"""Material extension layers through the deferred path
(clearcoat / sheen / anisotropy / iridescence / transmission)."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (
    CameraAttribs, PBRLightAttribs, PBRMaterialAnisotropyAttribs,
    PBRMaterialBasicAttribs, PBRMaterialIridescenceAttribs,
    PBRMaterialSheenAttribs, PBRMaterialTransmissionAttribs,
    PBRRendererShaderParameters, stack_materials)
from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
from diligentfx_tpu.gltf.primitives import uv_sphere
from diligentfx_tpu.pbr.deferred import render_gbuffer
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

W = H = 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                       max_tiles_per_tri=16, big_tri_capacity=16, chunk=8)


@pytest.fixture(scope="module")
def base():
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=CFG)
    mesh = uv_sphere(1.0, stacks=12, slices=16)
    scene = build_scene([(mesh, np.eye(4, dtype=np.float32),
                          PBRMaterialBasicAttribs.create(
                              base_color_factor=(0.8, 0.1, 0.1, 1.0),
                              metallic_factor=0.0, roughness_factor=0.5,
                              clearcoat_factor=1.0,
                              clearcoat_roughness_factor=0.1))])
    eye = [0.0, 0.0, 3.5]
    view = m3.look_at(eye, [0, 0, 0])
    proj = m3.perspective(0.8, 1.0, 0.1, 20.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 20.0, W, H)
    lights = PBRLightAttribs.directional([-0.3, -0.5, -1.0], [3, 3, 3])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    return renderer, scene, info


def render(renderer, scene, info, **kw):
    gb = render_gbuffer(scene, info, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=CFG, **kw)
    total = np.asarray(gb.direct + gb.ambient_diffuse + gb.ambient_specular)
    return gb, total


def test_clearcoat_adds_secondary_highlight(base):
    renderer, scene, info = base
    gb0, img0 = render(renderer, scene, info, enable_clearcoat=False)
    gb1, img1 = render(renderer, scene, info, enable_clearcoat=True)
    assert np.isfinite(img1).all()
    hit = np.asarray(gb1.hit)
    # clearcoat changes the response (fresnel rim + extra specular)
    diff = np.abs(img1 - img0)[hit].mean()
    assert diff > 1e-3


def test_sheen_layer(base):
    renderer, scene, info = base
    sheen = stack_materials([PBRMaterialSheenAttribs.create((1.0, 0.5, 0.3), 0.5)])
    scene_s = scene._replace(materials_sheen=sheen)
    gb0, img0 = render(renderer, scene, info)
    gb1, img1 = render(renderer, scene_s, info)
    hit = np.asarray(gb1.hit)
    assert np.isfinite(img1).all()
    # sheen adds rim energy
    assert img1[hit].sum() > img0[hit].sum()


def test_anisotropy_changes_highlight(base):
    renderer, scene, info = base
    aniso = stack_materials([PBRMaterialAnisotropyAttribs.create(0.9, 0.0)])
    scene_a = scene._replace(materials_anisotropy=aniso)
    _, img0 = render(renderer, scene, info)
    gb1, img1 = render(renderer, scene_a, info)
    hit = np.asarray(gb1.hit)
    assert np.isfinite(img1).all()
    assert np.abs(img1 - img0)[hit].mean() > 1e-4


def test_iridescence_tints_specular(base):
    renderer, scene, info = base
    irid = stack_materials([PBRMaterialIridescenceAttribs.create(
        1.0, 1.3, 100.0, 400.0)])
    scene_i = scene._replace(materials_iridescence=irid)
    gb1, img1 = render(renderer, scene_i, info)
    _, img0 = render(renderer, scene, info)
    hit = np.asarray(gb1.hit)
    assert np.isfinite(img1).all()
    # the thin film changes per-channel specular response
    delta = (img1 - img0)[hit]
    per_chan = np.abs(delta).mean(0)
    assert per_chan.max() > 1e-4
    assert per_chan.std() > 1e-6  # chromatic, not uniform


def test_transmission_replaces_diffuse_with_transmitted_env(base):
    """Transmission = 1 swaps the Lambertian lobe for refracted environment
    radiance (PBR_Shading.fxh transmission/volume): glass is CLEAR, not dark —
    the ambient-diffuse layer stays populated (transmitted light) but the
    punctual diffuse response is suppressed."""
    renderer, scene, info = base
    trans = stack_materials([PBRMaterialTransmissionAttribs.create(1.0)])
    scene_t = scene._replace(materials_transmission=trans)
    gb1, _ = render(renderer, scene_t, info)
    gb0, _ = render(renderer, scene, info)
    hit = np.asarray(gb0.hit)
    d1 = np.asarray(gb1.ambient_diffuse)[hit]
    d0 = np.asarray(gb0.ambient_diffuse)[hit]
    # the transmitted layer is alive (not near-black glass)...
    assert d1.mean() > 0.05 * d0.mean()
    # ...and spectrally different from the Lambertian response (it is env
    # radiance tinted by base color, not irradiance-weighted diffuse)
    assert np.abs(d1 - d0).mean() > 1e-3
    # punctual diffuse is suppressed: direct term drops (spec survives)
    p1 = np.asarray(gb1.direct)[hit].sum()
    p0 = np.asarray(gb0.direct)[hit].sum()
    assert p1 < p0


def test_volume_beer_lambert_attenuates_transmission(base):
    """KHR_materials_volume: thicker absorbing volumes transmit less, tinted
    by the attenuation color (Beer-Lambert)."""
    from diligentfx_tpu.attribs import PBRMaterialVolumeAttribs
    renderer, scene, info = base
    trans = stack_materials([PBRMaterialTransmissionAttribs.create(1.0)])

    def with_vol(thickness):
        vol = stack_materials([PBRMaterialVolumeAttribs.create(
            attenuation_color=(0.9, 0.2, 0.2), thickness_factor=thickness,
            attenuation_distance=1.0)])
        return scene._replace(materials_transmission=trans,
                              materials_volume=vol)

    gb0, _ = render(renderer, with_vol(0.0), info)
    gb1, _ = render(renderer, with_vol(1.0), info)
    gb3, _ = render(renderer, with_vol(3.0), info)
    hit = np.asarray(gb0.hit)
    d0 = np.asarray(gb0.ambient_diffuse)[hit].mean(0)
    d1 = np.asarray(gb1.ambient_diffuse)[hit].mean(0)
    d3 = np.asarray(gb3.ambient_diffuse)[hit].mean(0)
    # monotone extinction with thickness
    assert d1.sum() < d0.sum() and d3.sum() < d1.sum()
    # attenuation color (0.9, 0.2, 0.2): green/blue extinguish much faster
    # (base color is red-dominant so compare RELATIVE drop per channel)
    rel = d3 / np.maximum(d0, 1e-6)
    assert rel[0] > rel[1] and rel[0] > rel[2]


def test_spec_gloss_workflow(base):
    """workflow=1 uses base as diffuse + specular_factor as F0."""
    renderer, scene, info = base
    import jax.numpy as jnp
    mats = scene.materials
    sg = mats.replace(
        workflow=jnp.ones_like(mats.workflow),
        specular_factor=jnp.full_like(mats.specular_factor, 0.9),
        roughness_factor=jnp.full_like(mats.roughness_factor, 0.7))
    scene_sg = scene._replace(materials=sg)
    gb_sg, img_sg = render(renderer, scene_sg, info)
    gb_mr, img_mr = render(renderer, scene, info)
    hit = np.asarray(gb_sg.hit)
    assert np.isfinite(img_sg).all()
    # high specular factor → much stronger specular response than MR dielectric
    assert img_sg[hit].mean() != pytest.approx(img_mr[hit].mean(), rel=0.01)
