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


def test_transmission_suppresses_diffuse(base):
    renderer, scene, info = base
    trans = stack_materials([PBRMaterialTransmissionAttribs.create(1.0)])
    scene_t = scene._replace(materials_transmission=trans)
    gb1, _ = render(renderer, scene_t, info)
    gb0, _ = render(renderer, scene, info)
    hit = np.asarray(gb0.hit)
    d1 = np.asarray(gb1.ambient_diffuse)[hit].sum()
    d0 = np.asarray(gb0.ambient_diffuse)[hit].sum()
    assert d1 < d0 * 0.2  # fully transmissive → diffuse mostly gone


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
