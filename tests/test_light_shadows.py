"""Per-light spot/point shadow maps (HnLight shadow atlas slices,
HnLight.cpp shadow view/proj; HnShadowMapManager.hpp:47-66)."""
import numpy as np
import pytest
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.components import shadow_map_manager as smm
from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
from diligentfx_tpu.gltf.primitives import plane, transform_mesh
from diligentfx_tpu.pbr.deferred import render_gbuffer
from diligentfx_tpu.pbr.renderer import (PBRRenderer, RenderInfo, build_scene,
                                         transform_vertices)

W = H = 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                       max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)


@pytest.fixture(scope="module")
def renderer():
    return PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=CFG)


def _scene_floor_occluder():
    """Ground plane at y=0, small occluder quad at y=1."""
    floor_m = np.eye(4, dtype=np.float32)
    occ = plane(0.8)
    occ_m = np.eye(4, dtype=np.float32)
    occ_m[3, 1] = 1.0
    mat = PBRMaterialBasicAttribs.create(base_color_factor=(1, 1, 1, 1),
                                         roughness_factor=1.0)
    return build_scene([(plane(6.0), floor_m, mat), (occ, occ_m, mat)],
                       double_sided_flags=[False, True])


def _camera():
    eye = [0.0, 3.0, 4.0]
    view = m3.look_at(eye, [0, 0, 0])
    proj = m3.perspective(0.9, 1.0, 0.1, 30.0)
    return CameraAttribs.create(view, proj, eye, 0.1, 30.0, W, H)


def _floor_direct(renderer, scene, info, kinds):
    gb = render_gbuffer(scene, info, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=CFG, use_ibl=False,
                        light_shadow_kinds=kinds)
    return gb, np.asarray(gb.direct)


def test_point_shadow_face_selection():
    v = jnp.asarray([[1.0, 0.1, 0.1], [-2.0, 0.0, 0.0], [0.0, 3.0, 0.1],
                     [0.0, -1.0, 0.0], [0.1, 0.2, 5.0], [0.0, 0.0, -0.5]])
    np.testing.assert_array_equal(np.asarray(smm.point_shadow_face(v)),
                                  [0, 1, 2, 3, 4, 5])


def test_spot_shadow_darkens_occluded_floor(renderer):
    scene = _scene_floor_occluder()
    lpos, ldir = [0.0, 4.0, 0.0], [0.0, -1.0, 0.0]
    lights = PBRLightAttribs.spot(lpos, ldir, [30.0, 30.0, 30.0],
                                  0.4, 0.9, range=20.0, shadow_map_index=0)
    vp = smm.spot_view_proj(lpos, ldir, 0.9, near=0.1, far=20.0)[None]
    wp, _, _ = transform_vertices(scene)
    maps = smm.render_light_shadow_maps(wp, scene.indices, vp,
                                        shadow_map_size=256, cfg=CFG)
    info = RenderInfo(camera=_camera(), lights=lights,
                      renderer_params=PBRRendererShaderParameters.create(),
                      light_shadow_maps=maps, light_shadow_view_projs=vp)
    gb, lit = _floor_direct(renderer, scene, info, ("spot",))
    _, unlit = _floor_direct(
        renderer, scene,
        info._replace(light_shadow_maps=None, light_shadow_view_projs=None),
        ())
    # pixel under the occluder center vs an open floor pixel
    hit = np.asarray(gb.hit)
    cy, cx = H // 2 + 8, W // 2        # floor just in front of center
    assert np.isfinite(lit).all()
    # find shadowed floor: pixels where direct light dropped a lot
    drop = (unlit.sum(-1) - lit.sum(-1))
    shadowed = (drop > 0.3 * unlit.sum(-1)) & hit & (unlit.sum(-1) > 0.05)
    assert shadowed.sum() > 20            # the occluder casts a real shadow
    # fully open areas (outside the penumbra/bias boundary) keep their light
    open_px = (drop < 0.05 * unlit.sum(-1)) & hit & (unlit.sum(-1) > 0.05)
    assert open_px.sum() > 100
    np.testing.assert_allclose(lit.sum(-1)[open_px], unlit.sum(-1)[open_px],
                               rtol=0.1, atol=0.02)


def test_point_shadow_darkens_occluded_floor(renderer):
    scene = _scene_floor_occluder()
    lpos = [0.0, 4.0, 0.0]
    lights = PBRLightAttribs.point(lpos, [40.0, 40.0, 40.0], range=30.0,
                                   shadow_map_index=0)
    vps = smm.point_view_projs(lpos, near=0.1, far=30.0)
    wp, _, _ = transform_vertices(scene)
    maps = smm.render_light_shadow_maps(wp, scene.indices, vps,
                                        shadow_map_size=256, cfg=CFG)
    info = RenderInfo(camera=_camera(), lights=lights,
                      renderer_params=PBRRendererShaderParameters.create(),
                      light_shadow_maps=maps, light_shadow_view_projs=vps)
    gb, lit = _floor_direct(renderer, scene, info, ("point",))
    _, unlit = _floor_direct(
        renderer, scene,
        info._replace(light_shadow_maps=None, light_shadow_view_projs=None),
        ())
    hit = np.asarray(gb.hit)
    drop = (unlit.sum(-1) - lit.sum(-1))
    shadowed = (drop > 0.3 * unlit.sum(-1)) & hit & (unlit.sum(-1) > 0.05)
    assert shadowed.sum() > 20
    open_px = (drop < 0.05 * unlit.sum(-1)) & hit & (unlit.sum(-1) > 0.05)
    assert open_px.sum() > 100
    np.testing.assert_allclose(lit.sum(-1)[open_px], unlit.sum(-1)[open_px],
                               rtol=0.1, atol=0.02)


def test_light_shadows_through_task_manager(renderer):
    """light_shadow_kinds rides through HnTaskManager.execute."""
    from diligentfx_tpu.hydrogent.task_manager import (HnTaskManager,
                                                       TaskManagerCreateInfo)
    scene = _scene_floor_occluder()
    lpos, ldir = [0.0, 4.0, 0.0], [0.0, -1.0, 0.0]
    lights = PBRLightAttribs.spot(lpos, ldir, [30.0, 30.0, 30.0],
                                  0.4, 0.9, range=20.0, shadow_map_index=0)
    vp = smm.spot_view_proj(lpos, ldir, 0.9, near=0.1, far=20.0)[None]
    wp, _, _ = transform_vertices(scene)
    maps = smm.render_light_shadow_maps(wp, scene.indices, vp,
                                        shadow_map_size=256, cfg=CFG)
    info = RenderInfo(camera=_camera(), lights=lights,
                      renderer_params=PBRRendererShaderParameters.create(),
                      light_shadow_maps=maps, light_shadow_view_projs=vp)
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False))
    state = tm.initial_state(W, H)
    out_s = tm.execute(scene, info, state, width=W, height=H,
                       light_shadow_kinds=("spot",))
    out_n = tm.execute(scene, info, state, width=W, height=H)
    a, b = np.asarray(out_s.color), np.asarray(out_n.color)
    assert np.isfinite(a).all()
    # shadowing changed the image (occluder shadow on the floor)
    assert np.abs(a - b).max() > 0.02
