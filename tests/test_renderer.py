"""End-to-end forward renderer tests (CPU, small frames)."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.config import (DebugViewType, PBRRendererCreateInfo,
                                   RasterizerConfig, ShadowMode)
from diligentfx_tpu.gltf.primitives import plane, uv_sphere
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=1024,
                       max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)
CI = PBRRendererCreateInfo(brdf_lut_dim=16, num_brdf_samples=8,
                           irradiance_cube_dim=16, prefiltered_env_map_dim=16,
                           num_specular_env_samples=8, enable_shadows=True)
W, H = 128, 128


@pytest.fixture(scope="module")
def renderer():
    return PBRRenderer(CI, raster_cfg=CFG)


@pytest.fixture(scope="module")
def scene():
    sphere = uv_sphere(0.8, stacks=10, slices=14)
    ground = plane(20.0)
    lift = np.eye(4, dtype=np.float32)
    lift[3, 1] = 1.5
    gnode = np.eye(4, dtype=np.float32)
    gnode[3, 1] = -0.5
    return build_scene([
        (sphere, lift, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.8, 0.2, 0.2, 1.0), metallic_factor=0.0,
            roughness_factor=0.4)),
        (ground, gnode, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.6, 0.6, 0.6, 1.0), metallic_factor=0.0,
            roughness_factor=0.8)),
    ])


@pytest.fixture(scope="module")
def frame_info():
    eye = [0.0, 2.5, 6.0]
    view = m3.look_at(eye, [0.0, 0.5, 0.0])
    proj = m3.perspective(0.8, W / H, 0.1, 50.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 50.0, W, H)
    lights = PBRLightAttribs.directional([0.05, -1.0, -0.1], [4.0, 4.0, 4.0],
                                         shadow_map_index=0)
    return RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())


def test_forward_frame_basic(renderer, scene, frame_info):
    img = renderer.render(scene, frame_info, width=W, height=H)
    a = np.asarray(img)
    assert a.shape == (H, W, 3)
    assert np.isfinite(a).all()
    assert a.min() >= 0.0 and a.max() <= 1.0
    # Sphere should be visibly red-ish near image center
    cx = a[H // 3, W // 2]
    assert cx[0] > cx[2]


def test_debug_views(renderer, scene, frame_info):
    for dv in (DebugViewType.BASE_COLOR, DebugViewType.SHADING_NORMAL,
               DebugViewType.NDOTV, DebugViewType.SCENE_DEPTH):
        img = renderer.render(scene, frame_info, width=W, height=H, debug_view=dv)
        assert np.isfinite(np.asarray(img)).all()


def test_shadowed_render(renderer, scene, frame_info):
    """With a near-vertical sun, the ground under the sphere must be darker
    when shadows are enabled."""
    import math
    from diligentfx_tpu.components.shadow_map_manager import (
        distribute_cascades, render_cascade_shadow_maps)
    from diligentfx_tpu.pbr.renderer import transform_vertices

    view = frame_info.camera.view
    world = m3.inverse(view)
    p00 = float(frame_info.camera.proj[0, 0])
    p11 = float(frame_info.camera.proj[1, 1])
    att = distribute_cascades(view, world, p00, p11, 0.1, 50.0,
                              [0.05, -1.0, -0.1], num_cascades=3,
                              shadow_map_size=256)
    wp, _, _ = transform_vertices(scene, None)
    smaps = render_cascade_shadow_maps(wp, scene.indices, att,
                                       shadow_map_size=256, cfg=CFG)
    info_sh = frame_info._replace(shadow_attribs=att, shadow_maps=smaps)

    img_no = np.asarray(renderer.render(scene, frame_info, width=W, height=H,
                                        convert_output_to_srgb=False))
    img_sh = np.asarray(renderer.render(scene, info_sh, width=W, height=H,
                                        shadow_mode=ShadowMode.PCF,
                                        convert_output_to_srgb=False))
    assert np.isfinite(img_sh).all()
    # A contact-shadow region must appear under the sphere: a meaningful
    # number of pixels clearly darkened, with real occlusion strength.
    darkening = (img_no - img_sh).mean(-1)
    assert darkening.max() > 0.1, darkening.max()
    assert (darkening > 0.05).sum() > 50, (darkening > 0.05).sum()
    # And identical where fully lit far from the sphere (left edge of ground)
    np.testing.assert_allclose(img_sh[-1, 5], img_no[-1, 5], atol=0.05)


def test_evsm_shadow_mode(renderer, scene, frame_info):
    from diligentfx_tpu.components.shadow_map_manager import (
        convert_to_filterable, distribute_cascades, gaussian_blur_separable,
        render_cascade_shadow_maps)
    from diligentfx_tpu.pbr.renderer import transform_vertices

    view = frame_info.camera.view
    att = distribute_cascades(view, m3.inverse(view),
                              float(frame_info.camera.proj[0, 0]),
                              float(frame_info.camera.proj[1, 1]),
                              0.1, 50.0, [0.05, -1.0, -0.1],
                              num_cascades=3, shadow_map_size=256)
    wp, _, _ = transform_vertices(scene, None)
    smaps = render_cascade_shadow_maps(wp, scene.indices, att,
                                       shadow_map_size=256, cfg=CFG)
    moments = gaussian_blur_separable(convert_to_filterable(smaps, ShadowMode.EVSM2))
    info_sh = frame_info._replace(shadow_attribs=att, shadow_maps=smaps,
                                  shadow_moments=moments)
    img = np.asarray(renderer.render(scene, info_sh, width=W, height=H,
                                     shadow_mode=ShadowMode.EVSM2))
    assert np.isfinite(img).all()


def test_ibl_disk_cache(tmp_path):
    import time as _t
    from diligentfx_tpu.utils.cache import load_ibl_maps
    r1 = PBRRenderer(CI, raster_cfg=CFG, ibl_cache_dir=str(tmp_path))
    files = list(tmp_path.glob("ibl_*.npz"))
    assert len(files) == 1
    r2 = PBRRenderer(CI, raster_cfg=CFG, ibl_cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(r1.ibl_maps.preintegrated_ggx),
                               np.asarray(r2.ibl_maps.preintegrated_ggx),
                               atol=1e-6)
    assert len(r2.ibl_maps.prefiltered) == len(r1.ibl_maps.prefiltered)


def test_banded_gbuffer_matches_monolithic(renderer, scene, frame_info):
    """render_gbuffer_banded (raster + reusable band-shading program) must
    be numerically identical to the monolithic render_gbuffer."""
    info = frame_info
    from diligentfx_tpu.pbr.deferred import render_gbuffer, render_gbuffer_banded
    a = render_gbuffer(scene, info, renderer.ibl_maps, renderer.env_oct,
                       width=W, height=H, cfg=CFG)
    b = render_gbuffer_banded(scene, info, renderer.ibl_maps,
                              renderer.env_oct, width=W, height=H, cfg=CFG,
                              bands=4)
    for name in a._fields:
        if getattr(a, name) is None:
            assert getattr(b, name) is None, name
            continue
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        if av.dtype == bool:
            np.testing.assert_array_equal(av, bv, err_msg=name)
        else:
            np.testing.assert_allclose(av, bv, atol=1e-5, err_msg=name)


def test_fused_gbuffer_matches_two_pass(renderer, scene, frame_info,
                                        monkeypatch):
    """The fused raster+interpolate+material kernel (rasterize_fused) must
    produce the same G-buffer as the two-pass gather path.  DFX_RECON=off
    keeps position INTERPOLATED for exactness — the default
    depth-reconstruction path trades mm-scale position error for 9 fewer
    epilogue plane rows (bounded by the test below)."""
    import functools
    from jax.experimental import pallas as pl
    from diligentfx_tpu.pbr.deferred import render_gbuffer
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setenv("DFX_RECON", "off")
    a = render_gbuffer(scene, frame_info, renderer.ibl_maps, renderer.env_oct,
                       width=W, height=H, cfg=CFG, fuse="off")
    b = render_gbuffer(scene, frame_info, renderer.ibl_maps, renderer.env_oct,
                       width=W, height=H, cfg=CFG, fuse="on")
    for name in a._fields:
        if getattr(a, name) is None:
            assert getattr(b, name) is None, name
            continue
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        if av.dtype == bool:
            np.testing.assert_array_equal(av, bv, err_msg=name)
        else:
            np.testing.assert_allclose(av, bv, atol=5e-4, rtol=5e-4,
                                       err_msg=name)


def test_recon_world_pos_accuracy(renderer, scene, frame_info, monkeypatch):
    """Depth-reconstructed world position (the fused default) vs the
    interpolated truth: the error budget is set by f32 NDC-depth ulps
    amplified by d(z_cam)/d(z_ndc) = z^2 (f-n)/(nf) — assert a per-pixel
    bound of 256 depth-ulps through that amplification plus a 1e-3 floor,
    and that shading-visible products stay tight."""
    import functools
    from jax.experimental import pallas as pl
    from diligentfx_tpu.pbr.deferred import render_gbuffer
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setenv("DFX_RECON", "off")
    a = render_gbuffer(scene, frame_info, renderer.ibl_maps, renderer.env_oct,
                       width=W, height=H, cfg=CFG, fuse="on")
    monkeypatch.setenv("DFX_RECON", "on")
    b = render_gbuffer(scene, frame_info, renderer.ibl_maps, renderer.env_oct,
                       width=W, height=H, cfg=CFG, fuse="on")
    hit = np.asarray(a.hit)
    cam = frame_info.camera
    n, f = float(cam.near_z), float(cam.far_z)
    d = np.asarray(a.depth)
    z_cam = n * f / np.maximum(f - d * (f - n), 1e-9)
    amp = z_cam * z_cam * (f - n) / (n * f)
    bound = 256.0 * np.spacing(np.maximum(d, 0.5).astype(np.float32)) * amp + 1e-3
    err = np.abs(np.asarray(b.world_pos) - np.asarray(a.world_pos)).max(-1)
    assert (err[hit] <= bound[hit]).mean() > 0.999, (
        err[hit].max(), bound[hit].min())
    # lighting products must be visually identical
    for name in ("direct", "ambient_diffuse", "ambient_specular"):
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.abs(av - bv).max() < 2e-2, name


def test_forward_fused_matches_two_pass(renderer, scene, frame_info,
                                        monkeypatch):
    """The forward path's fused-raster branch must match the gather path."""
    import functools
    from jax.experimental import pallas as pl
    from diligentfx_tpu.config import ToneMappingMode
    from diligentfx_tpu.pbr.renderer import _render_frame
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    kw = dict(width=W, height=H, cfg=CFG, use_ibl=True, use_lights=True,
              debug_view=DebugViewType.NONE,
              tone_mapping_mode=ToneMappingMode.UNCHARTED2,
              convert_output_to_srgb=True)
    a = _render_frame(scene, frame_info, renderer.ibl_maps, renderer.env_oct,
                      fuse="off", **kw)
    b = _render_frame(scene, frame_info, renderer.ibl_maps, renderer.env_oct,
                      fuse="on", **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-3, rtol=2e-3)


def test_static_scene_motion_zero_with_near_crossing_plane(renderer,
                                                           frame_info):
    """Regression: per-vertex prev-uv division produced multi-screen bogus
    motion on triangles crossing the previous near plane (a big ground plane
    behind the camera).  Static scene → motion ≈ 0 everywhere."""
    from diligentfx_tpu.pbr.deferred import render_gbuffer
    ground = np.eye(4, dtype=np.float32)
    ground[3, 1] = -0.8
    sc = build_scene([(plane(8.0), ground,
                       PBRMaterialBasicAttribs.create())])
    gb = render_gbuffer(sc, frame_info, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=CFG)
    m = np.asarray(gb.motion)
    assert np.abs(m).max() < 1e-3, np.abs(m).max()
