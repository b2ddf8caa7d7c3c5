"""Multi-chip band-sharded rendering on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
from diligentfx_tpu.gltf.primitives import plane, uv_sphere
from diligentfx_tpu.parallel.mesh import band_halo_exchange, make_render_mesh
from diligentfx_tpu.parallel.tiling import render_forward_banded
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

W, H = 128, 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                       max_tiles_per_tri=16, big_tri_capacity=16, chunk=8)


@pytest.fixture(scope="module")
def setup():
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=CFG)
    sphere = uv_sphere(0.8, 10, 14)
    g = plane(20.0)
    gn = np.eye(4, dtype=np.float32)
    gn[3, 1] = -1.0
    scene = build_scene([
        (sphere, np.eye(4, dtype=np.float32),
         PBRMaterialBasicAttribs.create(base_color_factor=(0.8, 0.2, 0.2, 1),
                                        metallic_factor=0.4,
                                        roughness_factor=0.3)),
        (g, gn, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.4, 0.4, 0.45, 1), roughness_factor=0.7)),
    ])
    eye = [0.0, 1.5, 5.0]
    cam = CameraAttribs.create(m3.look_at(eye, [0, 0, 0]),
                               m3.perspective(0.9, 1.0, 0.1, 50.0),
                               eye, 0.1, 50.0, W, H)
    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.3], [3, 3, 3])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    return renderer, scene, info


def test_banded_matches_single_device(setup):
    renderer, scene, info = setup
    mesh = make_render_mesh(8, dp=1, sp=8)
    banded = render_forward_banded(scene, info, renderer.ibl_maps,
                                   renderer.env_oct, mesh,
                                   width=W, height=H, cfg=CFG)
    assert banded.shape == (H, W, 3)

    # single-device reference through the same code path (1-band mesh)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    single = render_forward_banded(scene, info, renderer.ibl_maps,
                                   renderer.env_oct, mesh1,
                                   width=W, height=H, cfg=CFG)
    a, b = np.asarray(banded), np.asarray(single)
    assert np.isfinite(a).all()
    # plane setup is in GLOBAL screen coords and the band offset applies as
    # an exact integer pixel shift in the kernels → bands are BIT-exact
    # (PERF_NOTES.md round-2 lesson)
    np.testing.assert_array_equal(a, b)


def test_halo_exchange_bands():
    mesh = make_render_mesh(8, dp=1, sp=8)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    img = jnp.arange(64 * 16, dtype=jnp.float32).reshape(64, 16)

    def f(band):
        padded = band_halo_exchange(band, halo=2)
        return padded

    out = shard_map(f, mesh=mesh, in_specs=P("sp", None),
                    out_specs=P("sp", None), check_rep=False)(img)
    # each 8-row band becomes 12 rows; verify interior band 1 got band 0 rows
    out = np.asarray(out).reshape(8, 12, 16)
    np.testing.assert_allclose(out[1, :2], np.asarray(img)[6:8])   # from above
    np.testing.assert_allclose(out[1, 2:10], np.asarray(img)[8:16])
    np.testing.assert_allclose(out[1, 10:], np.asarray(img)[16:18])  # from below
    # edge band 0 has zero top halo
    np.testing.assert_allclose(out[0, :2], 0.0)


def test_full_deferred_banded_matches_sp1(setup):
    """The FULL deferred chain (G-buffer + SSAO + SSR + composite + TAA +
    bloom + tone map) band-sharded over sp must match the same pipeline on a
    1-band mesh — validates the halo exchanges, all_gathers and band-local
    viewport math (SURVEY.md §5.7 CP/SP analogue)."""
    import jax
    from jax.sharding import Mesh
    from diligentfx_tpu.config import ToneMappingMode
    from diligentfx_tpu.parallel.tiling import (initial_banded_state,
                                                render_frame_banded)
    renderer, scene, info = setup
    W, H = 256, 128
    kw = dict(width=W, height=H, cfg=CFG, use_ibl=True,
              enable_ssao=True, enable_ssr=True, enable_taa=True,
              enable_bloom=True, ssr_divisor=2, ssr_steps=12,
              tone_mapping_mode=ToneMappingMode.UNCHARTED2, halo=8)

    mesh4 = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("sp",))
    mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("sp",))

    st4 = initial_banded_state(W, H, mesh4)
    st1 = initial_banded_state(W, H, mesh1)
    for _ in range(2):   # two frames exercise the temporal paths
        c4, st4 = render_frame_banded(scene, info, renderer.ibl_maps,
                                      renderer.env_oct, st4, mesh4, **kw)
        c1, st1 = render_frame_banded(scene, info, renderer.ibl_maps,
                                      renderer.env_oct, st1, mesh1, **kw)
    a4, a1 = np.asarray(c4), np.asarray(c1)
    assert np.isfinite(a4).all() and np.isfinite(a1).all()
    np.testing.assert_allclose(a4, a1, atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_banded_matches_task_manager_execute_1080p(setup):
    """1080p-class cross-IMPLEMENTATION parity: the sp=4 banded pipeline vs
    the production HnTaskManager.execute (not banded-vs-banded) over two
    frames with TAA jitter, SSAO, SSR, OIT, bloom, tone map + sRGB — the
    round-3 verdict's done-criterion for the banded-path unification.  Any
    fork between the shared effect implementations and the banded wiring
    shows up here as a mismatch."""
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    from diligentfx_tpu.config import ToneMappingMode
    from diligentfx_tpu.gltf.primitives import plane, uv_sphere
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.parallel.tiling import (initial_banded_state,
                                                render_frame_banded)
    from diligentfx_tpu.pbr.renderer import build_scene
    from diligentfx_tpu.postfx.ssr import SSRSettings

    renderer, _scene, info = setup
    W, H, SP = 1920, 1088, 4
    # a scene WITH blend geometry so the banded OIT path is exercised
    sphere = uv_sphere(0.8, 8, 10)
    g = plane(20.0)
    gn = np.eye(4, dtype=np.float32)
    gn[3, 1] = -1.0
    tn = np.eye(4, dtype=np.float32)
    tn[3, 0] = 1.2
    scene = build_scene([
        (sphere, np.eye(4, dtype=np.float32),
         PBRMaterialBasicAttribs.create(base_color_factor=(0.8, 0.2, 0.2, 1),
                                        metallic_factor=0.4,
                                        roughness_factor=0.3)),
        (sphere, tn,
         PBRMaterialBasicAttribs.create(base_color_factor=(0.2, 0.5, 0.9, 0.5),
                                        alpha_mode=2, roughness_factor=0.2)),
        (g, gn, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.4, 0.4, 0.45, 1), roughness_factor=0.7)),
    ])
    cam_w = m3.look_at([0.0, 1.5, 5.0], [0, 0, 0])
    cam = CameraAttribs.create(cam_w, m3.perspective(0.9, W / H, 0.1, 50.0),
                               [0.0, 1.5, 5.0], 0.1, 50.0, W, H)
    info = info._replace(camera=cam)

    ssr_steps = 12
    tmci = TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=3,
        enable_ssr=True, ssr_resolution_divisor=2,
        enable_taa=True, enable_bloom=True, enable_dof=False,
        oit_layer_count=4,
        tone_mapping_mode=ToneMappingMode.UNCHARTED2,
        convert_output_to_srgb=True)
    tm = HnTaskManager(renderer, tmci)
    settings = FrameSettings(ssr=SSRSettings(
        max_traversal_intersections=ssr_steps))

    mesh_sp = Mesh(np.asarray(jax.devices()[:SP]).reshape(SP), ("sp",))
    bst = initial_banded_state(W, H, mesh_sp)
    est = tm.initial_state(W, H)
    for _ in range(2):
        cb, bst = render_frame_banded(
            scene, info, renderer.ibl_maps, renderer.env_oct, bst, mesh_sp,
            width=W, height=H, cfg=renderer.raster_cfg, use_ibl=True,
            enable_ssao=True, ssao_num_slices=2, ssao_num_steps=3,
            enable_ssr=True, ssr_divisor=2, ssr_steps=ssr_steps,
            enable_taa=True, enable_bloom=True, oit_layer_count=4,
            tone_mapping_mode=ToneMappingMode.UNCHARTED2,
            convert_output_to_srgb=True, jitter_seq=tm.jitter_seq)
        out = tm.execute(scene, info, est, width=W, height=H,
                         settings=settings)
        est = out.state
    a_b, a_e = np.asarray(cb), np.asarray(out.color)
    assert np.isfinite(a_b).all() and np.isfinite(a_e).all()
    np.testing.assert_allclose(a_b, a_e, atol=4e-3, rtol=4e-3)
