"""Full frame-graph pipeline tests (HnTaskManager analogue)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.config import (PBRRendererCreateInfo, RasterizerConfig,
                                   ToneMappingMode)
from diligentfx_tpu.gltf.primitives import plane, uv_sphere
from diligentfx_tpu.hydrogent.task_manager import (FrameState, HnTaskManager,
                                                   TaskManagerCreateInfo)
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

W, H = 128, 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=1024,
                       max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)
CI = PBRRendererCreateInfo(brdf_lut_dim=16, num_brdf_samples=8,
                           irradiance_cube_dim=16, prefiltered_env_map_dim=16,
                           num_specular_env_samples=8)


@pytest.fixture(scope="module")
def setup():
    renderer = PBRRenderer(CI, raster_cfg=CFG)
    sphere = uv_sphere(0.8, stacks=10, slices=14)
    ground = plane(20.0)
    lift = np.eye(4, dtype=np.float32)
    lift[3, 1] = 1.0
    gnode = np.eye(4, dtype=np.float32)
    gnode[3, 1] = -0.5
    scene = build_scene([
        (sphere, lift, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.8, 0.2, 0.2, 1.0), metallic_factor=0.9,
            roughness_factor=0.2)),
        (ground, gnode, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.5, 0.5, 0.55, 1.0), metallic_factor=0.0,
            roughness_factor=0.15)),
    ])
    eye = [0.0, 2.0, 6.0]
    view = m3.look_at(eye, [0.0, 0.5, 0.0])
    proj = m3.perspective(0.8, W / H, 0.1, 50.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 50.0, W, H)
    lights = PBRLightAttribs.directional([-0.3, -1.0, -0.2], [4.0, 4.0, 4.0])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    return renderer, scene, info


def test_full_pipeline_three_frames(setup):
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, enable_ssr=True, enable_taa=True, enable_bloom=True,
        enable_dof=False))
    state = tm.initial_state(W, H)
    for f in range(3):
        out = tm.execute(scene, info, state, width=W, height=H)
        state = out.state
        a = np.asarray(out.color)
        assert np.isfinite(a).all(), f
        assert a.shape == (H, W, 3)
        assert 0.0 <= a.min() and a.max() <= 1.0
    assert int(state.frame_index) == 3
    # TAA accumulated
    assert float(state.taa.sample_count.max()) >= 2
    # G-buffer AOVs sane
    gb = out.gbuffer
    assert gb.mesh_id.shape == (H, W)
    assert int(gb.mesh_id.max()) == 1          # two prims
    assert bool(gb.hit.any())
    assert float(gb.depth.min()) > 0.0


def test_pipeline_minimal_config(setup):
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False, enable_dof=False,
        tone_mapping_mode=ToneMappingMode.AGX))
    state = tm.initial_state(W, H)
    out = tm.execute(scene, info, state, width=W, height=H)
    assert np.isfinite(np.asarray(out.color)).all()


def test_pipeline_with_dof(setup):
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=True,
        enable_bloom=False, enable_dof=True))
    state = tm.initial_state(W, H)
    out = tm.execute(scene, info, state, width=W, height=H)
    assert np.isfinite(np.asarray(out.color)).all()


def test_motion_vectors_on_camera_move(setup):
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False))
    state = tm.initial_state(W, H)
    out1 = tm.execute(scene, info, state, width=W, height=H)
    # move the camera; prev_view_proj in state reflects frame 1
    eye2 = [0.5, 2.0, 6.0]
    view2 = m3.look_at(eye2, [0.0, 0.5, 0.0])
    cam2 = CameraAttribs.create(view2, info.camera.proj, eye2, 0.1, 50.0, W, H)
    out2 = tm.execute(scene, info._replace(camera=cam2), out1.state,
                      width=W, height=H)
    hit = np.asarray(out2.gbuffer.hit)
    mv = np.asarray(out2.gbuffer.motion)
    assert np.abs(mv[hit]).max() > 1e-3


def test_pipeline_light_scattering_and_auto_exposure(setup):
    renderer, scene, info = setup
    from diligentfx_tpu.hydrogent.task_manager import TaskManagerCreateInfo
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False, enable_light_scattering=True,
        epipolar_slices=64, epipolar_samples=32, epipolar_march_steps=8,
        enable_auto_exposure=True))
    state = tm.initial_state(W, H)
    out = tm.execute(scene, info, state, width=W, height=H)
    a = np.asarray(out.color)
    assert np.isfinite(a).all()
    assert out.state.average_log_lum is not None
    assert np.isfinite(float(out.state.average_log_lum))
    # second frame adapts exposure
    out2 = tm.execute(scene, info, out.state, width=W, height=H)
    assert np.isfinite(np.asarray(out2.color)).all()


def test_view_modes(setup):
    renderer, scene, info = setup
    from diligentfx_tpu.config import DebugViewType
    for vm in (DebugViewType.BASE_COLOR, DebugViewType.SHADING_NORMAL,
               DebugViewType.MOTION_VECTORS, DebugViewType.SCENE_DEPTH):
        tm = HnTaskManager(renderer, TaskManagerCreateInfo(
            enable_ssao=False, enable_ssr=False, enable_taa=False,
            enable_bloom=False, view_mode=vm))
        out = tm.execute(scene, info, tm.initial_state(W, H), width=W, height=H)
        a = np.asarray(out.color)
        assert np.isfinite(a).all(), vm


def test_execute_split_matches_execute(setup):
    """execute_split (two compiled phases, for 4K-scale programs) must be
    numerically identical to the monolithic execute."""
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, enable_ssr=True, enable_taa=True,
        enable_bloom=True))
    s1 = tm.initial_state(W, H)
    a = tm.execute(scene, info, s1, width=W, height=H)
    b = tm.execute_split(scene, info, s1, width=W, height=H)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.state.frame_index),
                                  np.asarray(b.state.frame_index))


def test_execute_split_banded_matches(setup):
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, enable_ssr=True, enable_taa=True,
        enable_bloom=True))
    s1 = tm.initial_state(W, H)
    a = tm.execute(scene, info, s1, width=W, height=H)
    b = tm.execute_split(scene, info, s1, width=W, height=H,
                         gbuffer_bands=4)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-5)


def test_all_35_debug_views(setup):
    """Every DebugViewType value renders finite output (HN_VIEW_MODE table,
    PBR_Renderer.hpp:401-439).  One full-pipeline compile (view IRIDESCENCE,
    exercising the emit_debug G-buffer payload end to end); the remaining 33
    views evaluate _debug_aov directly on that G-buffer — same code path the
    pipeline dispatches to, without 33 recompiles."""
    from diligentfx_tpu.config import DebugViewType
    from diligentfx_tpu.hydrogent.task_manager import _debug_aov
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False, view_mode=DebugViewType.IRIDESCENCE))
    out = tm.execute(scene, info, tm.initial_state(W, H), width=W, height=H)
    a = np.asarray(out.color)
    assert np.isfinite(a).all() and a.shape == (H, W, 3)
    gb = out.gbuffer
    assert gb.debug is not None and len(gb.debug) >= 20
    ao = jnp.ones_like(gb.depth)
    for view in DebugViewType:
        if view == DebugViewType.NONE:
            continue
        img = np.asarray(_debug_aov(view, gb, ao))
        assert np.isfinite(img).all(), view.name
        assert img.shape == (H, W, 3), view.name


def test_selection_grid_boundbox_vector_field_tasks(setup):
    """The remaining HnTaskManager task UIDs: ProcessSelection (outline +
    desaturation), CoordinateGrid, RenderBoundBox, vector-field overlay,
    ComputeDepthBounds (HnTaskManager.hpp:57-78)."""
    from diligentfx_tpu.hydrogent.task_manager import (BoundBoxParams,
                                                       FrameSettings)
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False, enable_selection=True, enable_grid=True,
        enable_bound_box=True, enable_vector_field=True,
        enable_depth_bounds=True))
    state = tm.initial_state(W, H)
    settings = FrameSettings(
        selected_ids=jnp.array([0, -1, -1, -1], jnp.int32),
        bound_box=BoundBoxParams(box_min=jnp.array([-0.8, 0.2, -0.8]),
                                 box_max=jnp.array([0.8, 1.8, 0.8])))
    base_tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False))
    base = base_tm.execute(scene, info, base_tm.initial_state(W, H),
                           width=W, height=H)
    out = tm.execute(scene, info, state, width=W, height=H, settings=settings)
    a, b = np.asarray(out.color), np.asarray(base.color)
    assert np.isfinite(a).all()
    assert np.abs(a - b).max() > 0.05          # overlays visibly changed pixels
    # depth bounds product sane: scene spans in front of the camera
    dr = out.depth_range
    assert dr is not None
    assert 0.0 < float(dr.scene_near_z) < float(dr.scene_far_z) <= 50.0 * 1.01
    # selection desaturation: unselected ground pixels lost saturation
    sel_mask = np.asarray(out.gbuffer.mesh_id) == 0
    assert sel_mask.any()


def test_reset_taa_forces_history_rejection(setup):
    """HnTaskManager::ResetTAA zeroes the accumulated sample counts so the
    next frame's blend alpha is 1 (full current frame)."""
    renderer, scene, info = setup
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=True,
        enable_bloom=False))
    state = tm.initial_state(W, H)
    out = tm.execute(scene, info, state, width=W, height=H)
    assert float(np.asarray(out.state.taa.sample_count).max()) >= 1.0
    reset = tm.reset_taa(out.state)
    assert float(np.asarray(reset.taa.sample_count).max()) == 0.0
    # other temporal products survive
    assert reset.prev_depth is out.state.prev_depth
    assert tm.suspend_super_sampling(out.state).taa.sample_count.sum() == 0
