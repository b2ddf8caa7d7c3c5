"""Async pipeline compile + fallback execution (the analogue of async PSO
compilation with EXECUTE_RESULT_FALLBACK, HnRenderPass interface:114-120)."""
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
from diligentfx_tpu.gltf.primitives import uv_sphere
from diligentfx_tpu.hydrogent.async_compile import (AsyncFramePipeline,
                                                    ExecuteResult)
from diligentfx_tpu.hydrogent.task_manager import TaskManagerCreateInfo
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

W = H = 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                       max_tiles_per_tri=16, big_tri_capacity=16, chunk=8)


def test_async_compile_serves_fallback_then_full():
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=CFG)
    scene = build_scene([(uv_sphere(1.0, stacks=10, slices=14),
                          np.eye(4, dtype=np.float32),
                          PBRMaterialBasicAttribs.create(
                              base_color_factor=(0.7, 0.3, 0.2, 1.0)))])
    eye = [0.0, 0.0, 3.0]
    cam = CameraAttribs.create(m3.look_at(eye, [0, 0, 0]),
                               m3.perspective(0.8, 1.0, 0.1, 20.0),
                               eye, 0.1, 20.0, W, H)
    info = RenderInfo(camera=cam,
                      lights=PBRLightAttribs.directional([0, -1, -1], [3, 3, 3]),
                      renderer_params=PBRRendererShaderParameters.create())
    ci = TaskManagerCreateInfo(enable_ssr=True, enable_ssao=True,
                               enable_taa=True, enable_bloom=True)
    pipe = AsyncFramePipeline(renderer, ci, width=W, height=H)

    results = []
    out = state = None
    for i in range(60):
        out, res = pipe.execute(scene, info, out.state if out else None)
        results.append(res)
        if res == ExecuteResult.OK:
            break
        if i == 2:   # a few real fallback frames, then let the compile land
            assert pipe._ready.wait(timeout=300)
    # the first frame must not have blocked on the full compile
    assert results[0] == ExecuteResult.FALLBACK
    # the full pipeline eventually lands
    assert results[-1] == ExecuteResult.OK, results
    assert np.isfinite(np.asarray(out.color)).all()
    # once ready it stays ready, and temporal state carries forward
    out2, res2 = pipe.execute(scene, info, out.state)
    assert res2 == ExecuteResult.OK
    assert int(out2.state.frame_index) == int(out.state.frame_index) + 1
