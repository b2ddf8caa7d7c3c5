"""End-to-end transparency through the task graph."""
import json
import os

import numpy as np
import pytest

from tests.test_gltf import make_quad_gltf


def test_transparent_quad_through_pipeline(tmp_path):
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import (PBRRendererCreateInfo, RasterizerConfig,
                                       ToneMappingMode)
    from diligentfx_tpu.gltf.loader import load_gltf
    from diligentfx_tpu.gltf.model import build_render_scene
    from diligentfx_tpu.hydrogent.task_manager import (HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    path = make_quad_gltf(str(tmp_path), with_texture=False,
                          alpha_mode="BLEND")
    # halve the base color alpha so the quad is semi-transparent
    with open(path) as f:
        doc = json.load(f)
    doc["materials"][0]["pbrMetallicRoughness"]["baseColorFactor"] = [1, 0, 0, 0.5]
    with open(path, "w") as f:
        json.dump(doc, f)

    model = load_gltf(path)
    rs = build_render_scene(model)
    assert rs.scene.blend_indices is not None
    assert rs.scene.blend_indices.shape[0] == 2
    # main pass kept only the degenerate placeholder
    assert rs.scene.indices.shape[0] == 1

    W = H = 128
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=128,
                           max_tiles_per_tri=8, big_tri_capacity=16, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=cfg)
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False, tone_mapping_mode=ToneMappingMode.NONE,
        convert_output_to_srgb=False))

    eye = [0.5, 0.0, 3.0]
    view = m3.look_at(eye, [0.5, 0.0, 0.0])
    proj = m3.perspective(1.0, 1.0, 0.1, 10.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 10.0, W, H)
    lights = PBRLightAttribs.directional([0, 0, -1], [3, 3, 3])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())

    state = tm.initial_state(W, H)
    out = tm.execute(rs.scene, info, state, width=W, height=H)
    a = np.asarray(out.color)
    assert np.isfinite(a).all()
    center = a[H // 2, W // 2]
    corner = a[4, 4]
    # quad region is tinted red but still transmits some background
    assert center[0] > corner[0] + 0.05
    assert not np.allclose(center, corner, atol=0.02)
