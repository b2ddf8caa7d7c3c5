#!/usr/bin/env python
"""Regenerate golden images (run on CPU: deterministic across this stack).
Usage: python tests/golden/generate.py"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def render_mr_spheres_golden():
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRMaterialBasicAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.gltf.primitives import uv_sphere
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

    W = H = 128
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                           max_tiles_per_tri=16, big_tri_capacity=16, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=32, num_brdf_samples=32, irradiance_cube_dim=32,
        prefiltered_env_map_dim=32, num_specular_env_samples=32),
        raster_cfg=cfg)
    meshes = []
    sphere = uv_sphere(0.45, stacks=16, slices=24)
    for i in range(3):          # metallic 0, 0.5, 1 across a row
        node = np.eye(4, dtype=np.float32)
        node[3, 0] = (i - 1) * 1.1
        meshes.append((sphere, node, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.7, 0.2, 0.2, 1.0),
            metallic_factor=i * 0.5, roughness_factor=0.3)))
    scene = build_scene(meshes)
    eye = [0.0, 0.6, 3.2]
    cam = CameraAttribs.create(m3.look_at(eye, [0, 0, 0]),
                               m3.perspective(0.8, 1.0, 0.1, 20.0),
                               eye, 0.1, 20.0, W, H)
    info = RenderInfo(camera=cam,
                      lights=PBRLightAttribs.directional([-0.4, -0.6, -0.8],
                                                         [3.0, 3.0, 3.0]),
                      renderer_params=PBRRendererShaderParameters.create())
    return np.asarray(renderer.render(scene, info, width=W, height=H))


if __name__ == "__main__":
    from diligentfx_tpu.utils.image import write_png
    img = render_mr_spheres_golden()
    out = os.path.join(os.path.dirname(__file__), "mr_spheres_128.png")
    write_png(out, img)
    print("wrote", out, img.shape, "mean", float(img.mean()))
