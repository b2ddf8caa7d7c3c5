#!/usr/bin/env python
"""Render the `mr_spheres` benchmark config (BASELINE.json configs[0]):
a grid of spheres sweeping metallic × roughness under IBL + one directional
light — the procedural stand-in for the glTF MetalRoughSpheres asset.

Usage: JAX_PLATFORMS=cpu python examples/render_mr_spheres.py --size 128 --out /tmp/frame.png
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_mr_spheres_scene(rows=4, cols=4, sphere_res=24):
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    from diligentfx_tpu.gltf.primitives import uv_sphere
    from diligentfx_tpu.pbr.renderer import build_scene

    mesh = uv_sphere(0.42, stacks=sphere_res, slices=sphere_res + 8)
    entries = []
    for r in range(rows):
        for c in range(cols):
            metallic = r / max(rows - 1, 1)
            roughness = np.clip(c / max(cols - 1, 1), 0.03, 1.0)
            node = np.eye(4, dtype=np.float32)
            node[3, :3] = [c - (cols - 1) / 2, (rows - 1) / 2 - r, 0.0]
            mat = PBRMaterialBasicAttribs.create(
                base_color_factor=(0.8, 0.3, 0.25, 1.0),
                metallic_factor=metallic, roughness_factor=roughness)
            entries.append((mesh, node, mat))
    return build_scene(entries)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=str, default="/tmp/mr_spheres.png")
    ap.add_argument("--ibl-dim", type=int, default=64)
    ap.add_argument("--debug-view", type=str, default="NONE")
    args = ap.parse_args()

    import jax.numpy as jnp
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import (DebugViewType, PBRRendererCreateInfo,
                                       RasterizerConfig)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.utils.image import write_png

    w = h = args.size
    scene = build_mr_spheres_scene()
    ci = PBRRendererCreateInfo(
        brdf_lut_dim=64, num_brdf_samples=64,
        irradiance_cube_dim=32, prefiltered_env_map_dim=args.ibl_dim,
        num_specular_env_samples=64)
    t0 = time.time()
    renderer = PBRRenderer(ci, raster_cfg=RasterizerConfig(
        tile_h=8, tile_w=128, bin_capacity=4096, chunk=32))
    print(f"IBL precompute: {time.time() - t0:.1f}s")

    view = m3.look_at([0.0, 0.3, 6.0], [0.0, 0.0, 0.0])
    proj = m3.perspective(0.6, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, [0.0, 0.3, 6.0], 0.1, 100.0, w, h)
    lights = PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())

    t0 = time.time()
    img = renderer.render(scene, info, width=w, height=h,
                          debug_view=DebugViewType[args.debug_view])
    img.block_until_ready()
    print(f"first frame (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    img = renderer.render(scene, info, width=w, height=h,
                          debug_view=DebugViewType[args.debug_view])
    img.block_until_ready()
    print(f"steady-state frame: {(time.time() - t0) * 1000:.1f} ms")

    arr = np.asarray(img)
    assert np.isfinite(arr).all(), "NaN/Inf in output!"
    write_png(args.out, arr)
    print(f"wrote {args.out}  ({w}x{h}, mean={arr.mean():.3f})")


if __name__ == "__main__":
    main()
