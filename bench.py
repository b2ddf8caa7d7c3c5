#!/usr/bin/env python
"""Benchmark: full PBR frame at 1080p on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): full PBR+postfx 1080p frame < 16 ms on v5e-1.
vs_baseline = 16.0 / measured_ms  (>1 means faster than target).

--smoke runs a tiny CPU config for CI-style verification.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def build_bench_scene(rows, cols, sphere_res):
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    from diligentfx_tpu.gltf.primitives import uv_sphere, plane
    from diligentfx_tpu.pbr.renderer import build_scene

    mesh = uv_sphere(0.42, stacks=sphere_res, slices=sphere_res + 8)
    ground = plane(40.0, segments=8)
    entries = []
    for r in range(rows):
        for c in range(cols):
            node = np.eye(4, dtype=np.float32)
            node[3, :3] = [c - (cols - 1) / 2, (rows - 1) / 2 - r, 0.0]
            mat = PBRMaterialBasicAttribs.create(
                base_color_factor=(0.8, 0.3, 0.25, 1.0),
                metallic_factor=r / max(rows - 1, 1),
                roughness_factor=max(c / max(cols - 1, 1), 0.03))
            entries.append((mesh, node, mat))
    gnode = np.eye(4, dtype=np.float32)
    gnode[3, :3] = [0.0, -rows / 2 - 0.5, 0.0]
    entries.append((ground, gnode, PBRMaterialBasicAttribs.create(
        base_color_factor=(0.5, 0.5, 0.55, 1.0), metallic_factor=0.0,
        roughness_factor=0.6)))
    return build_scene(entries)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU run")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out-png", type=str, default="")
    args = ap.parse_args()

    if args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    if args.smoke:
        w, h = 256, 128
        scene = build_bench_scene(2, 2, 12)
        ci = PBRRendererCreateInfo(brdf_lut_dim=32, num_brdf_samples=16,
                                   irradiance_cube_dim=16,
                                   prefiltered_env_map_dim=32,
                                   num_specular_env_samples=16)
        cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=1024, chunk=32)
        frames = 3
    else:
        w, h = 1920, 1080
        scene = build_bench_scene(5, 9, 32)
        ci = PBRRendererCreateInfo()
        # tile_h=32 measured fastest for the Pallas kernel (PERF_NOTES.md)
        # max_tiles_per_tri=8: the binning sort scales with T x K pairs
        # (16 -> 8 measured -20 ms at 1080p; raster stats show zero bin/big
        # overflow for this scene — see PERF_NOTES.md)
        # sub_bins=4 + big_tile_capacity: segment candidates per (8, 128)
        # sub-bin and bin big triangles by exact per-tile bbox overlap —
        # measured z-loop work 357 -> 103 Mpx at 1080p (PERF_NOTES.md r4)
        cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                               max_tiles_per_tri=8, big_tri_capacity=64,
                               chunk=8, pair_compaction_cap=1 << 17,
                               sub_bins=4, big_tile_capacity=16)
        frames = args.frames

    from diligentfx_tpu.hydrogent.task_manager import (HnTaskManager,
                                                       TaskManagerCreateInfo)

    renderer = PBRRenderer(ci, raster_cfg=cfg)
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=4,
        ssao_use_pallas=not args.smoke,
        ssr_use_pallas=not args.smoke,
        fast_env_taps=not args.smoke,
        enable_ssr=True, ssr_half_resolution=True,
        ssr_resolution_divisor=2,
        enable_taa=True, enable_bloom=True, enable_dof=False,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | (0 if args.smoke else TAAFeatureFlags.PALLAS_WARP))))

    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0]),
        PBRLightAttribs.point([2.0, 2.0, 2.0], [8.0, 7.0, 6.0], range=30.0),
    ])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())

    from diligentfx_tpu.hydrogent.task_manager import FrameSettings
    from diligentfx_tpu.postfx.ssr import SSRSettings
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))

    state = tm.initial_state(w, h)
    out = tm.execute(scene, info, state, width=w, height=h, settings=settings)
    state = out.state
    jax.block_until_ready(out.color)
    assert bool(jnp.isfinite(out.color).all()), "non-finite output"

    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        out = tm.execute(scene, info, state, width=w, height=h,
                         settings=settings)
        state = out.state
        jax.block_until_ready(out.color)
        times.append((time.perf_counter() - t0) * 1000.0)
    # force full completion through a host transfer before trusting the clock
    np.asarray(out.color)
    ms = float(np.median(times))

    if args.out_png:
        from diligentfx_tpu.utils.image import write_png
        write_png(args.out_png, np.asarray(out.color))

    metric = ("smoke_256x128_frame_ms" if args.smoke else
              "1080p_full_chain_pbr_ssr_ssao_taa_bloom_frame_ms")
    print(json.dumps({
        "metric": metric,
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / ms, 3),
    }))


if __name__ == "__main__":
    main()
