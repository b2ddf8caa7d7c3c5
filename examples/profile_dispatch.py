#!/usr/bin/env python
"""Separate per-dispatch (axon tunnel) overhead from real frame compute.

Three measurements at the exact bench config:
  1. trivial        — per-call latency of a tiny jitted program (the
                      dispatch floor through the tunnel)
  2. frame_call     — per-call bench frame (what bench.py measures)
  3. frame_scan_K   — K frames chained inside ONE jit via lax.scan,
                      divided by K (pure compute throughput; no per-frame
                      dispatch, no per-frame host round trip)

If frame_scan_K/frame < frame_call by tens of ms, the gap is dispatch
overhead — a floor no kernel work can remove, and an argument for
measuring (and serving) frames in pipelined batches.

Usage: python examples/profile_dispatch.py [--frames 12] [--scan 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def median_loop(fn, frames):
    times = []
    out = None
    for _ in range(frames):
        t0 = time.perf_counter()
        out = fn()
        times.append((time.perf_counter() - t0) * 1000.0)
    # force completion through a host pull before trusting the clock
    np.asarray(jax_leaf(out))
    return float(np.median(times))


def jax_leaf(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--scan", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent import task_manager as tmm
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags

    # ---- 1. dispatch floor -------------------------------------------------
    x = jax.device_put(np.random.rand(8, 128).astype(np.float32))
    tiny = jax.jit(lambda a: a * 1.0001 + 0.1)
    y = tiny(x)
    jax.block_until_ready(y)
    t_triv = median_loop(lambda: jax.block_until_ready(tiny(x)), 50)
    print(f"trivial per-call      {t_triv:9.2f} ms", flush=True)

    # ---- bench config frame -------------------------------------------------
    w, h = 1920, 1080
    scene = build_bench_scene(5, 9, 32)
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=8, big_tri_capacity=64,
                           chunk=8, pair_compaction_cap=1 << 17,
                           sub_bins=4, big_tile_capacity=16)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    ci = TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=4,
        ssao_use_pallas=True, ssr_use_pallas=True, fast_env_taps=True,
        enable_ssr=True, ssr_half_resolution=True, ssr_resolution_divisor=2,
        enable_taa=True, enable_bloom=True, enable_dof=False,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | TAAFeatureFlags.PALLAS_WARP))
    tm = HnTaskManager(renderer, ci)

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
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))

    state = tm.initial_state(w, h)
    out = tm.execute(scene, info, state, width=w, height=h, settings=settings)
    state = out.state
    jax.block_until_ready(out.color)

    # ---- 2. per-call frame ---------------------------------------------------
    holder = {"state": state}

    def one_frame():
        o = tm.execute(scene, info, holder["state"], width=w, height=h,
                       settings=settings)
        holder["state"] = o.state
        jax.block_until_ready(o.color)
        return o.color

    t_call = median_loop(one_frame, args.frames)
    print(f"frame per-call        {t_call:9.2f} ms", flush=True)

    # ---- 3. K frames in ONE program (lax.scan) -------------------------------
    K = args.scan
    ibl_maps = renderer.ibl_maps
    env_oct = renderer.env_oct
    statics = dict(width=w, height=h, cfg=renderer.raster_cfg, ci=ci,
                   use_ibl=renderer.ci.enable_ibl, use_textures=False,
                   pcf_kernel_size=renderer.ci.pcf_kernel_size,
                   enable_clearcoat=renderer.ci.enable_clear_coat,
                   ssr_steps=24, light_shadow_kinds=())

    def step(st, _):
        pre = tmm._frame_pre(scene, info, st, ibl_maps, env_oct,
                             tm.jitter_seq, settings, None, None, **statics)
        o = tmm._frame_post(pre, st, settings, width=w, height=h, ci=ci)
        return o.state, jnp.sum(o.color[::256, ::256])

    @jax.jit
    def run_scan(st):
        st2, sums = jax.lax.scan(step, st, None, length=K)
        return st2, sums

    st2, sums = run_scan(holder["state"])
    jax.block_until_ready(sums)
    holder2 = {"state": st2}

    def scan_call():
        s2, sm = run_scan(holder2["state"])
        holder2["state"] = s2
        jax.block_until_ready(sm)
        return sm

    t_scan = median_loop(scan_call, max(args.frames // 2, 4))
    print(f"frame in-scan (K={K})  {t_scan / K:9.2f} ms/frame "
          f"(scan total {t_scan:.2f})", flush=True)
    print(f"dispatch overhead ≈ {t_call - t_scan / K:9.2f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
