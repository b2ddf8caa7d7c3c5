#!/usr/bin/env python
"""Feature-toggled FULL-FRAME profiling at 1080p — the only trustworthy
stage-attribution method on the axon tunnel (PERF_NOTES.md: standalone
sub-pass benches re-ship their jit inputs per call; in-frame deltas of
feature-toggled full frames are the real numbers).

Each variant runs the complete HnTaskManager frame with one feature changed;
the printed delta vs base is that feature's in-frame cost.

Usage: python examples/profile_toggles.py [--frames 12] [--only base,nossr]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags

    w, h = 1920, 1080
    scene = build_bench_scene(5, 9, 32)
    # EXACTLY the bench.py headline config (round 5): deltas below attribute
    # the 208 ms plateau
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=8, big_tri_capacity=64,
                           chunk=8, pair_compaction_cap=1 << 17,
                           sub_bins=4, big_tile_capacity=16)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    renderer_noibl = None

    base_kw = dict(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=4,
        ssao_use_pallas=True, ssr_use_pallas=True, fast_env_taps=True,
        enable_ssr=True, ssr_half_resolution=True, ssr_resolution_divisor=2,
        enable_taa=True, enable_bloom=True, enable_dof=False,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | TAAFeatureFlags.PALLAS_WARP))

    def mk(**over):
        kw = dict(base_kw)
        kw.update(over)
        return TaskManagerCreateInfo(**kw)

    gbuf_off = dict(enable_ssao=False, enable_ssr=False, enable_taa=False,
                    enable_bloom=False)

    variants = [
        ("base_div2", mk(), None),
        ("ssr_div4", mk(ssr_resolution_divisor=4), None),
        ("no_ssr", mk(enable_ssr=False), None),
        ("no_ssao", mk(enable_ssao=False), None),
        ("no_taa", mk(enable_taa=False), None),
        ("no_bloom", mk(enable_bloom=False), None),
        ("gbuffer_only", mk(**gbuf_off), None),
        ("gbuffer_no_ibl", mk(**gbuf_off), "noibl"),
        ("gbuffer_no_lights", mk(use_lights=False, **gbuf_off), None),
        ("gbuffer_no_aovs", mk(emit_aovs=False, **gbuf_off), None),
        ("full_no_aovs", mk(emit_aovs=False), None),
        ("gbuffer_fuse_off", mk(**gbuf_off), "fuseoff"),
        # raster + binning in isolation (no interp/material/shading)
        ("gbuffer_vis_only", mk(vis_only=True, **gbuf_off), None),
        # raster-config knob deltas (each swaps the rasterizer config)
        ("gbuffer_chunk16", mk(**gbuf_off), ("cfg", dict(chunk=16))),
        ("gbuffer_subbins1", mk(**gbuf_off), ("cfg", dict(sub_bins=1))),
        ("gbuffer_tile16", mk(**gbuf_off), ("cfg", dict(tile_h=16))),
        ("gbuffer_cap512", mk(**gbuf_off), ("cfg", dict(bin_capacity=512))),
        ("gbuffer_cap256", mk(**gbuf_off), ("cfg", dict(bin_capacity=256))),
        ("full_cap256", mk(), ("cfg", dict(bin_capacity=256))),
        ("visonly_subbins1", mk(vis_only=True, **gbuf_off),
         ("cfg", dict(sub_bins=1))),
        # SSR interior attribution (march vs reconstruction vs cleanup)
        ("ssr_no_spatial", mk(ssr_enable_spatial=False), None),
        ("ssr_no_bilateral", mk(ssr_enable_bilateral=False), None),
        ("ssr_lean", mk(ssr_enable_spatial=False,
                        ssr_enable_bilateral=False), None),
        # SSR stage bisect (truncate-and-fabricate; deltas between cuts
        # attribute setup / march / taps)
        ("ssr_cut_setup", mk(ssr_stage_cut="setup"), None),
        ("ssr_cut_march", mk(ssr_stage_cut="march"), None),
        ("ssr_cut_taps", mk(ssr_stage_cut="taps"), None),
        # binning stage bisect + variants (static cfg knobs)
        ("visonly_cut_clipped", mk(vis_only=True, **gbuf_off),
         ("cfg", dict(bin_cut="clipped"))),
        ("visonly_cut_planes0", mk(vis_only=True, **gbuf_off),
         ("cfg", dict(bin_cut="planes0"))),
        ("visonly_cut_setup", mk(vis_only=True, **gbuf_off),
         ("cfg", dict(bin_cut="setup"))),
        ("visonly_cut_pairs", mk(vis_only=True, **gbuf_off),
         ("cfg", dict(bin_cut="pairs"))),
        ("visonly_noscatter", mk(vis_only=True, **gbuf_off),
         ("cfg", dict(skip_pair_compaction=True))),
        ("full_noscatter", mk(), ("cfg", dict(skip_pair_compaction=True))),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

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

    results = {}
    for name, ci, mode in variants:
        rdr = renderer
        if mode == "noibl":
            if renderer_noibl is None:
                renderer_noibl = PBRRenderer(
                    PBRRendererCreateInfo(enable_ibl=False), raster_cfg=cfg)
            rdr = renderer_noibl
        if isinstance(mode, tuple) and mode[0] == "cfg":
            import dataclasses
            cfg2 = dataclasses.replace(cfg, **mode[1])
            rdr = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg2)
        if mode == "fuseoff":
            os.environ["DFX_FUSE"] = "off"
        tm = HnTaskManager(rdr, ci)
        state = tm.initial_state(w, h)
        out = tm.execute(scene, info, state, width=w, height=h,
                         settings=settings)
        state = out.state
        jax.block_until_ready(out.color)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = tm.execute(scene, info, state, width=w, height=h,
                             settings=settings)
            state = out.state
            jax.block_until_ready(out.color)
            times.append((time.perf_counter() - t0) * 1000.0)
        np.asarray(out.color)
        ms = float(np.median(times))
        results[name] = ms
        if mode == "fuseoff":
            os.environ.pop("DFX_FUSE", None)
        base = results.get("base_div2")
        delta = f"  (delta vs base {ms - base:+8.1f})" if base and name != "base_div2" else ""
        print(f"{name:22s} {ms:9.1f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
