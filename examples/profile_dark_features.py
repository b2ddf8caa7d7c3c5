#!/usr/bin/env python
"""VERDICT r4 #7: measure the round-4 default-off features in a
cfg4-with-scattering frame — epipolar min/max shadow tree, masked sample
refinement — plus texture heap vs atlas at 1080p.  Full-frame 12-frame
medians (the only trustworthy attribution on axon, PERF_NOTES.md).

Usage: python examples/profile_dark_features.py [--only a,b] [--frames N]
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
    from benchmark_suite import make_camera, sponza_like_scene
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags

    w, h = 1920, 1080
    scene = sponza_like_scene(n_columns=12)
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1536,
                           max_tiles_per_tri=16, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    base_kw = dict(
        enable_ssao=True, ssao_half_resolution=True, ssao_use_pallas=True,
        ssao_num_slices=2, ssao_num_steps=4,
        enable_ssr=True, ssr_half_resolution=True, ssr_use_pallas=True,
        enable_taa=True, enable_bloom=True, enable_dof=True,
        dof_use_pallas=True, fast_env_taps=True,
        enable_light_scattering=True, enable_auto_exposure=True,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | TAAFeatureFlags.PALLAS_WARP))

    def mk(**over):
        kw = dict(base_kw)
        kw.update(over)
        return TaskManagerCreateInfo(**kw)

    variants = [
        ("cfg4_base", mk()),
        ("cfg4_minmax_tree", mk(epipolar_use_minmax_tree=True)),
        ("cfg4_refine2", mk(epipolar_refinement_factor=2)),
        ("cfg4_tree_refine2", mk(epipolar_use_minmax_tree=True,
                                 epipolar_refinement_factor=2)),
        # round-5: single-scattering LUT fast mode (SINGLE_SCTR_MODE_LUT)
        ("cfg4_sctr_lut", mk(epipolar_single_sctr_lut=True)),
        ("cfg4_sctr_lut_tree", mk(epipolar_single_sctr_lut=True,
                                  epipolar_use_minmax_tree=True)),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.2], [4, 4, 4])
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))
    cam = make_camera([10.0 * np.sin(0.2), 2.0, 10.0 * np.cos(0.2)],
                      [0, 1, 0], w, h)
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())

    results = {}
    for name, ci in variants:
        tm = HnTaskManager(renderer, ci)
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
        base = results.get("cfg4_base")
        delta = (f"  (delta vs base {ms - base:+8.1f})"
                 if base and name != "cfg4_base" else "")
        print(f"{name:22s} {ms:9.1f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
