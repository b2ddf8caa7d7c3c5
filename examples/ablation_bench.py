#!/usr/bin/env python
"""Ablation timing of the full chain at 1080p: toggle one effect off at a
time; the delta vs full is that effect's cost. Prints one JSON line each."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def main():
    import jax
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
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=16, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    eye = [0.0, 1.0, 7.5]
    cam = CameraAttribs.create(m3.look_at(eye, [0, 0, 0]),
                               m3.perspective(0.7, w / h, 0.1, 100.0),
                               eye, 0.1, 100.0, w, h)
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0]),
        PBRLightAttribs.point([2.0, 2.0, 2.0], [8.0, 7.0, 6.0], range=30.0)])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))
    flags = (TAAFeatureFlags.YCOCG_COLOR_SPACE
             | TAAFeatureFlags.GAUSSIAN_WEIGHTING
             | TAAFeatureFlags.PALLAS_WARP)

    base = dict(enable_ssao=True, ssao_half_resolution=True,
                ssao_num_slices=2, ssao_num_steps=4, ssao_use_pallas=True,
                enable_ssr=True, ssr_half_resolution=True,
                ssr_resolution_divisor=4, fast_env_taps=True,
                enable_taa=True, enable_bloom=True, enable_dof=False,
                taa_feature_flags=flags)
    variants = {
        "full": {},
        "no_ssr": {"enable_ssr": False},
        "no_ssao": {"enable_ssao": False},
        "no_taa": {"enable_taa": False},
        "no_bloom": {"enable_bloom": False},
        "ssao_xla": {"ssao_use_pallas": False},
        "gbuffer_only": {"enable_ssr": False, "enable_ssao": False,
                         "enable_taa": False, "enable_bloom": False},
    }
    for name, over in variants.items():
        ci = TaskManagerCreateInfo(**{**base, **over})
        tm = HnTaskManager(renderer, ci)
        state = tm.initial_state(w, h)
        out = tm.execute(scene, info, state, width=w, height=h,
                         settings=settings)
        state = out.state
        np.asarray(out.color).ravel()[:1]
        t0 = time.perf_counter()
        n = 8
        for _ in range(n):
            out = tm.execute(scene, info, state, width=w, height=h,
                             settings=settings)
            state = out.state
        np.asarray(out.color).ravel()[:1]
        ms = (time.perf_counter() - t0) / n * 1000
        print(json.dumps({"variant": name, "ms": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
