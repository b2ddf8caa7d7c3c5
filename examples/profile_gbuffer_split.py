#!/usr/bin/env python
"""G-buffer interior attribution at 1080p (round 5).

Times CHAINED render_gbuffer variants (output folded back into the model
transform so iterations serialize) with ONE wall-clock over the whole loop
and a final np.asarray host pull — the only timing scheme that is valid on
the axon tunnel for sub-frame programs (the per-iteration-median scheme
under-measures small programs by 10x+; see profile_channel_layout.py).

Variants isolate: raster kernel | +shading sans lights/ibl (stacks, motion,
background, AOV masks) | +lights | +IBL | full.

Usage: python examples/profile_gbuffer_split.py [--frames 12] [--only a,b]
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

    import functools
    import jax
    import jax.numpy as jnp
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.pbr import deferred
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    w, h = 1920, 1080
    scene = build_bench_scene(5, 9, 32)
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=8, big_tri_capacity=64,
                           chunk=8, pair_compaction_cap=1 << 17,
                           sub_bins=4, big_tile_capacity=16)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)

    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0]),
        PBRLightAttribs.point([2.0, 2.0, 2.0], [8.0, 7.0, 6.0], range=30.0),
    ])
    info0 = RenderInfo(camera=cam, lights=lights,
                       renderer_params=PBRRendererShaderParameters.create())

    ibl = renderer.ibl_maps
    env = renderer.env_oct
    pad_w, pad_h = 1920, 1088
    n_op = scene.indices.shape[0]

    def kernel_stage(info):
        vb, out, clip, winv = deferred._fused_raster(
            scene, info, n_op, pad_w=pad_w, pad_h=pad_h, cfg=cfg,
            use_textures=False)
        return out[0]

    def gb_fn(use_ibl, use_lights, fast_env=True):
        def f(info):
            gb = deferred.render_gbuffer(
                scene, info, ibl, env, width=w, height=h, cfg=cfg,
                use_ibl=use_ibl, use_lights=use_lights, fast_env=fast_env)
            return gb.depth + gb.direct[..., 0]
        return f

    variants = [
        ("kernel_only", kernel_stage),
        ("shade_base", gb_fn(False, False)),       # stacks+motion+bg+AOVs
        ("shade_lights", gb_fn(False, True)),      # + 2 punctual lights
        ("shade_ibl", gb_fn(True, False)),         # + IBL (SH9+packed pyr)
        ("full", gb_fn(True, True)),
        ("full_slow_env", gb_fn(True, True, fast_env=False)),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

    for name, fn in variants:
        @jax.jit
        def step(info, _fn=fn):
            o = _fn(info)
            eps = o.reshape(-1)[0] * 0.0
            mt = jnp.eye(4, dtype=jnp.float32) + eps
            return info._replace(model_transform=mt), o

        info, o = step(info0)
        np.asarray(o.reshape(-1)[0])          # compile + warm + sync
        t0 = time.perf_counter()
        for _ in range(args.frames):
            info, o = step(info)
        np.asarray(o.reshape(-1)[0])
        ms = (time.perf_counter() - t0) * 1000.0 / args.frames
        print(f"{name:18s} {ms:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
