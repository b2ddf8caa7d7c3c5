#!/usr/bin/env python
"""Fine-grained G-buffer stage attribution at 1080p.

Times render_gbuffer variants (full / no-ibl / no-lights / raster-only)
as single jit programs over DEVICE-RESIDENT inputs.  The round-2 trap of
standalone sub-pass benches (PERF_NOTES.md) was host-resident inputs
re-shipping through the axon tunnel per call — here every input pytree is
device_put once and verified committed before the timing loop.

Usage: python examples/profile_gbuffer.py [--frames 12]
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
    from diligentfx_tpu.pbr import deferred
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    w, h = 1920, 1080
    scene = build_bench_scene(5, 9, 32)
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=8, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)

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

    dev = jax.devices()[0]
    scene = jax.device_put(scene, dev)
    info = jax.device_put(info, dev)
    ibl = jax.device_put(renderer.ibl_maps, dev)
    env = jax.device_put(renderer.env_oct, dev)
    jax.block_until_ready((scene, info, ibl, env))

    pad_w, pad_h = 1920, 1088

    def run_gbuffer(**kw):
        base = dict(width=w, height=h, cfg=cfg, use_ibl=True,
                    use_lights=True, fast_env=True)
        base.update(kw)
        return lambda: deferred.render_gbuffer(scene, info, ibl, env, **base)

    def run_raster():
        return deferred._raster_stage(scene, info, None, pad_w=pad_w,
                                      pad_h=pad_h, cfg=cfg,
                                      use_textures=False)

    variants = [
        ("raster_only", run_raster),
        ("gbuf_full", run_gbuffer()),
        ("gbuf_no_ibl", run_gbuffer(use_ibl=False)),
        ("gbuf_no_lights", run_gbuffer(use_lights=False)),
        ("gbuf_bare", run_gbuffer(use_ibl=False, use_lights=False)),
        ("gbuf_slow_env", run_gbuffer(fast_env=False)),
        ("gbuf_debug", run_gbuffer(emit_debug=True)),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

    for name, fn in variants:
        out = fn()
        jax.block_until_ready(out)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1000.0)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)
        print(f"{name:18s} {float(np.median(times)):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
