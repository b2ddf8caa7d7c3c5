#!/usr/bin/env python
"""In-frame raster-knob sweep at 1080p: full render_gbuffer as ONE program
per cfg variant, calls CHAINED through a dummy data dependency so the axon
tunnel cannot pipeline independent iterations (PERF_NOTES.md measurement
discipline).  The deltas between variants attribute the raster stage's cost
to binning sort size, bin capacity (gather rows), kernel chunk, tile shape.

Usage: python examples/profile_raster_knobs.py [--frames 12] [--only a,b]
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
    renderer = PBRRenderer(PBRRendererCreateInfo())

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

    dev = jax.devices()[0]
    scene = jax.device_put(scene, dev)
    info0 = jax.device_put(info0, dev)
    ibl = jax.device_put(renderer.ibl_maps, dev)
    env = jax.device_put(renderer.env_oct, dev)
    jax.block_until_ready((scene, info0, ibl, env))

    def base(**kw):
        d = dict(tile_h=32, tile_w=128, bin_capacity=1024,
                 max_tiles_per_tri=8, big_tri_capacity=64, chunk=8,
                 pair_compaction_cap=1 << 17)
        d.update(kw)
        return RasterizerConfig(**d)

    variants = [
        ("base", base(), "auto"),
        ("subbin", base(sub_bins=4, big_tile_capacity=16), "auto"),
        ("subbin_c16", base(sub_bins=4, big_tile_capacity=16, chunk=16), "auto"),
        ("bigfilter_only", base(big_tile_capacity=16), "auto"),
        ("subbin_th64", base(tile_h=64, sub_bins=8, big_tile_capacity=16), "auto"),
        ("fuse_off", base(big_tri_capacity=65), "off"),
        ("cap512", base(bin_capacity=512), "auto"),
        ("no_pair_compaction", base(pair_compaction_cap=0), "auto"),
        ("chunk16", base(chunk=16), "auto"),
        ("chunk32", base(chunk=32), "auto"),
        ("tile64", base(tile_h=64), "auto"),
        ("tile16", base(tile_h=16), "auto"),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]

    for name, cfg, fuse in variants:
        def frame(info):
            return deferred.render_gbuffer(
                scene, info, ibl, env, width=w, height=h, cfg=cfg,
                use_ibl=True, use_lights=True, fast_env=True, fuse=fuse)

        def chain(info, gb):
            # dummy dependency: identity model transform derived from the
            # previous output forces serial execution across iterations
            eps = gb.depth[0, 0] * 0.0
            mt = jnp.eye(4, dtype=jnp.float32) + eps
            return info0._replace(model_transform=mt)

        gb = frame(info0)
        jax.block_until_ready(gb)
        info = chain(info0, gb)
        gb = frame(info)                  # warm the model_transform variant
        jax.block_until_ready(gb)
        info = chain(info0, gb)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            gb = frame(info)
            info = chain(info0, gb)
            jax.block_until_ready((gb.depth, info))
            times.append((time.perf_counter() - t0) * 1000.0)
        np.asarray(gb.depth)
        print(f"{name:22s} {float(np.median(times)):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
