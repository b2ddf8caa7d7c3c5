#!/usr/bin/env python
"""SSR sub-stage attribution at 1080p (device-resident inputs; the
profile_gbuffer.py method).  Decomposes compute_ssr cost at a given
resolution divisor via the pass toggles.

Usage: python examples/profile_ssr.py [--frames 12] [--div 2]
"""
import argparse
import functools
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
    ap.add_argument("--div", type=int, default=2)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import CameraAttribs
    from diligentfx_tpu.postfx import ssr as fx_ssr

    w, h = 1920, 1080
    rng = np.random.default_rng(7)
    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)

    dev = jax.devices()[0]
    put = functools.partial(jax.device_put, device=dev)
    color = put(rng.random((h, w, 3), np.float32))
    depth = put((0.3 + 0.5 * rng.random((h, w))).astype(np.float32))
    nrm = rng.normal(size=(h, w, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-9
    normal_vs = put(nrm)
    rough = put(rng.random((h, w, 1), np.float32))
    motion = put((rng.random((h, w, 2), np.float32) - 0.5) * 0.01)
    sh, sw = fx_ssr.ssr_state_shape(h, w, args.div)
    state = fx_ssr.SSRState(radiance=put(rng.random((sh, sw, 4), np.float32)))
    disocc = put(np.zeros((h, w), bool))
    cam = put(cam)
    jax.block_until_ready((color, depth, normal_vs, rough, motion,
                           state.radiance))

    settings = fx_ssr.SSRSettings(max_traversal_intersections=24)

    def run(**kw):
        base = dict(half_resolution=True, resolution_divisor=args.div,
                    use_pallas=True)
        base.update(kw)

        @functools.partial(jax.jit, static_argnames=tuple(
            k for k in base if isinstance(base[k], (bool, int))))
        def f(color, depth, normal_vs, rough, cam, state, motion, disocc,
              **skw):
            return fx_ssr.compute_ssr(color, depth, normal_vs, rough, cam,
                                      jnp.int32(3), settings, state,
                                      motion=motion, disocclusion=disocc,
                                      **skw)

        return lambda: f(color, depth, normal_vs, rough, cam, state, motion,
                         disocc, **base)

    variants = [
        ("full", run()),
        ("xla_march", run(use_pallas=False)),
        ("no_bilateral", run(enable_bilateral=False)),
        ("no_temporal", run(enable_temporal=False)),
        ("no_spatial", run(enable_spatial=False)),
        ("bare", run(enable_bilateral=False, enable_temporal=False,
                     enable_spatial=False)),
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
        np.asarray(jax.tree.leaves(out)[0])
        print(f"d{args.div} {name:14s} {float(np.median(times)):9.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
