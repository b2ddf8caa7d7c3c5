#!/usr/bin/env python
"""Quantify the TPU cost of channel-LAST (H, W, 3)/(H, W, 1) shading math vs
channel-FIRST (3, H, W) planes.

Hypothesis (round 5): XLA lays out (H, W, C) with C minor -> C pads to the
128-lane tile, so every materialized (H, W, 3) intermediate moves ~42x its
useful bytes and every (H, W, 1) ~128x.  The shading/AOV block is built
entirely from such arrays (pbr/shading.py), which would explain the measured
~97 ms for what is arithmetically a ~2 ms job.

Measures a representative shading-ish chain (normalize, dot, schlick, mads)
in both layouts, chained through iterations (axon can't pipeline), plus a
pure relayout (HWC -> CHW transpose) cost.
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
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    H, W = args.h, args.w
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    @jax.jit
    def make_hwc(k):
        a = jax.random.normal(k, (H, W, 3), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(k, 1), (H, W, 3), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(k, 2), (H, W, 1), jnp.float32)
        return a, b, r

    @jax.jit
    def make_chw(k):
        a = jax.random.normal(k, (3, H, W), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(k, 1), (3, H, W), jnp.float32)
        r = jax.random.uniform(jax.random.fold_in(k, 2), (1, H, W), jnp.float32)
        return a, b, r

    def chain_hwc(a, b, r):
        # ~a punctual-light-ish block: normalize, halfway, dot products,
        # schlick fresnel, ggx ndf, mads -- all (H, W, 3)/(H, W, 1)
        n = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-9)
        v = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-9)
        out = jnp.zeros((H, W, 3), jnp.float32)
        for i in range(4):
            l = jnp.roll(v, i, axis=-1)
            h = (l + v)
            h = h / jnp.sqrt(jnp.sum(h * h, -1, keepdims=True) + 1e-9)
            ndl = jnp.clip(jnp.sum(n * l, -1, keepdims=True), 0, 1)
            ndh = jnp.clip(jnp.sum(n * h, -1, keepdims=True), 0, 1)
            a2 = jnp.maximum(r * r, 1e-4)
            d = a2 / (3.14159 * jnp.square(ndh * ndh * (a2 - 1.0) + 1.0))
            f = 0.04 + (b - 0.04) * jnp.power(1.0 - ndl, 5.0)
            out = out + f * d * ndl
        return out

    def chain_chw(a, b, r):
        n = a / jnp.sqrt(jnp.sum(a * a, 0, keepdims=True) + 1e-9)
        v = b / jnp.sqrt(jnp.sum(b * b, 0, keepdims=True) + 1e-9)
        out = jnp.zeros((3, H, W), jnp.float32)
        for i in range(4):
            l = jnp.roll(v, i, axis=0)
            h = (l + v)
            h = h / jnp.sqrt(jnp.sum(h * h, 0, keepdims=True) + 1e-9)
            ndl = jnp.clip(jnp.sum(n * l, 0, keepdims=True), 0, 1)
            ndh = jnp.clip(jnp.sum(n * h, 0, keepdims=True), 0, 1)
            a2 = jnp.maximum(r * r, 1e-4)
            d = a2 / (3.14159 * jnp.square(ndh * ndh * (a2 - 1.0) + 1.0))
            f = 0.04 + (b - 0.04) * jnp.power(1.0 - ndl, 5.0)
            out = out + f * d * ndl
        return out

    def chain_hwc_barrier(a, b, r):
        """Same math but with optimization_barrier between light iterations —
        models imperfect fusion (each iteration materializes its accum)."""
        n = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-9)
        v = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-9)
        out = jnp.zeros((H, W, 3), jnp.float32)
        for i in range(4):
            l = jnp.roll(v, i, axis=-1)
            h = (l + v)
            h = h / jnp.sqrt(jnp.sum(h * h, -1, keepdims=True) + 1e-9)
            ndl = jnp.clip(jnp.sum(n * l, -1, keepdims=True), 0, 1)
            ndh = jnp.clip(jnp.sum(n * h, -1, keepdims=True), 0, 1)
            a2 = jnp.maximum(r * r, 1e-4)
            d = a2 / (3.14159 * jnp.square(ndh * ndh * (a2 - 1.0) + 1.0))
            f = 0.04 + (b - 0.04) * jnp.power(1.0 - ndl, 5.0)
            out = jax.lax.optimization_barrier(out + f * d * ndl)
        return out

    def chain_chw_barrier(a, b, r):
        n = a / jnp.sqrt(jnp.sum(a * a, 0, keepdims=True) + 1e-9)
        v = b / jnp.sqrt(jnp.sum(b * b, 0, keepdims=True) + 1e-9)
        out = jnp.zeros((3, H, W), jnp.float32)
        for i in range(4):
            l = jnp.roll(v, i, axis=0)
            h = (l + v)
            h = h / jnp.sqrt(jnp.sum(h * h, 0, keepdims=True) + 1e-9)
            ndl = jnp.clip(jnp.sum(n * l, 0, keepdims=True), 0, 1)
            ndh = jnp.clip(jnp.sum(n * h, 0, keepdims=True), 0, 1)
            a2 = jnp.maximum(r * r, 1e-4)
            d = a2 / (3.14159 * jnp.square(ndh * ndh * (a2 - 1.0) + 1.0))
            f = 0.04 + (b - 0.04) * jnp.power(1.0 - ndl, 5.0)
            out = jax.lax.optimization_barrier(out + f * d * ndl)
        return out

    def transpose_hwc_chw(a, b, r):
        return jnp.moveaxis(a, -1, 0) + jnp.moveaxis(b, -1, 0)

    def bench(name, make, fn):
        # axon: block_until_ready does NOT sync — time the WHOLE chained loop
        # and end with a host pull (np.asarray), per PERF_NOTES.md discipline.
        @jax.jit
        def step(ins):
            o = fn(*ins)
            eps = o.reshape(-1)[0] * 0.0
            return (ins[0] + eps, ins[1], ins[2]), o

        ins = make(k1)
        ins, o = step(ins)          # compile + warm
        np.asarray(o.reshape(-1)[0])
        t0 = time.perf_counter()
        for it in range(args.frames):
            ins, o = step(ins)
        np.asarray(o.reshape(-1)[0])
        ms = (time.perf_counter() - t0) * 1000.0 / args.frames
        print(f"{name:26s} {ms:8.2f} ms", flush=True)

    bench("hwc_fused", make_hwc, chain_hwc)
    bench("chw_fused", make_chw, chain_chw)
    bench("hwc_barriered", make_hwc, chain_hwc_barrier)
    bench("chw_barriered", make_chw, chain_chw_barrier)
    bench("transpose_hwc->chw", make_hwc, transpose_hwc_chw)


if __name__ == "__main__":
    main()
