#!/usr/bin/env python
"""Microbenchmark: channel-LAST (H, W, 3) vs planar (H, W) elementwise cost
on this TPU, plus the cost of stacking planes into channel-last images.

Motivation: the deferred shading block (~78 ms at 1080p, BASELINE.md r2) has
near-zero gathers — if (H, W, 3) intermediates are laid out with the 3-wide
minor dim padded to 128 lanes, every materialized temp costs ~42x its logical
bytes and the fix is planar math, not a kernel.

Timing discipline per PERF_NOTES.md: device-resident inputs staged by a jitted
producer, many-frame medians, one final host pull.
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
    ap.add_argument("--muls", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    h, w = 1088, 1920
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make():
        k1, k2, k3 = jax.random.split(key, 3)
        return (jax.random.uniform(k1, (h, w, 3)),
                jax.random.uniform(k2, (3, h, w)),
                jax.random.uniform(k3, (h, w)))

    cl, cf, pl_ = make()
    jax.block_until_ready((cl, cf, pl_))

    n = args.muls

    # chains with a data dependence so XLA can't fold them away; sin() every
    # 8 steps blocks algebraic simplification of the mul chain
    def chain(x):
        for i in range(n):
            x = x * 1.0001 + 1e-7
            if i % 8 == 7:
                x = jnp.sin(x)
        return x

    f_cl = jax.jit(chain)
    f_cf = jax.jit(chain)
    f_pl = jax.jit(chain)

    @jax.jit
    def stacks(a):
        # 10 stacked channel-last products from planes (the grp() pattern)
        outs = []
        for i in range(10):
            p0 = a * (1.0 + i)
            p1 = a * (2.0 + i)
            p2 = a * (3.0 + i)
            outs.append(jnp.stack([p0, p1, p2], axis=-1))
        return outs

    @jax.jit
    def planar_outputs(a):
        # same flop count, planar outputs
        outs = []
        for i in range(10):
            outs.append(a * (1.0 + i))
            outs.append(a * (2.0 + i))
            outs.append(a * (3.0 + i))
        return outs

    def bench(name, fn, x):
        out = fn(x)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = fn(x)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1000.0)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name:28s} {float(np.median(times)):8.2f} ms", flush=True)

    bench(f"chain{n}_channel_last_HW3", f_cl, cl)
    bench(f"chain{n}_channel_first_3HW", f_cf, cf)
    bench(f"chain{n}_plane_HW", f_pl, pl_)
    bench("stack10_planes_to_HW3", stacks, pl_)
    bench("planar30_outputs", planar_outputs, pl_)


if __name__ == "__main__":
    main()
