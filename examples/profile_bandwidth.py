#!/usr/bin/env python
"""Streaming-bandwidth microbenchmarks: what does a plain XLA elementwise
op actually sustain on this part, and does the (H, W, C) channel-LAST
layout pay a padding tax vs (C, H, W) / (H, W) planes?

Each case is a single jit program over device-resident inputs, looped; the
reported rate assumes read+write of the logical bytes.
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
    ap.add_argument("--frames", type=int, default=15)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    h, w = 1088, 1920
    rng = np.random.default_rng(3)
    dev = jax.devices()[0]

    def bench(name, fn, *arrs, nbytes):
        arrs = [jax.device_put(a, dev) for a in arrs]
        jax.block_until_ready(arrs)
        f = jax.jit(fn)
        out = f(*arrs)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = f(*arrs)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1000.0)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ms = float(np.median(times))
        gbs = nbytes / (ms * 1e-3) / 1e9
        print(f"{name:28s} {ms:8.2f} ms  {gbs:8.1f} GB/s", flush=True)

    a2 = rng.random((h, w), np.float32)
    a3 = rng.random((h, w, 3), np.float32)
    c3 = rng.random((3, h, w), np.float32)
    big = rng.random((64 * 1024 * 1024,), np.float32)       # 256 MB

    bench("add1_flat_256MB", lambda x: x + 1.0, big,
          nbytes=big.nbytes * 2)
    bench("add1_hw", lambda x: x + 1.0, a2, nbytes=a2.nbytes * 2)
    bench("add1_hw3_chanlast", lambda x: x + 1.0, a3, nbytes=a3.nbytes * 2)
    bench("add1_3hw_chanfirst", lambda x: x + 1.0, c3, nbytes=c3.nbytes * 2)
    bench("mul_chain10_hw3",
          lambda x: x * 1.01 + 0.1 if False else
          __import__("functools").reduce(lambda y, _: y * 1.01 + 0.1,
                                         range(10), x),
          a3, nbytes=a3.nbytes * 2)
    bench("roll_hw", lambda x: jnp.roll(x, (1, 1), (0, 1)), a2,
          nbytes=a2.nbytes * 2)
    bench("roll_hw3", lambda x: jnp.roll(x, (1, 1), (0, 1)), a3,
          nbytes=a3.nbytes * 2)
    bench("roll9sum_hw3",
          lambda x: sum(jnp.roll(x, (dy, dx), (0, 1))
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)),
          a3, nbytes=a3.nbytes * 2)
    bench("stack3_hw_to_hw3",
          lambda x, y, z: jnp.stack([x, y, z], axis=-1),
          a2, a2 + 1, a2 + 2, nbytes=a2.nbytes * 4)
    bench("chanfirst_to_last",
          lambda x: jnp.moveaxis(x, 0, -1) + 0.0, c3, nbytes=c3.nbytes * 2)
    bench("normalize_hw3",
          lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True), a3,
          nbytes=a3.nbytes * 2)
    bench("normalize_3hw",
          lambda x: x / jnp.sqrt(x[0]**2 + x[1]**2 + x[2]**2)[None], c3,
          nbytes=c3.nbytes * 2)


if __name__ == "__main__":
    main()
