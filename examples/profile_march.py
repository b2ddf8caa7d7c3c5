#!/usr/bin/env python
"""Chained-loop microbench of the Pallas SSR row-DDA march kernel.

Valid on axon ONLY because (a) inputs are produced on-device by a jitted
producer, (b) iterations chain (each call's origin is perturbed by the
previous call's output), so the input ship happens once and the loop
measures steady-state kernel throughput (PERF_NOTES.md measurement rules).
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
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--div", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diligentfx_tpu.ops.march_pallas import march_small_table_pallas
    from diligentfx_tpu.postfx.ssr import build_min_depth_pyramid

    h, w = 1080 // args.div, 1920 // args.div
    hp, wp = -(-h // 8) * 8, -(-w // 128) * 128

    @jax.jit
    def make_inputs(seed):
        k = jax.random.split(jax.random.PRNGKey(seed), 4)
        depth = jax.random.uniform(k[0], (h, w), jnp.float32, 0.3, 1.0)
        o = jnp.stack([jax.random.uniform(k[1], (hp, wp)),
                       jax.random.uniform(k[2], (hp, wp)),
                       jnp.full((hp, wp), 0.4)], axis=-1)
        d = jax.random.uniform(k[3], (hp, wp, 3), jnp.float32, -0.5, 0.5)
        return depth, o, d

    depth, o, d = make_inputs(0)
    mips = build_min_depth_pyramid(depth, 4)
    cm = 2
    while cm < len(mips) - 1 and mips[cm].shape[1] > 128:
        cm += 1
    coarse = mips[cm]
    print(f"march res {h}x{w}, table {coarse.shape}")

    @jax.jit
    def step(o_cur):
        t_lo, t_hit, hit = march_small_table_pallas(
            coarse, o_cur, d, jnp.float32(0.02))
        # chain: perturb origins by the outputs so calls serialize
        return o_cur + jnp.stack([t_lo, t_hit,
                                  hit.astype(jnp.float32)], -1) * 1e-6

    o_cur = step(o)
    jax.block_until_ready(o_cur)
    np.asarray(o_cur)[:1, :1]
    t0 = time.perf_counter()
    for _ in range(args.iters):
        o_cur = step(o_cur)
    np.asarray(o_cur)[:1, :1]
    ms = (time.perf_counter() - t0) / args.iters * 1000.0
    print(f"march kernel: {ms:.2f} ms/call")


if __name__ == "__main__":
    main()
