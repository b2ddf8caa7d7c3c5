#!/usr/bin/env python
"""Layout microbenchmark: channel-LAST (H, W, 3) vs channel-PLANES (3, H, W)
elementwise shading-style math at 1080p.

Hypothesis (round 5): the deferred shading block (~97 ms, VERDICT r4) is
dominated not by gathers but by (H, W, 3) channel-last arithmetic — the
minor dim of 3 occupies 3 of 128 lanes in the (8, 128) vreg tiling, so VPU
work runs at ~2% lane utilization wherever XLA keeps that layout.

Measures a ~40-op shading-like chain (dot/normalize/lerp/where) in both
layouts, with device_put random inputs and many-iteration loops + final
np.asarray pull (axon timing rules, PERF_NOTES.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def shade_last(n, v, l, albedo, rough):
    """Channel-last: vecs (H, W, 3), scalars (H, W, 1)."""
    def dot(a, b):
        return jnp.sum(a * b, axis=-1, keepdims=True)

    def normalize(a):
        return a * jax.lax.rsqrt(jnp.maximum(dot(a, a), 1e-12))

    out = jnp.zeros_like(albedo)
    h = normalize(v + l)
    nn = normalize(n)
    for i in range(8):
        ndoth = jnp.clip(dot(nn, h), 0.0, 1.0)
        ndotl = jnp.clip(dot(nn, l), 0.0, 1.0)
        a2 = jnp.maximum(rough * rough, 1e-3)
        d = a2 / (3.14159 * jnp.square(ndoth * ndoth * (a2 - 1.0) + 1.0) + 1e-6)
        f = albedo + (1.0 - albedo) * jnp.exp2(-9.28 * ndoth)
        spec = d * f * ndotl
        diff = albedo * ndotl * (1.0 - f)
        out = out + jnp.where(ndotl > 0, spec + diff, 0.0) * (1.0 / (i + 1.0))
    return out


def shade_planes(n, v, l, albedo, rough):
    """Channel-planes: vecs (3, H, W), scalars (H, W)."""
    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def normalize(a):
        r = jax.lax.rsqrt(jnp.maximum(dot(a, a), 1e-12))
        return a * r[None]

    out = jnp.zeros_like(albedo)
    h = normalize(v + l)
    nn = normalize(n)
    for i in range(8):
        ndoth = jnp.clip(dot(nn, h), 0.0, 1.0)
        ndotl = jnp.clip(dot(nn, l), 0.0, 1.0)
        a2 = jnp.maximum(rough * rough, 1e-3)
        d = a2 / (3.14159 * jnp.square(ndoth * ndoth * (a2 - 1.0) + 1.0) + 1e-6)
        f = albedo + (1.0 - albedo) * jnp.exp2(-9.28 * ndoth)[None]
        spec = d[None] * f * ndotl[None]
        diff = albedo * (ndotl * (1.0 - 0.5))[None] - f * 0.1
        out = out + jnp.where((ndotl > 0)[None], spec + diff, 0.0) * (1.0 / (i + 1.0))
    return out


def bench(fn, args, iters=30, reps=64):
    f = jax.jit(lambda *a: _chain(fn, a, reps))
    r = f(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree.leaves(r)[0][:1, :1])
        dt = (time.perf_counter() - t0) * 1000.0 / reps
        best = min(best, dt)
    return best


def _chain(fn, args, reps):
    out = None
    a = list(args)
    for i in range(reps):
        r = fn(*a)
        # feed a perturbation back so XLA can't CSE the repeats
        a[3] = a[3] * 0.999 + (r * 1e-6 if r.shape == a[3].shape else 0.0)
        out = r
    return out, a[3]


def main():
    h, w = 1080, 1920
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    last = [
        jax.device_put(jax.random.normal(ks[0], (h, w, 3))),
        jax.device_put(jax.random.normal(ks[1], (h, w, 3))),
        jax.device_put(jax.random.normal(ks[2], (h, w, 3))),
        jax.device_put(jax.random.uniform(ks[3], (h, w, 3))),
        jax.device_put(jax.random.uniform(ks[4], (h, w, 1))),
    ]
    planes = [jnp.moveaxis(x, -1, 0) if x.shape[-1] == 3 else x[..., 0]
              for x in last]
    planes = [jax.device_put(x) for x in planes]

    t_last = bench(shade_last, last)
    print(f"channel-last  (H,W,3): {t_last:8.3f} ms per shade pass", flush=True)
    t_planes = bench(shade_planes, planes)
    print(f"channel-plane (3,H,W): {t_planes:8.3f} ms per shade pass", flush=True)
    print(f"ratio: {t_last / max(t_planes, 1e-9):.2f}x", flush=True)


if __name__ == "__main__":
    main()
