"""SSR march fidelity vs a brute-force exact intersection (VERDICT r4 #8).

The repo has two march paths, neither of which is the reference's per-ray
variable-length hi-Z DDA (SSR_ComputeIntersection.fx,
MaxTraversalIntersections=64 default, Hydrogent HnPostProcessTask.hpp:128):

  * XLA fallback (`_march`, use_pallas=False): fixed-budget batched point
    march of the FINE depth buffer + per-texel-plane crossing acceptance +
    secant.  `steps` is the budget knob (bench keeps 24).
  * Pallas row-DDA (`march_small_table_pallas` ≡ `march_dda_reference`):
    exact per-row traversal of a VMEM-resident min-pooled table; effective
    resolution is the TABLE's (≤128-lane) size, `steps` is ignored.

These tests quantify what each path buys on the worst case for a sparse
march: THIN features (railing-like bars) in FRONT of a far ramp.  Thin
near features hurt twice — a sparse sampling can hop over the bar itself,
and the min-pooled coarse table POLLUTES far-surface crossings near the
bars' silhouettes (the acceptance window rejects a real hit whose sampled
texel holds the bar's min depth).  The round-5 acceptance fix (per-texel
depth planes + row-boundary slack, ops/march_pallas.py `_dda_body`)
brought the measured miss rates to:

  XLA fine march, steps=24 → 3.8%   (was 26.9% marching the coarse mip)
  XLA fine march, steps=48 → 0.0%
  row-DDA on the 4x-pooled table → 15.4%   (was 38.5%)
  row-DDA on the 2x-pooled table → 7.7%

Brute force = 4096 uniform samples of the FINE depth buffer with the same
front-to-back crossing semantics; a miss = brute force finds a crossing but
the march reports none.  Bounds asserted below leave slack for numeric
drift; PERF_NOTES.md r5 records the measured rates and the bench's choice
of steps=24.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from diligentfx_tpu.postfx.ssr import _march, build_min_depth_pyramid
from diligentfx_tpu.ops.march_pallas import march_dda_reference


H, W = 128, 128
THICK = jnp.float32(0.02)


def _thin_feature_depth():
    """Ground ramp (far) + thin vertical bars (near) — railing scene."""
    y = np.linspace(0.0, 1.0, H, dtype=np.float32)[:, None]
    x = np.linspace(0.0, 1.0, W, dtype=np.float32)[None, :]
    depth = 0.6 + 0.35 * y + 0.0 * x          # ground: 0.6 → 0.95
    # thin bars: 1-2 px wide columns at depth 0.3, upper half of the screen
    for cx, wpx in [(24, 1), (48, 2), (70, 1), (95, 2), (110, 1)]:
        depth[: H // 2, cx:cx + wpx] = 0.3
    return jnp.asarray(depth)


def _rays():
    """Rays from lower-screen origins marching up-screen toward the bars,
    crossing the ground ramp in z behind the bar region."""
    rng = np.random.default_rng(7)
    n = 48
    ox = rng.uniform(0.05, 0.95, n).astype(np.float32)
    oy = rng.uniform(0.75, 0.95, n).astype(np.float32)
    oz = rng.uniform(0.18, 0.26, n).astype(np.float32)   # in front of bars
    # target the upper band where the bars live
    tx = rng.uniform(0.05, 0.95, n).astype(np.float32)
    ty = rng.uniform(0.02, 0.35, n).astype(np.float32)
    tz = rng.uniform(0.55, 0.9, n).astype(np.float32)    # behind the ground
    o = np.stack([ox, oy, oz], -1)
    d = np.stack([tx, ty, tz], -1) - o
    return jnp.asarray(o), jnp.asarray(d)


def _grid_of(o, d):
    """_march wants (h, w, 3) grids; lay the N rays out on one row block."""
    n = o.shape[0]
    og = jnp.zeros((8, max(n, 128), 3), jnp.float32)
    dg = jnp.zeros((8, max(n, 128), 3), jnp.float32)
    og = og.at[0, :n].set(o)
    dg = dg.at[0, :n].set(d)
    return og, dg, n


def _brute_force(depth, o, d, thickness, samples=4096):
    """Exact reference: dense uniform sampling of the FINE buffer with the
    same front-to-back crossing acceptance as `_march`."""
    ts = jnp.linspace(0.0, 1.0, samples + 1)
    p = o[:, None, :] + d[:, None, :] * ts[None, :, None]      # (n, S+1, 3)
    xi = jnp.clip((p[..., 0] * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((p[..., 1] * H).astype(jnp.int32), 0, H - 1)
    dz = depth[yi, xi]
    f = p[..., 2] - dz
    inside = ((p[..., 0] > 0) & (p[..., 0] < 1)
              & (p[..., 1] > 0) & (p[..., 1] < 1))
    step_dz = jnp.abs(d[:, 2:3]) / samples
    cross = ((f[:, 1:] > 0) & (f[:, :-1] <= 0)
             & (f[:, 1:] < thickness + step_dz) & inside[:, 1:])
    hit = cross.any(axis=1)
    i0 = jnp.argmax(cross, axis=1)
    t_hit = (i0.astype(jnp.float32) + 0.5) / samples
    return np.asarray(hit), np.asarray(o + d * t_hit[:, None])


def _scene():
    depth = _thin_feature_depth()
    mips = build_min_depth_pyramid(depth, 4)
    o, d = _rays()
    og, dg, n = _grid_of(o, d)
    b_hit, b_pos = _brute_force(depth, o, d, THICK)
    assert b_hit.sum() >= 20, "scene must actually produce brute-force hits"
    return mips, o, d, og, dg, n, b_hit, b_pos


def _miss_rate(m_hit, b_hit):
    return float(((~m_hit) & b_hit).sum()) / float(b_hit.sum())


def _run_xla(mips, og, dg, n, steps):
    hit_uvz, hit = _march(mips, og, dg, steps, THICK, coarse_mip=2)
    return np.asarray(hit[0, :n]), np.asarray(hit_uvz[0, :n])


def test_xla_march_24_step_miss_rate_thin_features():
    """The bench budget (24 steps): ≤10% missed crossings, no false hits."""
    mips, o, d, og, dg, n, b_hit, b_pos = _scene()
    m_hit, _ = _run_xla(mips, og, dg, n, 24)
    assert _miss_rate(m_hit, b_hit) <= 0.10          # measured 3.8%
    assert (m_hit & ~b_hit).sum() <= 2


def test_xla_march_48_step_no_worse_and_tight():
    mips, o, d, og, dg, n, b_hit, b_pos = _scene()
    m24, _ = _run_xla(mips, og, dg, n, 24)
    m48, m_pos = _run_xla(mips, og, dg, n, 48)
    r24 = _miss_rate(m24, b_hit)
    r48 = _miss_rate(m48, b_hit)
    assert r48 <= 0.02                               # measured 0.0%
    assert r48 <= r24 + 1e-9
    # position agreement where both hit: within 2 fine texels
    both = m48 & b_hit
    assert both.sum() >= 15
    duv = np.abs(m_pos[both, :2] - b_pos[both, :2]).max(axis=-1)
    assert np.median(duv) <= 2.0 / W


def test_dda_miss_rate_vs_table_pooling():
    """The Pallas row-DDA's fidelity is set by its table's pooling factor
    (the kernel walks down the pyramid until ≤128 lanes; at the bench's
    div2 processing res that is a ~4x-pooled table).  Bounds at 2x/4x
    pooling; pollution-driven misses must shrink with a finer table."""
    mips, o, d, og, dg, n, b_hit, b_pos = _scene()
    rates = {}
    for cm in (1, 2):
        _, _, hit = march_dda_reference(mips[cm], og, dg, THICK)
        rates[cm] = _miss_rate(np.asarray(hit[0, :n]), b_hit)
    assert rates[2] <= 0.25                          # measured 15.4%
    assert rates[1] <= 0.12                          # measured 7.7%
    assert rates[1] <= rates[2] + 1e-9


def test_march_no_false_hits_on_empty_scene():
    """Rays over a flat far plane with no crossing must not hit — both
    paths."""
    depth = jnp.full((H, W), 0.9, jnp.float32)
    mips = build_min_depth_pyramid(depth, 4)
    o, d = _rays()
    # rays that stay in FRONT of the plane (z from 0.2 to 0.5): no crossing
    d = d.at[:, 2].set(0.3)
    og, dg, n = _grid_of(o, d)
    _, hit = _march(mips, og, dg, 24, THICK, coarse_mip=2)
    assert not np.asarray(hit[0, :n]).any()
    _, _, hit_dda = march_dda_reference(mips[2], og, dg, THICK)
    assert not np.asarray(hit_dda[0, :n]).any()
