"""Pallas SSR hi-Z march — the coarse depth mip lives ENTIRELY in VMEM.

Round-2 shape: fixed-step march, each step tapping the VMEM table with a
per-ROW sweep (O(rows) selects per tap) — measured ~120 ms at 1080p/div2,
the dominant SSR cost.  Round-3 shape: a row-DDA (this file) that mirrors
the reference's hi-Z cell traversal (ScreenSpaceReflection.fx ray march /
FFX-SSSR hierarchical traversal): v(t) is LINEAR in t, so a ray crosses
each table row in at most one t-interval with a closed form.  Sweeping the
R table rows ONCE (in any order — the intervals are disjoint, so a min over
crossing t's is the first hit) costs 3 lane-gathers + ~20 VPU ops per row
TOTAL for the whole march, independent of any step count: ~4x less work
than 24 fixed steps x R-row taps, with exact per-row vertical resolution.

Within a row the ray spans [u(tin), u(tout)]; depth is sampled at entry,
midpoint, and exit (2 piecewise-linear sub-intervals).  Nearly-horizontal
rays that traverse many columns inside one row are under-sampled in u —
the same failure class as the fixed-step march's 24-sample budget, handled
downstream by the fine-buffer secant + facing check + confidence fades.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_H = 8
TILE_W = 128


def _dda_body(row2, t0, t1, has, ou, du, oz, dz, thick,
              cols, t_lo_b, t_hit_b):
    """One piecewise-linear sub-interval [t0, t1] against a broadcast table
    row: crossing test + secant, folded into the running first-hit min.

    The crossing is tested against EACH sampled texel's depth plane
    separately (d0 at entry, d1 at exit), not only the mixed d0→d1 secant:
    min-pooled thin NEAR features pollute single texels of the coarse table,
    and a genuine far-surface crossing whose entry/exit sample lands in such
    a texel fails the mixed test's acceptance window (measured 38% miss on
    a railing scene, tests/test_ssr_march_fidelity.py).  Per-texel planes
    mirror the reference hi-Z DDA's per-CELL intersection test
    (SSR_ComputeIntersection.fx): only both-samples-polluted intervals can
    still hide a hit.  Zero extra gathers — d0/d1 are already in hand."""
    u0 = ou + du * t0
    u1 = ou + du * t1
    x0 = jnp.clip(jnp.floor(u0 * cols).astype(jnp.int32), 0, cols - 1)
    x1 = jnp.clip(jnp.floor(u1 * cols).astype(jnp.int32), 0, cols - 1)
    d0 = jnp.take_along_axis(row2, x0, axis=1)
    d1 = jnp.take_along_axis(row2, x1, axis=1)
    z0 = oz + dz * t0
    z1 = oz + dz * t1
    slop = jnp.abs(dz) * (t1 - t0)
    win = thick + slop
    inside = (u0 > 0.0) & (u0 < 1.0) & (u1 > 0.0) & (u1 < 1.0)
    ok = has & inside
    t_span = t1 - t0

    # entry slack of half the sub-interval's z advance: a crossing that
    # straddles the ROW BOUNDARY shows f slightly > 0 at this row's entry
    # and f < 0 only vs the PREVIOUS row's depth — no single row sees the
    # sign change (grazing rays on slowly-converging ramps; measured 19%
    # miss at mip0 before this).  Worst case it accepts half a step early.
    eps0 = 0.5 * slop

    def plane(dp, t_lo_b, t_hit_b):
        # crossing of the constant-depth plane z = dp within [t0, t1]
        f0 = z0 - dp
        f1 = z1 - dp
        cross = ok & (f0 <= eps0) & (f1 > 0.0) & (f1 < win)
        denom = f1 - f0
        frac = jnp.where(jnp.abs(denom) > 1e-12, -f0 / denom, 1.0)
        t_star = t0 + jnp.clip(frac, 0.0, 1.0) * t_span
        upd = cross & (t_star < t_hit_b)
        return (jnp.where(upd, t0, t_lo_b), jnp.where(upd, t_star, t_hit_b))

    t_lo_b, t_hit_b = plane(d0, t_lo_b, t_hit_b)
    t_lo_b, t_hit_b = plane(d1, t_lo_b, t_hit_b)
    # the mixed d0→d1 secant still catches sloped surfaces converging with
    # the ray between the two texels (both per-plane tests miss those)
    f0m = z0 - d0
    f1m = z1 - d1
    crossm = ok & (f0m <= eps0) & (f1m > 0.0) & (f1m < win)
    denom = f1m - f0m
    frac = jnp.where(jnp.abs(denom) > 1e-12, -f0m / denom, 1.0)
    t_star = t0 + jnp.clip(frac, 0.0, 1.0) * t_span
    upd = crossm & (t_star < t_hit_b)
    return (jnp.where(upd, t0, t_lo_b), jnp.where(upd, t_star, t_hit_b))


def _march_kernel(coarse_ref, o_ref, d_ref, sc_ref,
                  tlo_ref, thit_ref, hit_ref,
                  *, rows: int, cols: int, sweep: str = "dyn"):
    """o_ref/d_ref: (3, 8, 128) origin/dir in (u, v, ndc_z); sc_ref: (1, 1)
    SMEM [thickness_ndc]; coarse_ref: (rows_pad, 128) min-depth mip.

    sweep: row-sweep lowering strategy (measured round 5):
      "dyn"    — fori_loop over the tile's [rmin, rmax) row bound (dynamic
                 trip count; the GTAO-v1 lesson says traced-bound loops can
                 stall Mosaic's pipelining)
      "static" — fori_loop over ALL rows with an in-range predicate
      "unroll" — fully unrolled static Python loop with predicated rows"""
    ou, ov, oz = o_ref[0], o_ref[1], o_ref[2]
    du, dv, dz = d_ref[0], d_ref[1], d_ref[2]
    thick = sc_ref[0, 0]

    eps = 1e-7
    safe_dv = jnp.where(jnp.abs(dv) > eps, dv, eps)
    inv_dv = 1.0 / safe_dv
    flat = jnp.abs(dv) <= eps
    # the row the (nearly-)horizontal ray lives in for its whole length
    home_row = jnp.clip(jnp.floor(ov * rows).astype(jnp.int32), 0, rows - 1)

    def body(r, carry, live=None):
        t_lo_b, t_hit_b = carry
        row = coarse_ref[r]                                # (128,)
        row2 = jnp.broadcast_to(row[None, :], (TILE_H, TILE_W))
        rf = jnp.asarray(r).astype(jnp.float32)
        ta = (rf / rows - ov) * inv_dv
        tb = ((rf + 1.0) / rows - ov) * inv_dv
        tin = jnp.clip(jnp.minimum(ta, tb), 0.0, 1.0)
        tout = jnp.clip(jnp.maximum(ta, tb), 0.0, 1.0)
        has = (tout > tin) & ~flat
        in_home = flat & (home_row == r)
        tin = jnp.where(in_home, 0.0, tin)
        tout = jnp.where(in_home, 1.0, tout)
        has = has | in_home
        if live is not None:
            has = has & live
        tm = 0.5 * (tin + tout)
        t_lo_b, t_hit_b = _dda_body(row2, tin, tm, has, ou, du, oz, dz,
                                    thick, cols, t_lo_b, t_hit_b)
        t_lo_b, t_hit_b = _dda_body(row2, tm, tout, has, ou, du, oz, dz,
                                    thick, cols, t_lo_b, t_hit_b)
        return t_lo_b, t_hit_b

    init = (jnp.full((TILE_H, TILE_W), 2.0, jnp.float32),
            jnp.full((TILE_H, TILE_W), 2.0, jnp.float32))
    # sweep only the rows some ray in this tile can touch: a ray spans
    # v ∈ [ov, ov+dv] (t clipped to [0,1] already), so rows outside the
    # tile's union span contribute nothing — typical scenes reflect
    # up-screen a bounded distance, cutting the sweep 2-3x
    v_end = ov + dv
    vmin = jnp.min(jnp.minimum(ov, v_end))
    vmax = jnp.max(jnp.maximum(ov, v_end))
    rmin = jnp.clip(jnp.floor(vmin * rows).astype(jnp.int32), 0, rows)
    rmax = jnp.clip(jnp.floor(vmax * rows).astype(jnp.int32) + 1, 0, rows)
    if sweep == "dyn":
        t_lo, t_hit = jax.lax.fori_loop(rmin, rmax, body, init)
    elif sweep == "static":
        def gated(r, carry):
            return body(r, carry, live=jnp.broadcast_to(
                (r >= rmin) & (r < rmax), (TILE_H, TILE_W)))
        t_lo, t_hit = jax.lax.fori_loop(0, rows, gated, init)
    else:                                   # "unroll"
        # predicated static rows: Mosaic pipelines the unrolled gathers;
        # out-of-bound rows still cost their ops (no dynamic skip)
        t_lo, t_hit = init
        for r in range(rows):
            live = jnp.broadcast_to((jnp.int32(r) >= rmin)
                                    & (jnp.int32(r) < rmax),
                                    (TILE_H, TILE_W))
            t_lo, t_hit = body(jnp.int32(r), (t_lo, t_hit), live=live)
    found = t_hit < 1.5
    tlo_ref[...] = jnp.where(found, t_lo, 0.0)
    thit_ref[...] = jnp.where(found, t_hit, 1.0)
    hit_ref[...] = found.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("steps", "sweep"))
def march_small_table_pallas(coarse: Array, origin_uvz: Array, dir_uvz: Array,
                             thickness_ndc, *, steps: int = 0,
                             sweep: str = "dyn"):
    """Row-DDA SSR march against a VMEM-resident min-depth table.

    coarse: (rows, cols) with cols <= 128; origin/dir: (h, w, 3) in
    (u, v, ndc_z); thickness_ndc: scalar.  h % 8 == 0, w % 128 == 0.
    `steps` is accepted for interface compatibility and ignored — the DDA's
    effective resolution is the table's row count (2 piecewise-linear
    sub-intervals per crossed row).
    Returns (t_lo (h, w), t_hit (h, w), hit (h, w) bool) — the coarse
    bracket for the fine-buffer secant outside."""
    del steps
    rows, cols = coarse.shape
    assert cols <= TILE_W, cols
    h, w = origin_uvz.shape[:2]
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    rows_pad = -(-rows // TILE_H) * TILE_H
    tab = jnp.pad(coarse, ((0, rows_pad - rows), (0, TILE_W - cols)))
    o_cf = jnp.moveaxis(origin_uvz, -1, 0)      # (3, h, w) channel-first
    d_cf = jnp.moveaxis(dir_uvz, -1, 0)
    sc = jnp.reshape(jnp.asarray(thickness_ndc, jnp.float32), (1, 1))
    tiles_x = w // TILE_W
    kernel = functools.partial(_march_kernel, rows=rows, cols=cols,
                               sweep=sweep)
    t_lo, t_hit, hit = pl.pallas_call(
        kernel,
        grid=(tiles_x * (h // TILE_H),),
        in_specs=[
            pl.BlockSpec((rows_pad, TILE_W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W),
                         lambda i: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W),
                         lambda i: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i: (i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ],
    )(tab, o_cf, d_cf, sc)
    return t_lo, t_hit, hit > 0.5


def march_dda_reference(coarse, origin_uvz, dir_uvz, thickness_ndc):
    """Pure-jnp reference of the row-DDA (same math as the kernel) for
    parity testing the Pallas lowering."""
    rows, cols = coarse.shape
    ou, ov, oz = (origin_uvz[..., i] for i in range(3))
    du, dv, dz = (dir_uvz[..., i] for i in range(3))
    eps = 1e-7
    safe_dv = jnp.where(jnp.abs(dv) > eps, dv, eps)
    inv_dv = 1.0 / safe_dv
    flat = jnp.abs(dv) <= eps
    home_row = jnp.clip(jnp.floor(ov * rows).astype(jnp.int32), 0, rows - 1)
    t_lo_b = jnp.full(ou.shape, 2.0, jnp.float32)
    t_hit_b = jnp.full(ou.shape, 2.0, jnp.float32)

    def sub(row_vals, t0, t1, has, t_lo_b, t_hit_b):
        u0 = ou + du * t0
        u1 = ou + du * t1
        x0 = jnp.clip(jnp.floor(u0 * cols).astype(jnp.int32), 0, cols - 1)
        x1 = jnp.clip(jnp.floor(u1 * cols).astype(jnp.int32), 0, cols - 1)
        d0 = row_vals[x0]
        d1 = row_vals[x1]
        z0 = oz + dz * t0
        z1 = oz + dz * t1
        slop = jnp.abs(dz) * (t1 - t0)
        win = thickness_ndc + slop
        inside = (u0 > 0.0) & (u0 < 1.0) & (u1 > 0.0) & (u1 < 1.0)
        ok = has & inside
        t_span = t1 - t0

        eps0 = 0.5 * slop    # row-boundary slack, see _dda_body

        def fold(f0, f1, t_lo_b, t_hit_b):
            cross = ok & (f0 <= eps0) & (f1 > 0.0) & (f1 < win)
            denom = f1 - f0
            frac = jnp.where(jnp.abs(denom) > 1e-12, -f0 / denom, 1.0)
            t_star = t0 + jnp.clip(frac, 0.0, 1.0) * t_span
            upd = cross & (t_star < t_hit_b)
            return (jnp.where(upd, t0, t_lo_b),
                    jnp.where(upd, t_star, t_hit_b))

        # per-texel depth planes (entry/exit) + the mixed secant — see
        # _dda_body: single polluted min-pool texels must not hide hits
        t_lo_b, t_hit_b = fold(z0 - d0, z1 - d0, t_lo_b, t_hit_b)
        t_lo_b, t_hit_b = fold(z0 - d1, z1 - d1, t_lo_b, t_hit_b)
        return fold(z0 - d0, z1 - d1, t_lo_b, t_hit_b)

    for r in range(rows):
        rf = float(r)
        ta = (rf / rows - ov) * inv_dv
        tb = ((rf + 1.0) / rows - ov) * inv_dv
        tin = jnp.clip(jnp.minimum(ta, tb), 0.0, 1.0)
        tout = jnp.clip(jnp.maximum(ta, tb), 0.0, 1.0)
        has = (tout > tin) & ~flat
        in_home = flat & (home_row == r)
        tin = jnp.where(in_home, 0.0, tin)
        tout = jnp.where(in_home, 1.0, tout)
        has = has | in_home
        tm = 0.5 * (tin + tout)
        t_lo_b, t_hit_b = sub(coarse[r], tin, tm, has, t_lo_b, t_hit_b)
        t_lo_b, t_hit_b = sub(coarse[r], tm, tout, has, t_lo_b, t_hit_b)
    found = t_hit_b < 1.5
    return (jnp.where(found, t_lo_b, 0.0), jnp.where(found, t_hit_b, 1.0),
            found)
