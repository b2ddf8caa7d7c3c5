"""Pallas SSR hi-Z march — the coarse depth mip lives ENTIRELY in VMEM.

The XLA batched march gathers (steps+1) x (h, w) rows from a ~32 KB coarse
mip (~20 ms at 1080p/div4: gathers cost per ROW regardless of table size,
PERF_NOTES.md).  Here each (8, 128) tile computes the affine step positions
in-kernel and samples the VMEM-resident table with a row sweep + per-lane
`take_along_axis` — no HBM gathers at all.  Returns the coarse bracket
(t_lo, t_hit, hit); the fine-buffer secant stays outside (2 bilinear taps).
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


def _march_kernel(coarse_ref, o_ref, d_ref, sc_ref,
                  tlo_ref, thit_ref, hit_ref,
                  *, steps: int, rows: int, cols: int):
    """o_ref/d_ref: (3, 8, 128) origin/dir in (u, v, ndc_z); sc_ref: (1, 1)
    SMEM [thickness_ndc]; coarse_ref: (rows_pad, 128) min-depth mip."""
    ou, ov, oz = o_ref[0], o_ref[1], o_ref[2]
    du, dv, dz = d_ref[0], d_ref[1], d_ref[2]
    thick = sc_ref[0, 0]
    dt = 1.0 / steps
    step_dz = jnp.abs(dz) * dt

    def tap(u, v):
        # nearest tap of the VMEM table at uv in [0,1]² (point_sample
        # semantics: floor(u * size), clamped)
        xi = jnp.clip(jnp.floor(u * cols).astype(jnp.int32), 0, cols - 1)
        yi = jnp.clip(jnp.floor(v * rows).astype(jnp.int32), 0, rows - 1)

        def body(r, acc):
            # full 128-lane operand/index shapes — the one per-lane gather
            # Mosaic lowers (range 128); xi < cols so pad lanes never win
            row = coarse_ref[r]                           # (128,)
            row2 = jnp.broadcast_to(row[None, :], (TILE_H, TILE_W))
            g = jnp.take_along_axis(row2, xi, axis=1)
            return jnp.where(yi == r, g, acc)

        return jax.lax.fori_loop(0, rows, body,
                                 jnp.zeros((TILE_H, TILE_W), jnp.float32))

    found = jnp.zeros((TILE_H, TILE_W), jnp.bool_)
    i0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    f_prev = (oz - tap(ou, ov))
    for s in range(1, steps + 1):
        t = s * dt
        pu = ou + du * t
        pv = ov + dv * t
        pz = oz + dz * t
        f = pz - tap(pu, pv)
        inside = (pu > 0) & (pu < 1) & (pv > 0) & (pv < 1)
        cross = ((f > 0) & (f_prev <= 0)
                 & (f < thick + step_dz) & inside & ~found)
        i0 = jnp.where(cross, jnp.float32(s - 1), i0)
        # secant fraction on the coarse bracket, recorded at first hit
        denom = f - f_prev
        frac = jnp.where(jnp.abs(denom) > 1e-12, -f_prev / denom, 1.0)
        frac = jnp.clip(frac, 0.0, 1.0)
        thit_new = (jnp.float32(s - 1) + frac) * dt
        if s == 1:
            t_hit = jnp.where(cross, thit_new, 1.0)
        else:
            t_hit = jnp.where(cross, thit_new, t_hit)
        found = found | cross
        f_prev = f

    tlo_ref[...] = i0 * dt
    thit_ref[...] = t_hit
    hit_ref[...] = found.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("steps",))
def march_small_table_pallas(coarse: Array, origin_uvz: Array, dir_uvz: Array,
                             thickness_ndc, *, steps: int):
    """Coarse SSR march against a VMEM-resident min-depth table.

    coarse: (rows, cols) with cols <= 128; origin/dir: (h, w, 3) in
    (u, v, ndc_z); thickness_ndc: scalar.  h % 8 == 0, w % 128 == 0.
    Returns (t_lo (h, w), t_hit (h, w), hit (h, w) bool) — the same coarse
    bracket `_march` computes, for the fine secant outside."""
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
    kernel = functools.partial(_march_kernel, steps=steps, rows=rows,
                               cols=cols)
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
