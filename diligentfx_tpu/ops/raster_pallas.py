"""Pallas TPU kernel for the per-tile raster loop.

Replaces the XLA-scan fallback in ops/raster.py (`_raster_tiles`), which is
HBM-bound: each scan step materializes (tiles, K, th, tw) intermediates.  Here
each grid step owns one framebuffer tile with VMEM-resident z/id/barycentric
accumulators and loops over **only that tile's actual candidate count**
(dynamic fori_loop trip count from a scalar-prefetch array) — HBM traffic is
just the gathered triangle setup in and the finished tile out, and empty bin
slots cost nothing.

Performance notes (measured on v5e):
  * Per-triangle coefficients are read as one (chunk, 16) vector block and
    broadcast per-coefficient — per-triangle dynamic scalar extracts would
    cost ~10 scalar loads/triangle and dominate the kernel.
  * The per-tile setup gather runs in XLA on 64-byte-aligned (T, 16) rows
    (0.04 ms at 1080p); packing ids into the same array via concat forces a
    multi-ms relayout, so candidate ids ship as a separate transposed input
    read with sublane-dynamic indexing (lane-dynamic indexing is unsupported).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SETUP_ROWS = 16  # 9 plane coefficients + pad to an aligned row


def _raster_tile_kernel(counts_ref,            # scalar prefetch: (num_tiles,)
                        tiles_x_ref,           # scalar prefetch: (1,)
                        setup_ref,             # (1, cap, 16) VMEM gathered coeffs
                        z_ref, id_ref, b0_ref, b1_ref,  # (1, th, tw) VMEM out
                        *, th: int, tw: int, cap: int, chunk: int,
                        depth_sign: float, depth_clear: float):
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], cap)
    tiles_x = tiles_x_ref[0]

    x0 = ((t % tiles_x) * tw).astype(jnp.float32)
    y0 = ((t // tiles_x) * th).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5

    z_ref[0] = jnp.full((th, tw), depth_clear, jnp.float32)
    id_ref[0] = jnp.full((th, tw), -1, jnp.int32)
    b0_ref[0] = jnp.zeros((th, tw), jnp.float32)
    b1_ref[0] = jnp.zeros((th, tw), jnp.float32)

    def body(i, _):
        base = pl.multiple_of(i * chunk, chunk)
        s = setup_ref[0, pl.ds(base, chunk), :]              # (chunk, 16)

        def coef(j):
            return s[:, j][:, None, None]                    # (chunk, 1, 1)

        l0 = coef(0) * px[None] + coef(1) * py[None] + coef(2)
        l1 = coef(3) * px[None] + coef(4) * py[None] + coef(5)
        l2 = 1.0 - l0 - l1
        z = coef(6) * px[None] + coef(7) * py[None] + coef(8)
        cover = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)      # (chunk, th, tw)
        # stored barycentrics: the ORIGINAL triangle's planes (cols 9-14)
        lo0 = coef(9) * px[None] + coef(10) * py[None] + coef(11)
        lo1 = coef(12) * px[None] + coef(13) * py[None] + coef(14)

        for k in range(chunk):
            idx = base + k
            zb = z_ref[0]
            take = cover[k] & (depth_sign * z[k] < depth_sign * zb) & (idx < count)
            tri = s[k, 15].astype(jnp.int32)                 # original tri id
            z_ref[0] = jnp.where(take, z[k], zb)
            id_ref[0] = jnp.where(take, tri, id_ref[0])
            b0_ref[0] = jnp.where(take, lo0[k], b0_ref[0])
            b1_ref[0] = jnp.where(take, lo1[k], b1_ref[0])
        return 0

    n_chunks = pl.cdiv(count, chunk)
    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=("th", "tw", "tiles_x",
                                             "depth_less", "chunk"))
def raster_tiles_pallas(setup: Array, candidates: Array, counts: Array,
                        *, th: int, tw: int, tiles_x: int,
                        depth_less: bool = True, chunk: int = 8
                        ) -> Tuple[Array, Array, Array, Array]:
    """Run the per-tile raster kernel.

    Args:
      setup: (T, 9) per-triangle plane coefficients (raster._triangle_setup).
      candidates: (num_tiles, cap) int32 triangle ids, -1 padded, compact
        (all valid entries first — see raster._bin_triangles).
      counts: (num_tiles,) int32 valid candidates per tile.
    Returns (z, id, b0, b1) each (num_tiles, th, tw).
    """
    num_tiles, cap = candidates.shape
    if setup.shape[1] < SETUP_ROWS:
        setup = jnp.pad(setup, ((0, 0), (0, SETUP_ROWS - setup.shape[1])))
    # Invalid (-1) slots gather row 0 but are never reached: the per-tile trip
    # count stops at `counts`, and compact candidate lists have no gaps.
    gathered = setup[jnp.maximum(candidates, 0)]             # (tiles, cap, 16)

    depth_clear = jnp.inf if depth_less else -jnp.inf
    kernel = functools.partial(
        _raster_tile_kernel, th=th, tw=tw, cap=cap, chunk=chunk,
        depth_sign=1.0 if depth_less else -1.0,
        depth_clear=float(depth_clear))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, cap, SETUP_ROWS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )
    z, tid, b0, b1 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, th, tw), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, th, tw), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, th, tw), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, th, tw), jnp.float32),
        ],
    )(counts, jnp.array([tiles_x], jnp.int32), gathered)
    return z, tid, b0, b1
