"""Pallas bounded-offset image warp — the gather-wall breaker (PERF_NOTES.md).

XLA gathers run at ~160M rows/s on this TPU (~13 ms per full-screen tap), so
resampling-heavy passes (TAA history, reprojection) dominate the frame.  This
kernel resamples with **zero HBM gathers**: the screen is tiled (8 x 128);
each tile's kernel instance DMAs a source window (tile + max-offset halo) into
VMEM and performs the per-pixel sample as
  1. a vertical row-select over the window's rows (select chain — VPU), then
  2. a horizontal `take_along_axis` lane gather (tpu.dynamic_gather, the one
     per-lane gather Mosaic supports, range 128 lanes per chunk),
as a two-pass separable bilinear filter.  Offsets are clamped to the halo.

The separable approximation evaluates the horizontal offset at the vertically
warped row (exact when the offset field is constant over the kernel's
footprint; error O(halo * d(offset)/dy) — negligible for motion-vector
fields).  Cost scales with window rows, not with taps x pixels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_H = 8
TILE_W = 128


def _warp_kernel(img_hbm, offy_ref, offx_ref, out_ref, scratch, sem,
                 *, halo_r: int, halo_c: int, win_h: int, win_w: int,
                 height: int, width: int, channels: int, tiles_x: int):
    t = pl.program_id(0)
    ty = t // tiles_x
    tx = t % tiles_x
    y0 = ty * TILE_H
    x0 = tx * TILE_W

    # window DMA with clamped, tile-aligned origin.  win_w includes one
    # extra TILE_W when halo_c % TILE_W != 0 so the round-down of rx (up to
    # TILE_W - 64 leftward) cannot eat the right halo (ADVICE r1).
    ry = jnp.clip(y0 - halo_r, 0, height - win_h)
    ry = pl.multiple_of((ry // TILE_H) * TILE_H, TILE_H)
    rx = jnp.clip(x0 - halo_c, 0, width - win_w)
    rx = pl.multiple_of((rx // TILE_W) * TILE_W, TILE_W)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(ry, win_h), pl.ds(rx, win_w)], scratch, sem)
    cp.start()
    cp.wait()

    # per-pixel source position, window-local
    oy = offy_ref[0]                                       # (8, 128) f32
    ox = offx_ref[0]
    py = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    sy = py + (y0 - ry).astype(jnp.float32) + oy           # window row coords
    sx = px + (x0 - rx).astype(jnp.float32) + ox
    sy = jnp.clip(sy, 0.0, win_h - 1.0)
    sx = jnp.clip(sx, 0.0, win_w - 1.0)
    yi = jnp.floor(sy).astype(jnp.int32)
    xi = jnp.floor(sx).astype(jnp.int32)
    fy = sy - yi.astype(jnp.float32)
    fx = sx - xi.astype(jnp.float32)

    win = scratch[:]                                       # (win_h, win_w)

    # Exact per-pixel bilinear via a window-row sweep: every window row is
    # horizontally gathered once (its values are row-invariant, so the lane
    # take_along_axis is exact) and contributes to the pixels whose vertical
    # neighbors include it.  2 lane-gathers per window row.
    xi1 = jnp.minimum(xi + 1, win_w - 1)
    v = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for r in range(win_h):
        row = win[r]                                       # (win_w,)
        ga = _row_gather(row, xi, win_w)
        gb = _row_gather(row, xi1, win_w)
        hval = ga + (gb - ga) * fx
        v = v + jnp.where(yi == r, hval * (1.0 - fy), 0.0) \
              + jnp.where(yi + 1 == r, hval * fy, 0.0)
    out_ref[0] = v


def _row_gather(row: Array, xi: Array, win_w: int) -> Array:
    """row (win_w,) → per-pixel row[xi] for xi (8, 128) via chunked
    take_along_axis (the Mosaic per-lane gather, range 128)."""
    out = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for c in range(win_w // TILE_W):
        seg = row[c * TILE_W:(c + 1) * TILE_W]
        seg2d = jnp.broadcast_to(seg[None, :], (TILE_H, TILE_W))
        local = jnp.clip(xi - c * TILE_W, 0, TILE_W - 1)
        g = jnp.take_along_axis(seg2d, local, axis=1)
        out = jnp.where((xi >= c * TILE_W) & (xi < (c + 1) * TILE_W), g, out)
    return out


@functools.partial(jax.jit, static_argnames=("halo_r", "halo_c"))
def warp_bilinear_pallas(img: Array, offset_px: Array, *,
                         halo_r: int = 16, halo_c: int = 64) -> Array:
    """Bilinear resample `img` at (pixel + offset_px) per pixel.

    img: (H, W) or (H, W, C) f32 with H % 8 == 0, W % 128 == 0;
    offset_px: (H, W, 2) pixel offsets (dx, dy), clamped to ±(halo_c, halo_r).
    Returns the warped image.  For multi-channel images each channel warps
    through the same kernel (window DMA per channel).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    assert halo_c % 64 == 0, "halo_c must be a multiple of 64"
    assert halo_r % TILE_H == 0, "halo_r must be a multiple of 8"
    # shrink halos for images smaller than the window
    halo_r = min(halo_r, (h - TILE_H) // 2 // TILE_H * TILE_H)
    halo_c = min(halo_c, (w - TILE_W) // 2 // 64 * 64)
    tiles_x = w // TILE_W
    tiles_y = h // TILE_H
    num_tiles = tiles_x * tiles_y
    win_h = TILE_H + 2 * halo_r
    # The kernel rounds the window origin DOWN to a TILE_W multiple; when
    # halo_c is not a TILE_W multiple that shift (64 px) would otherwise
    # leave zero right halo, so widen the window by one extra TILE_W.
    win_w = TILE_W + 2 * halo_c
    if halo_c % TILE_W != 0 and win_w + TILE_W <= w:
        win_w += TILE_W
    win_w = min(win_w, w)

    cx = max(halo_c - 1.0, 0.0)
    cy = max(halo_r - 1.0, 0.0)
    ox = jnp.clip(offset_px[..., 0], -cx, cx)
    oy = jnp.clip(offset_px[..., 1], -cy, cy)
    # tile the offsets to (tiles, 8, 128)
    def tile3(x):
        return (x.reshape(tiles_y, TILE_H, tiles_x, TILE_W)
                .transpose(0, 2, 1, 3).reshape(num_tiles, TILE_H, TILE_W))

    oy_t = tile3(oy)
    ox_t = tile3(ox)

    kernel = functools.partial(
        _warp_kernel, halo_r=halo_r, halo_c=halo_c, win_h=win_h, win_w=win_w,
        height=h, width=w, channels=1, tiles_x=tiles_x)

    outs = []
    for ch in range(c):
        out = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),          # img (HBM)
                pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_tiles, TILE_H, TILE_W),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((win_h, win_w), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(img[..., ch], oy_t, ox_t)
        out = (out.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
               .transpose(0, 2, 1, 3).reshape(h, w))
        outs.append(out)
    result = jnp.stack(outs, axis=-1)
    return result[..., 0] if squeeze else result


# ---------------------------------------------------------------------------
# Multi-tap warp: K taps of one image in ONE kernel (one window DMA, one
# launch) — the SSAO horizon taps were 16 separate pallas calls whose XLA
# glue (pad + offset tiling + untile per call) dominated the pass.
# ---------------------------------------------------------------------------


def _warp_multi_kernel(img_hbm, offy_ref, offx_ref, out_ref, scratch, sem,
                       *, k_taps: int, win_h: int, win_w: int,
                       height: int, width: int, tiles_x: int,
                       halo_r: int, halo_c: int):
    t = pl.program_id(0)
    ty = t // tiles_x
    tx = t % tiles_x
    y0 = ty * TILE_H
    x0 = tx * TILE_W

    ry = jnp.clip(y0 - halo_r, 0, height - win_h)
    ry = pl.multiple_of((ry // TILE_H) * TILE_H, TILE_H)
    rx = jnp.clip(x0 - halo_c, 0, width - win_w)
    rx = pl.multiple_of((rx // TILE_W) * TILE_W, TILE_W)
    cp = pltpu.make_async_copy(
        img_hbm.at[pl.ds(ry, win_h), pl.ds(rx, win_w)], scratch, sem)
    cp.start()
    cp.wait()

    py = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)

    for k in range(k_taps):
        sy = py + (y0 - ry).astype(jnp.float32) + offy_ref[k]
        sx = px + (x0 - rx).astype(jnp.float32) + offx_ref[k]
        sy = jnp.clip(sy, 0.0, win_h - 1.0)
        sx = jnp.clip(sx, 0.0, win_w - 1.0)
        yi = jnp.floor(sy).astype(jnp.int32)
        xi = jnp.floor(sx).astype(jnp.int32)
        fy = sy - yi.astype(jnp.float32)
        fx = sx - xi.astype(jnp.float32)
        xi1 = jnp.minimum(xi + 1, win_w - 1)

        def body(r, v):
            row = scratch[r]
            ga = _row_gather(row, xi, win_w)
            gb = _row_gather(row, xi1, win_w)
            hval = ga + (gb - ga) * fx
            return (v + jnp.where(yi == r, hval * (1.0 - fy), 0.0)
                      + jnp.where(yi + 1 == r, hval * fy, 0.0))

        out_ref[k] = jax.lax.fori_loop(0, win_h, body,
                                       jnp.zeros((TILE_H, TILE_W), jnp.float32))


@functools.partial(jax.jit, static_argnames=("halo_r", "halo_c"))
def warp_bilinear_multi_pallas(img: Array, offsets_px: Array, *,
                               halo_r: int = 16, halo_c: int = 64) -> Array:
    """K bilinear taps of `img` per pixel in one kernel.

    img: (H, W) f32, H % 8 == 0, W % 128 == 0;
    offsets_px: (K, H, W, 2) pixel offsets (dx, dy), clamped to the halo.
    Returns (K, H, W) sampled values.  One window DMA serves all K taps and
    the outputs land directly in final (K, H, W) layout (2D block index
    maps — no XLA untile, PERF_NOTES.md)."""
    h, w = img.shape
    k_taps = offsets_px.shape[0]
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    assert halo_c % 64 == 0 and halo_r % TILE_H == 0
    halo_r = min(halo_r, (h - TILE_H) // 2 // TILE_H * TILE_H)
    halo_c = min(halo_c, (w - TILE_W) // 2 // 64 * 64)
    tiles_x = w // TILE_W
    tiles_y = h // TILE_H
    win_h = TILE_H + 2 * halo_r
    win_w = TILE_W + 2 * halo_c
    if halo_c % TILE_W != 0 and win_w + TILE_W <= w:
        win_w += TILE_W
    win_w = min(win_w, w)

    cx = max(halo_c - 1.0, 0.0)
    cy = max(halo_r - 1.0, 0.0)
    ox = jnp.clip(offsets_px[..., 0], -cx, cx)
    oy = jnp.clip(offsets_px[..., 1], -cy, cy)

    kernel = functools.partial(
        _warp_multi_kernel, k_taps=k_taps, win_h=win_h, win_w=win_w,
        height=h, width=w, tiles_x=tiles_x, halo_r=halo_r, halo_c=halo_c)
    out = pl.pallas_call(
        kernel,
        grid=(tiles_x * tiles_y,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # img (HBM)
            pl.BlockSpec((k_taps, TILE_H, TILE_W),
                         lambda i: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_taps, TILE_H, TILE_W),
                         lambda i: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_taps, TILE_H, TILE_W),
                               lambda i: (0, i // tiles_x, i % tiles_x),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_taps, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win_h, win_w), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(img, oy, ox)
    return out
