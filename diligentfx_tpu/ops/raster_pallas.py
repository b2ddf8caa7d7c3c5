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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

SETUP_ROWS = 16  # 9 plane coefficients + pad to an aligned row


def _raster_tile_kernel(counts_ref,            # scalar prefetch: (num_tiles,)
                        tiles_x_ref,           # scalar prefetch: (3,) [tiles_x, off_x, off_y]
                        setup_ref,             # (1, cap, 16) VMEM gathered coeffs
                        z_ref, id_ref, b0_ref, b1_ref,  # (1, th, tw) VMEM out
                        *, th: int, tw: int, cap: int, chunk: int,
                        depth_sign: float, depth_clear: float):
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], cap)
    tiles_x = tiles_x_ref[0]

    # GLOBAL pixel coords: integer viewport offset added before the float
    # convert, so band-sharded evaluation is bit-exact vs the full frame
    x0 = ((t % tiles_x) * tw + tiles_x_ref[1]).astype(jnp.float32)
    y0 = ((t // tiles_x) * th + tiles_x_ref[2]).astype(jnp.float32)
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
        # 2D iota: Mosaic rejects the 1D-iota broadcast shape cast
        idxs = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
        live = (base + idxs) < count
        cover = ((l0 >= 0.0) & (l1 >= 0.0)
                 & (l2 >= 0.0) & live)                       # (chunk, th, tw)
        # stored barycentrics: the ORIGINAL triangle's planes (cols 9-14)
        lo0 = coef(9) * px[None] + coef(10) * py[None] + coef(11)
        lo1 = coef(12) * px[None] + coef(13) * py[None] + coef(14)

        # chunk-axis min/argmin picks the winner (FIRST minimum = the same
        # tie-break as a sequential strict-less z test); Mosaic has no 3D
        # gather, so the winner's values resolve via one-hot select chains
        zc = jnp.where(cover, depth_sign * z, jnp.inf)
        best = jnp.min(zc, axis=0)
        bk = jnp.argmin(zc, axis=0)                          # (th, tw)
        take = best < depth_sign * z_ref[0]
        tri = jnp.full((th, tw), -1, jnp.int32)
        b0v = jnp.zeros((th, tw), jnp.float32)
        b1v = jnp.zeros((th, tw), jnp.float32)
        for k in range(chunk):
            is_k = bk == k
            tri = jnp.where(is_k, s[k, 15].astype(jnp.int32), tri)
            b0v = jnp.where(is_k, lo0[k], b0v)
            b1v = jnp.where(is_k, lo1[k], b1v)
        z_ref[0] = jnp.where(take, depth_sign * best, z_ref[0])
        id_ref[0] = jnp.where(take, tri, id_ref[0])
        b0_ref[0] = jnp.where(take, b0v, b0_ref[0])
        b1_ref[0] = jnp.where(take, b1v, b1_ref[0])
        return 0

    n_chunks = pl.cdiv(count, chunk)
    jax.lax.fori_loop(0, n_chunks, body, 0)


def _gather_table_cols(table_ref, row: int, slot: Array, cap_pad: int,
                       th: int, tw: int) -> Array:
    """table_ref[0?, row, slot[p]] per pixel — a VMEM column gather built
    from lane-range-128 `take_along_axis` segments + selects (the one
    per-lane gather Mosaic supports, PERF_NOTES.md)."""
    acc = jnp.zeros((th, tw), jnp.float32)
    for j in range(cap_pad // 128):
        seg = table_ref[row, j * 128:(j + 1) * 128]          # (128,)
        seg2 = jnp.broadcast_to(seg[None, :], (th, tw))
        loc = jnp.clip(slot - j * 128, 0, 127)
        g = jnp.take_along_axis(seg2, loc, axis=1)
        acc = jnp.where((slot >= j * 128) & (slot < (j + 1) * 128), g, acc)
    return acc


def _fused_tile_kernel(counts_ref, tiles_x_ref, setup_ref, planesT_ref,
                       mattab_ref, z_ref, id_ref, out_ref, slot_scr,
                       vals_scr,
                       *, th: int, tw: int, cap: int, cap_pad: int, chunk: int,
                       depth_sign: float, depth_clear: float,
                       n_ch: int, n_const: int, deriv_channels: tuple,
                       n_mrow: int, m_pad: int, transpose_in_kernel: bool):
    """Visibility raster + fused attribute/material epilogue.

    Phase 1 is the z-loop of `_raster_tile_kernel` (also recording the
    winning candidate SLOT).  Phase 2 interpolates every attribute channel
    as an affine numerator plane over a shared denominator plane
    (perspective-correct: N_c(x,y)/D(x,y), coefficients per candidate in
    `planesT`), evaluates optional screen derivatives, reads per-triangle
    constants, and gathers the winning material row from `mattab` — all
    tile-local in VMEM, zero HBM gathers.  This collapses the deferred
    interpolate + material passes (~53 ms of XLA gathers at 1080p) into
    the raster kernel (PERF_NOTES.md round-2 plan)."""
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], cap)
    tiles_x = tiles_x_ref[0]

    x0 = ((t % tiles_x) * tw + tiles_x_ref[1]).astype(jnp.float32)
    y0 = ((t // tiles_x) * th + tiles_x_ref[2]).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5

    z_ref[...] = jnp.full((th, tw), depth_clear, jnp.float32)
    slot_scr[...] = jnp.zeros((th, tw), jnp.int32)

    def body(i, _):
        base = pl.multiple_of(i * chunk, chunk)
        s = setup_ref[0, pl.ds(base, chunk), :]              # (chunk, 16)

        def coef(j):
            return s[:, j][:, None, None]                    # (chunk, 1, 1)

        l0 = coef(0) * px[None] + coef(1) * py[None] + coef(2)
        l1 = coef(3) * px[None] + coef(4) * py[None] + coef(5)
        l2 = 1.0 - l0 - l1
        z = coef(6) * px[None] + coef(7) * py[None] + coef(8)
        # 2D iota: Mosaic rejects the 1D-iota broadcast shape cast
        idxs = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
        live = (base + idxs) < count
        cover = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & live

        # chunk-axis min/argmin replaces a per-candidate select chain
        # (identical winner semantics: argmin takes the FIRST minimum, the
        # same tie-break as the sequential strict-less z test).  The loop
        # tracks ONLY z and the winning slot; the triangle id rides the
        # planes table as the final const and resolves in the epilogue
        # (Mosaic has no 3D gather for a per-pixel chunk-axis pick).
        zc = jnp.where(cover, depth_sign * z, jnp.inf)       # (chunk, th, tw)
        best = jnp.min(zc, axis=0)
        bk = jnp.argmin(zc, axis=0)                          # (th, tw)
        take = best < depth_sign * z_ref[...]
        z_ref[...] = jnp.where(take, depth_sign * best, z_ref[...])
        slot_scr[...] = jnp.where(take, base + bk, slot_scr[...])
        return 0

    jax.lax.fori_loop(0, pl.cdiv(count, chunk), body, 0)

    seg_used = [jnp.int32(s * 128) < count for s in range(cap_pad // 128)]
    _fused_epilogue(planesT_ref, mattab_ref, z_ref, id_ref, out_ref,
                    slot_scr, vals_scr, px, py, th=th, tw=tw, cap_pad=cap_pad,
                    depth_sign=depth_sign, n_ch=n_ch, n_const=n_const,
                    deriv_channels=deriv_channels, n_mrow=n_mrow,
                    m_pad=m_pad, transpose_in_kernel=transpose_in_kernel,
                    seg_used=seg_used)


def _fused_epilogue(planesT_ref, mattab_ref, z_ref, id_ref, out_ref,
                    slot_scr, vals_scr, px, py, *, th, tw, cap_pad,
                    depth_sign, n_ch, n_const, deriv_channels, n_mrow,
                    m_pad, transpose_in_kernel, seg_used=None):
    """Tile-local interpolation + material fetch over the winning slots.

    The per-winner plane values are gathered SEGMENT-major into `vals_scr`
    ((n_rows, th, tw) VMEM scratch): each 128-slot segment computes its
    lane index + membership mask ONCE for all plane rows (the old per-value
    sweep recomputed them ~33x), and `seg_used[s]` (scalar, derived from the
    bin counts) skips segments no candidate occupies — typical bench tiles
    fill ~50 of each sub-bin's 256 slots, so half the sweep is dead work."""
    slot = slot_scr[...]
    pt = planesT_ref[0]
    if transpose_in_kernel:
        # planes arrived row-major (cap_pad, P) straight from the XLA gather
        # (XLA transposes of gathered tables are pathological, PERF_NOTES.md
        # round 2) — transpose tile-locally in VMEM instead.  Branch on the
        # STATIC flag, never on shape: p_pad == cap_pad would silently
        # double-transpose (ADVICE r2).
        pt = pt.T

    n_rows = vals_scr.shape[0]
    for r in range(n_rows):
        vals_scr[r] = jnp.zeros((th, tw), jnp.float32)
    for s in range(cap_pad // 128):
        def seg_body(s=s):
            seg = pt[:, s * 128:(s + 1) * 128]              # (p_pad, 128)
            loc = jnp.clip(slot - s * 128, 0, 127)
            m = (slot >= s * 128) & (slot < (s + 1) * 128)
            for r in range(n_rows):
                seg2 = jnp.broadcast_to(seg[r][None, :], (th, tw))
                g = jnp.take_along_axis(seg2, loc, axis=1)
                vals_scr[r] = jnp.where(m, g, vals_scr[r])
        if seg_used is None:
            seg_body()
        else:
            pl.when(seg_used[s])(seg_body)

    def val_at(v):
        return vals_scr[v]

    d_a, d_b, d_c = val_at(0), val_at(1), val_at(2)
    den = d_a * px + d_b * py + d_c
    rcp = 1.0 / jnp.where(jnp.abs(den) < 1e-20, 1.0, den)

    ch_vals = []
    derivs = []
    for c in range(n_ch):
        a = val_at(3 + 3 * c)
        b = val_at(4 + 3 * c)
        cc = val_at(5 + 3 * c)
        val = (a * px + b * py + cc) * rcp
        ch_vals.append(val)
        if c in deriv_channels:
            derivs.append((a - val * d_a) * rcp)             # d(val)/dx
            derivs.append((b - val * d_b) * rcp)             # d(val)/dy
    consts = [val_at(3 + 3 * n_ch + k) for k in range(n_const)]
    # the FINAL const is always the original triangle id (appended by
    # rasterize_fused): resolve the id image here, -1 where nothing won
    hit = depth_sign * z_ref[...] < jnp.inf
    id_ref[...] = jnp.where(hit, consts[-1].astype(jnp.int32), -1)
    consts = consts[:-1]

    outs = ch_vals + derivs + consts
    if n_mrow:
        mid = consts[0].astype(jnp.int32)                    # const 0 = mat id
        for r in range(n_mrow):
            outs.append(_gather_table_cols(mattab_ref, r, mid, m_pad, th, tw))
    for i, o in enumerate(outs):
        out_ref[i] = o


def _fused_tile_kernel_sub(counts_ref,  # (num_tiles*(sub+1),) prefetch, flat
                           tiles_x_ref, setup_ref, planesT_ref, mattab_ref,
                           z_ref, id_ref, out_ref, slot_scr, vals_scr,
                           *, th: int, tw: int, sub: int, cap_sub: int,
                           big_cap: int, cap_pad: int, chunk: int,
                           depth_sign: float, depth_clear: float,
                           n_ch: int, n_const: int, deriv_channels: tuple,
                           n_mrow: int, m_pad: int,
                           transpose_in_kernel: bool):
    """_fused_tile_kernel with SUB-BINNED candidates: the candidate table's
    segment j (rows [j*cap_sub, (j+1)*cap_sub)) holds only triangles whose
    bbox intersects the tile's pixel rows [j*sbh, (j+1)*sbh), so the z-loop
    evaluates each small candidate on sbh*tw pixels instead of th*tw (3.5x
    less z-loop work measured on the 1080p bench scene, PERF_NOTES.md r4).
    The final segment (exact-bbox-filtered big triangles) evaluates on the
    full tile.  Winner semantics match the unsegmented kernel: submission
    order within a segment; every pixel sees smalls before bigs."""
    t = pl.program_id(0)
    tiles_x = tiles_x_ref[0]
    sbh = th // sub

    x0 = ((t % tiles_x) * tw + tiles_x_ref[1]).astype(jnp.float32)
    y0 = ((t // tiles_x) * th + tiles_x_ref[2]).astype(jnp.float32)
    px = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32) + 0.5
    py = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32) + 0.5

    z_ref[...] = jnp.full((th, tw), depth_clear, jnp.float32)
    slot_scr[...] = jnp.zeros((th, tw), jnp.int32)

    def seg_coords(r0, rh):
        # fresh (rh, tw) iotas per segment: SLICING the (th, tw) px/py
        # values crashes the Mosaic compiler (SIGABRT in window inference,
        # bisected round 4) — recomputing is also cheaper than a relayout
        pxs = x0 + jax.lax.broadcasted_iota(
            jnp.int32, (rh, tw), 1).astype(jnp.float32) + 0.5
        pys = y0 + jax.lax.broadcasted_iota(
            jnp.int32, (rh, tw), 0).astype(jnp.float32) + (r0 + 0.5)
        return pxs, pys

    def seg_loop(base, count, pxs, pys, r0, rh):
        """z-loop of one segment over pixel rows [r0, r0+rh)."""
        def body(i, _):
            off = pl.multiple_of(base + i * chunk, chunk)
            s = setup_ref[0, pl.ds(off, chunk), :]           # (chunk, 16)

            def coef(j):
                return s[:, j][:, None, None]

            l0 = coef(0) * pxs[None] + coef(1) * pys[None] + coef(2)
            l1 = coef(3) * pxs[None] + coef(4) * pys[None] + coef(5)
            l2 = 1.0 - l0 - l1
            z = coef(6) * pxs[None] + coef(7) * pys[None] + coef(8)
            idxs = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
            live = idxs < (count - i * chunk)
            cover = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & live
            zc = jnp.where(cover, depth_sign * z, jnp.inf)
            best = jnp.min(zc, axis=0)
            bk = jnp.argmin(zc, axis=0)
            zs = z_ref[r0:r0 + rh]
            take = best < depth_sign * zs
            z_ref[r0:r0 + rh] = jnp.where(take, depth_sign * best, zs)
            ss = slot_scr[r0:r0 + rh]
            slot_scr[r0:r0 + rh] = jnp.where(take, off + bk, ss)
            return 0

        jax.lax.fori_loop(0, pl.cdiv(count, chunk), body, 0)

    band_cnts = []
    for j in range(sub):
        cnt = jnp.minimum(counts_ref[t * (sub + 1) + j], cap_sub)
        band_cnts.append((j * cap_sub, cnt))
        pxs, pys = seg_coords(j * sbh, sbh)
        seg_loop(j * cap_sub, cnt, pxs, pys, j * sbh, sbh)
    cnt_b = jnp.minimum(counts_ref[t * (sub + 1) + sub], big_cap)
    band_cnts.append((sub * cap_sub, cnt_b))
    seg_loop(sub * cap_sub, cnt_b, px, py, 0, th)

    # a 128-slot segment is live iff some band's occupied prefix overlaps it
    seg_used = []
    for s in range(cap_pad // 128):
        live = None
        for start, cnt in band_cnts:
            hit = ((jnp.int32(start) < jnp.int32((s + 1) * 128))
                   & (jnp.int32(start) + cnt > jnp.int32(s * 128)))
            live = hit if live is None else (live | hit)
        seg_used.append(live)
    _fused_epilogue(planesT_ref, mattab_ref, z_ref, id_ref, out_ref,
                    slot_scr, vals_scr, px, py, th=th, tw=tw, cap_pad=cap_pad,
                    depth_sign=depth_sign, n_ch=n_ch, n_const=n_const,
                    deriv_channels=deriv_channels, n_mrow=n_mrow,
                    m_pad=m_pad, transpose_in_kernel=transpose_in_kernel,
                    seg_used=seg_used)


@functools.partial(jax.jit, static_argnames=(
    "th", "tw", "tiles_x", "n_ch", "n_const", "deriv_channels", "depth_less",
    "chunk", "transpose_in_kernel", "sub", "cap_sub", "big_cap"))
def raster_tiles_fused_pallas(setup: Array, planes: Array, candidates: Array,
                              counts: Array, mat_table: Optional[Array], *,
                              th: int, tw: int, tiles_x: int,
                              n_ch: int, n_const: int,
                              deriv_channels: tuple = (),
                              depth_less: bool = True, chunk: int = 8,
                              transpose_in_kernel: bool = False,
                              screen_offset=(0, 0),
                              sub: int = 0, cap_sub: int = 0,
                              big_cap: int = 0):
    """Fused visibility raster + attribute interpolation + material fetch.

    Args:
      setup: (T, 16) raster plane coefficients (raster._triangle_setup).
      planes: (T, P) attribute planes: [D(3), (A,B,C) per channel, consts]
        with P = 3*(n_ch+1) + n_const (raster._triangle_setup attrs path).
      candidates/counts: compact per-tile lists (raster._bin_triangles), OR —
        when sub > 0 — the segmented layout of raster._bin_triangles_sub
        (candidates (tiles, sub*cap_sub + big_cap), counts (tiles, sub+1)).
      mat_table: optional (n_mrow, M) material table transposed; const 0 must
        then be the per-triangle material id.
    Returns (z (H, W) f32, id (H, W) i32, out (OUT_CH, H, W) f32) with
    OUT_CH = n_ch + 2*len(deriv_channels) + n_const + n_mrow and
    H = (num_tiles // tiles_x) * th, W = tiles_x * tw — the kernel writes
    final image layouts directly (channel-FIRST for the channels).
    """
    num_tiles, cap = candidates.shape
    if setup.shape[1] < SETUP_ROWS:
        setup = jnp.pad(setup, ((0, 0), (0, SETUP_ROWS - setup.shape[1])))
    safe = jnp.maximum(candidates, 0)
    g_setup = setup[safe]                                    # (tiles, cap, 16)

    cap_pad = -(-cap // 128) * 128
    p = planes.shape[1]
    p_pad = -(-p // 8) * 8
    if transpose_in_kernel:
        # row-major gather only; the kernel transposes its tile's block in
        # VMEM (XLA transposes of gathered tables run at MB/s, PERF_NOTES.md)
        planes_p = jnp.pad(planes, ((0, 0), (0, p_pad - p)))
        cand_p = jnp.pad(safe, ((0, 0), (0, cap_pad - cap)))
        g_planes = planes_p[cand_p]                          # (tiles, capP, P)
    else:
        g_planes = planes[safe].transpose(0, 2, 1)           # (tiles, P, cap)
        g_planes = jnp.pad(g_planes,
                           ((0, 0), (0, p_pad - p), (0, cap_pad - cap)))

    if mat_table is not None:
        n_mrow, m = mat_table.shape
        m_pad = -(-m // 128) * 128
        mattab = jnp.pad(mat_table, ((0, 0), (0, m_pad - m)))
    else:
        n_mrow, m_pad = 0, 128
        mattab = jnp.zeros((8, m_pad), jnp.float32)

    import os
    if os.environ.get("DFX_VIS_STAGE") == "prep":
        # profiling bisect: binning + the kernel-input gathers, no kernel.
        # (env read at trace time — use a fresh process per setting)
        chk = (jnp.sum(g_setup) * 1e-12 + jnp.sum(g_planes) * 1e-12
               + jnp.sum(counts.astype(jnp.float32)))
        out_ch2 = n_ch + 2 * len(deriv_channels) + (n_const - 1) + n_mrow
        tiles_y2 = num_tiles // tiles_x
        hh, ww = tiles_y2 * th, tiles_x * tw
        return (jnp.broadcast_to(chk * 1e-20 + 0.5, (hh, ww)),
                jnp.broadcast_to((chk * 0).astype(jnp.int32) - 1, (hh, ww)),
                jnp.broadcast_to(chk * 1e-20, (out_ch2, hh, ww)))

    # the last const is the tri id consumed in-kernel, not emitted
    out_ch = n_ch + 2 * len(deriv_channels) + (n_const - 1) + n_mrow
    depth_clear = jnp.inf if depth_less else -jnp.inf
    if sub > 0:
        assert cap_sub % chunk == 0 and big_cap % chunk == 0, \
            "segment capacities must be chunk-aligned"
        assert cap == sub * cap_sub + big_cap, (cap, sub, cap_sub, big_cap)
        counts = counts.reshape(-1)   # Mosaic prefers flat scalar prefetch
        kernel = functools.partial(
            _fused_tile_kernel_sub, th=th, tw=tw, sub=sub, cap_sub=cap_sub,
            big_cap=big_cap, cap_pad=cap_pad, chunk=chunk,
            depth_sign=1.0 if depth_less else -1.0,
            depth_clear=float(depth_clear), n_ch=n_ch, n_const=n_const,
            deriv_channels=tuple(deriv_channels), n_mrow=n_mrow, m_pad=m_pad,
            transpose_in_kernel=transpose_in_kernel)
    else:
        kernel = functools.partial(
            _fused_tile_kernel, th=th, tw=tw, cap=cap, cap_pad=cap_pad,
            chunk=chunk, depth_sign=1.0 if depth_less else -1.0,
            depth_clear=float(depth_clear), n_ch=n_ch, n_const=n_const,
            deriv_channels=tuple(deriv_channels), n_mrow=n_mrow, m_pad=m_pad,
            transpose_in_kernel=transpose_in_kernel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, cap, SETUP_ROWS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, cap_pad, p_pad), lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM) if transpose_in_kernel
             else pl.BlockSpec((1, p_pad, cap_pad), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)),
            pl.BlockSpec(mattab.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # write each tile straight into its (row-block, col-block) slot
            # of the FINAL (H, W) / (C, H, W) images — no XLA untile exists
            # (the (C, tiles, th, tw) layout cost a measured 6.5 s relayout
            # at 1080p, PERF_NOTES.md)
            pl.BlockSpec((th, tw), lambda i, *_: (i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, *_: (i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_ch, th, tw),
                         lambda i, *_: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((th, tw), jnp.int32),
                        pltpu.VMEM((planes.shape[1], th, tw), jnp.float32)],
    )
    tiles_y = num_tiles // tiles_x
    z, tid, out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y * th, tiles_x * tw), jnp.float32),
            jax.ShapeDtypeStruct((tiles_y * th, tiles_x * tw), jnp.int32),
            jax.ShapeDtypeStruct((out_ch, tiles_y * th, tiles_x * tw),
                                 jnp.float32),
        ],
    )(counts, jnp.stack([jnp.int32(tiles_x),
                         jnp.asarray(screen_offset[0], jnp.int32),
                         jnp.asarray(screen_offset[1], jnp.int32)]),
      g_setup, g_planes, mattab)
    return z, tid, out


@functools.partial(jax.jit, static_argnames=("th", "tw", "tiles_x",
                                             "depth_less", "chunk"))
def raster_tiles_pallas(setup: Array, candidates: Array, counts: Array,
                        *, th: int, tw: int, tiles_x: int,
                        depth_less: bool = True, chunk: int = 8,
                        screen_offset=(0, 0)
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
    )(counts, jnp.stack([jnp.int32(tiles_x),
                         jnp.asarray(screen_offset[0], jnp.int32),
                         jnp.asarray(screen_offset[1], jnp.int32)]),
      gathered)
    return z, tid, b0, b1
