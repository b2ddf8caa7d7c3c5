"""Fused GTAO Pallas kernel — the whole horizon-slice integral in ONE kernel.

The SSAO pass's Pallas path previously issued slices x sides x steps (16 at
the bench config) separate windowed-warp launches (ops/warp_pallas.py), each
re-DMAing its own source window and paying XLA pad/offset-tiling/untile glue.
This kernel DMAs ONE depth window per tile and computes every horizon tap AND
the full XeGTAO arc integral in-kernel:

  * tap offsets are computed in-register from the analytic IGN noise
    (postfx/context.interleaved_gradient_noise formula) — no (K, H, W, 2)
    offset staging (the measured killer of the multi-tap warp kernel,
    PERF_NOTES.md round-2 negative results);
  * each tap's window-row sweep is bounded by that tap's maximum vertical
    reach (t_k^2 * max-radius-in-tile, a per-tile SCALAR), so near-field taps
    sweep ~10 rows instead of the full 40-row window;
  * the GTAO math (slice projection, horizon angles, cosine-weighted arc
    integral — PostProcess/ScreenSpaceAmbientOcclusion, XeGTAO formulation)
    runs on VMEM tiles; arccos is a Hastings polynomial (max err ~7e-5 rad).

Semantics match postfx/ssao.compute_gtao's `use_pallas=True` path (mip-0
taps, offsets clamped to the (±63, ±15) halo) — tests assert parity.
Reference: PostProcess/ScreenSpaceAmbientOcclusion/README.md (XeGTAO),
ScreenSpaceAmbientOcclusion.hpp:144-152.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_H = 32     # tall tiles amortize the halo: (32 + 2*16) window rows for
TILE_W = 128    # 32 output rows vs (8 + 32)/8 at the warp kernel's 8
PI = 3.141592653589793


def _row_gather(row: Array, xi: Array, win_w: int) -> Array:
    """row (win_w,) → per-pixel row[xi] for xi (TILE_H, TILE_W) via chunked
    take_along_axis (the Mosaic per-lane gather, range 128)."""
    out = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for c in range(win_w // TILE_W):
        seg = row[c * TILE_W:(c + 1) * TILE_W]
        seg2d = jnp.broadcast_to(seg[None, :], (TILE_H, TILE_W))
        local = jnp.clip(xi - c * TILE_W, 0, TILE_W - 1)
        g = jnp.take_along_axis(seg2d, local, axis=1)
        out = jnp.where((xi >= c * TILE_W) & (xi < (c + 1) * TILE_W), g, out)
    return out


def _acos(x: Array) -> Array:
    """Hastings arccos approximation (max err ~7e-5 rad) — Mosaic has no
    native arccos lowering."""
    ax = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 - 0.0187293 * ax)))
    return jnp.where(x >= 0.0, p, PI - p)


def _gtao_kernel(depth_hbm, dtile_ref, n_ref, sc_ref, out_ref, win, acc_scr,
                 sem,
                 *, num_slices: int, num_steps: int, tiles_x: int,
                 halo_r: int, halo_c: int, win_h: int, win_w: int,
                 hp: int, wp: int, wlog: int, fh: int):
    """sc_ref (SMEM, (1, 8)): [frame_index, radius, falloff_from,
    falloff_range, p00, p11, near, far]."""
    t = pl.program_id(0)
    ty = t // tiles_x
    tx = t % tiles_x
    y0 = ty * TILE_H
    x0 = tx * TILE_W

    ry = jnp.clip(y0 - halo_r, 0, hp - win_h)
    ry = pl.multiple_of((ry // TILE_H) * TILE_H, TILE_H)
    rx = jnp.clip(x0 - halo_c, 0, wp - win_w)
    rx = pl.multiple_of((rx // TILE_W) * TILE_W, TILE_W)
    cp = pltpu.make_async_copy(
        depth_hbm.at[pl.ds(ry, win_h), pl.ds(rx, win_w)], win, sem)
    cp.start()

    f_idx = sc_ref[0, 0]
    radius = sc_ref[0, 1]
    falloff_from = sc_ref[0, 2]
    falloff_range = sc_ref[0, 3]
    p00 = sc_ref[0, 4]
    p11 = sc_ref[0, 5]
    near = sc_ref[0, 6]
    far = sc_ref[0, 7]

    # global pixel coords
    py = (y0.astype(jnp.float32)
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32))
    px = (x0.astype(jnp.float32)
          + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32))
    xi = px + 0.5
    yi = py + 0.5

    def to_view_z(d):
        return near * far / jnp.maximum(far - d * (far - near), 1e-12)

    d_c = dtile_ref[0]
    view_z = to_view_z(d_c)
    # view-space position (x right, y up, -Z forward)
    x_ndc = xi / wlog * 2.0 - 1.0
    y_ndc = 1.0 - yi / fh * 2.0
    pos_x = x_ndc * view_z / p00
    pos_y = y_ndc * view_z / p11
    pos_z = -view_z
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(
        pos_x * pos_x + pos_y * pos_y + pos_z * pos_z, 1e-12))
    v_x = -pos_x * inv_len
    v_y = -pos_y * inv_len
    v_z = -pos_z * inv_len

    # IGN noise (context.interleaved_gradient_noise), global-coordinate keyed
    fo = 5.588238 * (f_idx - 64.0 * jnp.floor(f_idx / 64.0))
    nx = px + fo
    ny = py + fo
    m1 = 0.06711056 * nx + 0.00583715 * ny
    m1 = m1 - jnp.floor(m1)
    noise = 52.9829189 * m1
    noise = noise - jnp.floor(noise)

    radius_px = radius * p11 * (fh * 0.5) / jnp.maximum(view_z, 1e-4)
    radius_px = jnp.clip(radius_px, 2.0, float(max(fh, wlog)) * 0.25)
    # per-tile scalar bound for the tap row sweeps
    radmax = jnp.max(radius_px)

    n_x = n_ref[0]
    n_y = n_ref[1]
    n_z = n_ref[2]

    cx = float(max(halo_c - 1, 0))
    cy = float(max(halo_r - 1, 0))
    oyw = (y0 - ry).astype(jnp.float32)   # tile origin in window coords

    cp.wait()

    def tap(off_x, off_y, bound_rows):
        """Bilinear window tap at (pixel + offset).  The row sweep is a
        STATIC unrolled loop (Mosaic pipelines unrolled gathers; a traced
        fori_loop here measured ~2x slower end-to-end — same lesson as the
        round-2 multi-tap warp negative result) with each row's work gated
        by a per-tile SCALAR row-range predicate (the raster epilogue's
        live-segment pattern)."""
        # window-local source coords: (global px) - (window origin)
        sy = jnp.clip(py - ry.astype(jnp.float32) + off_y,
                      0.0, win_h - 1.0)
        sx = jnp.clip(px - rx.astype(jnp.float32) + off_x,
                      0.0, win_w - 1.0)
        yi0 = jnp.floor(sy).astype(jnp.int32)
        xi0 = jnp.floor(sx).astype(jnp.int32)
        fy = sy - yi0.astype(jnp.float32)
        fx = sx - xi0.astype(jnp.float32)
        xi1 = jnp.minimum(xi0 + 1, win_w - 1)

        rlo = jnp.maximum(jnp.floor(oyw - bound_rows).astype(jnp.int32), 0)
        rhi = jnp.minimum((oyw + TILE_H + bound_rows + 2.0).astype(jnp.int32),
                          win_h)

        acc_scr[...] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for r in range(win_h):
            def row_body(r=r):
                row = win[r]
                ga = _row_gather(row, xi0, win_w)
                gb = _row_gather(row, xi1, win_w)
                hval = ga + (gb - ga) * fx
                acc_scr[...] = (acc_scr[...]
                                + jnp.where(yi0 == r, hval * (1.0 - fy), 0.0)
                                + jnp.where(yi0 + 1 == r, hval * fy, 0.0))
            pl.when((jnp.int32(r) >= rlo) & (jnp.int32(r) < rhi))(row_body)
        return acc_scr[...]

    visibility = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    for s in range(num_slices):
        phi = (s + noise) * (PI / num_slices)
        cos_p = jnp.cos(phi)
        sin_p = jnp.sin(phi)
        # slice axis / projected normal (view space; screen y is -view y)
        # ortho = slice_dir - v (slice_dir . v); axis = norm(cross(ortho, v))
        sd_x, sd_y = cos_p, sin_p
        sdv = sd_x * v_x + sd_y * v_y                    # slice_dir . v
        o_x = sd_x - v_x * sdv
        o_y = sd_y - v_y * sdv
        o_z = -v_z * sdv
        a_x = o_y * v_z - o_z * v_y
        a_y = o_z * v_x - o_x * v_z
        a_z = o_x * v_y - o_y * v_x
        a_il = 1.0 / jnp.sqrt(jnp.maximum(
            a_x * a_x + a_y * a_y + a_z * a_z, 1e-12))
        a_x, a_y, a_z = a_x * a_il, a_y * a_il, a_z * a_il
        ndota = n_x * a_x + n_y * a_y + n_z * a_z
        np_x = n_x - a_x * ndota
        np_y = n_y - a_y * ndota
        np_z = n_z - a_z * ndota
        np_len = jnp.sqrt(jnp.maximum(
            np_x * np_x + np_y * np_y + np_z * np_z, 1e-8))
        cos_norm = jnp.clip(
            (np_x * v_x + np_y * v_y + np_z * v_z) / np_len, -1.0, 1.0)
        sgn_n = jnp.where(np_x * o_x + np_y * o_y + np_z * o_z >= 0.0,
                          1.0, -1.0)
        n_angle = _acos(cos_norm) * sgn_n

        best = [jnp.full((TILE_H, TILE_W), -1.0, jnp.float32),
                jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)]
        for side, sgn in ((0, 1.0), (1, -1.0)):
            for step in range(num_steps):
                tt = (step + 0.5 + 0.5 * noise) / num_steps
                tt = tt * tt
                off_x = jnp.clip(cos_p * (sgn * tt * radius_px), -cx, cx)
                off_y = jnp.clip(-sin_p * (sgn * tt * radius_px), -cy, cy)
                # scalar vertical reach of this tap for the row-sweep bound
                t_hi = float(((step + 1.0) / num_steps) ** 2)
                bound = jnp.minimum(t_hi * radmax, cy)
                d = tap(off_x, off_y, bound)
                su = (xi + off_x) / wlog
                sv = (yi + off_y) / fh
                zs = to_view_z(d)
                sp_x = (su * 2.0 - 1.0) * zs / p00
                sp_y = (1.0 - sv * 2.0) * zs / p11
                sp_z = -zs
                dx = sp_x - pos_x
                dy = sp_y - pos_y
                dz = sp_z - pos_z
                dist = jnp.sqrt(jnp.maximum(
                    dx * dx + dy * dy + dz * dz, 1e-10))
                cos_h = (dx * v_x + dy * v_y + dz * v_z) / dist
                wgt = jnp.clip(1.0 - (dist - falloff_from)
                               / jnp.maximum(falloff_range, 1e-5), 0.0, 1.0)
                cos_h = cos_h * wgt - (1.0 - wgt)
                best[side] = jnp.maximum(best[side], cos_h)

        # side 0 (+dir_px) is the +ortho half-plane → the positive horizon
        # h1 (see postfx/ssao.py compute_gtao, round-5 side/angle fix)
        h0 = -_acos(jnp.clip(best[1], -1.0, 1.0))
        h1 = _acos(jnp.clip(best[0], -1.0, 1.0))
        h0 = n_angle + jnp.maximum(h0 - n_angle, -PI / 2)
        h1 = n_angle + jnp.minimum(h1 - n_angle, PI / 2)
        cos_n = cos_norm                       # cos is even in the sign flip
        sin_n = sgn_n * jnp.sqrt(jnp.maximum(1.0 - cos_norm * cos_norm, 0.0))
        arc = (0.25 * (-jnp.cos(2.0 * h0 - n_angle) + cos_n
                       + 2.0 * h0 * sin_n)
               + 0.25 * (-jnp.cos(2.0 * h1 - n_angle) + cos_n
                         + 2.0 * h1 * sin_n))
        visibility = visibility + np_len * arc

    out_ref[...] = jnp.clip(visibility / num_slices, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("num_slices", "num_steps",
                                             "fh_log", "w_log"))
def gtao_pallas(depth: Array, normal_vs: Array, scalars: Array, *,
                num_slices: int, num_steps: int,
                fh_log: int = 0, w_log: int = 0) -> Array:
    """Fused GTAO: depth (H, W) NDC, normal_vs (H, W, 3) view-space,
    scalars (8,) f32 [frame_index, radius, falloff_from, falloff_range,
    p00, p11, near, far].  Returns (H, W) ambient visibility.

    Pads internally to the (8, 128) tile grid (edge mode — same tap
    semantics as the per-warp path) and crops."""
    h, w = depth.shape
    fh = fh_log or h
    wl = w_log or w
    ph, pw = (-h) % TILE_H, (-w) % TILE_W
    dp = jnp.pad(depth, ((0, ph), (0, pw)), mode="edge")
    np_ = jnp.pad(normal_vs, ((0, ph), (0, pw), (0, 0)), mode="edge")
    hp, wp = dp.shape
    halo_r, halo_c = 16, 64
    halo_r = min(halo_r, (hp - TILE_H) // 2 // 8 * 8)
    halo_c = min(halo_c, (wp - TILE_W) // 2 // 64 * 64)
    win_h = TILE_H + 2 * halo_r
    win_w = TILE_W + 2 * halo_c
    # the kernel rounds the window origin DOWN to a tile multiple; when the
    # halo is not a tile multiple that shift would eat the far-side halo, so
    # widen by one extra tile (same fix as warp_pallas win_w, ADVICE r1)
    if halo_r % TILE_H != 0 and win_h + TILE_H <= hp:
        win_h += TILE_H
    win_h = min(win_h, hp)
    if halo_c % TILE_W != 0 and win_w + TILE_W <= wp:
        win_w += TILE_W
    win_w = min(win_w, wp)
    tiles_x = wp // TILE_W
    tiles_y = hp // TILE_H

    n_cf = jnp.moveaxis(np_, -1, 0)                       # (3, hp, wp)
    sc = jnp.reshape(scalars.astype(jnp.float32), (1, 8))

    kernel = functools.partial(
        _gtao_kernel, num_slices=num_slices, num_steps=num_steps,
        tiles_x=tiles_x, halo_r=halo_r, halo_c=halo_c,
        win_h=win_h, win_w=win_w, hp=hp, wp=wp, wlog=wl, fh=fh)
    out = pl.pallas_call(
        kernel,
        grid=(tiles_x * tiles_y,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # depth (HBM)
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda i: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TILE_H, TILE_W),
                         lambda i: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, TILE_W),
                               lambda i: (i // tiles_x, i % tiles_x),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win_h, win_w), jnp.float32),
                        pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(dp, dp[None], n_cf, sc)
    return out[:h, :w]
