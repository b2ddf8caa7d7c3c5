"""TPU tile rasterizer → visibility buffer.

The reference delegates rasterization to the GPU API (draw calls through
IDeviceContext; SURVEY.md §2.6 item 5) — on TPU we implement it ourselves,
designed for the hardware rather than as a GPU-pipeline translation:

  1. **Vertex stage**: one batched fp32 matmul (MXU) transforms all vertices.
  2. **Triangle setup** (vectorized over triangles, VPU): screen mapping,
     backface/degenerate/near culling, barycentric-plane coefficients, and an
     affine depth plane per triangle.
  3. **Binning** (sort-middle): each triangle expands to at most
     `max_tiles_per_tri` (tile, tri) pairs — larger triangles go to a small
     "big list" appended to every tile's bin — the pairs are sorted by tile
     (XLA sort) and gathered into fixed-capacity per-tile candidate lists.
     Fixed capacities keep every shape static for XLA.
  4. **Per-tile raster**: a sequential scan over candidate chunks; each step
     evaluates barycentric planes for a chunk of triangles across all tiles'
     pixel blocks simultaneously (regular (tiles, K, th, tw) elementwise work
     that XLA tiles onto the VPU), z-tests, and updates the visibility buffer.

The output is a *visibility buffer* (depth, triangle id, screen barycentrics)
rather than shaded pixels: attribute interpolation and material shading then
run as perfectly regular data-parallel passes over the pixel grid
(see `interpolate`), which is where the TPU is fastest.  This replaces the
reference's per-draw forward pipeline (GLTF_PBR_Renderer.cpp:606-784) with a
two-phase visibility+shading design.

All functions are jit-compatible with static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.config import RasterizerConfig

Array = jax.Array

# f32 setup row per raster primitive (= near-clipped sub-triangle):
#  0-5  a,b,c planes of the sub-triangle's own λ0, λ1 (coverage test)
#  6-8  az,bz,cz depth plane
#  9-14 a,b,c planes of the ORIGINAL triangle's λ0, λ1 (stored barycentrics —
#       attribute interpolation always happens in the original triangle frame)
#  15   original triangle id (exact in f32 below 2^24)
_SETUP_DIM = 16


class VisibilityBuffer(NamedTuple):
    """Per-pixel visibility: the TPU analogue of the G-buffer's mesh-id +
    depth targets (HnFrameRenderTargets.hpp:42-52), plus barycentrics so any
    vertex attribute can be reconstructed later."""
    depth: Array      # (H, W) f32, NDC z; background = depth_clear
    tri_id: Array     # (H, W) int32, -1 = background
    bary: Array       # (H, W, 2) f32 screen-space λ0, λ1 (λ2 = 1-λ0-λ1)


class RasterStats(NamedTuple):
    max_bin_count: Array   # () int32 — max triangles binned into one tile
    bin_overflow: Array    # () int32 — pairs dropped due to bin_capacity
    big_overflow: Array    # () int32 — big triangles dropped
    num_culled: Array      # () int32 — triangles culled at setup


def clip_to_screen(clip: Array, width: int, height: int) -> Tuple[Array, Array, Array]:
    """Clip-space (V,4) → screen xy (V,2) (pixel units, y down, origin top-left),
    ndc z (V,), and 1/w (V,)."""
    w = clip[..., 3]
    winv = jnp.where(jnp.abs(w) > 1e-12, 1.0 / w, 0.0)
    ndc = clip[..., :3] * winv[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    return jnp.stack([sx, sy], axis=-1), ndc[..., 2], winv


def _clip_near_plane(clip: Array, indices: Array, eps: float,
                     clip_cap: Optional[int] = None,
                     corner_clip: Optional[Array] = None):
    """Near-plane (w = eps) polygon clipping with a COMPACTED expansion.

    Each input triangle yields up to two raster primitives (sub-triangles of
    its visible region).  Every sub-triangle corner carries its barycentric
    coordinates *in the original triangle*, so downstream attribute
    interpolation is unaffected by clipping.

    Only triangles actually crossing the near plane with two vertices inside
    produce a second sub-triangle — ~0 per frame in typical scenes — so the
    second slots are compacted into a small static overflow region instead of
    doubling every downstream array (setup, pair expansion, binning scatter
    and sort all scale with the primitive count; the old fixed 2x expansion
    was ~44% of the binning block's input for zero useful work).

    Returns (verts (T+C, 3, 4) clip positions with w >= eps,
             corner_bary (T+C, 3, 3), alive (T+C,), orig_id (T+C,) int32,
             clip_overflow () int32 — second sub-triangles dropped because
             more than C triangles straddled the near plane).
    """
    t = indices.shape[0]
    c = corner_clip if corner_clip is not None else clip[indices]  # (T, 3, 4)
    w = c[..., 3]
    inside = w > eps                                        # (T, 3)
    n_in = jnp.sum(inside.astype(jnp.int32), axis=-1)

    # Rotate vertex order so the pattern is canonical:
    #   n=3: any; n=2: the OUT vertex lands at position C;
    #   n=1: the IN vertex lands at position A.
    first_out = jnp.argmin(inside.astype(jnp.int32), axis=-1)
    first_in = jnp.argmax(inside.astype(jnp.int32), axis=-1)
    r = jnp.where(n_in == 3, 0,
                  jnp.where(n_in == 2, (first_out + 1) % 3, first_in))
    rot = jnp.stack([r, (r + 1) % 3, (r + 2) % 3], axis=-1)  # (T, 3)

    cr = jnp.take_along_axis(c, rot[..., None], axis=1)      # (T, 3, 4) rotated
    eye3 = jnp.eye(3, dtype=jnp.float32)
    br = eye3[rot]                                           # (T, 3, 3) orig bary rows

    a, b, cc = cr[:, 0], cr[:, 1], cr[:, 2]
    ba, bb, bc = br[:, 0], br[:, 1], br[:, 2]

    def isect(p, q, bp, bq):
        tt = (eps - p[:, 3]) / jnp.where(
            jnp.abs(q[:, 3] - p[:, 3]) < 1e-12, 1e-12, q[:, 3] - p[:, 3])
        tt = jnp.clip(tt, 0.0, 1.0)[:, None]
        return p + tt * (q - p), bp + tt * (bq - bp)

    i_ac, b_ac = isect(a, cc, ba, bc)
    i_bc, b_bc = isect(b, cc, bb, bc)
    i_ab, b_ab = isect(a, b, ba, bb)

    two = (n_in == 2)[:, None]
    one = (n_in == 1)[:, None]

    # slot 1: ALL → (A, B, C); TWO → (A, B, I_BC); ONE → (A, I_AB, I_AC)
    s1_v1 = jnp.where(one, i_ab, b)
    s1_b1 = jnp.where(one, b_ab, bb)
    s1_v2 = jnp.where(two, i_bc, jnp.where(one, i_ac, cc))
    s1_b2 = jnp.where(two, b_bc, jnp.where(one, b_ac, bc))
    slot1_v = jnp.stack([a, s1_v1, s1_v2], axis=1)
    slot1_b = jnp.stack([ba, s1_b1, s1_b2], axis=1)
    slot1_alive = n_in > 0

    # slot 2: TWO → (A, I_BC, I_AC), compacted into the overflow region
    slot2_v = jnp.stack([a, i_bc, i_ac], axis=1)
    slot2_b = jnp.stack([ba, b_bc, b_ac], axis=1)
    slot2_alive = n_in == 2

    cap = clip_cap if clip_cap is not None else min(max(64, t // 8), t)
    rank = jnp.cumsum(slot2_alive.astype(jnp.int32)) - 1
    slot = jnp.where(slot2_alive & (rank < cap), rank, cap)
    src = jnp.full((cap + 1,), -1, jnp.int32).at[slot].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop",
        unique_indices=True)[:cap]
    ok = src >= 0
    srcc = jnp.maximum(src, 0)

    verts = jnp.concatenate([slot1_v, slot2_v[srcc]], axis=0)  # (T+C, 3, 4)
    barys = jnp.concatenate([slot1_b, slot2_b[srcc]], axis=0)
    alive = jnp.concatenate([slot1_alive, ok], axis=0)
    orig = jnp.concatenate([jnp.arange(t, dtype=jnp.int32), srcc], axis=0)
    n2 = jnp.sum(slot2_alive.astype(jnp.int32))
    clip_ovf = jnp.maximum(n2 - cap, 0)
    return verts, barys, alive, orig, clip_ovf


def _fab_setup(chk, p: int, planes_dim: int, width: int, height: int,
               with_planes: bool):
    """Deterministic shape-compatible _triangle_setup outputs (profiling
    cut points INSIDE setup — bin_cut='clipped'/'planes0').  The fabricated
    bboxes/validity are identical across cut points so the downstream
    binning+kernel suffix contributes a constant offset and deltas between
    cuts attribute the setup stages."""
    iz = (chk * 0.0).astype(jnp.float32)
    ii = jnp.arange(p, dtype=jnp.float32)
    setup = jnp.broadcast_to((ii * 1e-3)[:, None] + iz, (p, _SETUP_DIM))
    valid = (jnp.arange(p) % 3 == 0) & (iz < 1.0)
    x0 = jnp.mod(ii * 13.7, max(width - 16, 1))
    y0 = jnp.mod(ii * 7.3, max(height - 16, 1))
    bbox = jnp.stack([x0 + iz, y0, x0 + 12.0, y0 + 9.0], axis=-1)
    orig = jnp.arange(p, dtype=jnp.int32)
    out = [setup, valid, bbox, orig]
    if with_planes:
        out.append(jnp.broadcast_to((ii * 1e-4)[:, None] + iz,
                                    (p, planes_dim)))
    out.append(iz.astype(jnp.int32))
    return tuple(out)


def _triangle_setup(clip: Array, indices: Array, width: int, height: int,
                    double_sided, front_ccw: bool, near_eps: float,
                    screen_size=None, screen_offset=(0, 0),
                    attrs: Optional[Array] = None,
                    winv_vert: Optional[Array] = None,
                    tri_consts: Optional[Array] = None,
                    cut: str = ""):
    """Near-clip + raster setup.

    screen_size/screen_offset support viewport bands for multi-chip tile
    sharding (parallel/tiling.py): NDC maps to the FULL screen_size, then
    shifts by screen_offset so rows [offset, offset+height) land locally.

    When `attrs` (V, C) + `winv_vert` (V,) are given, also returns per-raster-
    primitive attribute planes for the fused kernel: perspective-correct
    interpolation is N_c(x,y)/D(x,y) with N_c, D affine per triangle
    (N_c = Σ λs_j a_j w⁻¹_j, D = Σ λs_j w⁻¹_j; λs affine in screen space),
    laid out [D(3), (A,B,C) per channel, tri_consts (K)] → (P, 3*(C+1)+K),
    P = T + clip-overflow capacity (see _clip_near_plane).

    Returns (setup (P, 16) — see _SETUP_DIM, valid (P,),
             bbox (P, 4) [xmin,ymin,xmax,ymax], orig_id (P,)[, planes],
             clip_ovf ())."""
    # ONE per-corner vertex gather: gathers cost per row (PERF_NOTES.md), so
    # clip positions, 1/w, and the premultiplied attributes ride the same
    # (T, 3, 5+C) gather instead of three separate indices gathers
    if attrs is not None:
        aw_v = attrs * winv_vert[:, None]                    # (V, C)
        vdata = jnp.concatenate([clip, winv_vert[:, None], aw_v], axis=-1)
        vd = vdata[indices]                                  # (T, 3, 5+C)
        corner_clip = vd[..., :4]
        corner_attr = vd[..., 4:]                            # [w⁻¹, a·w⁻¹]
    else:
        corner_clip = clip[indices]
        corner_attr = None
    verts, barys, alive, orig, clip_ovf = _clip_near_plane(
        clip, indices, near_eps, corner_clip=corner_clip)
    t_in = indices.shape[0]
    orig2 = orig[t_in:]                   # overflow rows' original tri ids
    n_pl = (3 * (attrs.shape[1] + 1)
            + (tri_consts.shape[1] if tri_consts is not None else 0)
            ) if attrs is not None else 0
    if cut == "clipped":
        chk = jnp.sum(verts) * 1e-12 + jnp.sum(barys) * 1e-12
        if corner_attr is not None:
            chk = chk + jnp.sum(corner_attr) * 1e-12
        return _fab_setup(chk, verts.shape[0], n_pl, width, height,
                          attrs is not None)
    full_w, full_h = screen_size if screen_size is not None else (width, height)
    off_x, off_y = screen_offset

    w = verts[..., 3]
    winv = 1.0 / jnp.maximum(w, near_eps * 0.5)
    # GLOBAL screen coordinates — the viewport offset is NOT folded into the
    # plane setup (it would perturb every coefficient product and break
    # bit-exactness of band-sharded rendering vs the monolithic frame, which
    # SSR's binary march decisions then amplify).  The offset applies as an
    # exact integer pixel shift at evaluation time (kernels) and to the bbox
    # for binning below.
    sx = (verts[..., 0] * winv * 0.5 + 0.5) * full_w
    sy = (0.5 - verts[..., 1] * winv * 0.5) * full_h
    sz = verts[..., 2] * winv

    x0, y0 = sx[:, 0], sy[:, 0]
    x1, y1 = sx[:, 1], sy[:, 1]
    x2, y2 = sx[:, 2], sy[:, 2]

    # Signed "area" (cross z). In y-down screen coords a glTF CCW front face
    # (viewed in y-up NDC) has negative cross.
    d = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    front = (d < 0.0) if front_ccw else (d > 0.0)
    if double_sided is None:
        ds = jnp.zeros_like(front)
    else:
        ds2 = jnp.broadcast_to(jnp.asarray(double_sided, bool), (t_in,))
        ds = jnp.concatenate([ds2, ds2[orig2]])

    nondegenerate = jnp.abs(d) > 1e-12
    valid = alive & nondegenerate & (front | ds)

    dinv = jnp.where(nondegenerate, 1.0 / d, 0.0)
    # Sub-triangle's own barycentric planes: lambda_i(x, y) = a_i x + b_i y + c_i
    a0 = (y1 - y2) * dinv
    b0 = (x2 - x1) * dinv
    c0 = (x1 * y2 - x2 * y1) * dinv
    a1 = (y2 - y0) * dinv
    b1 = (x0 - x2) * dinv
    c1 = (x2 * y0 - x0 * y2) * dinv
    a2 = -(a0 + a1)
    b2 = -(b0 + b1)
    c2 = 1.0 - c0 - c1
    # Depth plane (affine in screen space)
    z0, z1, z2 = sz[:, 0], sz[:, 1], sz[:, 2]
    az = a0 * z0 + a1 * z1 + a2 * z2
    bz = b0 * z0 + b1 * z1 + b2 * z2
    cz = c0 * z0 + c1 * z1 + c2 * z2

    # Original-triangle barycentric planes.  The corner values of original
    # λ in SCREEN space are the perspective-mapped barys:
    #   λs_j(corner k) = bary[k, j] * w_orig_j / Σ_m bary[k, m] w_orig_m
    # — but since bary[k] are clip-space (linear-in-clip) weights and the
    # sub-corner's clip position is exactly Σ bary[k,m] * orig_vert_m, the
    # perspective-correct screen bary at corner k is
    #   λs_j = bary[k, j] * w_j / w_corner.
    w_orig = corner_clip[:, :, 3]                            # (T, 3)
    ow = jnp.concatenate([w_orig, w_orig[orig2]], axis=0)    # (P, 3) orig w
    num = barys * ow[:, None, :]                             # (2T, 3corner, 3j)
    lam_s = num / jnp.maximum(w[..., None], 1e-12)           # (2T, 3corner, 3j)

    def plane_from_values(v0, v1, v2):
        # affine plane through the 3 screen corners with given values
        aa = a0 * v0 + a1 * v1 + a2 * v2
        bb = b0 * v0 + b1 * v1 + b2 * v2
        ccv = c0 * v0 + c1 * v1 + c2 * v2
        return aa, bb, ccv

    ao0, bo0, co0 = plane_from_values(lam_s[:, 0, 0], lam_s[:, 1, 0], lam_s[:, 2, 0])
    ao1, bo1, co1 = plane_from_values(lam_s[:, 0, 1], lam_s[:, 1, 1], lam_s[:, 2, 1])

    setup = jnp.stack([a0, b0, c0, a1, b1, c1, az, bz, cz,
                       ao0, bo0, co0, ao1, bo1, co1,
                       orig.astype(jnp.float32)], axis=-1)

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    fox = jnp.asarray(off_x, jnp.float32)
    foy = jnp.asarray(off_y, jnp.float32)
    on_screen = ((xmax >= fox) & (xmin < fox + width)
                 & (ymax >= foy) & (ymin < foy + height))
    valid = valid & on_screen
    # bbox in LOCAL viewport coords for binning (exact integer shift)
    bbox = jnp.stack([xmin - fox, ymin - foy, xmax - fox, ymax - foy],
                     axis=-1)
    if attrs is None:
        return setup, valid, bbox, orig, clip_ovf

    if cut == "planes0":
        chk = jnp.sum(setup) * 1e-12 + jnp.sum(bbox) * 1e-12
        if corner_attr is not None:
            chk = chk + jnp.sum(corner_attr) * 1e-12
        return _fab_setup(chk, setup.shape[0], n_pl, width, height, True)

    # ---- attribute planes for the fused raster+shade kernel ---------------
    corner = corner_attr                                     # (T, 3, 1+C)
    corner2 = jnp.concatenate([corner, corner[orig2]], 0)    # (P, 3, 1+C)
    # value of N_c (and D at column 0) at each sub-triangle corner
    cv = jnp.einsum("tkj,tjc->tkc", lam_s, corner2,
                    precision=jax.lax.Precision.HIGHEST)     # (2T, 3, 1+C)
    pa = a0[:, None] * cv[:, 0] + a1[:, None] * cv[:, 1] + a2[:, None] * cv[:, 2]
    pb = b0[:, None] * cv[:, 0] + b1[:, None] * cv[:, 1] + b2[:, None] * cv[:, 2]
    pc = c0[:, None] * cv[:, 0] + c1[:, None] * cv[:, 1] + c2[:, None] * cv[:, 2]
    planes = jnp.stack([pa, pb, pc], axis=-1).reshape(pa.shape[0], -1)
    if tri_consts is not None:
        tc = jnp.concatenate([tri_consts, tri_consts[orig2]], axis=0)
        planes = jnp.concatenate([planes, tc], -1)
    return setup, valid, bbox, orig, planes, clip_ovf


def _bin_triangles(valid: Array, bbox: Array, width: int, height: int,
                   cfg: RasterizerConfig):
    """Sort-middle binning. Returns (candidates (num_tiles, total_cap) int32
    with -1 padding, stats-pieces)."""
    tiles_x = width // cfg.tile_w
    tiles_y = height // cfg.tile_h
    num_tiles = tiles_x * tiles_y
    t = valid.shape[0]

    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / cfg.tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(bbox[:, 1] / cfg.tile_h).astype(jnp.int32), 0, tiles_y - 1)
    tx1 = jnp.clip(jnp.floor(bbox[:, 2] / cfg.tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty1 = jnp.clip(jnp.floor(bbox[:, 3] / cfg.tile_h).astype(jnp.int32), 0, tiles_y - 1)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    n_cover = span_x * span_y

    is_small = valid & (n_cover <= cfg.max_tiles_per_tri)
    is_big = valid & (n_cover > cfg.max_tiles_per_tri)

    # --- small triangles: bounded pair expansion -------------------------
    k = jnp.arange(cfg.max_tiles_per_tri, dtype=jnp.int32)           # (K,)
    # k // span via float reciprocal (exact for k < K; see _bin_triangles_sub)
    inv_span = 1.0 / jnp.maximum(span_x[:, None], 1).astype(jnp.float32)
    ky = jnp.floor((k[None, :].astype(jnp.float32) + 0.5)
                   * inv_span).astype(jnp.int32)                     # (T, K)
    kx = k[None, :] - ky * jnp.maximum(span_x[:, None], 1)
    pair_tile = (ty0[:, None] + ky) * tiles_x + (tx0[:, None] + kx)  # (T, K)
    pair_valid = is_small[:, None] & (k[None, :] < n_cover[:, None])
    pair_tile = jnp.where(pair_valid, pair_tile, num_tiles)          # sentinel
    pair_tri = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[:, None], pair_tile.shape)

    flat_tile = pair_tile.reshape(-1)
    flat_tri = pair_tri.reshape(-1)
    # Stable sort by tile keeps triangle submission order within a tile —
    # the rasterizer's tie-break is then deterministic draw order.
    # When (tile, prim) packs into one int32, a single-key sort is ~2x
    # cheaper than argsort+gather (prim id in the low bits preserves
    # submission order within a tile, so stability is implied).
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    tri_bits = max(int(t).bit_length(), 1)
    if cfg.pair_compaction_cap > 0 and tile_bits + tri_bits <= 31:
        # Compact the valid pairs into a small buffer BEFORE sorting: the
        # (T, K) expansion is mostly sentinels (real pairs ≈ covered tiles,
        # typically « T*K), and XLA's TPU sort cost scales with element
        # count.  Exclusive cumsum gives each pair a unique, ordered slot,
        # so the scatter is parallel and the packed-key sort stays stable
        # (prim id in the low bits).
        cap = cfg.pair_compaction_cap
        n_small = jnp.where(is_small, n_cover, 0)
        off = (jnp.cumsum(n_small) - n_small).astype(jnp.int32)
        pos = off[:, None] + k[None, :]                          # (T, K)
        # invalid pairs get distinct out-of-range slots.  Base them past ANY
        # reachable valid position (valid pos < T*K): when total valid pairs
        # exceed cap, in-range-computed positions >= cap would otherwise
        # collide with oob slots — non-unique indices under
        # unique_indices=True is undefined behavior even with mode='drop'
        oob = (cap + t * cfg.max_tiles_per_tri
               + jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
               * cfg.max_tiles_per_tri + k[None, :])
        pos = jnp.where(pair_valid, pos, oob).reshape(-1)
        sentinel = jnp.int32(num_tiles << tri_bits)
        packed = (pair_tile << tri_bits) | pair_tri
        buf = jnp.full((cap,), sentinel, jnp.int32)
        buf = buf.at[pos].set(packed.reshape(-1), mode="drop",
                              unique_indices=True)
        packed = jnp.sort(buf)
        sorted_tile = packed >> tri_bits
        sorted_tri = packed & ((1 << tri_bits) - 1)
        counts = jax.ops.segment_sum(
            jnp.ones_like(sorted_tile), sorted_tile,
            num_segments=num_tiles + 1).astype(jnp.int32)[:num_tiles]
    else:
        if tile_bits + tri_bits <= 31:
            packed = (flat_tile << tri_bits) | flat_tri
            packed = jnp.sort(packed)
            sorted_tile = packed >> tri_bits
            sorted_tri = packed & ((1 << tri_bits) - 1)
        else:
            order = jnp.argsort(flat_tile, stable=True)
            sorted_tile = flat_tile[order]
            sorted_tri = flat_tri[order]
        counts = jax.ops.segment_sum(
            jnp.ones_like(flat_tile), flat_tile, num_segments=num_tiles + 1
        ).astype(jnp.int32)[:num_tiles]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    j = jnp.arange(cfg.bin_capacity, dtype=jnp.int32)
    gather_idx = starts[:, None] + j[None, :]                        # (tiles, cap)
    in_bin = j[None, :] < jnp.minimum(counts[:, None], cfg.bin_capacity)
    gather_idx = jnp.clip(gather_idx, 0, sorted_tri.shape[0] - 1)
    cand_small = jnp.where(in_bin, sorted_tri[gather_idx], -1)

    # --- big triangles: appended to every tile's bin ----------------------
    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1              # (T,)
    slot = jnp.where(is_big & (big_rank < cfg.big_tri_capacity), big_rank, cfg.big_tri_capacity)
    big_ids = jnp.zeros((cfg.big_tri_capacity + 1,), jnp.int32).at[slot].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    # Slots never written stay 0 — mask them with the actual big count.
    n_big = jnp.sum(is_big.astype(jnp.int32))
    big_valid = jnp.arange(cfg.big_tri_capacity, dtype=jnp.int32) < n_big
    big_list = jnp.where(big_valid, big_ids[:cfg.big_tri_capacity], -1)
    cand_big = jnp.broadcast_to(big_list[None, :], (num_tiles, cfg.big_tri_capacity))

    candidates = jnp.concatenate([cand_small, cand_big], axis=1)

    # Compact layout for the Pallas backend: big-list entries are scattered to
    # directly follow each tile's small candidates, so a per-tile trip count
    # of (count + n_big) covers everything with no -1 gap.
    small_counts = jnp.minimum(counts, cfg.bin_capacity)
    rows = jnp.broadcast_to(jnp.arange(num_tiles, dtype=jnp.int32)[:, None],
                            (num_tiles, cfg.big_tri_capacity))
    big_j = jnp.arange(cfg.big_tri_capacity, dtype=jnp.int32)
    cols = small_counts[:, None] + big_j[None, :]
    compact = jnp.where(in_bin, cand_small, -1)
    compact = jnp.concatenate(
        [compact, jnp.full((num_tiles, cfg.big_tri_capacity), -1, jnp.int32)], axis=1)
    compact = compact.at[rows, cols].set(
        jnp.broadcast_to(big_list[None, :], rows.shape), mode="drop")
    counts_total = small_counts + n_big

    max_count = jnp.max(counts)
    overflow = jnp.sum(jnp.maximum(counts - cfg.bin_capacity, 0))
    if cfg.pair_compaction_cap > 0 and tile_bits + tri_bits <= 31:
        total_pairs = jnp.sum(jnp.where(is_small, n_cover, 0))
        overflow = overflow + jnp.maximum(
            total_pairs - cfg.pair_compaction_cap, 0)
    big_overflow = jnp.maximum(n_big - cfg.big_tri_capacity, 0)
    return candidates, compact, counts_total, max_count, overflow, big_overflow


def _fabricate_bins(chk, num_tiles, sub, cap_sub, cfg):
    """Shape-compatible dummy _bin_triangles_sub outputs built from a traced
    checksum (profiling DFX_BIN_CUT path — keeps the prefix alive, lets XLA
    DCE the suffix)."""
    big_cap = cfg.big_tile_capacity or cfg.big_tri_capacity
    big_cap = -(-big_cap // cfg.chunk) * cfg.chunk
    ichk = (chk * 0.0).astype(jnp.int32)
    cand = jnp.broadcast_to(ichk - 1, (num_tiles, sub * cap_sub + big_cap))
    seg_counts = jnp.broadcast_to(ichk, (num_tiles, sub + 1))
    return cand, seg_counts, ichk, ichk, ichk


def _bin_triangles_sub(valid: Array, bbox: Array, width: int, height: int,
                       cfg: RasterizerConfig):
    """Sub-bin binning for the fused Pallas kernel (cfg.sub_bins > 1 or
    cfg.big_tile_capacity > 0).

    Small triangles bin at (tile_h / sub_bins, tile_w) granularity so the
    kernel's z-loop evaluates each candidate only on its sub-bin's pixel rows
    (the median triangle covers ~46 px; a full 32x128 tile evaluation wastes
    56x that — measured in PERF_NOTES.md round 4).  Big triangles bin by
    EXACT bbox overlap per kernel tile instead of broadcasting the global
    big list to every tile.

    Returns (cand (num_tiles, sub*cap_sub + big_cap) int32, row-compact per
    segment with -1 padding; seg_counts (num_tiles, sub+1) int32;
    max_count; overflow; big_overflow).  Candidate order within a segment is
    submission order (stable), and every pixel sees its small candidates
    before any big candidate — the same winner semantics as _bin_triangles.
    """
    sub = max(cfg.sub_bins, 1)
    bin_h = cfg.tile_h // sub
    cap_sub = cfg.bin_capacity // sub
    big_cap = cfg.big_tile_capacity or cfg.big_tri_capacity
    big_cap = -(-big_cap // cfg.chunk) * cfg.chunk   # chunk-aligned segment
    tiles_x = width // cfg.tile_w
    tiles_y = height // cfg.tile_h
    num_tiles = tiles_x * tiles_y
    bins_y = tiles_y * sub
    num_bins = bins_y * tiles_x
    t = valid.shape[0]

    import os
    _cut = cfg.bin_cut or os.environ.get("DFX_BIN_CUT", "")
    if _cut == "setup":
        # truncate BEFORE the pair expansion: isolates _triangle_setup (+
        # upstream vertex work) from the binning pipeline
        chk = (jnp.sum(bbox) * 1e-9
               + jnp.sum(valid.astype(jnp.float32)) * 1e-9)
        return _fabricate_bins(chk, num_tiles, sub, cap_sub, cfg)

    tx0 = jnp.clip(jnp.floor(bbox[:, 0] / cfg.tile_w).astype(jnp.int32), 0, tiles_x - 1)
    by0 = jnp.clip(jnp.floor(bbox[:, 1] / bin_h).astype(jnp.int32), 0, bins_y - 1)
    tx1 = jnp.clip(jnp.floor(bbox[:, 2] / cfg.tile_w).astype(jnp.int32), 0, tiles_x - 1)
    by1 = jnp.clip(jnp.floor(bbox[:, 3] / bin_h).astype(jnp.int32), 0, bins_y - 1)
    span_x = tx1 - tx0 + 1
    span_y = by1 - by0 + 1
    n_cover = span_x * span_y

    is_small = valid & (n_cover <= cfg.max_tiles_per_tri)
    is_big = valid & (n_cover > cfg.max_tiles_per_tri)

    k = jnp.arange(cfg.max_tiles_per_tri, dtype=jnp.int32)
    # k // span via float reciprocal: int32 division has no VPU hardware
    # path (XLA lowers it to a long sequence); (k+0.5)/span never lands
    # near an integer boundary for k < K, span <= K, so floor is exact
    inv_span = 1.0 / jnp.maximum(span_x[:, None], 1).astype(jnp.float32)
    ky = jnp.floor((k[None, :].astype(jnp.float32) + 0.5)
                   * inv_span).astype(jnp.int32)
    kx = k[None, :] - ky * jnp.maximum(span_x[:, None], 1)
    pair_bin = (by0[:, None] + ky) * tiles_x + (tx0[:, None] + kx)
    pair_valid = is_small[:, None] & (k[None, :] < n_cover[:, None])
    pair_bin = jnp.where(pair_valid, pair_bin, num_bins)
    pair_tri = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[:, None],
                                pair_bin.shape)

    bin_bits = max(int(num_bins + 1).bit_length(), 1)
    tri_bits = max(int(t).bit_length(), 1)
    assert bin_bits + tri_bits <= 31, (
        f"sub-binning needs bin+tri ids to pack into an int31 "
        f"({bin_bits}+{tri_bits}); lower sub_bins or split the raster")
    cap = cfg.pair_compaction_cap or t * cfg.max_tiles_per_tri
    n_small = jnp.where(is_small, n_cover, 0)
    off = (jnp.cumsum(n_small) - n_small).astype(jnp.int32)
    pos = off[:, None] + k[None, :]
    oob = (cap + t * cfg.max_tiles_per_tri
           + jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
           * cfg.max_tiles_per_tri + k[None, :])
    pos = jnp.where(pair_valid, pos, oob).reshape(-1)
    sentinel = jnp.int32(num_bins << tri_bits)
    packed = (pair_bin << tri_bits) | pair_tri
    if _cut == "pairs":
        chk = (jnp.sum(packed.astype(jnp.float32)) * 1e-9
               + jnp.sum(pos.astype(jnp.float32)) * 1e-9)
        return _fabricate_bins(chk, num_tiles, sub, cap_sub, cfg)
    if (cfg.skip_pair_compaction
            or os.environ.get("DFX_BIN_NOSCATTER", "0") == "1"):
        # A/B probe: sort the raw (P*K) pair array directly (invalid pairs
        # carry the sentinel bin and sort to the end) instead of compacting
        # into the small buffer first — the round-5 bisect measured the
        # compaction scatter at ~6 ms while the 131k sort was ~free
        buf = packed.reshape(-1)
    else:
        buf = jnp.full((cap,), sentinel, jnp.int32)
        buf = buf.at[pos].set(packed.reshape(-1), mode="drop",
                              unique_indices=True)
    if _cut == "scatter":
        chk = jnp.sum(buf.astype(jnp.float32)) * 1e-9
        return _fabricate_bins(chk, num_tiles, sub, cap_sub, cfg)
    packed = jnp.sort(buf)
    sorted_bin = packed >> tri_bits
    sorted_tri = packed & ((1 << tri_bits) - 1)
    if _cut == "sort":
        chk = jnp.sum(sorted_tri.astype(jnp.float32)) * 1e-9
        return _fabricate_bins(chk, num_tiles, sub, cap_sub, cfg)
    counts = jax.ops.segment_sum(
        jnp.ones_like(sorted_bin), sorted_bin,
        num_segments=num_bins + 1).astype(jnp.int32)[:num_bins]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    # Build the gather INDEX directly in the kernel-tile layout — tile t's
    # segment s slot j reads bin (ty*sub + s)*tiles_x + tx — so the gather
    # emits (num_tiles, sub*cap_sub) with NO transpose of gathered data
    # (the round-2 trap: XLA relayouts of gather outputs are pathological;
    # the (bins, cap)->tile-layout transpose here measured ~1/3 of the whole
    # binning-suffix block in the round-5 DFX_BIN_CUT bisect).  Index math is
    # iota-elementwise; starts/counts are tiny (num_bins,) tables.
    t_id = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, sub), 0)
    s_id = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, sub), 1)
    bin_id = ((t_id // tiles_x) * sub + s_id) * tiles_x + (t_id % tiles_x)
    seg_counts = jnp.minimum(counts[bin_id], cap_sub)        # (tiles, sub)
    starts_t = starts[bin_id]                                # tiny gathers
    j_id = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, sub, cap_sub), 2)
    gather_idx = jnp.clip(starts_t[:, :, None] + j_id, 0,
                          sorted_tri.shape[0] - 1)
    cand_small = jnp.where(j_id < seg_counts[:, :, None], sorted_tri[gather_idx],
                           -1).reshape(num_tiles, sub * cap_sub)

    # --- big triangles: exact per-tile bbox overlap ------------------------
    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    gslot = jnp.where(is_big & (big_rank < cfg.big_tri_capacity), big_rank,
                      cfg.big_tri_capacity)
    big_ids = jnp.full((cfg.big_tri_capacity + 1,), -1, jnp.int32).at[gslot].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")[:cfg.big_tri_capacity]
    n_big = jnp.sum(is_big.astype(jnp.int32))
    big_valid = jnp.arange(cfg.big_tri_capacity, dtype=jnp.int32) < n_big

    safe_big = jnp.maximum(big_ids, 0)
    btx0, bty0 = tx0[safe_big], by0[safe_big] // sub   # kernel-tile coords
    btx1, bty1 = tx1[safe_big], by1[safe_big] // sub
    tid2 = jnp.arange(num_tiles, dtype=jnp.int32)
    ttx = (tid2 % tiles_x)[:, None]
    tty = (tid2 // tiles_x)[:, None]
    ov = (big_valid[None, :] & (ttx >= btx0[None, :]) & (ttx <= btx1[None, :])
          & (tty >= bty0[None, :]) & (tty <= bty1[None, :]))  # (tiles, B)
    bpos = jnp.cumsum(ov.astype(jnp.int32), axis=1) - 1
    rows2 = jnp.broadcast_to(tid2[:, None], ov.shape)
    cand_big = jnp.full((num_tiles, big_cap + 1), -1, jnp.int32)
    cand_big = cand_big.at[rows2, jnp.where(ov, jnp.minimum(bpos, big_cap),
                                            big_cap)].set(
        jnp.broadcast_to(big_ids[None, :], ov.shape), mode="drop")[:, :big_cap]
    big_counts = jnp.minimum(jnp.sum(ov.astype(jnp.int32), axis=1), big_cap)

    cand = jnp.concatenate([cand_small, cand_big], axis=1)
    seg_counts = jnp.concatenate([seg_counts, big_counts[:, None]], axis=1)

    max_count = jnp.max(counts)
    overflow = jnp.sum(jnp.maximum(counts - cap_sub, 0))
    total_pairs = jnp.sum(jnp.where(is_small, n_cover, 0))
    overflow = overflow + jnp.maximum(total_pairs - cap, 0)
    big_overflow = (jnp.maximum(n_big - cfg.big_tri_capacity, 0)
                    + jnp.sum(jnp.maximum(
                        jnp.sum(ov.astype(jnp.int32), axis=1) - big_cap, 0)))
    return cand, seg_counts, max_count, overflow, big_overflow


def _raster_tiles(setup: Array, candidates: Array, width: int, height: int,
                  cfg: RasterizerConfig, depth_clear: float, depth_less: bool,
                  screen_offset=(0, 0)):
    """Scan over candidate chunks; per step rasterize K triangles into every
    tile's (th, tw) pixel block."""
    tiles_x = width // cfg.tile_w
    tiles_y = height // cfg.tile_h
    num_tiles = tiles_x * tiles_y
    th, tw = cfg.tile_h, cfg.tile_w
    total_cap = candidates.shape[1]
    chunk = min(cfg.chunk, total_cap)
    n_steps = -(-total_cap // chunk)
    pad = n_steps * chunk - total_cap
    if pad:
        candidates = jnp.pad(candidates, ((0, 0), (0, pad)), constant_values=-1)

    # Pixel-center coordinates of each tile's block, in GLOBAL screen coords
    # (integer viewport offset added before the float convert — exact, so a
    # band evaluates the identical f32 px/py as the monolithic frame).
    off_x = jnp.asarray(screen_offset[0], jnp.int32)
    off_y = jnp.asarray(screen_offset[1], jnp.int32)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_px0 = (tile_ids % tiles_x) * tw + off_x
    tile_py0 = (tile_ids // tiles_x) * th + off_y
    ly = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0) + 0.5
    lx = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1) + 0.5
    px = tile_px0[:, None, None].astype(jnp.float32) + lx[None]      # (tiles, th, tw)
    py = tile_py0[:, None, None].astype(jnp.float32) + ly[None]

    worse = jnp.float32(depth_clear)
    sign = 1.0 if depth_less else -1.0

    def step(state, cand_k):
        z_buf, id_buf, b0_buf, b1_buf = state
        ids = cand_k                                                  # (tiles, K)
        live = ids >= 0
        s = setup[jnp.maximum(ids, 0)]                                # (tiles, K, 16)

        def plane(ai, bi, ci):
            return (s[..., ai, None, None] * px[:, None] +
                    s[..., bi, None, None] * py[:, None] +
                    s[..., ci, None, None])                           # (tiles, K, th, tw)

        l0 = plane(0, 1, 2)
        l1 = plane(3, 4, 5)
        l2 = 1.0 - l0 - l1
        z = plane(6, 7, 8)
        cover = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & live[..., None, None]
        zc = jnp.where(cover, sign * z, jnp.inf)
        best_k = jnp.argmin(zc, axis=1)                               # (tiles, th, tw)
        best = jnp.min(zc, axis=1)
        take = best < sign * z_buf

        lo0 = plane(9, 10, 11)
        lo1 = plane(12, 13, 14)
        orig_ids = s[..., 15].astype(jnp.int32)                       # (tiles, K)

        gk = best_k[:, None]
        z_new = jnp.where(take, sign * best, z_buf)
        id_new = jnp.where(take, jnp.take_along_axis(
            jnp.broadcast_to(orig_ids[..., None, None], l0.shape), gk, axis=1
        )[:, 0], id_buf)
        b0_new = jnp.where(take, jnp.take_along_axis(lo0, gk, axis=1)[:, 0], b0_buf)
        b1_new = jnp.where(take, jnp.take_along_axis(lo1, gk, axis=1)[:, 0], b1_buf)
        return (z_new, id_new, b0_new, b1_new), None

    init = (
        jnp.full((num_tiles, th, tw), depth_clear, jnp.float32),
        jnp.full((num_tiles, th, tw), -1, jnp.int32),
        jnp.zeros((num_tiles, th, tw), jnp.float32),
        jnp.zeros((num_tiles, th, tw), jnp.float32),
    )
    cand_steps = candidates.reshape(num_tiles, n_steps, chunk).transpose(1, 0, 2)
    (z_buf, id_buf, b0_buf, b1_buf), _ = jax.lax.scan(step, init, cand_steps)

    def untile(x):
        c = x.reshape(tiles_y, tiles_x, th, tw).transpose(0, 2, 1, 3)
        return c.reshape(height, width)

    return untile(z_buf), untile(id_buf), untile(b0_buf), untile(b1_buf)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cfg", "front_ccw", "depth_less",
                     "backend"))
def rasterize(clip: Array, indices: Array, *, width: int, height: int,
              cfg: RasterizerConfig = RasterizerConfig(),
              double_sided: Optional[Array] = None,
              front_ccw: bool = True,
              depth_less: bool = True,
              near_eps: float = 1e-3,
              backend: str = "auto",
              screen_size=None,
              screen_offset=(0, 0)) -> Tuple[VisibilityBuffer, RasterStats]:
    """Rasterize triangles to a visibility buffer.

    Args:
      clip: (V, 4) clip-space vertex positions (row-vector pipeline output).
      indices: (T, 3) int32 triangle vertex indices.
      width, height: framebuffer size; must be multiples of the tile size.
      double_sided: optional (T,) bool — rasterize backfaces too.
      front_ccw: glTF/USD convention (counter-clockwise front faces).
      depth_less: True for standard z (near=0), False for reversed-z.
    """
    if width % cfg.tile_w or height % cfg.tile_h:
        raise ValueError(
            f"framebuffer {width}x{height} must be a multiple of the tile "
            f"size {cfg.tile_w}x{cfg.tile_h}; pad the viewport")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    depth_clear = jnp.inf if depth_less else -jnp.inf
    setup, valid, bbox, _orig, clip_ovf = _triangle_setup(
        clip, indices, width, height, double_sided, front_ccw, near_eps,
        screen_size=screen_size, screen_offset=screen_offset)
    candidates, compact, counts, max_count, overflow, big_overflow = _bin_triangles(
        valid, bbox, width, height, cfg)
    overflow = overflow + clip_ovf
    if backend == "pallas":
        from diligentfx_tpu.ops.raster_pallas import raster_tiles_pallas
        tiles_x = width // cfg.tile_w
        zt, idt, b0t, b1t = raster_tiles_pallas(
            setup, compact, counts, th=cfg.tile_h, tw=cfg.tile_w,
            tiles_x=tiles_x, depth_less=depth_less,
            screen_offset=screen_offset)
        tiles_y = height // cfg.tile_h

        def untile(x):
            c = x.reshape(tiles_y, tiles_x, cfg.tile_h, cfg.tile_w)
            return c.transpose(0, 2, 1, 3).reshape(height, width)

        z, tid, b0, b1 = untile(zt), untile(idt), untile(b0t), untile(b1t)
    else:
        z, tid, b0, b1 = _raster_tiles(
            setup, candidates, width, height, cfg, float(depth_clear),
            depth_less, screen_offset=screen_offset)
    vb = VisibilityBuffer(depth=z, tri_id=tid, bary=jnp.stack([b0, b1], axis=-1))
    stats = RasterStats(
        max_bin_count=max_count,
        bin_overflow=overflow,
        big_overflow=big_overflow,
        num_culled=jnp.sum((~valid).astype(jnp.int32)),
    )
    return vb, stats


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "cfg", "front_ccw", "depth_less",
                     "n_ch", "deriv_channels", "interpret"))
def rasterize_fused(clip: Array, indices: Array, attrs: Array, winv: Array,
                    tri_consts: Optional[Array], mat_table: Optional[Array],
                    *, width: int, height: int, cfg: RasterizerConfig,
                    n_ch: int, deriv_channels: tuple = (),
                    double_sided: Optional[Array] = None,
                    front_ccw: bool = True, depth_less: bool = True,
                    near_eps: float = 1e-3,
                    interpret: bool = False,
                    screen_size=None, screen_offset=(0, 0)
                    ) -> Tuple[VisibilityBuffer, Array, RasterStats]:
    """Fused rasterize + perspective-correct attribute interpolation +
    material-row fetch in one Pallas kernel (the round-2 gather killer,
    PERF_NOTES.md).  Replaces rasterize + interpolate_all + the per-pixel
    material-table gather of the deferred path.

    Args:
      attrs: (V, n_ch) packed per-vertex attributes.
      winv: (V,) 1/clip_w (0 for degenerate).
      tri_consts: optional (T, K) per-ORIGINAL-triangle constants (e.g.
        material id, node id); emitted per pixel after the channels/derivs.
      mat_table: optional (n_mrow, M) transposed material table; requires
        tri_consts[:, 0] == material id.
      deriv_channels: channel indices whose d/dx, d/dy are also emitted
        (between the channels and the constants in the output).
    Returns (vb, out (OUT_CH, H, W) channel-FIRST, stats) with OUT_CH =
      n_ch + 2*len(deriv_channels) + K + n_mrow; vb.bary is zeros (attributes
      are already interpolated — no downstream bary use).  Channel-first is
      deliberate: the kernel writes final (C, H, W) images directly and
      consumers stack the few channels they need — a channel-LAST output
      forced a multi-second XLA relayout (PERF_NOTES.md).
    """
    import os
    from diligentfx_tpu.ops.raster_pallas import raster_tiles_fused_pallas
    if width % cfg.tile_w or height % cfg.tile_h:
        raise ValueError(f"{width}x{height} not tile-aligned")
    # planes-table layout: gather row-major and transpose per tile in VMEM
    # (XLA transposes of gathered tables are pathological — PERF_NOTES.md);
    # DFX_FUSE_TK=0 reverts to the XLA-transpose prep for A/B measurement
    tk = os.environ.get("DFX_FUSE_TK", "1") == "1"
    setup, valid, bbox, _orig, planes, clip_ovf = _triangle_setup(
        clip, indices, width, height, double_sided, front_ccw, near_eps,
        screen_size=screen_size, screen_offset=screen_offset,
        attrs=attrs, winv_vert=winv, tri_consts=tri_consts,
        cut=cfg.bin_cut if cfg.bin_cut in ("clipped", "planes0") else "")
    # the original triangle id rides the planes table as one more const:
    # the kernel's z-loop then tracks only (z, slot) and the id resolves in
    # the epilogue with the other per-winner values
    planes = jnp.concatenate([planes, _orig[:, None].astype(jnp.float32)],
                             axis=-1)
    sub_kw = {}
    if cfg.sub_bins > 1 or cfg.big_tile_capacity > 0:
        compact, counts, max_count, overflow, big_overflow = \
            _bin_triangles_sub(valid, bbox, width, height, cfg)
        sub = max(cfg.sub_bins, 1)
        cap_sub = cfg.bin_capacity // sub
        sub_kw = dict(sub=sub, cap_sub=cap_sub,
                      big_cap=compact.shape[1] - sub * cap_sub)
    else:
        _, compact, counts, max_count, overflow, big_overflow = _bin_triangles(
            valid, bbox, width, height, cfg)
    overflow = overflow + clip_ovf
    tiles_x = width // cfg.tile_w
    tiles_y = height // cfg.tile_h
    n_const = (0 if tri_consts is None else tri_consts.shape[1]) + 1
    if os.environ.get("DFX_VIS_STAGE") == "bin":
        # profiling bisect (fresh process per setting): stop after triangle
        # setup + binning — downstream kernel/prep DCEs away, the checksum
        # keeps the binning+setup graph alive.  Frame output is garbage.
        chk = (jnp.sum(counts.astype(jnp.float32))
               + jnp.sum(compact.astype(jnp.float32)) * 1e-9
               + jnp.sum(setup) * 1e-12 + jnp.sum(planes) * 1e-12)
        out_ch = (n_ch + 2 * len(deriv_channels) + (n_const - 1)
                  + (mat_table.shape[0] if mat_table is not None else 0))
        z = jnp.broadcast_to(chk * 1e-20 + 0.5, (height, width))
        tid = jnp.broadcast_to((chk * 0).astype(jnp.int32) - 1,
                               (height, width))
        out = jnp.broadcast_to(chk * 1e-20, (out_ch, height, width))
        vb = VisibilityBuffer(depth=z, tri_id=tid,
                              bary=jnp.zeros((height, width, 2), jnp.float32))
        stats = RasterStats(max_bin_count=max_count, bin_overflow=overflow,
                            big_overflow=big_overflow,
                            num_culled=jnp.sum((~valid).astype(jnp.int32)))
        return vb, out, stats
    fn = raster_tiles_fused_pallas
    if interpret:
        import jax.experimental.pallas as _pl
        orig_call = _pl.pallas_call
        _pl.pallas_call = functools.partial(orig_call, interpret=True)
        try:
            zt, idt, outt = fn(setup, planes, compact, counts, mat_table,
                               th=cfg.tile_h, tw=cfg.tile_w, tiles_x=tiles_x,
                               n_ch=n_ch, n_const=n_const,
                               deriv_channels=deriv_channels,
                               depth_less=depth_less, chunk=cfg.chunk,
                               transpose_in_kernel=tk,
                               screen_offset=screen_offset, **sub_kw)
        finally:
            _pl.pallas_call = orig_call
    else:
        zt, idt, outt = fn(setup, planes, compact, counts, mat_table,
                           th=cfg.tile_h, tw=cfg.tile_w, tiles_x=tiles_x,
                           n_ch=n_ch, n_const=n_const,
                           deriv_channels=deriv_channels,
                           depth_less=depth_less, chunk=cfg.chunk,
                           transpose_in_kernel=tk,
                           screen_offset=screen_offset, **sub_kw)

    # kernel outputs are already final (H, W) / (C, H, W) images
    z, tid, out = zt, idt, outt
    vb = VisibilityBuffer(depth=z, tri_id=tid,
                          bary=jnp.zeros((height, width, 2), jnp.float32))
    stats = RasterStats(max_bin_count=max_count, bin_overflow=overflow,
                        big_overflow=big_overflow,
                        num_culled=jnp.sum((~valid).astype(jnp.int32)))
    return vb, out, stats


# ---------------------------------------------------------------------------
# Attribute interpolation (the deferred half of the visibility buffer design)
# ---------------------------------------------------------------------------


def perspective_bary(vb: VisibilityBuffer, indices: Array, winv: Array) -> Array:
    """Screen-space λ → perspective-correct λ, (H, W, 3)."""
    tid = jnp.maximum(vb.tri_id, 0)
    vidx = indices[tid]                                   # (H, W, 3)
    wi = winv[vidx]                                       # (H, W, 3)
    l0 = vb.bary[..., 0]
    l1 = vb.bary[..., 1]
    l2 = 1.0 - l0 - l1
    lam = jnp.stack([l0, l1, l2], axis=-1)
    num = lam * wi
    den = jnp.sum(num, axis=-1, keepdims=True)
    return num / jnp.where(jnp.abs(den) < 1e-20, 1.0, den)


def interpolate(vb: VisibilityBuffer, indices: Array, attr: Array,
                pbary: Array, background=0.0) -> Array:
    """Perspective-correct interpolation of a per-vertex attribute.

    Args:
      attr: (V, C) per-vertex values.
      pbary: (H, W, 3) from `perspective_bary`.
    Returns (H, W, C).
    """
    tid = jnp.maximum(vb.tri_id, 0)
    vidx = indices[tid]                                   # (H, W, 3)
    a = attr[vidx]                                        # (H, W, 3, C)
    out = jnp.sum(a * pbary[..., None], axis=-2)
    return jnp.where((vb.tri_id >= 0)[..., None], out, background)


def interpolate_all(vb: VisibilityBuffer, indices: Array, attrs: Array,
                    winv: Array, background=0.0) -> Array:
    """Single-gather perspective-correct interpolation of a packed per-vertex
    attribute matrix (V, C) → (H, W, C).

    Fuses what would be one gather per attribute (pos, normal, uv, ...) plus
    the 1/w gather of `perspective_bary` into ONE vertex-data gather — the
    dominant cost of the deferred-interpolation pass on TPU is gather traffic,
    not arithmetic."""
    tid = jnp.maximum(vb.tri_id, 0)
    vidx = indices[tid]                                     # (H, W, 3)
    packed = jnp.concatenate([attrs, winv[:, None]], axis=-1)[vidx]  # (H,W,3,C+1)
    wi = packed[..., -1]                                    # (H, W, 3)
    l0 = vb.bary[..., 0]
    l1 = vb.bary[..., 1]
    lam = jnp.stack([l0, l1, 1.0 - l0 - l1], axis=-1)
    num = lam * wi
    den = jnp.sum(num, axis=-1, keepdims=True)
    pb = num / jnp.where(jnp.abs(den) < 1e-20, 1.0, den)
    out = jnp.sum(packed[..., :-1] * pb[..., None], axis=-2)
    return jnp.where((vb.tri_id >= 0)[..., None], out, background)


def interpolate_with_derivs(vb: VisibilityBuffer, indices: Array, attr: Array,
                            setup_bary: Array, winv: Array):
    """Interpolate + analytic screen-space derivatives (∂/∂x, ∂/∂y).

    Replaces the GPU's quad-based ddx/ddy (used for mip selection,
    RenderPBR.psh:115-116) with exact per-triangle derivatives: screen λ is
    affine per triangle, so d(λ)/dpixel is the per-triangle plane coefficient;
    perspective-corrected u = Σλᵢwᵢuᵢ / Σλᵢwᵢ differentiates by quotient rule.

    Args:
      attr: (V, C); setup_bary: (T, 6) = per-tri (a0,b0,c0,a1,b1,c1);
      winv: (V,) 1/w_clip.
    Returns (value, ddx, ddy) each (H, W, C).
    """
    tid = jnp.maximum(vb.tri_id, 0)
    vidx = indices[tid]                                   # (H, W, 3)
    wi = winv[vidx]                                       # (H, W, 3)
    av = attr[vidx]                                       # (H, W, 3, C)
    s = setup_bary[tid]                                   # (H, W, 6)

    l0 = vb.bary[..., 0]
    l1 = vb.bary[..., 1]
    lam = jnp.stack([l0, l1, 1.0 - l0 - l1], axis=-1)     # (H, W, 3)
    dldx = jnp.stack([s[..., 0], s[..., 3], -(s[..., 0] + s[..., 3])], axis=-1)
    dldy = jnp.stack([s[..., 1], s[..., 4], -(s[..., 1] + s[..., 4])], axis=-1)

    g = lam * wi                                          # (H, W, 3)
    den = jnp.sum(g, axis=-1, keepdims=True)
    den = jnp.where(jnp.abs(den) < 1e-20, 1.0, den)
    num = jnp.sum(g[..., None] * av, axis=-2)             # (H, W, C)
    val = num / den

    dgx = dldx * wi
    dgy = dldy * wi
    dnum_x = jnp.sum(dgx[..., None] * av, axis=-2)
    dnum_y = jnp.sum(dgy[..., None] * av, axis=-2)
    dden_x = jnp.sum(dgx, axis=-1, keepdims=True)
    dden_y = jnp.sum(dgy, axis=-1, keepdims=True)
    ddx = (dnum_x - val * dden_x) / den
    ddy = (dnum_y - val * dden_y) / den

    mask = (vb.tri_id >= 0)[..., None]
    zero = jnp.zeros_like(val)
    return (jnp.where(mask, val, zero), jnp.where(mask, ddx, zero),
            jnp.where(mask, ddy, zero))


def bary_setup_from_clip(clip: Array, indices: Array, width: int, height: int) -> Array:
    """Recompute the (T, 6) barycentric plane coefficients (for derivative
    interpolation) from clip positions — cheap, avoids threading raster
    internals through the API."""
    screen, _, _ = clip_to_screen(clip, width, height)
    p0, p1, p2 = (screen[indices[:, k]] for k in range(3))
    x0, y0 = p0[:, 0], p0[:, 1]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    d = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    dinv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 0.0)
    return jnp.stack([
        (y1 - y2) * dinv, (x2 - x1) * dinv, (x1 * y2 - x2 * y1) * dinv,
        (y2 - y0) * dinv, (x0 - x2) * dinv, (x2 * y0 - x0 * y2) * dinv,
    ], axis=-1)


def pad_viewport(width: int, height: int, cfg: RasterizerConfig) -> Tuple[int, int]:
    """Round a viewport up to the tile grid (render padded, crop after)."""
    w = -(-width // cfg.tile_w) * cfg.tile_w
    h = -(-height // cfg.tile_h) * cfg.tile_h
    return w, h
