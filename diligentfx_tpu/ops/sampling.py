"""Texture sampling on TPU: gather-based filtering.

Replaces the GPU sampler objects of the reference (immutable samplers in
PBR_Renderer::CreateInfo, PBR_Renderer.hpp:255-288) with explicit gather +
arithmetic.  Wrap modes match Diligent's TEXTURE_ADDRESS_* semantics.

Environment maps use an **octahedral** parametrization instead of the
reference's cubemaps (PBR_Renderer.hpp:477-480): a single square texture with
near-uniform solid-angle distribution and branch-free direction mapping —
the TPU-idiomatic replacement for 6-face cube sampling (no per-face control
flow, plain 2D gathers that XLA tiles well).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

WRAP_REPEAT = 0
WRAP_MIRROR = 1
WRAP_CLAMP = 2


def _apply_wrap(coord: Array, size: int, wrap: int) -> Array:
    if wrap == WRAP_REPEAT:
        return jnp.mod(coord, size)
    if wrap == WRAP_MIRROR:
        period = 2 * size
        m = jnp.mod(coord, period)
        return jnp.where(m < size, m, period - 1 - m)
    return jnp.clip(coord, 0, size - 1)


def point_sample(img: Array, uv: Array, wrap_u: int = WRAP_CLAMP,
                 wrap_v: int = WRAP_CLAMP) -> Array:
    """Nearest sample. img (H, W, C), uv (..., 2) in [0,1] → (..., C)."""
    h, w = img.shape[0], img.shape[1]
    x = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    y = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    x = _apply_wrap(x, w, wrap_u)
    y = _apply_wrap(y, h, wrap_v)
    return img[y, x]


def bilinear_sample(img: Array, uv: Array, wrap_u: int = WRAP_CLAMP,
                    wrap_v: int = WRAP_CLAMP) -> Array:
    """Bilinear sample. img (H, W, C), uv (..., 2) in [0,1] → (..., C)."""
    h, w = img.shape[0], img.shape[1]
    fx = uv[..., 0] * w - 0.5
    fy = uv[..., 1] * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0w = _apply_wrap(x0, w, wrap_u)
    x1w = _apply_wrap(x0 + 1, w, wrap_u)
    y0w = _apply_wrap(y0, h, wrap_v)
    y1w = _apply_wrap(y0 + 1, h, wrap_v)
    c00 = img[y0w, x0w]
    c10 = img[y0w, x1w]
    c01 = img[y1w, x0w]
    c11 = img[y1w, x1w]
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def sample_mip_trilinear(mips: Sequence[Array], uv: Array, lod: Array,
                         wrap_u: int = WRAP_CLAMP, wrap_v: int = WRAP_CLAMP) -> Array:
    """Trilinear sample from an explicit mip chain (list of (Hi, Wi, C)).

    lod (...,): fractional mip level, clamped to the chain.  Implemented as a
    static sum over mip levels with per-pixel weights — every level is sampled
    (XLA-friendly, no data-dependent indexing into a ragged structure); cost
    is bounded by the (small, static) mip count.
    """
    n = len(mips)
    lod = jnp.clip(lod, 0.0, n - 1)
    lo = jnp.floor(lod)
    frac = lod - lo
    out = None
    for i, mip in enumerate(mips):
        # weight of level i in the trilinear blend
        w_i = jnp.where(lo == i, 1.0 - frac, jnp.where(lo == i - 1, frac, 0.0))
        if i == n - 1:
            w_i = jnp.where(lo >= n - 1, 1.0, w_i)
        s = bilinear_sample(mip, uv, wrap_u, wrap_v)
        term = s * w_i[..., None]
        out = term if out is None else out + term
    return out


def compute_texture_lod(ddx_uv: Array, ddy_uv: Array, width: int, height: int,
                        bias: float = 0.0) -> Array:
    """GPU-style mip selection from analytic UV derivatives (replaces
    ddx/ddy at RenderPBR.psh:115-116). Returns (...,)."""
    dx = ddx_uv * jnp.array([width, height], jnp.float32)
    dy = ddy_uv * jnp.array([width, height], jnp.float32)
    rho2 = jnp.maximum(jnp.sum(dx * dx, axis=-1), jnp.sum(dy * dy, axis=-1))
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12)) + bias


# ---------------------------------------------------------------------------
# Octahedral environment mapping
# ---------------------------------------------------------------------------


def dir_to_oct_uv(d: Array) -> Array:
    """Unit direction (..., 3) → octahedral uv in [0,1]² (y-up world)."""
    n = d / jnp.maximum(jnp.sum(jnp.abs(d), axis=-1, keepdims=True), 1e-12)
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    # Project upper hemisphere to the inner diamond, lower folds outward.
    u = x
    v = z
    lower = y < 0.0
    uf = (1.0 - jnp.abs(v)) * jnp.sign(u + 1e-20)
    vf = (1.0 - jnp.abs(u)) * jnp.sign(v + 1e-20)
    u = jnp.where(lower, uf, u)
    v = jnp.where(lower, vf, v)
    return jnp.stack([u, v], axis=-1) * 0.5 + 0.5


def oct_uv_to_dir(uv: Array) -> Array:
    """Octahedral uv in [0,1]² → unit direction (..., 3)."""
    f = uv * 2.0 - 1.0
    u, v = f[..., 0], f[..., 1]
    y = 1.0 - jnp.abs(u) - jnp.abs(v)
    lower = y < 0.0
    uu = jnp.where(lower, (1.0 - jnp.abs(v)) * jnp.sign(u + 1e-20), u)
    vv = jnp.where(lower, (1.0 - jnp.abs(u)) * jnp.sign(v + 1e-20), v)
    d = jnp.stack([uu, y, vv], axis=-1)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def oct_pixel_dirs(res: int) -> Array:
    """(res, res, 3) unit directions at octahedral texel centers."""
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    u, v = jnp.meshgrid(t, t, indexing="xy")
    return oct_uv_to_dir(jnp.stack([u, v], axis=-1))


def oct_solid_angles(res: int) -> Array:
    """(res, res) approximate solid angle per octahedral texel (sums to 4π)."""
    d = oct_pixel_dirs(res)
    # |d|_1-normalized mapping: the Jacobian of oct→sphere ∝ 1/|p|^3 where
    # p is the pre-normalization octahedron point.  Compute numerically from
    # the L1 norm before normalization.
    t = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    u, v = jnp.meshgrid(t * 2 - 1, t * 2 - 1, indexing="xy")
    y = 1.0 - jnp.abs(u) - jnp.abs(v)
    lower = y < 0
    uu = jnp.where(lower, (1.0 - jnp.abs(v)) * jnp.sign(u + 1e-20), u)
    vv = jnp.where(lower, (1.0 - jnp.abs(u)) * jnp.sign(v + 1e-20), v)
    p = jnp.stack([uu, y, vv], axis=-1)
    r = jnp.linalg.norm(p, axis=-1)
    w = 1.0 / jnp.maximum(r, 1e-9) ** 3
    area = (2.0 / res) * (2.0 / res) * 2.0  # octahedron total L1 area factor
    w = w * area
    # normalize exactly to 4π
    return w * (4.0 * jnp.pi / jnp.sum(w))


def sample_env_oct(mips: Sequence[Array], direction: Array, lod: Array) -> Array:
    """Sample an octahedral environment mip chain by direction (..., 3)."""
    uv = dir_to_oct_uv(direction)
    return sample_mip_trilinear(mips, uv, lod, WRAP_CLAMP, WRAP_CLAMP)


def sh9_basis(d: Array) -> Array:
    """(..., 3) dirs → (..., 9) real spherical-harmonic basis values (l ≤ 2)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        jnp.full_like(x, 0.282095),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], axis=-1)


def flatten_mip_pyramid(mips: Sequence[Array]):
    """Pack a square mip chain into one flat (P, C) array + (L,) offset/size
    metadata, enabling O(2-level) trilinear sampling with dynamic level
    selection (`sample_oct_pyramid`) instead of sampling every level."""
    flat = jnp.concatenate([m.reshape(-1, m.shape[-1]) for m in mips], axis=0)
    sizes = jnp.array([m.shape[0] for m in mips], jnp.int32)
    offsets = jnp.array(
        [0] + list(jnp.cumsum(jnp.array([m.shape[0] * m.shape[1] for m in mips]))[:-1]),
        jnp.int32)
    return flat, offsets, sizes


def _pyramid_bilinear(flat: Array, offsets: Array, sizes: Array,
                      level: Array, uv: Array) -> Array:
    """Bilinear tap at a (per-pixel dynamic) mip level of a flattened square
    pyramid.  level (...,) int32, uv (..., 2) in [0,1]."""
    n = sizes[level]                                       # (...,)
    off = offsets[level]
    nf = n.astype(jnp.float32)
    fx = uv[..., 0] * nf - 0.5
    fy = uv[..., 1] * nf - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0.astype(jnp.float32))[..., None]
    ty = (fy - y0.astype(jnp.float32))[..., None]
    x0c = jnp.clip(x0, 0, n - 1)
    x1c = jnp.clip(x0 + 1, 0, n - 1)
    y0c = jnp.clip(y0, 0, n - 1)
    y1c = jnp.clip(y0 + 1, 0, n - 1)
    c00 = flat[off + y0c * n + x0c]
    c10 = flat[off + y0c * n + x1c]
    c01 = flat[off + y1c * n + x0c]
    c11 = flat[off + y1c * n + x1c]
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def build_packed_pyramid(mips: Sequence[Array]) -> Array:
    """Pack a square mip chain into a gather-FOOTPRINT table: one row per
    texel of levels 0..L-2 holding that texel's clamped fine 2×2 bilinear
    footprint (12 floats) plus the 3×3 coarse window at level l+1 centered
    at the texel's coarse-grid image (27 floats) — every texel a trilinear
    sample with x0=floor(u·n-0.5)=x can touch.  One row gather then yields
    a FULL trilinear sample (`sample_pyramid_packed`): gathers cost by ROWS
    on this TPU, not row width (PERF_NOTES.md), so this is 8× fewer gathers
    than the 2-tap flattened-pyramid path and strictly higher quality than
    the round-3 nearest-mip fast path it replaces.

    Levels may HALVE or REPEAT their size (prefilter_env_ggx_oct clamps at
    4×4 but keeps emitting roughness levels): the coarse window center is
    (y//2, x//2) for a halving step and (y, x) for a same-size step.

    Returns (R, 40) f32 with R = Σ_{l<L-1} n_l² (rows in level-major,
    row-major texel order; the 40th column is alignment padding)."""
    packs = []
    for lvl in range(max(len(mips) - 1, 1)):
        img = mips[lvl]
        coarse = mips[lvl + 1] if lvl + 1 < len(mips) else mips[lvl]
        n = img.shape[0]
        halving = coarse.shape[0] != n
        # exact same-size or exact-half steps only: the sampling math
        # (fx*0.5-0.25 / x0p>>1) assumes 2x halving, and an odd-n floor-half
        # chain would die later in a shape error (ADVICE r4)
        assert coarse.shape[0] == n or coarse.shape[0] * 2 == n, \
            f"mip step must be same-size or exact half, got {n}->{coarse.shape[0]}"

        def shift(a, dy, dx):
            # clamp-to-edge shift: out[y, x] = a[clip(y+dy), clip(x+dx)]
            ys = jnp.clip(jnp.arange(a.shape[0]) + dy, 0, a.shape[0] - 1)
            xs = jnp.clip(jnp.arange(a.shape[1]) + dx, 0, a.shape[1] - 1)
            return a[ys][:, xs]

        fine = [img, shift(img, 0, 1), shift(img, 1, 0), shift(img, 1, 1)]
        # coarse window on the fine grid: cw(dy,dx)[y,x] =
        # coarse[clip(cy+dy), clip(cx+dx)] with (cy,cx) = (y//2,x//2) or (y,x)
        cw = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                c = shift(coarse, dy, dx)
                if halving:
                    c = jnp.repeat(jnp.repeat(c, 2, axis=0), 2, axis=1)
                cw.append(c[:n, :n])
        row = jnp.concatenate(fine + cw, axis=-1)           # (n, n, 39)
        packs.append(row.reshape(n * n, 39))
    packed = jnp.concatenate(packs, axis=0)
    return jnp.pad(packed, ((0, 0), (0, 1)))


def _packed_level_bilinear(g: Array, base: int, tx: Array, ty: Array) -> Array:
    """Bilerp of a 2×2 footprint stored at g[..., base:base+12]."""
    c00 = g[..., base + 0:base + 3]
    c10 = g[..., base + 3:base + 6]
    c01 = g[..., base + 6:base + 9]
    c11 = g[..., base + 9:base + 12]
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def sample_pyramid_packed(packed: Array, sizes: Sequence[int],
                          uv: Array, lod: Array) -> Array:
    """Full trilinear sample of a square clamp-wrapped mip pyramid with ONE
    row gather per pixel, from a `build_packed_pyramid` table.  Numerically
    identical to `sample_oct_pyramid`'s 8-tap trilinear (tests assert it).

    sizes: STATIC per-level dims (each next level the same size or half —
    prefiltered env chains repeat 4×4 for the roughest levels)."""
    sizes = tuple(int(s) for s in sizes)
    num_levels = len(sizes)
    # guard against a stale/mismatched static sizes list (ADVICE r4): the
    # table has one row per texel of levels 0..L-2, and steps must be
    # same-size or exact half (build_packed_pyramid's contract)
    expect_rows = sum(s * s for s in sizes[:-1]) if num_levels > 1 else sizes[0] ** 2
    assert packed.shape[0] == expect_rows, \
        f"packed pyramid has {packed.shape[0]} rows, sizes {sizes} imply {expect_rows}"
    assert all(b == a or b * 2 == a for a, b in zip(sizes, sizes[1:])), sizes
    lod = jnp.clip(lod, 0.0, num_levels - 1.0)
    lvl = jnp.clip(jnp.floor(lod), 0, max(num_levels - 2, 0)).astype(jnp.int32)
    frac = jnp.clip(lod - lvl.astype(jnp.float32), 0.0, 1.0)[..., None]
    # static per-level size / row offset / halving flag resolved by a (short)
    # select chain — an offsets[lvl] array index would itself be a gather
    n = jnp.full_like(lvl, sizes[0])
    off = jnp.zeros_like(lvl)
    halv = jnp.ones(lvl.shape, jnp.bool_)
    acc = 0
    for i in range(max(num_levels - 1, 1)):
        sel = lvl == i
        n = jnp.where(sel, sizes[i], n)
        off = jnp.where(sel, acc, off)
        nxt = sizes[min(i + 1, num_levels - 1)]
        halv = jnp.where(sel, nxt != sizes[i], halv)
        acc += sizes[i] ** 2

    # fine footprint coordinates (clamp wrap; a clamped-negative x0 zeroes
    # tx so the packed row-0 footprint reproduces edge-clamp bilinear)
    nf = n.astype(jnp.float32)
    fx = uv[..., 0] * nf - 0.5
    fy = uv[..., 1] * nf - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = jnp.where(x0 < 0, 0.0, fx - x0.astype(jnp.float32))[..., None]
    ty = jnp.where(y0 < 0, 0.0, fy - y0.astype(jnp.float32))[..., None]
    x0p = jnp.clip(x0, 0, n - 1)
    y0p = jnp.clip(y0, 0, n - 1)

    g = packed[off + y0p * n + x0p]                     # (..., 40) ONE gather
    fine = _packed_level_bilinear(g, 0, tx, ty)

    # coarse footprint inside the packed 3×3 window centered at the texel's
    # coarse-grid image ((y0p//2, x0p//2) for a halving step, (y0p, x0p) for
    # a same-size step); the true coarse x0' is within [center-1, center]
    fxc = jnp.where(halv, fx * 0.5 - 0.25, fx)
    fyc = jnp.where(halv, fy * 0.5 - 0.25, fy)
    xc0 = jnp.floor(fxc).astype(jnp.int32)
    yc0 = jnp.floor(fyc).astype(jnp.int32)
    tcx = jnp.where(xc0 < 0, 0.0, fxc - xc0.astype(jnp.float32))[..., None]
    tcy = jnp.where(yc0 < 0, 0.0, fyc - yc0.astype(jnp.float32))[..., None]
    cx = jnp.where(halv, jnp.right_shift(x0p, 1), x0p)
    cy = jnp.where(halv, jnp.right_shift(y0p, 1), y0p)
    jx1 = (jnp.clip(xc0 - (cx - 1), 0, 2) == 1)[..., None]
    jy1 = (jnp.clip(yc0 - (cy - 1), 0, 2) == 1)[..., None]

    def ent(r, c):
        b = 12 + (r * 3 + c) * 3
        return g[..., b:b + 3]

    def pick(a, b):
        top = jnp.where(jx1, ent(a, b + 1), ent(a, b))
        bot = jnp.where(jx1, ent(a + 1, b + 1), ent(a + 1, b))
        return jnp.where(jy1, bot, top)

    ctop = pick(0, 0) + (pick(0, 1) - pick(0, 0)) * tcx
    cbot = pick(1, 0) + (pick(1, 1) - pick(1, 0)) * tcx
    coarse = ctop + (cbot - ctop) * tcy
    return fine + (coarse - fine) * frac


def sample_oct_pyramid(flat: Array, offsets: Array, sizes: Array,
                       direction: Array, lod: Array) -> Array:
    """Trilinear octahedral environment sample from a flattened pyramid:
    exactly two bilinear taps per pixel regardless of chain length."""
    num_levels = sizes.shape[0]
    lod = jnp.clip(lod, 0.0, num_levels - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    uv = dir_to_oct_uv(direction)
    s0 = _pyramid_bilinear(flat, offsets, sizes, l0, uv)
    s1 = _pyramid_bilinear(flat, offsets, sizes, l1, uv)
    return s0 + (s1 - s0) * frac


def equirect_to_oct(equirect: Array, res: int) -> Array:
    """Convert a lat-long (H, W, C) environment map to octahedral (res, res, C)."""
    d = oct_pixel_dirs(res)
    u = jnp.arctan2(-d[..., 2], d[..., 0]) / (2 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return bilinear_sample(equirect, jnp.stack([u, v], axis=-1), WRAP_REPEAT, WRAP_CLAMP)


def build_mip_chain(img: Array, num_levels: int) -> List[Array]:
    """Simple 2x2 box-filter mip chain (GPU GenerateMips analogue)."""
    mips = [img]
    cur = img
    for _ in range(num_levels - 1):
        h, w = cur.shape[0], cur.shape[1]
        if h < 2 or w < 2:
            break
        cur = 0.25 * (cur[0::2, 0::2] + cur[1::2, 0::2] + cur[0::2, 1::2] + cur[1::2, 1::2])
        mips.append(cur)
    return mips


def _upsample_axis(x: Array, f: int, axis: int) -> Array:
    """Interleave f bilinear phases along `axis` (exact jax.image.resize
    'bilinear' semantics for an integer factor: output i samples input at
    (i + 0.5)/f - 0.5, edge-clamped)."""
    if f == 1:
        return x
    n = x.shape[axis]

    def shift(arr, d):
        # clamp-to-edge shift by d in {-1, +1} along axis
        sl = [slice(None)] * arr.ndim
        ed = [slice(None)] * arr.ndim
        if d > 0:
            sl[axis] = slice(1, None)
            ed[axis] = slice(n - 1, None)
            return jnp.concatenate([arr[tuple(sl)], arr[tuple(ed)]], axis)
        sl[axis] = slice(0, n - 1)
        ed[axis] = slice(0, 1)
        return jnp.concatenate([arr[tuple(ed)], arr[tuple(sl)]], axis)

    nxt = shift(x, +1)
    prv = shift(x, -1)
    phases = []
    for p in range(f):
        t = (p + 0.5) / f - 0.5
        if t >= 0:
            phases.append(x * (1.0 - t) + nxt * t)
        else:
            phases.append(prv * (-t) + x * (1.0 + t))
    st = jnp.stack(phases, axis=axis + 1)           # (..., n, f, ...)
    new_shape = list(x.shape)
    new_shape[axis] = n * f
    return st.reshape(new_shape)


def upsample_bilinear(x: Array, fy: int, fx: int) -> Array:
    """Gather-free integer-factor bilinear upsample: f phase images built
    from clamp-shifted copies (streaming VPU lerps), interleaved by a plain
    C-order reshape.  Replaces `jax.image.resize(..., "bilinear")` on the
    postfx upsample paths — resize lowers to per-pixel gathers, the TPU
    cost unit (PERF_NOTES.md)."""
    return _upsample_axis(_upsample_axis(x, fy, 0), fx, 1)


def sh9_eval(d: Array, sh_coeffs: Array) -> Array:
    """Σ_k basis_k(d) * sh_coeffs[k] as fully-fused unrolled MADs — the
    stacked-basis + einsum form materialized a (..., 9) DUS chain per frame
    (PERF_NOTES.md round-2 HLO audit).  d (..., 3), sh_coeffs (9, C)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    basis = [
        jnp.full_like(x, 0.282095),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ]
    chans = []
    for c in range(sh_coeffs.shape[1]):
        acc = jnp.zeros_like(x)
        for k in range(9):
            acc = acc + basis[k] * sh_coeffs[k, c]
        chans.append(acc)
    return jnp.stack(chans, axis=-1)
