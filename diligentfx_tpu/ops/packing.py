"""Packed vertex formats — the analogue of PBR_Renderer's vertex packing
(PackVertexNormal / PackVertexPos64, PBR_Renderer.hpp:1064-1086;
VertexProcessing.fxh unpack helpers).

TPU framing: geometry lives in HBM; packing halves/quarters the bytes the
vertex stage streams (HBM bandwidth is the usual bottleneck, PERF_NOTES.md).
Normals pack to one uint32 via octahedral snorm16x2 (same wire format as the
reference's PackVertexNormal); positions quantize against an explicit AABB
into 21:21:22 bits across two uint32 (the reference's 64-bit packed
position); UVs pack pairwise into uint32 as float16x2.  All pack/unpack
functions are jnp-traceable so unpacking fuses into the vertex transform.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# Octahedral snorm16x2 normals (PackVertexNormal analogue)
# ---------------------------------------------------------------------------


def _oct_wrap(v: Array) -> Array:
    return (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)


def pack_normal(n: Array) -> Array:
    """(..., 3) unit vectors → (...,) uint32 (oct snorm16 x, y in lo, hi)."""
    n = n / jnp.maximum(jnp.sum(jnp.abs(n), axis=-1, keepdims=True), 1e-12)
    xy = jnp.where(n[..., 2:3] >= 0.0, n[..., :2], _oct_wrap(n[..., :2]))
    q = jnp.round(jnp.clip(xy, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    u = (q & 0xFFFF).astype(jnp.uint32)
    return u[..., 0] | (u[..., 1] << 16)


def unpack_normal(p: Array) -> Array:
    """(...,) uint32 → (..., 3) unit vectors."""
    lo = (p & 0xFFFF).astype(jnp.int32)
    hi = ((p >> 16) & 0xFFFF).astype(jnp.int32)
    # sign-extend snorm16
    lo = jnp.where(lo >= 0x8000, lo - 0x10000, lo)
    hi = jnp.where(hi >= 0x8000, hi - 0x10000, hi)
    xy = jnp.stack([lo, hi], axis=-1).astype(jnp.float32) / 32767.0
    z = 1.0 - jnp.abs(xy[..., 0]) - jnp.abs(xy[..., 1])
    xy = jnp.where(z[..., None] < 0.0, _oct_wrap(xy), xy)
    v = jnp.concatenate([xy, z[..., None]], axis=-1)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# 64-bit quantized positions (PackVertexPos64 analogue: 21:21:22 bits)
# ---------------------------------------------------------------------------


class PackedPositions(NamedTuple):
    lo: Array        # (V,) uint32: x[21] | y_lo[11]
    hi: Array        # (V,) uint32: y_hi[10] | z[22]
    aabb_min: Array  # (3,)
    aabb_scale: Array  # (3,) (max - min), 0-safe


_BX, _BY, _BZ = 21, 21, 22


def pack_positions(pos: Array,
                   aabb: Tuple[Array, Array] = None) -> PackedPositions:
    """(V, 3) f32 → two uint32 per vertex, quantized against the AABB."""
    if aabb is None:
        mn = jnp.min(pos, axis=0)
        mx = jnp.max(pos, axis=0)
    else:
        mn, mx = (jnp.asarray(a, jnp.float32) for a in aabb)
    scale = jnp.maximum(mx - mn, 1e-12)
    t = jnp.clip((pos - mn) / scale, 0.0, 1.0)
    qx = jnp.round(t[..., 0] * ((1 << _BX) - 1)).astype(jnp.uint32)
    qy = jnp.round(t[..., 1] * ((1 << _BY) - 1)).astype(jnp.uint32)
    qz = jnp.round(t[..., 2] * ((1 << _BZ) - 1)).astype(jnp.uint32)
    lo = qx | ((qy & 0x7FF) << _BX)           # 21 + 11 = 32
    hi = (qy >> 11) | (qz << (_BY - 11))      # 10 + 22 = 32
    return PackedPositions(lo=lo, hi=hi, aabb_min=mn, aabb_scale=scale)


def unpack_positions(p: PackedPositions) -> Array:
    qx = p.lo & ((1 << _BX) - 1)
    qy = ((p.lo >> _BX) & 0x7FF) | ((p.hi & 0x3FF) << 11)
    qz = p.hi >> (_BY - 11)
    t = jnp.stack([qx.astype(jnp.float32) / ((1 << _BX) - 1),
                   qy.astype(jnp.float32) / ((1 << _BY) - 1),
                   qz.astype(jnp.float32) / ((1 << _BZ) - 1)], axis=-1)
    return t * p.aabb_scale + p.aabb_min


# ---------------------------------------------------------------------------
# float16x2 UVs
# ---------------------------------------------------------------------------


def pack_uv(uv: Array) -> Array:
    """(..., 2) f32 → (...,) uint32 (f16 u | f16 v << 16)."""
    h = uv.astype(jnp.float16)
    bits = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)
    return bits[..., 0] | (bits[..., 1] << 16)


def unpack_uv(p: Array) -> Array:
    lo = (p & 0xFFFF).astype(jnp.uint16)
    hi = ((p >> 16) & 0xFFFF).astype(jnp.uint16)
    bits = jnp.stack([lo, hi], axis=-1)
    return jax.lax.bitcast_convert_type(bits, jnp.float16).astype(jnp.float32)
