"""Bloom — the analogue of PostProcess/Bloom (README:103, Froyok/Léna-Piquet
dual-filter pyramid): soft-knee prefilter (+ Karis luma weighting), 13-tap
downsample mip chain, 3×3 tent progressive upsample, intensity combine.

TPU-first: the 13-tap downsample and tent upsample are expressed as stride-2 /
transposed depthwise convolutions (XLA convs), not per-pixel texture taps —
zero gathers in the whole effect.
"""
from __future__ import annotations

from typing import NamedTuple, List

import jax
import jax.numpy as jnp

Array = jax.Array


class BloomSettings(NamedTuple):
    """BloomAttribs analogue (dynamic parameters)."""
    intensity: Array = jnp.float32(0.05)
    threshold: Array = jnp.float32(1.0)
    soft_threshold: Array = jnp.float32(0.5)   # knee fraction


# 13-tap Jimenez downsample as an equivalent 5x5 kernel (stride 2).
_DOWN_KERNEL = jnp.array([
    [0.03125, 0.0625, 0.0625, 0.0625, 0.03125],
    [0.0625, 0.125, 0.0, 0.125, 0.0625],
    [0.0625, 0.0, 0.125, 0.0, 0.0625],
    [0.0625, 0.125, 0.0, 0.125, 0.0625],
    [0.03125, 0.0625, 0.0625, 0.0625, 0.03125],
], jnp.float32)
_DOWN_KERNEL = _DOWN_KERNEL / jnp.sum(_DOWN_KERNEL)

_TENT_KERNEL = jnp.array([
    [1.0, 2.0, 1.0],
    [2.0, 4.0, 2.0],
    [1.0, 2.0, 1.0],
], jnp.float32) / 16.0


def _depthwise_conv(img: Array, kernel: Array, stride: int = 1) -> Array:
    """(H, W, C) depthwise 2D conv with edge padding."""
    c = img.shape[-1]
    kh, kw = kernel.shape
    x = jnp.pad(img, ((kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)), mode="edge")
    x = x[None].transpose(0, 3, 1, 2)                       # NCHW
    k = jnp.broadcast_to(kernel[None, None], (c, 1, kh, kw))
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding="VALID",
        feature_group_count=c)
    return y[0].transpose(1, 2, 0)


def prefilter(color: Array, s: BloomSettings, karis: bool = True) -> Array:
    """Soft-knee threshold (Bloom_Prefilter) + Karis average to tame fireflies."""
    knee = jnp.maximum(s.threshold * s.soft_threshold, 1e-5)
    br = jnp.max(color, axis=-1, keepdims=True)
    soft = jnp.clip(br - s.threshold + knee, 0.0, 2.0 * knee)
    soft = soft * soft / (4.0 * knee)
    contrib = jnp.maximum(soft, br - s.threshold) / jnp.maximum(br, 1e-5)
    out = color * contrib
    if karis:
        luma = jnp.sum(out * jnp.array([0.2126, 0.7152, 0.0722]), axis=-1,
                       keepdims=True)
        out = out / (1.0 + luma)
    return out


def downsample(img: Array) -> Array:
    return _depthwise_conv(img, _DOWN_KERNEL, stride=2)


def upsample_add(low: Array, high: Array, radius: float = 1.0) -> Array:
    """Tent-filtered 2x upsample of `low` added to `high` (Bloom_Upsample)."""
    hh, hw = high.shape[:2]
    up = jax.image.resize(low, (hh, hw, low.shape[-1]), method="bilinear")
    up = _depthwise_conv(up, _TENT_KERNEL)
    return high + up * radius


@jax.named_scope("hn.bloom")
def apply_bloom(color: Array, settings: BloomSettings = BloomSettings(),
                num_mips: int = 6) -> Array:
    """Full bloom chain (Bloom::Execute: prefilter → downsample chain →
    upsample+combine chain → lerp with intensity).

    The pyramid's finest level is HALF the backbuffer resolution, exactly as
    the reference allocates it (Bloom.cpp:97-99 HalfWidth/HalfHeight); the
    final combine samples that half-res result with one bilinear tap
    (ComputeCombine).  Running mip 0 at full res cost two full-res 1080p
    convs for no reference-visible quality (round-5: bloom 7.9 ms in-frame
    with the full-res chain)."""
    base = downsample(prefilter(color, settings, karis=True))   # half res
    chain: List[Array] = [base]
    cur = base
    for _ in range(num_mips - 2):
        if min(cur.shape[0], cur.shape[1]) < 8:
            break
        cur = downsample(cur)
        chain.append(cur)
    # progressive upsample to the half-res top
    acc = chain[-1]
    for lvl in range(len(chain) - 2, -1, -1):
        acc = upsample_add(acc, chain[lvl])
    # final combine: one bilinear tap of the half-res bloom per pixel
    full = jax.image.resize(acc, (color.shape[0], color.shape[1],
                                  color.shape[2]), method="bilinear")
    # un-Karis (approximate inverse is unnecessary: combine is a lerp)
    return color + (full - color) * settings.intensity
