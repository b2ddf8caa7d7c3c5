"""Tone mapping — the analogue of
Shaders/PostProcess/ToneMapping/public/ToneMapping.fxh (all 12 modes,
ToneMappingStructures.fxh:11-22).

`tone_map(color, mode, attribs, ave_log_lum)` mirrors `ToneMap()` semantics:
mode is a *static* arg (the reference specializes via TONE_MAPPING_MODE macro;
we specialize via Python branch under jit).  Colors are (..., 3) linear HDR.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.config import ToneMappingMode
from diligentfx_tpu.math3d import linear_to_srgb, srgb_to_linear

Array = jax.Array

RGB_TO_LUMINANCE = jnp.array([0.212671, 0.715160, 0.072169], jnp.float32)


class ToneMappingAttribs(NamedTuple):
    """ToneMappingStructures.fxh ToneMappingAttribs (dynamic params)."""
    middle_gray: Array = jnp.float32(0.18)
    white_point: Array = jnp.float32(3.0)
    luminance_saturation: Array = jnp.float32(1.0)
    # AgX custom look (AgXPunchyLook defaults)
    agx_saturation: Array = jnp.float32(1.4)
    agx_offset: Array = jnp.float32(0.0)
    agx_slope: Array = jnp.float32(1.0)
    agx_power: Array = jnp.float32(1.35)


def _uncharted2_curve(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def _agx_contrast(x):
    x2 = x * x
    x4 = x2 * x2
    return (15.5 * x4 * x2 - 40.14 * x4 * x + 31.96 * x4
            - 6.868 * x2 * x + 0.4298 * x2 + 0.1191 * x - 0.00232)


_AGX_M = jnp.array([
    [0.842479062253094, 0.0784335999999992, 0.0792237451477643],
    [0.0423282422610123, 0.878468636469772, 0.0791661274605434],
    [0.0423756549057051, 0.0784336, 0.879142973793104]], jnp.float32)
_AGX_MINV = jnp.array([
    [1.19687900512017, -0.0980208811401368, -0.0990297440797205],
    [-0.0528968517574562, 1.15190312990417, -0.0989611768448433],
    [-0.0529716355144438, -0.0980434501171241, 1.15107367264116]], jnp.float32)


def _agx(color):
    min_ev, max_ev = -12.47393, 4.026069
    c = jnp.einsum("ij,...j->...i", _AGX_M, color)
    c = jnp.clip(jnp.log2(jnp.maximum(c, 1e-10)), min_ev, max_ev)
    c = (c - min_ev) / (max_ev - min_ev)
    return _agx_contrast(c)


def _agx_eotf(color):
    c = jnp.einsum("ij,...j->...i", _AGX_MINV, color)
    return srgb_to_linear(c)


def _agx_punchy(color, saturation, offset, slope, power):
    lum = jnp.sum(color * RGB_TO_LUMINANCE, axis=-1, keepdims=True)
    c = jnp.power(jnp.maximum(color * slope + offset, 0.0), power)
    return lum + saturation * (c - lum)


def _pbr_neutral(color, ave_log_lum):
    color = color * (0.3 / ave_log_lum)
    start_compression = 0.8 - 0.04
    desaturation = 0.15
    x = jnp.min(color, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, 0.04)
    color = color - offset
    peak = jnp.max(color, axis=-1, keepdims=True)
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / (peak + d - start_compression)
    compress = peak >= start_compression
    scaled = color * new_peak / jnp.maximum(peak, 1e-9)
    g = 1.0 - 1.0 / (desaturation * (peak - new_peak) + 1.0)
    compressed = scaled + (new_peak - scaled) * g
    return jnp.where(compress, compressed, color)


def _commerce(color, ave_log_lum):
    color = color * (0.3 / ave_log_lum)
    start_compression = 0.8
    desaturation = 0.5
    d = 1.0 - start_compression
    peak = jnp.max(color, axis=-1, keepdims=True)
    new_peak = 1.0 - d * d / (peak + d - start_compression)
    inv_peak = 1.0 / jnp.maximum(peak, 1e-9)
    extra = jnp.sum(color * (1.0 - start_compression * inv_peak),
                    axis=-1, keepdims=True)
    scaled = color * new_peak * inv_peak
    g = 1.0 - 3.0 / (desaturation * extra + 3.0)
    compressed = scaled + (1.0 - scaled) * g
    return jnp.where(peak >= start_compression, compressed, color)


def tone_map(color: Array, mode: ToneMappingMode,
             attribs: ToneMappingAttribs = ToneMappingAttribs(),
             ave_log_lum=0.3) -> Array:
    """ToneMapping.fxh:101-198. mode must be a static Python value."""
    ave_log_lum = jnp.maximum(jnp.asarray(ave_log_lum, jnp.float32), 1e-6)
    lum_scale = attribs.middle_gray / ave_log_lum
    color = jnp.maximum(color, 0.0)
    initial_lum = jnp.maximum(
        jnp.sum(color * RGB_TO_LUMINANCE, axis=-1, keepdims=True), 1e-10)
    scaled_lum = initial_lum * lum_scale
    scaled_color = color * lum_scale
    wp = attribs.white_point

    def recolor(tone_lum):
        return tone_lum * jnp.power(color / initial_lum, attribs.luminance_saturation)

    if mode == ToneMappingMode.NONE:
        return color
    if mode == ToneMappingMode.EXP:
        return recolor(1.0 - jnp.exp(-scaled_lum))
    if mode == ToneMappingMode.REINHARD:
        return recolor(scaled_lum / (1.0 + scaled_lum))
    if mode == ToneMappingMode.REINHARD_MOD:
        return recolor(scaled_lum * (1.0 + scaled_lum / (wp * wp)) / (1.0 + scaled_lum))
    if mode == ToneMappingMode.UNCHARTED2:
        curr = _uncharted2_curve(2.0 * scaled_color)
        white_scale = 1.0 / _uncharted2_curve(jnp.broadcast_to(wp, (3,)))
        return curr * white_scale
    if mode == ToneMappingMode.FILMIC_ALU:
        x = jnp.maximum(scaled_color - 0.004, 0.0)
        t = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
        return jnp.power(t, 2.2)  # curve has 1/2.2 gamma baked in
    if mode == ToneMappingMode.LOGARITHMIC:
        t = jnp.log10(1.0 + scaled_lum) / jnp.log10(1.0 + wp)
        return recolor(t)
    if mode == ToneMappingMode.ADAPTIVE_LOG:
        bias = 0.85
        t = (1.0 / jnp.log10(1.0 + wp)
             * jnp.log(1.0 + scaled_lum)
             / jnp.log(2.0 + 8.0 * jnp.power(scaled_lum / wp,
                                             jnp.log(bias) / jnp.log(0.5))))
        return recolor(t)
    if mode == ToneMappingMode.AGX:
        return _agx_eotf(_agx(scaled_color))
    if mode == ToneMappingMode.AGX_CUSTOM:
        c = _agx(scaled_color)
        c = _agx_punchy(c, attribs.agx_saturation, attribs.agx_offset,
                        attribs.agx_slope, attribs.agx_power)
        return _agx_eotf(c)
    if mode == ToneMappingMode.PBR_NEUTRAL:
        return _pbr_neutral(color, ave_log_lum)
    if mode == ToneMappingMode.COMMERCE:
        return _commerce(color, ave_log_lum)
    raise ValueError(f"unknown tone mapping mode {mode}")


def reverse_exp_tone_map(color: Array, middle_gray=0.18, ave_log_lum=0.3) -> Array:
    """ReverseExpToneMap approximation (Components ToneMapping host helper,
    used to pre-compensate selection colors, HnPostProcessTask.cpp:844-850)."""
    lum_scale = middle_gray / jnp.maximum(ave_log_lum, 1e-6)
    c = jnp.clip(color, 0.0, 0.99)
    return -jnp.log(jnp.maximum(1.0 - c, 1e-6)) / lum_scale


def average_log_luminance(color: Array, eps: float = 1e-4) -> Array:
    """Auto-exposure measurement: exp(mean(log(lum))) (the reference computes
    this in EpipolarLightScattering's luminance chain / UpdateAverageLuminance)."""
    lum = jnp.sum(color * RGB_TO_LUMINANCE, axis=-1)
    return jnp.exp(jnp.mean(jnp.log(lum + eps)))


def loading_animation(color, factor, time, *, stripe_px: float = 32.0):
    """Streaming-asset loading overlay — the analogue of RenderPBR.psh's
    GetLoadingAnimationColor (RenderPBR.psh:361-386, applied :615-630):
    while assets stream in, geometry blends toward an animated diagonal
    stripe pattern; factor (scalar or (H, W, 1)) = 0 shows the scene,
    1 shows the full pattern."""
    import jax
    import jax.numpy as jnp
    h, w = color.shape[:2]
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    phase = (x + y) / stripe_px - time * 2.0
    stripe = 0.5 + 0.5 * jnp.sin(phase * 3.14159265)
    base = jnp.asarray([0.22, 0.24, 0.28], color.dtype)
    hi = jnp.asarray([0.36, 0.38, 0.42], color.dtype)
    pattern = base + (hi - base) * stripe[..., None]
    f = jnp.asarray(factor, color.dtype)
    if f.ndim == 0:
        f = jnp.broadcast_to(f, (h, w, 1))
    return color + (pattern - color) * f
