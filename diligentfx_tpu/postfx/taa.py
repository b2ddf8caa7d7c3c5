"""Temporal anti-aliasing — the analogue of PostProcess/TemporalAntiAliasing
(interface:64-73 feature flags; TAA_ComputeTemporalAccumulation.fx):
variance-clipped history accumulation in YCoCg, bicubic (Catmull-Rom) history
filtering, closest-motion reprojection, sample-count-based blend ramp.

One call = the single accumulation pass of the reference.  State = the
accumulated color buffer + per-pixel sample count ("NumSamples" in the
reference's history buffer alpha channel).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.postfx.context import BandCtx, PostFXResources

Array = jax.Array


class TAAFeatureFlags:
    NONE = 0
    GAUSSIAN_WEIGHTING = 1 << 0
    BICUBIC_FILTER = 1 << 1
    YCOCG_COLOR_SPACE = 1 << 2
    # TPU fast path: history reprojection through the Pallas windowed-warp
    # kernel (ops/warp_pallas.py, ~7x faster than XLA gathers; motion clamped
    # to the kernel halo of ±8 rows / ±64 columns)
    PALLAS_WARP = 1 << 3


class TAASettings(NamedTuple):
    """TemporalAntiAliasingAttribs analogue (dynamic)."""
    temporal_stability_factor: Array = jnp.float32(0.9375)  # history weight cap
    variance_gamma: Array = jnp.float32(1.0)                # clip box size
    skip_rejection: Array = jnp.asarray(False)              # static frames


class TAAState(NamedTuple):
    color: Array        # (H, W, 3) accumulated
    sample_count: Array  # (H, W) float


def rgb_to_ycocg(c: Array) -> Array:
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([
        0.25 * r + 0.5 * g + 0.25 * b,
        0.5 * r - 0.5 * b,
        -0.25 * r + 0.5 * g - 0.25 * b,
    ], axis=-1)


def ycocg_to_rgb(c: Array) -> Array:
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)


def _neighborhood_moments(color: Array, gaussian: bool = True,
                          band: Optional[BandCtx] = None):
    """3×3 mean/variance via shifts (no gathers).  With `band`, the window
    rides one wrap-exchanged halo row so band results equal the monolithic
    frame's `jnp.roll` windows exactly."""
    if gaussian:
        w = jnp.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
    else:
        w = jnp.ones((3, 3), jnp.float32) / 9.0
    h = color.shape[0]
    src_c = color if band is None else band.extend(color, 1, wrap=True)
    m1 = jnp.zeros_like(color)
    m2 = jnp.zeros_like(color)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            c = jnp.roll(src_c, (-dy, -dx), axis=(0, 1))
            if band is not None:
                c = c[1:1 + h]
            ww = w[dy + 1, dx + 1]
            m1 = m1 + c * ww
            m2 = m2 + c * c * ww
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    return m1, jnp.sqrt(var)


def _sample_history_bilinear(history: Array, uv: Array) -> Array:
    from diligentfx_tpu.ops.sampling import bilinear_sample
    return bilinear_sample(history, uv)


def _sample_history_catmull_rom(history: Array, uv: Array) -> Array:
    """9-tap optimized Catmull-Rom (Jimenez) — BICUBIC_FILTER flag path."""
    h, w = history.shape[:2]
    size = jnp.array([w, h], jnp.float32)
    pos = uv * size
    center = jnp.floor(pos - 0.5) + 0.5
    f = pos - center
    f2 = f * f
    f3 = f2 * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    w12 = w1 + w2
    offset12 = w2 / jnp.where(jnp.abs(w12) < 1e-6, 1.0, w12)

    from diligentfx_tpu.ops.sampling import bilinear_sample

    def tap(px, wgt):
        return bilinear_sample(history, px / size) * wgt[..., None]

    tl = center - 1.0
    t12 = center + offset12
    br = center + 2.0
    acc = tap(jnp.stack([tl[..., 0], tl[..., 1]], -1), w0[..., 0] * w0[..., 1])
    acc += tap(jnp.stack([t12[..., 0], tl[..., 1]], -1), w12[..., 0] * w0[..., 1])
    acc += tap(jnp.stack([br[..., 0], tl[..., 1]], -1), w3[..., 0] * w0[..., 1])
    acc += tap(jnp.stack([tl[..., 0], t12[..., 1]], -1), w0[..., 0] * w12[..., 1])
    acc += tap(jnp.stack([t12[..., 0], t12[..., 1]], -1), w12[..., 0] * w12[..., 1])
    acc += tap(jnp.stack([br[..., 0], t12[..., 1]], -1), w3[..., 0] * w12[..., 1])
    acc += tap(jnp.stack([tl[..., 0], br[..., 1]], -1), w0[..., 0] * w3[..., 1])
    acc += tap(jnp.stack([t12[..., 0], br[..., 1]], -1), w12[..., 0] * w3[..., 1])
    acc += tap(jnp.stack([br[..., 0], br[..., 1]], -1), w3[..., 0] * w3[..., 1])
    wsum = ((w0[..., 0] + w12[..., 0] + w3[..., 0])
            * (w0[..., 1] + w12[..., 1] + w3[..., 1]))[..., None]
    return acc / jnp.maximum(wsum, 1e-6)


@jax.named_scope("hn.taa")
def taa_accumulate(color: Array, state: Optional[TAAState],
                   resources: PostFXResources,
                   settings: TAASettings = TAASettings(),
                   feature_flags: int = (TAAFeatureFlags.BICUBIC_FILTER
                                         | TAAFeatureFlags.YCOCG_COLOR_SPACE
                                         | TAAFeatureFlags.GAUSSIAN_WEIGHTING),
                   disocclusion: Optional[Array] = None,
                   band: Optional[BandCtx] = None,
                   ) -> Tuple[Array, TAAState]:
    """One temporal accumulation step.  Returns (antialiased, new_state).

    disocclusion: optional (H, W) bool from context.disocclusion_mask —
    history sample-count resets where the prev-frame depth disagrees with
    the reprojected surface (beyond the variance clamp's soft rejection).

    band: run on an sp-band (parallel/tiling.py).  The history warp rides
    halo-exchanged rows with vertical motion clamped to halo-3 px (room for
    the Catmull-Rom ±2 footprint); the moment window rides a wrap halo.
    The SAME accumulation code runs either way — no banded fork."""
    h, w = color.shape[:2]
    if state is None:
        return color, TAAState(color=color, sample_count=jnp.ones((h, w), jnp.float32))

    x = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    if band is None:
        y = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
        prev_uv = jnp.stack([x, y], axis=-1) - resources.closest_motion
        hist_src = jnp.concatenate([state.color,
                                    state.sample_count[..., None]], axis=-1)
        samp_uv = prev_uv
        off_px = -resources.closest_motion * jnp.array([w, h], jnp.float32)
    else:
        halo = band.halo
        fh = band.full_h
        y0f = jnp.asarray(band.y0, jnp.float32)
        yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + y0f + 0.5)
        m = resources.closest_motion
        my = jnp.clip(m[..., 1] * fh, -(halo - 3.0), halo - 3.0)
        prev_uv = jnp.stack([x - m[..., 0], (yg - my) / fh], axis=-1)
        hist_src = band.extend(
            jnp.concatenate([state.color, state.sample_count[..., None]], -1),
            halo, wrap=False)
        # band-local uv into the extended array; the integer row shift
        # (y0 - halo) preserves every filter's fractional weights
        samp_uv = jnp.stack(
            [prev_uv[..., 0], (yg - my - y0f + halo) / (h + 2.0 * halo)],
            axis=-1)
        off_px = jnp.stack([-m[..., 0] * w, -my], axis=-1)

    if feature_flags & TAAFeatureFlags.PALLAS_WARP:
        from diligentfx_tpu.ops.warp_pallas import warp_bilinear_pallas
        if band is None:
            warped = warp_bilinear_pallas(hist_src, off_px, halo_r=8, halo_c=64)
        else:
            off_ext = jnp.pad(off_px, ((band.halo, band.halo), (0, 0), (0, 0)))
            warped = warp_bilinear_pallas(hist_src, off_ext,
                                          halo_r=8, halo_c=64)
            warped = warped[band.halo:band.halo + h]
        hist = warped[..., :3]
        hist_count = warped[..., 3]
    elif feature_flags & TAAFeatureFlags.BICUBIC_FILTER:
        hist = _sample_history_catmull_rom(hist_src[..., :3], samp_uv)
        hist_count = _sample_history_bilinear(hist_src[..., 3:4],
                                              samp_uv)[..., 0]
    else:
        hist = _sample_history_bilinear(hist_src[..., :3], samp_uv)
        hist_count = _sample_history_bilinear(hist_src[..., 3:4],
                                              samp_uv)[..., 0]

    in_bounds = ((prev_uv[..., 0] >= 0.0) & (prev_uv[..., 0] <= 1.0)
                 & (prev_uv[..., 1] >= 0.0) & (prev_uv[..., 1] <= 1.0))
    if disocclusion is not None:
        in_bounds = in_bounds & ~disocclusion

    use_ycocg = bool(feature_flags & TAAFeatureFlags.YCOCG_COLOR_SPACE)
    cur_cs = rgb_to_ycocg(color) if use_ycocg else color
    hist_cs = rgb_to_ycocg(jnp.maximum(hist, 0.0)) if use_ycocg else hist

    mean, std = _neighborhood_moments(
        cur_cs, gaussian=bool(feature_flags & TAAFeatureFlags.GAUSSIAN_WEIGHTING),
        band=band)
    lo = mean - settings.variance_gamma * std
    hi = mean + settings.variance_gamma * std
    clipped = jnp.clip(hist_cs, lo, hi)
    hist_cs = jnp.where(settings.skip_rejection, hist_cs, clipped)

    count = jnp.where(in_bounds, hist_count + 1.0, 1.0)
    alpha = jnp.maximum(1.0 / count, 1.0 - settings.temporal_stability_factor)
    alpha = jnp.where(in_bounds, alpha, 1.0)[..., None]

    out_cs = hist_cs + (cur_cs - hist_cs) * alpha
    out = ycocg_to_rgb(out_cs) if use_ycocg else out_cs
    out = jnp.maximum(out, 0.0)
    return out, TAAState(color=out, sample_count=jnp.minimum(count, 64.0))
