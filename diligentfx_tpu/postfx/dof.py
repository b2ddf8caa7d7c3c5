"""Depth of field — the analogue of PostProcess/DepthOfField (Catlike-Coding
based, README:115; passes at interface:130-141: CoC, temporal CoC, separated
near/far CoC, dilation, CoC blur X/Y, prefilter, two bokeh passes,
postfilter, combine).

Implementation: signed circle-of-confusion from a thin-lens model; the
near/far fields are SEPARATED (DepthOfField.hpp:132 SeparatedCoC): the far
field only gathers samples whose own far-CoC reaches the pixel (background
blur cannot grab foreground color), while the near field gathers through the
dilated+blurred near-CoC (foreground blur bleeds OVER sharp backgrounds).
Near-CoC dilation is max-pooled then smoothed by a separable Gaussian (the
CoC blur X/Y passes); bokeh runs as one disk-gather pass producing both
fields from the same taps, followed by a gather-free fixed-ring second bokeh
pass (the reference's Bokeh2 density fill), a tent postfilter, and a
two-stage combine (far lerp, then near lerp on top).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.ops.sampling import bilinear_sample
from diligentfx_tpu.postfx.context import depth_to_camera_z

Array = jax.Array


class DoFSettings(NamedTuple):
    """DepthOfFieldAttribs analogue."""
    focus_distance: Array = jnp.float32(5.0)     # meters
    f_stop: Array = jnp.float32(5.6)
    focal_length: Array = jnp.float32(0.05)      # meters (50mm)
    max_coc_px: Array = jnp.float32(12.0)        # max bokeh radius in pixels
    temporal_stability_factor: Array = jnp.float32(0.9)


def circle_of_confusion(depth: Array, camera: CameraAttribs,
                        s: DoFSettings) -> Array:
    """Signed CoC in [-1, 1] (negative = near field), ComputeCircleOfConfusion."""
    z = depth_to_camera_z(depth, camera)
    f = s.focal_length
    aperture = f / s.f_stop
    fd = s.focus_distance
    coc_m = aperture * f * (z - fd) / jnp.maximum(z * (fd - f), 1e-6)
    # sensor-plane CoC (meters) → pixels: 24mm full-frame sensor height
    h = depth.shape[0]
    coc_px = coc_m * (h / 0.024)
    return jnp.clip(coc_px / s.max_coc_px, -1.0, 1.0)


def dilate_near_coc(coc: Array, radius: int = 4) -> Array:
    """Near-field CoC dilation (DilateCoC pass): max-pool |near| so sharp
    objects in front of blurred backgrounds bleed correctly."""
    near = jnp.maximum(-coc, 0.0)
    d = near
    for axis in (0, 1):
        acc = d
        for k in range(1, radius + 1):
            acc = jnp.maximum(acc, jnp.roll(d, k, axis=axis))
            acc = jnp.maximum(acc, jnp.roll(d, -k, axis=axis))
        d = acc
    return d


def blur_coc_xy(coc: Array, radius: int = 3, sigma: float = 1.5) -> Array:
    """Separable Gaussian over the (dilated) near-CoC field — the reference's
    CoC blur X / CoC blur Y passes (DepthOfField.hpp:134-135): smooths the
    blocky max-pool so the near-field blend has no dilation staircases."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    out = coc
    for axis in (0, 1):
        acc = jnp.zeros_like(out)
        for j in range(2 * radius + 1):
            acc = acc + jnp.roll(out, j - radius, axis=axis) * k[j]
        out = acc
    return out


def _disk_kernel(n: int):
    """Golden-spiral unit disk points."""
    ga = math.pi * (3.0 - math.sqrt(5.0))
    pts = []
    for i in range(n):
        r = math.sqrt((i + 0.5) / n)
        a = i * ga
        pts.append((r * math.cos(a), r * math.sin(a)))
    return jnp.asarray(pts, jnp.float32)


def bokeh_blur_separated(color: Array, coc: Array, near_coc: Array,
                         s: DoFSettings, kernel_size: int = 24,
                         use_pallas: bool = False) -> Tuple[Array, Array]:
    """Disk-gather bokeh producing the SEPARATED far and near fields from
    one set of taps (the reference's Bokeh pass over the separated CoC
    texture, DepthOfField.hpp:132,137):

      far:  a tap contributes iff the sample's own FAR CoC reaches the
            center (far blur never pulls in-focus/foreground color),
      near: a tap contributes iff the dilated NEAR CoC at the sample
            reaches the center (foreground bleeds over anything).

    use_pallas routes taps through the gather-free windowed-warp kernel
    (color + both reach fields packed as one 5-channel warp)."""
    h, w = color.shape[:2]
    taps = _disk_kernel(kernel_size)
    xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5)
    yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5)
    far_reach_img = jnp.maximum(coc, 0.0) * s.max_coc_px
    near_reach_img = near_coc * s.max_coc_px
    radius_px = jnp.maximum(far_reach_img, near_reach_img)

    if use_pallas:
        from diligentfx_tpu.ops.warp_pallas import TILE_H, TILE_W, warp_bilinear_pallas
        packed = jnp.concatenate([color, far_reach_img[..., None],
                                  near_reach_img[..., None]], axis=-1)
        pad_h = (-h) % TILE_H
        pad_w = (-w) % TILE_W
        if pad_h or pad_w:
            packed = jnp.pad(packed, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")

    facc = color
    fwacc = jnp.ones((h, w, 1), jnp.float32)
    nacc = color
    nwacc = jnp.ones((h, w, 1), jnp.float32)
    for i in range(taps.shape[0]):
        ox = taps[i, 0] * radius_px
        oy = taps[i, 1] * radius_px
        tap_r = jnp.sqrt(taps[i, 0] ** 2 + taps[i, 1] ** 2) * radius_px
        if use_pallas:
            off = jnp.stack([ox, oy], axis=-1)
            if pad_h or pad_w:
                off = jnp.pad(off, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
            sampled = warp_bilinear_pallas(packed, off, halo_r=16, halo_c=64)
            sampled = sampled[:h, :w]
            c = sampled[..., :3]
            far_reach = sampled[..., 3]
            near_reach = sampled[..., 4]
        else:
            uv = jnp.stack([(xg + ox) / w, (yg + oy) / h], axis=-1)
            c = bilinear_sample(color, uv)
            far_reach = bilinear_sample(far_reach_img[..., None], uv)[..., 0]
            near_reach = bilinear_sample(near_reach_img[..., None], uv)[..., 0]
        fw = jnp.clip((far_reach - tap_r) * 0.5 + 0.5, 0.0, 1.0)[..., None]
        nw = jnp.clip((near_reach - tap_r) * 0.5 + 0.5, 0.0, 1.0)[..., None]
        facc = facc + c * fw
        fwacc = fwacc + fw
        nacc = nacc + c * nw
        nwacc = nwacc + nw
    return facc / fwacc, nacc / nwacc


def bokeh_fill(img: Array, radius_px: Array, s: DoFSettings) -> Array:
    """Second bokeh pass (Bokeh2, DepthOfField.hpp:138): a fixed small ring
    over the first pass's output fills undersampling gaps.  Fixed offsets →
    pure rolls, zero gathers; per-pixel weights keep in-focus pixels sharp."""
    offsets = [(2, 0), (-2, 0), (0, 2), (0, -2), (1, 1), (-1, 1), (1, -1), (-1, -1)]
    amt = jnp.clip(radius_px / 4.0, 0.0, 1.0)[..., None]
    acc = img
    wacc = jnp.ones_like(img[..., :1])
    for dy, dx in offsets:
        acc = acc + jnp.roll(img, (dy, dx), axis=(0, 1)) * amt
        wacc = wacc + amt
    return acc / wacc


def tent_3x3(img: Array) -> Array:
    k = jnp.array([1.0, 2.0, 1.0]) / 4.0
    out = img
    for axis in (0, 1):
        out = (jnp.roll(out, 1, axis) * k[0] + out * k[1]
               + jnp.roll(out, -1, axis) * k[2])
    return out


class DoFState(NamedTuple):
    coc_history: Array


@jax.named_scope("hn.dof")
def apply_dof(color: Array, depth: Array, camera: CameraAttribs,
              settings: DoFSettings = DoFSettings(),
              state: Optional[DoFState] = None,
              motion: Optional[Array] = None,
              use_temporal: bool = False,
              bokeh_kernel_size: int = 24,
              use_pallas: bool = False) -> Tuple[Array, DoFState]:
    """Full DoF chain (DepthOfField::Execute, interface:130-141):
    CoC → temporal CoC → separated near/far → near dilation → CoC blur X/Y →
    half-res prefilter → bokeh (both fields) → bokeh2 → tent postfilter →
    far-then-near combine."""
    h, w = depth.shape
    coc = circle_of_confusion(depth, camera, settings)

    if use_temporal and state is not None and motion is not None:
        xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
        yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
        prev_uv = jnp.stack([xg, yg], axis=-1) - motion
        hist = bilinear_sample(state.coc_history[..., None], prev_uv)[..., 0]
        coc = hist + (coc - hist) * (1.0 - settings.temporal_stability_factor)

    # half-res prefilter
    c2 = 0.25 * (color[0::2, 0::2] + color[1::2, 0::2]
                 + color[0::2, 1::2] + color[1::2, 1::2])
    coc2 = coc[0::2, 0::2]
    # separated near CoC: dilate then blur X/Y
    near2 = blur_coc_xy(dilate_near_coc(coc2, radius=3))
    far_blur, near_blur = bokeh_blur_separated(
        c2, coc2, near2, settings, bokeh_kernel_size, use_pallas=use_pallas)
    radius2 = jnp.maximum(jnp.maximum(coc2, 0.0), near2) * settings.max_coc_px
    far_blur = bokeh_fill(far_blur, jnp.maximum(coc2, 0.0) * settings.max_coc_px,
                          settings)
    near_blur = bokeh_fill(near_blur, near2 * settings.max_coc_px, settings)
    del radius2
    far_blur = tent_3x3(far_blur)
    near_blur = tent_3x3(near_blur)
    from diligentfx_tpu.ops.sampling import upsample_bilinear
    far_full = upsample_bilinear(far_blur, 2, 2)[:h, :w]
    near_full = upsample_bilinear(near_blur, 2, 2)[:h, :w]
    near_coc_full = upsample_bilinear(near2, 2, 2)[:h, :w]

    # combine: far field under, near field OVER (bleeds across sharp edges)
    far_blend = jnp.clip(jnp.maximum(coc, 0.0) * 2.0, 0.0, 1.0)[..., None]
    out = color + (far_full - color) * far_blend
    near_blend = jnp.clip(near_coc_full * 2.0, 0.0, 1.0)[..., None]
    out = out + (near_full - out) * near_blend
    return out, DoFState(coc_history=coc)
