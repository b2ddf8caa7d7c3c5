"""Depth of field — the analogue of PostProcess/DepthOfField (Catlike-Coding
based, README:115; passes at interface:130-141: CoC, temporal CoC, separated
near/far CoC, dilation, CoC blur, prefilter, two bokeh passes, postfilter,
combine).

Implementation: signed circle-of-confusion from a thin-lens model, half-res
prefilter weighted by CoC, golden-spiral disk bokeh gather scaled per-pixel,
near-field dilation via max-pooled CoC, tent postfilter, CoC-blended combine.
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


def _disk_kernel(n: int):
    """Golden-spiral unit disk points."""
    ga = math.pi * (3.0 - math.sqrt(5.0))
    pts = []
    for i in range(n):
        r = math.sqrt((i + 0.5) / n)
        a = i * ga
        pts.append((r * math.cos(a), r * math.sin(a)))
    return jnp.asarray(pts, jnp.float32)


def bokeh_blur(color: Array, coc: Array, near_coc: Array, s: DoFSettings,
               kernel_size: int = 24, use_pallas: bool = False) -> Array:
    """Disk-gather bokeh (the two bokeh passes): each tap weighted by whether
    the sample's CoC reaches the center pixel.  kernel_size is static.

    use_pallas routes each tap through the gather-free windowed-warp kernel
    (color + reach packed as one 4-channel warp; CoC radii are bounded, so
    the kernel halo always covers the disk)."""
    h, w = color.shape[:2]
    taps = _disk_kernel(kernel_size)
    xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5)
    yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5)
    radius_px = jnp.maximum(jnp.abs(coc), near_coc) * s.max_coc_px

    if use_pallas:
        from diligentfx_tpu.ops.warp_pallas import TILE_H, TILE_W, warp_bilinear_pallas
        reach_img = (jnp.maximum(jnp.abs(coc), near_coc) * s.max_coc_px)[..., None]
        packed = jnp.concatenate([color, reach_img], axis=-1)
        pad_h = (-h) % TILE_H
        pad_w = (-w) % TILE_W
        if pad_h or pad_w:
            packed = jnp.pad(packed, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")

    acc = color
    wacc = jnp.ones((h, w, 1), jnp.float32)
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
            reach = sampled[..., 3]
        else:
            uv = jnp.stack([(xg + ox) / w, (yg + oy) / h], axis=-1)
            c = bilinear_sample(color, uv)
            sample_coc = bilinear_sample(jnp.abs(coc)[..., None], uv)[..., 0]
            sample_near = bilinear_sample(near_coc[..., None], uv)[..., 0]
            reach = jnp.maximum(sample_coc, sample_near) * s.max_coc_px
        wgt = jnp.clip((reach - tap_r) * 0.5 + 0.5, 0.0, 1.0)[..., None]
        acc = acc + c * wgt
        wacc = wacc + wgt
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
    """Full DoF chain (DepthOfField::Execute)."""
    h, w = depth.shape
    coc = circle_of_confusion(depth, camera, settings)

    if use_temporal and state is not None and motion is not None:
        xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
        yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
        prev_uv = jnp.stack([xg, yg], axis=-1) - motion
        hist = bilinear_sample(state.coc_history[..., None], prev_uv)[..., 0]
        coc = hist + (coc - hist) * (1.0 - settings.temporal_stability_factor)

    # half-res field
    c2 = 0.25 * (color[0::2, 0::2] + color[1::2, 0::2]
                 + color[0::2, 1::2] + color[1::2, 1::2])
    coc2 = coc[0::2, 0::2]
    near2 = dilate_near_coc(coc2, radius=3)
    blurred = bokeh_blur(c2, coc2, near2, settings, bokeh_kernel_size,
                         use_pallas=use_pallas)
    blurred = tent_3x3(blurred)
    blurred_full = jax.image.resize(blurred, (h, w, 3), method="bilinear")
    near_full = jax.image.resize(near2, (h, w), method="bilinear")

    blend = jnp.clip(jnp.maximum(jnp.abs(coc), near_full) * 2.0, 0.0, 1.0)[..., None]
    out = color + (blurred_full - color) * blend
    return out, DoFState(coc_history=coc)
