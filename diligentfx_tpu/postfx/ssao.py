"""Screen-space ambient occlusion — the analogue of
PostProcess/ScreenSpaceAmbientOcclusion (XeGTAO-based, README:22; passes at
interface:144-152): ground-truth ambient occlusion via horizon-slice integral,
half-resolution option with depth-aware upsampling, spatial bilateral denoise,
optional temporal accumulation.

TPU notes: per-pixel ray taps are bilinear depth gathers; slice count ×
step count is static; the per-frame slice rotation comes from analytic IGN
noise (postfx/context.py) instead of the reference's blue-noise texture.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.math3d import normalize
from diligentfx_tpu.ops.sampling import bilinear_sample
from diligentfx_tpu.postfx.context import (BandCtx, depth_to_camera_z,
                                           interleaved_gradient_noise)

Array = jax.Array
PI = 3.141592653589793


class SSAOSettings(NamedTuple):
    """ScreenSpaceAmbientOcclusionAttribs analogue."""
    effect_radius: Array = jnp.float32(1.0)        # world units
    effect_falloff_range: Array = jnp.float32(0.615)
    radius_multiplier: Array = jnp.float32(1.0)
    depth_mip_sampling_offset: Array = jnp.float32(3.3)
    temporal_stability_factor: Array = jnp.float32(0.9)
    spatial_reconstruction_radius: Array = jnp.float32(4.0)


def view_space_position(depth: Array, camera: CameraAttribs,
                        row0=0, full_h: int = 0) -> Array:
    """Per-pixel view-space position (x right, y up, looking down -Z).

    row0/full_h support sp-sharded row bands (parallel/tiling.py): the
    local rows [0, h) map to global rows [row0, row0+h) of a full_h image."""
    h, w = depth.shape
    fh = full_h or h
    z = depth_to_camera_z(depth, camera)                     # positive dist
    x_ndc = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w * 2 - 1
    y_ndc = 1 - (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
                 + jnp.float32(row0) + 0.5) / fh * 2
    p00 = camera.proj[0, 0]
    p11 = camera.proj[1, 1]
    return jnp.stack([x_ndc * z / p00, y_ndc * z / p11, -z], axis=-1)


def view_space_normal_from_depth(depth: Array, camera: CameraAttribs) -> Array:
    """Cross-derivative normal reconstruction (when no G-buffer normal)."""
    p = view_space_position(depth, camera)
    dx = jnp.roll(p, -1, axis=1) - p
    dy = jnp.roll(p, -1, axis=0) - p
    n = jnp.cross(dy, dx)
    return normalize(n)


def build_avg_depth_pyramid(depth: Array, levels: int = 3):
    """Prefiltered (convolved) depth mips — the ComputePrefilteredDepthBuffer
    pass (ScreenSpaceAmbientOcclusion.hpp:145): far AO taps sample averaged
    depth instead of point depth, suppressing thin-feature noise.  2×2 mean
    chain (pure reshapes, no gathers)."""
    mips = [depth]
    cur = depth
    for _ in range(levels - 1):
        h, w = cur.shape
        if h < 2 or w < 2:
            break
        c = cur[:h // 2 * 2, :w // 2 * 2]
        cur = 0.25 * (c[0::2, 0::2] + c[1::2, 0::2]
                      + c[0::2, 1::2] + c[1::2, 1::2])
        mips.append(cur)
    return mips


def _tap_depth(depth: Array, off_x: Array, off_y: Array,
               use_pallas: bool) -> Array:
    """Sample depth at (pixel + offset px): XLA bilinear gathers, or the
    gather-free Pallas windowed warp (offsets clamp to the kernel halo)."""
    h, w = depth.shape
    if use_pallas:
        from diligentfx_tpu.ops.warp_pallas import TILE_H, TILE_W, warp_bilinear_pallas
        pad_h = (-h) % TILE_H
        pad_w = (-w) % TILE_W
        d = jnp.pad(depth, ((0, pad_h), (0, pad_w)), mode="edge")
        off = jnp.pad(jnp.stack([off_x, off_y], axis=-1),
                      ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
        out = warp_bilinear_pallas(d, off, halo_r=16, halo_c=64)
        return out[:h, :w]
    xi = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5)
    yi = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5)
    uv = jnp.stack([(xi + off_x) / w, (yi + off_y) / h], axis=-1)
    return bilinear_sample(depth[..., None], uv)[..., 0]


def compute_gtao(depth: Array, normal_vs: Array, camera: CameraAttribs,
                 frame_index, settings: SSAOSettings = SSAOSettings(),
                 num_slices: int = 3, num_steps: int = 6,
                 use_pallas: bool = False,
                 row0=0, full_h: int = 0,
                 max_tap_px: Optional[Tuple[float, float]] = None,
                 use_mips: bool = True) -> Array:
    """GTAO horizon-slice integral (the SSAO ComputeAO pass).

    depth: (H, W) NDC depth; normal_vs: (H, W, 3) view-space normal.
    Returns (H, W) ambient visibility in [0, 1].

    row0/full_h: global row window for sp-sharded bands; max_tap_px: clamp
    tap offsets to (±dx, ±dy) px — set to the halo size in banded mode so
    every tap stays within the exchanged rows."""
    h, w = depth.shape
    fh = full_h or h
    import os
    if (use_pallas and row0 == 0 and max_tap_px is None
            and os.environ.get("DFX_GTAO_FUSED", "0") == "1"):
        # ONE fused kernel: window DMA + all horizon taps + the arc integral
        # in-register (ops/gtao_pallas.py) instead of slices*2*steps separate
        # windowed-warp launches — same mip-0 taps, same (±63, ±15) clamps.
        from diligentfx_tpu.ops.gtao_pallas import gtao_pallas
        radius = settings.effect_radius * settings.radius_multiplier
        scalars = jnp.stack([
            jnp.asarray(frame_index, jnp.float32),
            jnp.asarray(radius, jnp.float32),
            jnp.asarray(radius * (1.0 - settings.effect_falloff_range),
                        jnp.float32),
            jnp.asarray(settings.effect_falloff_range * radius, jnp.float32),
            camera.proj[0, 0], camera.proj[1, 1],
            jnp.asarray(camera.near_z, jnp.float32),
            jnp.asarray(camera.far_z, jnp.float32)])
        return gtao_pallas(depth, normal_vs, scalars,
                           num_slices=num_slices, num_steps=num_steps,
                           fh_log=fh, w_log=w)
    pos = view_space_position(depth, camera, row0=row0, full_h=fh)
    view_z = -pos[..., 2]
    v = normalize(-pos)                                      # to camera

    # noise keyed on GLOBAL rows → bands evaluate the monolithic pattern
    noise = interleaved_gradient_noise(h, w, frame_index, row0=row0)

    # screen-space radius: project world radius at this depth
    radius = settings.effect_radius * settings.radius_multiplier
    p11 = camera.proj[1, 1]
    radius_px = radius * p11 * (fh * 0.5) / jnp.maximum(view_z, 1e-4)
    radius_px = jnp.clip(radius_px, 2.0, float(max(fh, w)) * 0.25)

    falloff_range = settings.effect_falloff_range * radius
    falloff_from = radius * (1.0 - settings.effect_falloff_range)

    xi = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5)
    yi = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
          + jnp.float32(row0) + 0.5)

    # prefiltered depth mips: far taps read averaged depth (static per-step
    # MIP ladder — the SPMD analogue of XeGTAO's per-tap lod; the step
    # distance grows as t², so the outer third of steps covers most of the
    # radius and reads the coarsest mip)
    depth_pyr = (build_avg_depth_pyramid(depth, 3)
                 if (use_mips and not use_pallas) else [depth])

    visibility = jnp.zeros((h, w), jnp.float32)

    def tap_offset(s, sgn, step):
        """Pixel offset of horizon tap (slice s, direction sgn, step) —
        hoisted so the Pallas path can batch EVERY tap through one
        multi-tap warp kernel (one window DMA + launch instead of
        slices×2×steps separate pallas calls)."""
        phi_s = (s + noise) * (PI / num_slices)
        d_px = jnp.stack([jnp.cos(phi_s), -jnp.sin(phi_s)], axis=-1)
        t = (step + 0.5 + 0.5 * noise) / num_steps
        t = t * t                                  # denser near center
        off = d_px * (sgn * t * radius_px)[..., None]
        if use_pallas:
            # keep the reconstruction position consistent with the warp
            # kernel's halo clamp
            off = jnp.stack([jnp.clip(off[..., 0], -63.0, 63.0),
                             jnp.clip(off[..., 1], -15.0, 15.0)], -1)
        if max_tap_px is not None:
            off = jnp.stack(
                [jnp.clip(off[..., 0], -max_tap_px[0], max_tap_px[0]),
                 jnp.clip(off[..., 1], -max_tap_px[1], max_tap_px[1])], -1)
        return off

    # NOTE: batching every tap through warp_bilinear_multi_pallas was
    # measured SLOWER than per-tap calls (+27 ms full-frame at 1080p): the
    # (K, H, W, 2) offset staging and the in-kernel K×win_h row sweep cost
    # more than the 16 launches they replace.  Per-tap calls stay.
    d_all = None

    for s in range(num_slices):
        phi = (s + noise) * (PI / num_slices)
        cos_p = jnp.cos(phi)
        sin_p = jnp.sin(phi)
        # slice direction in screen space (y down)
        dir_px = jnp.stack([cos_p, -sin_p], axis=-1)

        # project the slice onto the tangent plane (GTAO formulation)
        # slice axis in view space
        slice_dir = jnp.stack([cos_p, sin_p, jnp.zeros_like(cos_p)], axis=-1)
        ortho = slice_dir - v * jnp.sum(slice_dir * v, -1, keepdims=True)
        axis = normalize(jnp.cross(ortho, v))
        # projected normal onto slice plane
        n_proj = normal_vs - axis * jnp.sum(normal_vs * axis, -1, keepdims=True)
        n_proj_len = jnp.sqrt(jnp.maximum(
            jnp.sum(n_proj * n_proj, -1), 1e-8))
        cos_norm = jnp.clip(jnp.sum(n_proj * v, -1) / n_proj_len, -1.0, 1.0)
        n_angle = jnp.arccos(cos_norm) * jnp.sign(
            jnp.sum(n_proj * ortho, -1))

        # horizon search both directions
        best_cos = [jnp.full((h, w), -1.0, jnp.float32),
                    jnp.full((h, w), -1.0, jnp.float32)]
        for side, sgn in ((0, 1.0), (1, -1.0)):
            for step in range(num_steps):
                t = (step + 0.5 + 0.5 * noise) / num_steps
                t = t * t                                      # denser near center
                # static per-step MIP ladder over the prefiltered depth:
                # near third → mip0, middle → mip1, far → mip2 (the SPMD
                # analogue of XeGTAO's per-tap lod; the Pallas warp path
                # keeps mip0 — its fixed halo already bounds far taps)
                # banded callers pass use_mips=False: the mip taps sample a
                # band-LOCAL pyramid whose cell alignment and uv mapping
                # cannot match the monolithic pyramid inside an exchangeable
                # halo, so bands tap mip0 only (same contract as the Pallas
                # warp path's fixed halo)
                mip = (0 if (use_pallas or not use_mips)
                       else min((3 * step) // max(num_steps, 1),
                                len(depth_pyr) - 1))
                off = tap_offset(s, sgn, step)
                if d_all is not None:
                    d = d_all[(s * 2 + side) * num_steps + step]
                elif mip == 0:
                    d = _tap_depth(depth, off[..., 0], off[..., 1], use_pallas)
                else:
                    uv_m = jnp.stack([(xi + off[..., 0]) / w,
                                      (yi + off[..., 1]) / fh], axis=-1)
                    d = bilinear_sample(depth_pyr[mip][..., None], uv_m)[..., 0]
                su = (xi + off[..., 0]) / w
                sv = (yi + off[..., 1]) / fh
                uv = jnp.stack([su, sv], axis=-1)
                sp = _uv_depth_to_view(uv, d, camera)
                delta = sp - pos
                dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-10))
                cos_h = jnp.sum(delta * v, -1) / dist
                # distance falloff (thin-object rejection)
                weight = jnp.clip(1.0 - (dist - falloff_from) /
                                  jnp.maximum(falloff_range, 1e-5), 0.0, 1.0)
                cos_h = cos_h * weight - (1.0 - weight)
                best_cos[side] = jnp.maximum(best_cos[side], cos_h)

        # side 0 marches +dir_px (screen) = +ortho (view; the y flip in
        # dir_px cancels the screen/view y flip), so side 0's horizon is the
        # POSITIVE angle h1 under n_angle's sign(n_proj . ortho) convention.
        # With the sides matched, both hemisphere clamps land exactly on the
        # true tangent-plane horizons (n ± π/2) for unoccluded geometry —
        # swapped, grazing-view flat surfaces lost ~0.35 visibility
        # (round-5 fix; XeGTAO ComputeAO side/angle pairing).
        h0 = -jnp.arccos(jnp.clip(best_cos[1], -1.0, 1.0))
        h1 = jnp.arccos(jnp.clip(best_cos[0], -1.0, 1.0))
        # clamp horizons to the normal hemisphere
        h0 = n_angle + jnp.maximum(h0 - n_angle, -PI / 2)
        h1 = n_angle + jnp.minimum(h1 - n_angle, PI / 2)
        # GTAO arc integral (cosine-weighted)
        a = (0.25 * (-jnp.cos(2.0 * h0 - n_angle) + jnp.cos(n_angle) + 2.0 * h0 * jnp.sin(n_angle))
             + 0.25 * (-jnp.cos(2.0 * h1 - n_angle) + jnp.cos(n_angle) + 2.0 * h1 * jnp.sin(n_angle)))
        visibility = visibility + n_proj_len * a

    return jnp.clip(visibility / num_slices, 0.0, 1.0)


def _uv_depth_to_view(uv: Array, depth: Array, camera: CameraAttribs) -> Array:
    z = depth_to_camera_z(depth, camera)
    x_ndc = uv[..., 0] * 2.0 - 1.0
    y_ndc = 1.0 - uv[..., 1] * 2.0
    return jnp.stack([x_ndc * z / camera.proj[0, 0],
                      y_ndc * z / camera.proj[1, 1], -z], axis=-1)


def bilateral_blur(ao: Array, depth: Array, camera: CameraAttribs,
                   radius: int = 3, depth_sigma: float = 0.05) -> Array:
    """Depth-aware separable blur (the SpatialReconstruction pass analogue)."""
    z = depth_to_camera_z(depth, camera)
    out = ao
    for axis in (0, 1):
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros_like(out)
        for d in range(-radius, radius + 1):
            a = jnp.roll(out, -d, axis=axis)
            zz = jnp.roll(z, -d, axis=axis)
            import math
            wz = jnp.exp(-jnp.abs(zz - z) / (depth_sigma * jnp.maximum(z, 1e-3)))
            wg = math.exp(-0.5 * (d / max(radius * 0.6, 1e-3)) ** 2)
            acc = acc + a * wz * wg
            wacc = wacc + wz * wg
        out = acc / jnp.maximum(wacc, 1e-6)
    return out


class SSAOState(NamedTuple):
    history: Array  # (H, W)
    # prev frame's CONVOLVED depth (blurred to the AO filter footprint) —
    # reprojected and compared against the current convolved depth to
    # validate history per pixel (the reference's convolved-depth-history
    # stage, ScreenSpaceAmbientOcclusion.hpp:144-152)
    depth_history: Optional[Array] = None  # (H, W)


@jax.named_scope("hn.ssao")
def apply_ssao(depth: Array, normal_vs: Array, camera: CameraAttribs,
               frame_index, settings: SSAOSettings = SSAOSettings(),
               state: Optional[SSAOState] = None,
               motion: Optional[Array] = None,
               half_resolution: bool = True,
               num_slices: int = 3, num_steps: int = 6,
               use_pallas: bool = False,
               disocclusion: Optional[Array] = None) -> Tuple[Array, SSAOState]:
    """Full SSAO effect (PrepareResources+Execute): AO compute (optionally at
    half res) over prefiltered depth mips, bilateral denoise, variance-guided
    temporal accumulation with prev-depth disocclusion, upsample.

    disocclusion: optional (H, W) bool — where history must be rejected
    (context.disocclusion_mask from the prev-frame depth buffer)."""
    h, w = depth.shape
    if half_resolution:
        d2 = depth[::2, ::2]
        n2 = normal_vs[::2, ::2]
        ao = compute_gtao(d2, n2, camera, frame_index, settings,
                          num_slices, num_steps, use_pallas=use_pallas)
        ao = bilateral_blur(ao, d2, camera)
        from diligentfx_tpu.ops.sampling import upsample_bilinear
        ao = upsample_bilinear(ao, 2, 2)[:h, :w]
    else:
        ao = compute_gtao(depth, normal_vs, camera, frame_index, settings,
                          num_slices, num_steps, use_pallas=use_pallas)
        ao = bilateral_blur(ao, depth, camera)

    conv_depth = convolved_depth(depth)
    ao, new_state = ssao_temporal(ao, conv_depth, state, motion, settings,
                                  use_pallas=use_pallas,
                                  disocclusion=disocclusion)
    return ao, new_state


def convolved_depth(depth: Array, band: Optional[BandCtx] = None) -> Array:
    """Current depth blurred to the AO filter footprint — the
    history-validation metric of the reference's denoiser
    (ScreenSpaceAmbientOcclusion.hpp:144-152 ConvolvedDepthHistory).
    With `band`, the 3×3 window rides one wrap-exchanged halo row so band
    results equal the monolithic frame's `jnp.roll` windows exactly."""
    h = depth.shape[0]
    src = depth if band is None else band.extend(depth, 1, wrap=True)
    conv = jnp.zeros_like(depth)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = jnp.roll(src, (dy, dx), axis=(0, 1))
            conv = conv + (s if band is None else s[1:1 + h])
    return conv / 9.0


def ssao_temporal(ao: Array, conv_depth: Array, state: Optional[SSAOState],
                  motion: Optional[Array],
                  settings: SSAOSettings = SSAOSettings(), *,
                  use_pallas: bool = False,
                  disocclusion: Optional[Array] = None,
                  band: Optional[BandCtx] = None
                  ) -> Tuple[Array, SSAOState]:
    """Variance-guided temporal accumulation with convolved-depth-validated
    resampled history (ScreenSpaceAmbientOcclusion.hpp:144-152) — shared by
    the single-chip pipeline and the sp-banded pipeline (`band`): banded
    history warps ride halo-exchanged rows with vertical motion clamped to
    the halo, and moment windows ride a wrap halo, so there is ONE temporal
    implementation (no banded fork)."""
    if state is None or motion is None:
        return ao, SSAOState(history=ao, depth_history=conv_depth)
    h, w = ao.shape
    xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    if band is None:
        yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
        prev_uv = jnp.stack([xg, yg], axis=-1) - motion
        hist_src = jnp.stack([state.history,
                              (state.depth_history
                               if state.depth_history is not None
                               else jnp.zeros_like(state.history))], axis=-1)
        samp_uv = prev_uv
        off_px = -motion * jnp.array([w, h], jnp.float32)
    else:
        halo = band.halo
        fh = band.full_h
        y0f = jnp.asarray(band.y0, jnp.float32)
        ygp = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + y0f + 0.5)
        my = jnp.clip(motion[..., 1] * fh, -(halo - 1.0), halo - 1.0)
        prev_uv = jnp.stack([xg - motion[..., 0], (ygp - my) / fh], axis=-1)
        hist_src = band.extend(
            jnp.stack([state.history,
                       (state.depth_history
                        if state.depth_history is not None
                        else jnp.zeros_like(state.history))], axis=-1),
            halo, wrap=False)
        samp_uv = jnp.stack(
            [prev_uv[..., 0], (ygp - my - y0f + halo) / (h + 2.0 * halo)],
            axis=-1)
        off_px = jnp.stack([-motion[..., 0] * w, -my], axis=-1)

    if use_pallas:
        from diligentfx_tpu.ops.warp_pallas import warp_bilinear_pallas
        if band is None:
            warped = warp_bilinear_pallas(hist_src, off_px, halo_r=8, halo_c=64)
        else:
            off_ext = jnp.pad(off_px, ((band.halo, band.halo), (0, 0), (0, 0)))
            warped = warp_bilinear_pallas(hist_src, off_ext,
                                          halo_r=8, halo_c=64)
            warped = warped[band.halo:band.halo + h]
    else:
        warped = bilinear_sample(hist_src, samp_uv)
    hist = warped[..., 0]
    hist_cd = warped[..., 1] if state.depth_history is not None else None

    # variance-guided accumulation (the ReBLUR-style history constraint,
    # ScreenSpaceAmbientOcclusion.hpp:147-150): clamp reprojected history
    # to the current frame's 3×3 AO distribution
    src = ao if band is None else band.extend(ao, 1, wrap=True)
    acc = jnp.zeros_like(ao)
    acc2 = jnp.zeros_like(ao)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = jnp.roll(src, (dy, dx), axis=(0, 1))
            if band is not None:
                s = s[1:1 + h]
            acc = acc + s
            acc2 = acc2 + s * s
    mean = acc / 9.0
    std = jnp.sqrt(jnp.maximum(acc2 / 9.0 - mean * mean, 0.0))
    hist = jnp.clip(hist, mean - 2.0 * std, mean + 2.0 * std)
    reject = ~((prev_uv[..., 0] >= 0) & (prev_uv[..., 0] <= 1)
               & (prev_uv[..., 1] >= 0) & (prev_uv[..., 1] <= 1))
    if disocclusion is not None:
        # "resampled history" semantics: a disoccluded pixel falls back
        # to the current (already spatially-denoised) AO entirely
        reject = reject | disocclusion
    alpha = jnp.where(reject, 1.0, 1.0 - settings.temporal_stability_factor)
    if hist_cd is not None:
        # resampled-history validation: down-weight history whose
        # reprojected convolved depth disagrees with the current one
        # (geometry moved/revealed under this pixel) — the per-pixel
        # complement of the global disocclusion mask
        rel = jnp.abs(hist_cd - conv_depth) / jnp.maximum(conv_depth, 1e-4)
        w_depth = jnp.exp(-rel * 16.0)
        alpha = 1.0 - (1.0 - alpha) * w_depth
    ao = hist + (ao - hist) * alpha
    return ao, SSAOState(history=ao, depth_history=conv_depth)
