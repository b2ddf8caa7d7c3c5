"""Screen-space reflections — the analogue of
PostProcess/ScreenSpaceReflection (FidelityFX-SSSR-style stochastic SSR;
passes at interface:145-154: depth hierarchy, ray march, spatial
reconstruction, temporal accumulation, bilateral cleanup).

Ray marching: screen-space march in uv/depth space over a min-depth pyramid —
a fixed-budget coarse march with per-pixel early-exit masking plus a binary
refinement, rather than the reference's per-ray variable-length hi-Z DDA
(data-dependent loop lengths are hostile to SPMD; the fixed budget matches
`MaxTraversalIntersections` = 64 default, SSR README:70).

Stochastic roughness: ray directions jitter by GGX-VNDF sampling driven by the
analytic R2 noise (context.py), matching the blue-noise VNDF sampling of the
reference; rough-surface results are averaged by the spatial reconstruction
pass and stabilized temporally.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.math3d import normalize, reflect, saturate
from diligentfx_tpu.ops.sampling import bilinear_sample
from diligentfx_tpu.pbr.brdf import smith_ggx_sample_visible_normal
from diligentfx_tpu.postfx.context import r2_noise_pair
from diligentfx_tpu.postfx.ssao import view_space_position

Array = jax.Array


class SSRSettings(NamedTuple):
    """ScreenSpaceReflectionAttribs analogue."""
    max_traversal_intersections: int = 48      # static: march budget
    depth_buffer_thickness: Array = jnp.float32(0.15)  # world units
    roughness_threshold: Array = jnp.float32(0.4)      # fade out above
    ggx_importance_sample_bias: Array = jnp.float32(0.3)
    temporal_stability_factor: Array = jnp.float32(0.9)
    spatial_reconstruction_radius: Array = jnp.float32(3.0)


class SSRState(NamedTuple):
    radiance: Array   # (h, w, 4) rgb + confidence history, at PROCESSING res


def ssr_state_shape(height: int, width: int,
                    resolution_divisor: int = 0,
                    half_resolution: bool = False) -> Tuple[int, int]:
    """Shape of the temporal history (temporal accumulation runs at the
    march resolution, not full res — 16x fewer history gathers at d=4)."""
    d = resolution_divisor or (2 if half_resolution else 1)
    return (-(-height // d), -(-width // d))


def build_min_depth_pyramid(depth: Array, levels: int = 5):
    """Hierarchical min-depth chain (the ComputeHierarchicalDepthBuffer pass)."""
    mips = [depth]
    cur = depth
    for _ in range(levels - 1):
        h, w = cur.shape
        if h < 2 or w < 2:
            break
        h2, w2 = h // 2 * 2, w // 2 * 2
        c = cur[:h2, :w2]
        cur = jnp.minimum(
            jnp.minimum(c[0::2, 0::2], c[1::2, 0::2]),
            jnp.minimum(c[0::2, 1::2], c[1::2, 1::2]))
        mips.append(cur)
    return mips


def _march(depth_mips, origin_uvz: Array, dir_uvz: Array, steps: int,
           thickness_ndc: Array, coarse_mip: int = 2,
           use_pallas: bool = False,
           march_sweep: str = "dyn") -> Tuple[Array, Array]:
    """Fixed-budget coarse march + secant refinement.
    origin/dir in (u, v, ndc_z) space.  Returns (hit_uvz, hit_mask).

    TPU shape: the sample positions before the first crossing are a fixed
    affine sequence o + d*(i+1)*dt, so the whole march is ONE batched
    (S, h, w) gather instead of S sequential point samples in a fori_loop —
    gathers are the cost unit here (PERF_NOTES.md) and one big gather runs
    at wall rate while a sequential loop pays per-step dispatch.  The
    reference's per-ray variable-length hi-Z DDA (SSR README:70) early-exits
    instead; uniform work + argmax is the SPMD equivalent.  Refinement is a
    secant step on the already-gathered bracket values plus one bilinear tap
    on the fine buffer (vs a 6-iteration binary search = 6 more gathers)."""
    from diligentfx_tpu.ops.sampling import point_sample
    # the Pallas march needs the whole table in one 128-lane extent
    # (PERF_NOTES.md: Mosaic per-lane gather range); walk down the pyramid
    # until it fits — marching a coarser mip at higher march resolution
    # keeps the zero-HBM-gather path at ANY resolution divisor, and the
    # two-stage secant (coarse bracket + fine-buffer correction below)
    # recovers the precision the coarser table loses.
    cm = min(coarse_mip, len(depth_mips) - 1)
    if use_pallas:
        while cm < len(depth_mips) - 1 and depth_mips[cm].shape[1] > 128:
            cm += 1
    coarse = depth_mips[cm]
    fine = depth_mips[0]
    dt = 1.0 / steps

    if use_pallas and coarse.shape[1] <= 128:
        # the whole coarse mip lives in VMEM: the march needs ZERO HBM
        # gathers (the XLA batched march below gathers (S+1)·h·w rows,
        # ~20 ms at 1080p/div4 — PERF_NOTES.md)
        from diligentfx_tpu.ops.march_pallas import march_small_table_pallas
        h, w = origin_uvz.shape[:2]
        ph, pw = (-h) % 8, (-w) % 128
        o_p = jnp.pad(origin_uvz, ((0, ph), (0, pw), (0, 0)), mode="edge")
        d_p = jnp.pad(dir_uvz, ((0, ph), (0, pw), (0, 0)), mode="edge")
        t_lo, t_hit, hit = march_small_table_pallas(
            coarse, o_p, d_p, thickness_ndc, steps=steps, sweep=march_sweep)
        t_lo, t_hit, hit = t_lo[:h, :w], t_hit[:h, :w], hit[:h, :w]
    else:
        ts = jnp.arange(steps + 1, dtype=jnp.float32) * dt           # (S+1,)
        p = origin_uvz[None] + dir_uvz[None] * ts[:, None, None, None]
        # march the FINE buffer: an XLA gather costs per ROW, independent of
        # which mip it reads — and the min-pooled coarse mips POLLUTE far
        # surfaces near thin-feature silhouettes (a real crossing sampled
        # through a polluted texel fails the acceptance window; 27% miss on
        # the fidelity railing scene vs 3.8% fine, tests/
        # test_ssr_march_fidelity.py).  The coarse table exists for the
        # Pallas path's VMEM residency, not for XLA.
        d = point_sample(fine[..., None], p[..., :2])[..., 0]        # (S+1,h,w)
        z = p[..., 2]
        f = z - d
        inside = ((p[..., 0] > 0) & (p[..., 0] < 1)
                  & (p[..., 1] > 0) & (p[..., 1] < 1))
        # a hit is a true front-to-back CROSSING: in front of the depth at
        # the previous sample (f <= 0), behind it within thickness at this
        # one.  This also kills self-intersection with the ray's own sloped
        # surface (those rays are born with f > 0 and never produce a sign
        # change).  The acceptance window scales with the per-step z
        # advance: an immediate opaque crossing overshoots by at most one
        # step of ray z, while passing BEHIND a thin silhouette jumps by
        # the (much larger) depth gap.
        #
        # The crossing is tested against the ENTRY texel's depth plane, the
        # EXIT texel's, and the mixed secant (same trio as the Pallas DDA,
        # ops/march_pallas.py _dda_body): min-pooled thin near features
        # pollute single texels, and a real far-surface crossing sampled
        # through such a texel fails the mixed window (26.9% miss on the
        # fidelity test's railing scene before this).
        step_dz = jnp.abs(dir_uvz[..., 2]) * dt
        win = thickness_ndc + step_dz

        def bracket(g0, g1):
            cross = (g0 <= 0) & (g1 > 0) & (g1 < win) & inside[1:]
            denom = g1 - g0
            frac = jnp.where(jnp.abs(denom) > 1e-12, -g0 / denom, 1.0)
            return cross, jnp.clip(frac, 0.0, 1.0)

        c_a, fr_a = bracket(f[:-1], z[1:] - d[:-1])     # entry-texel plane
        c_b, fr_b = bracket(z[:-1] - d[1:], f[1:])      # exit-texel plane
        c_m, fr_m = bracket(f[:-1], f[1:])              # mixed secant
        cross = c_a | c_b | c_m
        # first valid sub-step t* per step (first-hit also within a step)
        frac_all = jnp.minimum(
            jnp.minimum(jnp.where(c_a, fr_a, jnp.inf),
                        jnp.where(c_b, fr_b, jnp.inf)),
            jnp.where(c_m, fr_m, jnp.inf))
        hit = cross.any(axis=0)
        i0 = jnp.argmax(cross, axis=0)                               # (h,w)
        frac = jnp.take_along_axis(
            jnp.where(jnp.isfinite(frac_all), frac_all, 1.0), i0[None], 0)[0]
        t_lo = i0.astype(jnp.float32) * dt
        t_hit = t_lo + frac * dt

    # fine-buffer correction: ONE batched gather taps the fine depth at both
    # bracket ends; a second secant runs purely on fine values.  The Pallas
    # perf path uses point taps (2 gathers); bilinear (8 gathers, ~3x the
    # pass cost at div2) only improves the bracket by sub-texel smoothing
    # the secant already provides.
    p_pair = (origin_uvz[None]
              + dir_uvz[None] * jnp.stack([t_lo, t_hit])[..., None])  # (2,h,w,3)
    if use_pallas:
        d_fine = point_sample(fine[..., None], p_pair[..., :2])[..., 0]
    else:
        d_fine = bilinear_sample(fine[..., None], p_pair[..., :2])[..., 0]
    f_lo = p_pair[0, ..., 2] - d_fine[0]
    f_hi = p_pair[1, ..., 2] - d_fine[1]
    denom = f_hi - f_lo
    frac2 = jnp.clip(jnp.where(jnp.abs(denom) > 1e-12, -f_lo / denom, 1.0),
                     0.0, 1.0)
    bracket = (f_hi > 0) & (f_lo < 0)
    t2 = jnp.where(bracket, t_lo + frac2 * (t_hit - t_lo), t_hit)
    hit_uvz = origin_uvz + dir_uvz * t2[..., None]
    return hit_uvz, hit


def _neighborhood_moments(x: Array) -> Tuple[Array, Array]:
    """3×3 mean/σ via shifts (no gathers) — for variance-guided history."""
    acc = jnp.zeros_like(x)
    acc2 = jnp.zeros_like(x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = jnp.roll(x, (dy, dx), axis=(0, 1))
            acc = acc + s
            acc2 = acc2 + s * s
    mean = acc / 9.0
    var = jnp.maximum(acc2 / 9.0 - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


def bilateral_cleanup(radiance: Array, depth_r: Array, rough_r: Array,
                      camera: CameraAttribs, radius: int = 3) -> Array:
    """The reference's final SSR pass (ComputeBilateralCleanup,
    ScreenSpaceReflection.hpp:154): depth- and roughness-aware separable
    blur whose strength scales with roughness — mirrors stay sharp, rough
    reflections lose residual stochastic noise."""
    from diligentfx_tpu.postfx.context import depth_to_camera_z
    z = depth_to_camera_z(depth_r, camera)
    amount = saturate(rough_r[..., 0] * 4.0)                 # (h, w)
    out = radiance
    for axis in (0, 1):
        acc = out
        wacc = jnp.ones_like(z)
        for d in range(1, radius + 1):
            for sgn in (-1, 1):
                s = jnp.roll(out, sgn * d, axis=axis)
                zz = jnp.roll(z, sgn * d, axis=axis)
                rr = jnp.roll(rough_r[..., 0], sgn * d, axis=axis)
                wz = jnp.exp(-jnp.abs(zz - z) / (0.05 * jnp.maximum(z, 1e-3)))
                wr = jnp.exp(-jnp.abs(rr - rough_r[..., 0]) * 8.0)
                wg = float(np_exp(-0.5 * (d / max(radius * 0.6, 1e-3)) ** 2))
                wgt = wz * wr * wg * amount
                acc = acc + s * wgt[..., None]
                wacc = wacc + wgt
        out = acc / wacc[..., None]
    return out


def np_exp(x):
    import math
    return math.exp(x)


@jax.named_scope("hn.ssr")
def compute_ssr(color: Array, depth: Array, normal_vs: Array, roughness: Array,
                camera: CameraAttribs, frame_index,
                settings: SSRSettings = SSRSettings(),
                state: Optional[SSRState] = None,
                motion: Optional[Array] = None,
                half_resolution: bool = False,
                resolution_divisor: int = 0,
                disocclusion: Optional[Array] = None,
                use_pallas: bool = False,
                enable_spatial: bool = True,
                enable_temporal: bool = True,
                enable_bilateral: bool = True,
                stage_cut: str = "",
                march_sweep: str = "dyn") -> Tuple[Array, SSRState]:
    """Full SSR: returns ((H, W, 4) radiance+confidence, new state).

    color: scene radiance to reflect (pre-tonemap); normal_vs view-space.
    """
    full_h, full_w = depth.shape
    d = resolution_divisor or (2 if half_resolution else 1)
    if d > 1:
        depth_r = depth[::d, ::d]
        normal_r = normal_vs[::d, ::d]
        rough_r = roughness[::d, ::d]
        half_resolution = True
    else:
        depth_r, normal_r, rough_r = depth, normal_vs, roughness
    h, w = depth_r.shape

    pos = view_space_position(depth_r, camera)
    v = normalize(-pos)

    # GGX-VNDF jittered reflection direction in view space
    noise = r2_noise_pair(h, w, frame_index)
    n = normal_r
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.99,
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape))
    t_b = normalize(jnp.cross(up, n))
    b_b = jnp.cross(n, t_b)
    v_ts = jnp.stack([jnp.sum(v * t_b, -1), jnp.sum(v * b_b, -1),
                      jnp.sum(v * n, -1)], axis=-1)
    alpha = jnp.clip(rough_r * rough_r * (1.0 - settings.ggx_importance_sample_bias),
                     1e-4, 1.0)
    h_ts = smith_ggx_sample_visible_normal(
        v_ts, alpha[..., 0], alpha[..., 0], noise[..., 0], noise[..., 1])
    h_vs = (h_ts[..., 0:1] * t_b + h_ts[..., 1:2] * b_b + h_ts[..., 2:3] * n)
    r_dir = normalize(reflect(-v, normalize(h_vs)))

    # endpoints in uv/ndc-z space: extend the ray to the near/far plane
    # (the reference's hi-Z DDA walks the full screen; a short fixed-length
    # ray can't reach distant reflectors), then clip to the screen rect
    # below so every march sample lands on-screen.
    p0 = pos
    rz_d = r_dir[..., 2]
    t_far = jnp.where(rz_d < -1e-6,
                      (-(camera.far_z * 0.99) - p0[..., 2]) / rz_d, jnp.inf)
    t_near = jnp.where(rz_d > 1e-6,
                       (-(camera.near_z * 1.01) - p0[..., 2]) / rz_d, jnp.inf)
    ray_len = jnp.clip(jnp.minimum(t_far, t_near), 0.1,
                       2.0 * camera.far_z)[..., None]
    p1 = pos + r_dir * ray_len

    def to_uvz(p_vs):
        clip = jnp.stack([
            p_vs[..., 0] * camera.proj[0, 0],
            p_vs[..., 1] * camera.proj[1, 1],
            p_vs[..., 2] * camera.proj[2, 2] + camera.proj[3, 2],
            -p_vs[..., 2],
        ], axis=-1)
        wc = jnp.maximum(clip[..., 3:4], 1e-5)
        ndc = clip[..., :3] / wc
        return jnp.stack([ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5,
                          ndc[..., 2]], axis=-1)

    import os
    _cut = stage_cut or os.environ.get("DFX_SSR_STAGE", "")

    def _fabricate(*keep):
        """Truncate the SSR graph here (profiling bisect, fresh process per
        setting): checksum the prefix so it stays live, fabricate the rest."""
        chk = sum(jnp.sum(k) * 1e-20 for k in keep)
        rad = jnp.broadcast_to(chk, (h, w, 1)) * jnp.ones((h, w, 4))
        st = SSRState(radiance=rad)
        up = jnp.broadcast_to(chk, (full_h, full_w, 1)) * jnp.ones(
            (full_h, full_w, 4))
        return (up if half_resolution else rad), st

    o_uvz = to_uvz(p0)
    e_uvz = to_uvz(p1)
    dir_uvz = e_uvz - o_uvz
    # clip the uv segment to the screen rect: concentrates the fixed march
    # budget on the visible portion of the ray
    eps = 1e-6
    du, dvv = dir_uvz[..., 0], dir_uvz[..., 1]
    sx = jnp.where(du > eps, (1.0 - o_uvz[..., 0]) / du,
                   jnp.where(du < -eps, -o_uvz[..., 0] / du, jnp.inf))
    sy = jnp.where(dvv > eps, (1.0 - o_uvz[..., 1]) / dvv,
                   jnp.where(dvv < -eps, -o_uvz[..., 1] / dvv, jnp.inf))
    s = jnp.clip(jnp.minimum(jnp.minimum(sx, sy), 1.0), 1e-4, 1.0)
    dir_uvz = dir_uvz * s[..., None]
    # small offset off the surface to avoid self-intersection
    o_uvz = o_uvz + dir_uvz * 0.01

    if _cut == "setup":
        return _fabricate(o_uvz, dir_uvz, alpha)
    mips = build_min_depth_pyramid(depth_r, 4)
    # thickness in NDC at this depth (approximate scale)
    thick = settings.depth_buffer_thickness / jnp.maximum(
        camera.far_z - camera.near_z, 1e-3)
    hit_uvz, hit = _march(mips, o_uvz, dir_uvz,
                          settings.max_traversal_intersections, thick,
                          use_pallas=use_pallas, march_sweep=march_sweep)
    if _cut == "march":
        return _fabricate(hit_uvz, hit.astype(jnp.float32))

    # reject hits whose surface doesn't face the ray (FFX-SSSR style): kills
    # the false crossings a grazing ray makes skimming its own reflector
    # (the point-sampled depth staircase oscillates around such rays)
    from diligentfx_tpu.ops.sampling import point_sample
    if use_pallas:
        # gathers cost per ROW regardless of width (PERF_NOTES.md): pack
        # [normal, color] into one march-res table so the hit-normal
        # rejection and the radiance tap share ONE gather.  Color is
        # decimated to march res — the reference's intersection pass also
        # samples its radiance at the SSR processing resolution
        # (SSR_ComputeIntersection.fx runs at the half-res dispatch); the
        # BRDF-weighted spatial reconstruction + temporal pass filter it.
        color_r = color[::d, ::d] if d > 1 else color
        packed_nc = jnp.concatenate([normal_r, color_r], axis=-1)
        vals = point_sample(packed_nc, hit_uvz[..., :2])
        n_hit = vals[..., :3]
        refl = vals[..., 3:6]
    else:
        n_hit = point_sample(normal_r, hit_uvz[..., :2])
        # radiance at the hit: the reference's single linear tap
        refl = bilinear_sample(color, hit_uvz[..., :2])
    hit = hit & (jnp.sum(n_hit * r_dir, axis=-1) < -0.05)
    # fades: screen edge, ray facing camera, roughness
    edge = (saturate(10.0 * (0.5 - jnp.abs(hit_uvz[..., 0:1] - 0.5)))
            * saturate(10.0 * (0.5 - jnp.abs(hit_uvz[..., 1:2] - 0.5))))
    rough_fade = saturate((settings.roughness_threshold - rough_r)
                          / jnp.maximum(settings.roughness_threshold, 1e-3) * 4.0)
    conf = hit[..., None].astype(jnp.float32) * edge * rough_fade
    radiance = jnp.concatenate([refl * conf, conf], axis=-1)
    if _cut == "taps":
        return _fabricate(radiance)

    # spatial reconstruction: BRDF-PDF-weighted neighborhood ray reuse
    # (SSR_ComputeSpatialReconstruction.fx semantics: each neighbor's ray is
    # re-weighted by THIS pixel's BRDF response to that ray over the
    # neighbor's sampling pdf — importance resampling of the stochastic
    # VNDF rays; ScreenSpaceReflection.hpp:145-154).  Replaces the round-3
    # unweighted 5-tap cross: edges stay sharp where BRDF lobes disagree,
    # rough lobes denoise across all 8 neighbors.
    if enable_spatial:
        a_c = alpha[..., 0]
        ndotv_c = jnp.maximum(jnp.sum(n * v, axis=-1), 1e-4)

        def g1(ndx, a2):
            return 2.0 * ndx / jnp.maximum(
                ndx + jnp.sqrt(a2 + (1.0 - a2) * ndx * ndx), 1e-6)

        def ggx_d(ndoth, a2):
            f = ndoth * ndoth * (a2 - 1.0) + 1.0
            return a2 / jnp.maximum(3.14159265 * f * f, 1e-8)

        # neighbor VNDF pdf (computed once, rolled with the ray):
        # pdf(r) = G1(v) * D(h) / (4 (n·v))
        ndoth_s = jnp.maximum(jnp.sum(n * normalize(h_vs), axis=-1), 0.0)
        a2_s = a_c * a_c
        pdf_s = (g1(ndotv_c, a2_s) * ggx_d(ndoth_s, a2_s)
                 / jnp.maximum(4.0 * ndotv_c, 1e-4))

        acc = radiance                      # center: weight 1 (w_c/pdf_c ≈ 1)
        wsum = jnp.ones_like(rough_r[..., 0])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                r_j = jnp.roll(r_dir, (dy, dx), axis=(0, 1))
                pdf_j = jnp.roll(pdf_s, (dy, dx), axis=(0, 1))
                rad_j = jnp.roll(radiance, (dy, dx), axis=(0, 1))
                # THIS pixel's BRDF response to the neighbor's ray
                h_t = normalize(v + r_j)
                ndoth_t = jnp.maximum(jnp.sum(n * h_t, axis=-1), 0.0)
                ndotl_t = jnp.maximum(jnp.sum(n * r_j, axis=-1), 0.0)
                a2_c = a_c * a_c
                w_j = (ggx_d(ndoth_t, a2_c) * g1(ndotv_c, a2_c) * ndotl_t
                       / jnp.maximum(4.0 * ndotv_c * pdf_j, 1e-4))
                w_j = jnp.minimum(w_j, 4.0)  # clamp fireflies from tiny pdfs
                acc = acc + rad_j * w_j[..., None]
                wsum = wsum + w_j
        recon = acc / wsum[..., None]
        # mirror-like pixels keep their own ray; rough lobes take the
        # reconstruction (the reference scales its kernel by roughness too)
        blur_amt = saturate(rough_r * 4.0)
        radiance = radiance + (recon - radiance) * blur_amt

    # temporal accumulation at the PROCESSING resolution — the history
    # buffer and its reprojection gathers live on the (h, w) grid, which
    # is d^2 cheaper than full-res accumulation and just as stable (the
    # upsample after it smooths residual quarter-res ghosting).
    if enable_temporal and state is not None and motion is not None:
        motion_r = motion[::d, ::d] if d > 1 else motion
        xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
        yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
        prev_uv = jnp.stack([xg, yg], axis=-1) - motion_r
        if use_pallas and d <= 2:
            # bounded-offset windowed warp (zero HBM gathers) — the TAA
            # history pattern (ops/warp_pallas.py); offsets beyond the halo
            # clamp, and those pixels are rejected below anyway (off-screen
            # prev_uv or disocclusion).  d >= 4 keeps the XLA bilinear: the
            # remote compiler emits a faulting program when this warp joins
            # the full div4 SSR graph (kernel-standalone and div2 are fine;
            # deterministic UNAVAILABLE fault, cache-independent — see
            # PERF_NOTES.md round 3), and the quarter-res history gather is
            # cheap anyway.
            from diligentfx_tpu.ops.warp_pallas import warp_bilinear_pallas
            off = -motion_r * jnp.array([w, h], jnp.float32)
            ph, pw = (-h) % 8, (-w) % 128
            hist_p = warp_bilinear_pallas(
                jnp.pad(state.radiance, ((0, ph), (0, pw), (0, 0))),
                jnp.pad(off, ((0, ph), (0, pw), (0, 0))))
            hist = hist_p[:h, :w]
        else:
            hist = bilinear_sample(state.radiance, prev_uv)
        # variance-guided accumulation (ComputeTemporalAccumulation,
        # ScreenSpaceReflection.hpp:152): clamp the reprojected history to
        # the current frame's 3×3 distribution so stale reflections can't
        # survive outside it (kills smearing without a hard reset)...
        mean, std = _neighborhood_moments(radiance)
        hist = jnp.clip(hist, mean - 2.0 * std, mean + 2.0 * std)
        reject = ~((prev_uv[..., 0] >= 0) & (prev_uv[..., 0] <= 1)
                   & (prev_uv[..., 1] >= 0) & (prev_uv[..., 1] <= 1))
        if disocclusion is not None:
            # ...and reject it outright where the prev-frame depth says the
            # history tap sees a different surface (PostFXContext prev/
            # reprojected depth products, hpp:178-188).
            dis_r = disocclusion[::d, ::d] if d > 1 else disocclusion
            reject = reject | dis_r
        a = jnp.where(reject[..., None],
                      1.0, 1.0 - settings.temporal_stability_factor)
        radiance = hist + (radiance - hist) * a
    # bilateral cleanup (the reference's 7th pass): roughness/depth-aware
    if enable_bilateral:
        radiance = bilateral_cleanup(radiance, depth_r, rough_r, camera)
    new_state = SSRState(radiance=radiance)

    if half_resolution:
        # gather-free phase-interleave upsample (resize lowers to gathers)
        from diligentfx_tpu.ops.sampling import upsample_bilinear
        radiance = upsample_bilinear(radiance, d, d)[:full_h, :full_w]
    return radiance, new_state
