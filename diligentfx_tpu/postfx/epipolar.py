"""Epipolar light scattering — the analogue of
PostProcess/EpipolarLightScattering (3,344 host + 3,929 shader LoC; Intel
Outdoor Light Scattering-based, README:6): Rayleigh+Mie atmosphere with
precomputed optical-depth LUT, inscattering computed on an epipolar grid of
`num_slices × samples_per_slice` points instead of per pixel
(EpipolarLightScatteringStructures.fxh:97-160), shadowed ray marching (god
rays), epipolar→screen unwarp with depth-break correction, sun disk, and
auto-exposure measurement.

TPU-first deviations (documented per SURVEY.md §7 step 7):
  * The adaptive sample-refinement / interpolation-source search of the
    reference (data-dependent) is replaced by a fixed ray-march budget at
    EVERY epipolar sample — uniform SPMD work at equal-or-better quality.
  * The 1D min/max shadow binary tree becomes direct cascaded-shadow-map
    sampling at each march step (the tree accelerates divergent DDA on GPUs;
    fixed-step marching on TPU is already coherent).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.ops.sampling import bilinear_sample
from diligentfx_tpu.postfx.context import depth_to_camera_z, reconstruct_world_pos

Array = jax.Array
PI = 3.141592653589793

# Earth atmosphere constants (EpipolarLightScatteringStructures.fxh:180-246)
EARTH_RADIUS = 6_360_000.0
ATMOSPHERE_TOP = 6_420_000.0
BETA_RAYLEIGH = jnp.array([5.802e-6, 13.558e-6, 33.1e-6])
BETA_MIE = jnp.array([3.996e-6, 3.996e-6, 3.996e-6])
BETA_MIE_EXT = BETA_MIE / 0.9
BETA_OZONE = jnp.array([0.650e-6, 1.881e-6, 0.085e-6])
H_RAYLEIGH = 7994.0
H_MIE = 1200.0


class EpipolarSettings(NamedTuple):
    """EpipolarLightScatteringAttribs analogue (dynamic)."""
    num_epipolar_slices: int = 512        # static (structures fxh:101)
    max_samples_in_slice: int = 256       # static (structures fxh:104)
    num_ray_march_steps: int = 32         # static fixed budget
    # sample refinement (RefineSampleLocations / interpolation-source search,
    # EpipolarLightScattering.cpp:2393-2700): > 1 marches only every
    # `refinement_factor`-th sample plus a fixed budget of depth-break
    # samples (compacted, see _apply_impl); smooth spans interpolate along
    # the slice.  1 = march every sample (round-3 behavior).
    refinement_factor: int = 1            # static
    refinement_budget_div: int = 8        # static: budget = S*N // div
    # 1D min/max shadow tree (Build1DMinMaxMipMap analogue): the shadowed
    # march tests spans of the per-slice shadow line instead of PCF-sampling
    # the cascade maps per step — 1 packed gather/step instead of 4
    use_minmax_tree: bool = False         # static
    minmax_tree_res: int = 512            # static: base cells per slice line
    # Single-scattering LUT fast mode (SINGLE_SCTR_MODE_LUT,
    # RayMarch.fx:523-567 + precompute/PrecomputeSingleScattering.fx): the
    # per-sample march is replaced by cumulative-table lookups; shadowed
    # samples use the reference's own contiguous-lit-section approximation
    # (fDistToFirstLitSection / fTotalLitLength).  See
    # _build_sctr_cumulative for the tpu recast of the 4D LUT.
    single_sctr_lut: bool = False         # static
    mie_g: Array = jnp.float32(0.76)
    sun_intensity: Array = jnp.float32(20.0)
    scene_scale: Array = jnp.float32(1.0)  # world units → meters
    base_altitude: Array = jnp.float32(50.0)
    sun_angular_radius: Array = jnp.float32(0.00935)  # ~0.535°


def _density(h):
    """(rayleigh, mie) relative densities at altitude h meters."""
    hc = jnp.clip(h, 0.0, ATMOSPHERE_TOP - EARTH_RADIUS)
    return jnp.exp(-hc / H_RAYLEIGH), jnp.exp(-hc / H_MIE)


@functools.partial(jax.jit, static_argnames=("height_res", "angle_res", "steps"))
def precompute_optical_depth_lut(height_res: int = 64, angle_res: int = 128,
                                 steps: int = 64) -> Array:
    """(height_res, angle_res, 2) optical depth (Rayleigh, Mie densities
    integrated) from altitude h toward zenith angle θ to the atmosphere top —
    the PrecomputeNetDensityToAtmTop pass."""
    h_top = ATMOSPHERE_TOP - EARTH_RADIUS
    hs = (jnp.arange(height_res) + 0.5) / height_res
    hs = hs * hs * h_top                                # quadratic packing
    cz = (jnp.arange(angle_res) + 0.5) / angle_res * 2.0 - 1.0
    h, c = jnp.meshgrid(hs, cz, indexing="ij")

    r0 = EARTH_RADIUS + h
    # ray-sphere exit distance to atmosphere top
    b = r0 * c
    disc = b * b - (r0 * r0 - ATMOSPHERE_TOP * ATMOSPHERE_TOP)
    t_exit = -b + jnp.sqrt(jnp.maximum(disc, 0.0))
    ds = t_exit / steps

    def body(i, acc):
        t = (i + 0.5) * ds
        r = jnp.sqrt(r0 * r0 + t * t + 2.0 * r0 * t * c)
        dr, dm = _density(r - EARTH_RADIUS)
        return (acc[0] + dr * ds, acc[1] + dm * ds)

    odr, odm = jax.lax.fori_loop(0, steps, body,
                                 (jnp.zeros_like(h), jnp.zeros_like(h)))
    return jnp.stack([odr, odm], axis=-1)


@functools.partial(jax.jit, static_argnames=("height_res", "angle_res",
                                              "num_dirs", "steps"))
def precompute_multiple_scattering_lut(optical_lut: Array,
                                       height_res: int = 32,
                                       angle_res: int = 32,
                                       num_dirs: int = 64,
                                       steps: int = 20) -> Array:
    """(height_res, angle_res, 3) isotropic multiple-scattering transfer
    Psi_ms(altitude, sun cos-zenith) — the analogue of the reference's
    precomputed multiple-scattering LUTs (EpipolarLightScattering
    precompute/*.fx 4D tables), in the production-proven 2D formulation
    (Hillaire 2020, UE Sky Atmosphere): second-order inscatter L2 and the
    isotropic transfer factor f_ms are integrated over a uniform sphere of
    directions, and the geometric series of higher orders closes to
    Psi = L2 / (1 - f_ms)."""
    h_top = ATMOSPHERE_TOP - EARTH_RADIUS
    hs = (jnp.arange(height_res) + 0.5) / height_res
    hs = hs * hs * h_top
    mu = (jnp.arange(angle_res) + 0.5) / angle_res * 2.0 - 1.0
    h, mu_s = jnp.meshgrid(hs, mu, indexing="ij")         # (H, A)

    # Fibonacci sphere directions (D, 3): y = zenith component
    k = jnp.arange(num_dirs, dtype=jnp.float32)
    ga = PI * (3.0 - jnp.sqrt(5.0))
    y = 1.0 - 2.0 * (k + 0.5) / num_dirs
    rad = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    dirs_y = y                                            # cos zenith of ray
    # azimuth only matters via nothing (the integrand is azimuth-symmetric
    # once T_sun uses the local sun zenith), so dirs reduce to their zenith
    del ga, rad

    r0 = EARTH_RADIUS + h                                 # (H, A)

    def ray_exit(c):
        b = r0 * c
        disc_top = b * b - (r0 * r0 - ATMOSPHERE_TOP * ATMOSPHERE_TOP)
        t_top = -b + jnp.sqrt(jnp.maximum(disc_top, 0.0))
        disc_g = b * b - (r0 * r0 - EARTH_RADIUS * EARTH_RADIUS)
        hits_g = (disc_g > 0.0) & (c < 0.0)
        t_g = -b - jnp.sqrt(jnp.maximum(disc_g, 0.0))
        return jnp.where(hits_g, jnp.maximum(t_g, 0.0), t_top)

    uniform_phase = 1.0 / (4.0 * PI)

    def one_dir(c):                                       # c: scalar cos zenith
        c = jnp.broadcast_to(c, h.shape)
        t_end = ray_exit(c)
        ds = t_end / steps

        def body(i, carry):
            l2, fms, tau = carry
            t = (i + 0.5) * ds
            r = jnp.sqrt(r0 * r0 + t * t + 2.0 * r0 * t * c)
            alt = r - EARTH_RADIUS
            dr, dm = _density(alt)
            sig_s = (BETA_RAYLEIGH * dr[..., None]
                     + BETA_MIE * dm[..., None])          # (H, A, 3)
            sig_t = (BETA_RAYLEIGH * dr[..., None]
                     + BETA_MIE_EXT * dm[..., None])
            trans = jnp.exp(-tau)
            t_sun = _transmittance_to_sun(optical_lut, alt, mu_s)
            seg = ds[..., None]
            l2 = l2 + trans * sig_s * t_sun * uniform_phase * seg
            fms = fms + trans * sig_s * uniform_phase * seg
            tau = tau + sig_t * seg
            return l2, fms, tau

        z3 = jnp.zeros(h.shape + (3,))
        l2, fms, _ = jax.lax.fori_loop(0, steps, body, (z3, z3, z3))
        return l2, fms

    l2s, fmss = jax.vmap(one_dir)(dirs_y)                 # (D, H, A, 3)
    l2 = l2s.mean(0) * (4.0 * PI)      # sphere integral of the dir average
    fms = fmss.mean(0) * (4.0 * PI)
    return l2 / jnp.maximum(1.0 - fms, 1e-3)


def _sample_ms_lut(ms_lut: Array, h, cos_sun_zenith):
    return bilinear_sample(ms_lut, _lut_uv(h, cos_sun_zenith))


def _lut_uv(h, cos_zenith):
    h_top = ATMOSPHERE_TOP - EARTH_RADIUS
    u = (cos_zenith + 1.0) * 0.5
    v = jnp.sqrt(jnp.clip(h / h_top, 0.0, 1.0))
    return jnp.stack([u, v], axis=-1)


def _transmittance_to_sun(lut: Array, h, cos_zenith):
    od = bilinear_sample(lut, _lut_uv(h, cos_zenith))
    tau = (BETA_RAYLEIGH * od[..., 0:1] + BETA_MIE_EXT * od[..., 1:2]
           + BETA_OZONE * od[..., 0:1] * 6e-7 / 8e-6)
    return jnp.exp(-tau)


def phase_rayleigh(c):
    return 3.0 / (16.0 * PI) * (1.0 + c * c)


def phase_mie(c, g):
    """Cornette-Shanks."""
    g2 = g * g
    return (3.0 / (8.0 * PI) * (1.0 - g2) * (1.0 + c * c)
            / ((2.0 + g2) * jnp.power(jnp.maximum(
                1.0 + g2 - 2.0 * g * c, 1e-6), 1.5)))


def _inscatter_march(lut, origins, directions, lengths, sun_dir, s: EpipolarSettings,
                     shadow_fn=None, ms_lut=None, jitter=None):
    """Single-scattering inscatter + transmittance along rays, plus the
    isotropic multiple-scattering ambient term when `ms_lut` is given
    (precompute_multiple_scattering_lut).

    origins/directions (..., 3) world; lengths (...,); returns
    (inscatter (..., 3), transmittance (..., 3))."""
    steps = s.num_ray_march_steps
    ds = lengths / steps                                  # (...,)
    cos_theta = jnp.sum(directions * (-sun_dir), axis=-1)  # view·to-sun
    ph_r = phase_rayleigh(cos_theta)[..., None]
    ph_m = phase_mie(cos_theta, s.mie_g)[..., None]

    def altitude(p):
        return (s.base_altitude + p[..., 1] * s.scene_scale)

    # per-ray start jitter (golden-ratio hash over the epipolar grid) breaks
    # the concentric step-banding a fixed-step march otherwise produces
    if jitter is None:
        if lengths.ndim == 2:
            ji = jax.lax.broadcasted_iota(jnp.float32, lengths.shape, 0)
            jj = jax.lax.broadcasted_iota(jnp.float32, lengths.shape, 1)
            jitter = jnp.mod(0.618034 * ji + 0.3247179 * jj, 1.0)
        else:
            jitter = jnp.zeros_like(lengths)

    def body(i, carry):
        inscatter, tau_r, tau_m = carry
        t = (i + 0.25 + 0.5 * jitter) * ds
        p = origins + directions * t[..., None]
        h = altitude(p)
        dr, dm = _density(h)
        seg_r = dr * ds * s.scene_scale
        seg_m = dm * ds * s.scene_scale
        tau_r = tau_r + seg_r
        tau_m = tau_m + seg_m
        # transmittance camera→sample
        t_cam = jnp.exp(-(BETA_RAYLEIGH * tau_r[..., None]
                          + BETA_MIE_EXT * tau_m[..., None]))
        # transmittance sample→sun from the LUT
        cos_z = -sun_dir[1]
        t_sun = _transmittance_to_sun(lut, h, jnp.broadcast_to(cos_z, h.shape))
        vis = 1.0
        if shadow_fn is not None:
            vis = shadow_fn(p)[..., None]
        scatter = (BETA_RAYLEIGH * dr[..., None] * ph_r
                   + BETA_MIE * dm[..., None] * ph_m)
        inscatter = inscatter + (t_cam * t_sun * scatter * vis
                                 * (ds * s.scene_scale)[..., None])
        if ms_lut is not None:
            # multiple scattering: uniform-phase ambient transfer Psi_ms
            # (not shadowed — higher orders arrive from every direction)
            psi = _sample_ms_lut(ms_lut, h, jnp.broadcast_to(cos_z, h.shape))
            sig_s = (BETA_RAYLEIGH * dr[..., None] + BETA_MIE * dm[..., None])
            inscatter = inscatter + (t_cam * sig_s * psi
                                     * (ds * s.scene_scale)[..., None])
        return inscatter, tau_r, tau_m

    shape = lengths.shape
    init = (jnp.zeros(shape + (3,)), jnp.zeros(shape), jnp.zeros(shape))
    inscatter, tau_r, tau_m = jax.lax.fori_loop(0, steps, body, init)
    trans = jnp.exp(-(BETA_RAYLEIGH * tau_r[..., None]
                      + BETA_MIE_EXT * tau_m[..., None]))
    return inscatter * s.sun_intensity, trans


def _build_sctr_cumulative(lut, camera, sun_dir, s: EpipolarSettings, t_max,
                           ms_lut=None, v_res: int = 64, t_res: int = 128):
    """Per-frame cumulative single-scattering tables — the tpu-native recast
    of the reference's precomputed 4D single-scattering LUT
    (precompute/PrecomputeSingleScattering.fx, sampled via
    LookUpPrecomputedScattering in RayMarch.fx:523-567).

    The reference parameterizes its LUT by (altitude, view zenith, sun
    zenith, azimuth) because any camera may query it.  Here the flat
    exponential atmosphere (altitude = base + y·scale), the FIXED camera
    position and the FIXED sun elevation of one frame collapse that to TWO
    free variables: the ray's vertical direction component v_y and the
    distance t.  So instead of a 4D offline table we integrate, once per
    frame, cumulative tables F(v_y, t) with a plain `cumsum` over the
    distance axis, and the reference's lit-section evaluation
    T(cam→a)·LUT(a) − T(cam→b)·LUT(b) becomes F(b) − F(a) (our F already
    integrates from the camera, folding the extinction-to-start factor in).

    Returns one (v_res, t_res+1, 11) table: channels
    [f_r(3), f_m(3), f_ms(3), tau_r(1), tau_m(1)]; column k holds the
    integral over [0, k·dt] (column 0 = zeros)."""
    vy = (jnp.arange(v_res) + 0.5) / v_res * 2.0 - 1.0        # (V,)
    dt = t_max / t_res
    tm = (jnp.arange(t_res) + 0.5) * dt                       # (K,) midpoints
    h = (s.base_altitude
         + (camera.position[1] + vy[:, None] * tm[None, :]) * s.scene_scale)
    dr, dm = _density(h)                                      # (V, K)
    seg = dt * s.scene_scale
    # optical depth camera→midpoint k: full segments before k + half of k's
    tau_r = (jnp.cumsum(dr, axis=1) - 0.5 * dr) * seg
    tau_m = (jnp.cumsum(dm, axis=1) - 0.5 * dm) * seg
    t_cam = jnp.exp(-(BETA_RAYLEIGH * tau_r[..., None]
                      + BETA_MIE_EXT * tau_m[..., None]))     # (V, K, 3)
    cos_z = jnp.broadcast_to(-sun_dir[1], h.shape)
    t_sun = _transmittance_to_sun(lut, h, cos_z)              # (V, K, 3)
    f_r = jnp.cumsum(t_cam * t_sun * dr[..., None], axis=1) * seg
    f_m = jnp.cumsum(t_cam * t_sun * dm[..., None], axis=1) * seg
    if ms_lut is not None:
        psi = _sample_ms_lut(ms_lut, h, cos_z)
        sig_s = BETA_RAYLEIGH * dr[..., None] + BETA_MIE * dm[..., None]
        f_ms = jnp.cumsum(t_cam * sig_s * psi, axis=1) * seg
    else:
        f_ms = jnp.zeros_like(f_r)
    # cumulative-to-boundary: prepend the zero column so column k = [0, k·dt]
    cum = jnp.concatenate(
        [f_r, f_m, f_ms,
         (jnp.cumsum(dr, axis=1) * seg)[..., None],
         (jnp.cumsum(dm, axis=1) * seg)[..., None]], axis=-1)  # (V, K, 11)
    cum = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum], axis=1)
    return cum, t_max


def _tap_sctr_cumulative(cum, vy, t, t_max):
    """Bilinear tap of the cumulative table at (v_y, t) → (..., 11)."""
    v_res, kp1 = cum.shape[0], cum.shape[1]
    rf = jnp.clip((vy + 1.0) * 0.5 * v_res - 0.5, 0.0, v_res - 1.0)
    r0 = jnp.floor(rf).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, v_res - 1)
    fr = (rf - r0.astype(jnp.float32))[..., None]
    cf = jnp.clip(t / t_max, 0.0, 1.0) * (kp1 - 1)
    c0 = jnp.floor(cf).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, kp1 - 1)
    fc = (cf - c0.astype(jnp.float32))[..., None]
    a = cum[r0, c0] * (1.0 - fc) + cum[r0, c1] * fc
    b = cum[r1, c0] * (1.0 - fc) + cum[r1, c1] * fc
    return a * (1.0 - fr) + b * fr


def _lit_span(shadow_fn, origins, dirs, lengths, steps: int, jitter=None):
    """Distance to the first lit point + total lit length along each ray —
    the reference's fDistToFirstLitSection / fTotalLitLength
    (RayMarch.fx lit-section computation feeding the LUT path).  A
    visibility-only march: each step evaluates just the shadow function
    (min/max-tree gather or PCF), none of the scattering math."""
    ds = lengths / steps
    if jitter is None:
        jitter = jnp.zeros_like(lengths)

    def body(i, carry):
        first, lit = carry
        t = (i + 0.25 + 0.5 * jitter) * ds
        p = origins + dirs * t[..., None]
        vis = shadow_fn(p)
        lit = lit + vis * ds
        first = jnp.where((vis > 0.05) & (first < 0.0), t, first)
        return first, lit

    first, lit = jax.lax.fori_loop(
        0, steps, body,
        (jnp.full(lengths.shape, -1.0), jnp.zeros(lengths.shape)))
    first = jnp.where(first < 0.0, lengths, jnp.maximum(first - 0.5 * ds, 0.0))
    return first, jnp.minimum(lit, lengths - first)


def _inscatter_lut(cum, t_max, origins, dirs, lengths, sun_dir,
                   s: EpipolarSettings, shadow_fn=None, jitter=None):
    """LUT-mode inscatter evaluation (SINGLE_SCTR_MODE_LUT): 2 cumulative
    taps for the (contiguous-approximated) lit section + 1 for the full-ray
    transmittance/ambient, replacing the num_ray_march_steps×(3 bilinear LUT
    taps + transcendentals) march."""
    cos_theta = jnp.sum(dirs * (-sun_dir), axis=-1)
    ph_r = phase_rayleigh(cos_theta)[..., None]
    ph_m = phase_mie(cos_theta, s.mie_g)[..., None]
    vy = dirs[..., 1]
    if shadow_fn is not None:
        t0, lit = _lit_span(shadow_fn, origins, dirs, lengths,
                            s.num_ray_march_steps, jitter)
        t1 = jnp.minimum(t0 + lit, lengths)
    else:
        t0 = jnp.zeros_like(lengths)
        t1 = lengths
    end = _tap_sctr_cumulative(cum, vy, lengths, t_max)       # (..., 11)
    a = _tap_sctr_cumulative(cum, vy, t0, t_max)
    b = _tap_sctr_cumulative(cum, vy, t1, t_max)
    d_single = b - a
    ins = (BETA_RAYLEIGH * ph_r * d_single[..., 0:3]
           + BETA_MIE * ph_m * d_single[..., 3:6]
           + end[..., 6:9])   # ms ambient: unshadowed, whole ray (ref: higher
    #                           orders arrive from every direction)
    trans = jnp.exp(-(BETA_RAYLEIGH * end[..., 9:10]
                      + BETA_MIE_EXT * end[..., 10:11]))
    return ins * s.sun_intensity, trans


def _epipolar_grid(light_uv: Array, num_slices: int, num_samples: int):
    """Slice entry/exit points on the screen rect + sample uv grid
    (slices, samples, 2) — GenerateSliceEndpoints / the coordinate texture
    (EpipolarLightScattering.cpp:2393-2700 slice handling).

    Works for an OFF-SCREEN light: each slice ray from light_uv is slab-
    clipped against [0,1]² and samples span only the on-screen chord
    (entry→exit), so no sample budget is wasted outside the viewport; with
    the light on screen the entry degenerates to light_uv itself."""
    a = (jnp.arange(num_slices) + 0.5) / num_slices * 2.0 * PI
    d = jnp.stack([jnp.cos(a), jnp.sin(a)], axis=-1)       # (S, 2)
    eps = 1e-6
    big = 1e9

    def slab(p, dx):
        safe = jnp.where(jnp.abs(dx) < eps, eps, dx)
        t0 = (0.0 - p) / safe
        t1 = (1.0 - p) / safe
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        # degenerate axis: inside the slab → full range, outside → empty
        inside = (p >= 0.0) & (p <= 1.0)
        lo = jnp.where(jnp.abs(dx) < eps, jnp.where(inside, -big, big), lo)
        hi = jnp.where(jnp.abs(dx) < eps, jnp.where(inside, big, -big), hi)
        return lo, hi

    lx, hx = slab(light_uv[0], d[:, 0])
    ly, hy = slab(light_uv[1], d[:, 1])
    t_in = jnp.maximum(jnp.maximum(lx, ly), 0.0)
    t_out = jnp.minimum(hx, hy)
    valid = t_out > t_in                                   # slice crosses screen
    t_out = jnp.maximum(t_out, t_in)
    starts = light_uv[None, :] + d * t_in[:, None]         # (S, 2)
    ends = light_uv[None, :] + d * t_out[:, None]
    f = ((jnp.arange(num_samples) + 0.5) / num_samples)[None, :, None]
    grid = starts[:, None, :] * (1.0 - f) + ends[:, None, :] * f
    # invalid slices collapse to their (clamped) start — harmless samples
    grid = jnp.where(valid[:, None, None], grid,
                     jnp.clip(starts[:, None, :], 0.0, 1.0))
    return grid, ends


class ShadowLineTree(NamedTuple):
    """1D min/max shadow binary tree per (cascade, slice) — the analogue of
    the reference's Build1DMinMaxMipMap (EpipolarLightScattering.hpp:174,
    RenderSliceUVDirAndOrigin + the min/max mip chain): every camera ray of
    an epipolar slice lies in the plane spanned by the sun direction and the
    slice, so all its shadow-map lookups fall on ONE line per cascade map.
    Sampling that line once (point taps) and min/max-reducing it into a mip
    chain lets the march test a whole span with one packed gather: span max
    below the ray depth → fully shadowed, span min above → fully lit, mixed
    spans estimate the lit fraction from the min/max interval (the fixed-
    budget SPMD reading of the reference's tree traversal)."""
    packed: Array      # (C*S*R_tot, 2) level-major flat (min, max) depths
    lv_xy0: Array      # (2,) light-view xy of the camera position
    u_dir: Array       # (S, 2) unit light-view-xy direction of each slice
    u_min: Array       # (S,) sampled u range start (light-view units)
    u_rng: Array       # (S,) sampled u range extent (>= eps)
    base_r: int
    levels: int


def build_shadow_line_tree(att, shadow_maps, camera, world_ends,
                           num_slices: int, base_r: int = 512,
                           levels: int = 4) -> ShadowLineTree:
    """Sample each slice's shadow line per cascade + build min/max mips.

    world_ends: (S, N, 3) the epipolar sample world positions (ray endpoints)
    — their light-view projections bound the u range each slice's march can
    touch.  Gathers: C*S*base_r point taps, once per frame."""
    wl = att.world_to_light_view
    c = shadow_maps.shape[0]
    s_res = shadow_maps.shape[-1]

    lv0 = m3.transform_points(camera.position, wl)[:3]
    lv_ends = m3.transform_points(world_ends, wl)[..., :3]      # (S, N, 3)
    d_xy = lv_ends[..., :2] - lv0[:2]                            # (S, N, 2)
    # slice direction in light-view xy: the largest-|u| endpoint is the most
    # robust representative (all endpoints of a slice are collinear here)
    norms = jnp.sqrt(jnp.sum(d_xy * d_xy, -1))
    pick = jnp.argmax(norms, axis=1)
    rep = jnp.take_along_axis(d_xy, pick[:, None, None], axis=1)[:, 0]
    u_dir = rep / jnp.maximum(
        jnp.sqrt(jnp.sum(rep * rep, -1, keepdims=True)), 1e-9)  # (S, 2)
    u = jnp.sum(d_xy * u_dir[:, None, :], axis=-1)               # (S, N)
    u_min = jnp.minimum(u.min(axis=1), 0.0)
    u_max = jnp.maximum(u.max(axis=1), 0.0)
    u_rng = jnp.maximum(u_max - u_min, 1e-6)

    # sample every cascade map along every slice line at base_r points
    j = (jnp.arange(base_r, dtype=jnp.float32) + 0.5) / base_r   # (R,)
    u_j = u_min[:, None] + u_rng[:, None] * j[None, :]           # (S, R)
    line_xy = (lv0[:2] + u_dir[:, None, :] * u_j[..., None])     # (S, R, 2)
    scale = att.light_space_scale                                # (C, 3)
    bias = att.light_space_bias
    p_xy = (line_xy[None] * scale[:, None, None, :2]
            + bias[:, None, None, :2])                           # (C, S, R, 2)
    uv_x = p_xy[..., 0] * 0.5 + 0.5
    uv_y = 0.5 - p_xy[..., 1] * 0.5
    xi = jnp.clip((uv_x * s_res).astype(jnp.int32), 0, s_res - 1)
    yi = jnp.clip((uv_y * s_res).astype(jnp.int32), 0, s_res - 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 0)
    base = shadow_maps.reshape(-1)[ci * (s_res * s_res)
                                   + yi * s_res + xi]            # (C, S, R)

    mn, mx = base, base
    packs = [jnp.stack([mn, mx], axis=-1)]
    for _ in range(levels - 1):
        mn = jnp.minimum(mn[..., 0::2], mn[..., 1::2])
        mx = jnp.maximum(mx[..., 0::2], mx[..., 1::2])
        packs.append(jnp.stack([mn, mx], axis=-1))
    # level-major flat: level k holds C*S*(R>>k) rows
    packed = jnp.concatenate(
        [p.reshape(-1, 2) for p in packs], axis=0)
    return ShadowLineTree(packed=packed, lv_xy0=lv0[:2], u_dir=u_dir,
                          u_min=u_min, u_rng=u_rng, base_r=base_r,
                          levels=levels)


def make_tree_shadow_fn(tree: ShadowLineTree, att, camera, slice_ids,
                        du_cells):
    """Visibility function for _inscatter_march backed by the 1D min/max
    tree.  slice_ids: int32 array broadcastable to the ray shape; du_cells:
    per-ray span (in base cells) one march step covers — selects the tree
    level whose cell bounds the step."""
    from diligentfx_tpu.components.shadow_map_manager import find_cascade
    wl = att.world_to_light_view
    c = att.light_space_scale.shape[0]
    s_cnt = tree.u_dir.shape[0]
    lvl_f = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(du_cells, 1.0))),
                     0, tree.levels - 1).astype(jnp.int32)

    # static level offsets into the flat packed table
    offs, acc = [], 0
    for k in range(tree.levels):
        offs.append(acc)
        acc += c * s_cnt * (tree.base_r >> k)

    def fn(p):
        lv = m3.transform_points(p, wl)[..., :3]
        cam_z = -m3.transform_points(p, camera.view)[..., 2]
        info = find_cascade(att, lv, cam_z)
        u = jnp.sum((lv[..., :2] - tree.lv_xy0) * tree.u_dir[slice_ids],
                    axis=-1)
        cell_f = (u - tree.u_min[slice_ids]) / tree.u_rng[slice_ids]
        lvl = jnp.broadcast_to(lvl_f, cell_f.shape)
        off = jnp.zeros_like(info.cascade_idx)
        r_l = jnp.zeros_like(info.cascade_idx)
        for k in range(tree.levels):   # short static select chain
            off = jnp.where(lvl == k, offs[k], off)
            r_l = jnp.where(lvl == k, tree.base_r >> k, r_l)
        cell = jnp.clip((cell_f * r_l.astype(jnp.float32)).astype(jnp.int32),
                        0, r_l - 1)
        flat = off + (info.cascade_idx * s_cnt + slice_ids) * r_l + cell
        g = tree.packed[flat]                                   # (..., 2)
        zr = info.depth[..., 0] - 1e-3
        mn, mx = g[..., 0], g[..., 1]
        vis = jnp.where(zr <= mn, 1.0,
                        jnp.where(zr > mx, 0.0,
                                  (mx - zr) / jnp.maximum(mx - mn, 1e-5)))
        return jnp.where(info.in_any, vis, 1.0)

    return fn


class EpipolarOutput(NamedTuple):
    color: Array          # (H, W, 3) scene with inscattering applied
    inscatter: Array      # (H, W, 3)
    transmittance: Array  # (H, W, 3)


@functools.partial(jax.jit, static_argnames=("settings_static",))
def _apply_impl(color, depth, camera, sun_dir, sun_intensity_rgb, lut,
                settings, shadow_data, ms_lut=None, *, settings_static):
    (num_slices, num_samples, _steps, refine_m, refine_div, use_tree,
     tree_res, use_lut) = settings_static
    h, w = depth.shape
    # rebind the structural ints as Python values (they arrive traced in the
    # settings pytree; loop/grid sizes must be static)
    s = settings._replace(num_epipolar_slices=num_slices,
                          max_samples_in_slice=num_samples,
                          num_ray_march_steps=_steps,
                          refinement_factor=refine_m,
                          refinement_budget_div=refine_div,
                          use_minmax_tree=use_tree,
                          minmax_tree_res=tree_res,
                          single_sctr_lut=use_lut)

    # light projection to uv space
    sun_clip = m3.transform_points(camera.position - sun_dir * 1e4,
                                   camera.view_proj)
    sun_w = jnp.where(jnp.abs(sun_clip[3]) < 1e-6, 1e-6, sun_clip[3])
    sun_ndc = sun_clip[:2] / sun_w
    # behind-camera sun: dividing by the negative w lands on the ANTISOLAR
    # point, which is exactly where screen-space rays converge for a light
    # behind the viewer — the slab-clipped grid (see _epipolar_grid) handles
    # the point being on or off screen uniformly, replacing the old
    # push-off-screen hack (ref slice handling, Epipolar...cpp:2393-2700)
    light_uv = jnp.stack([sun_ndc[0] * 0.5 + 0.5, 0.5 - sun_ndc[1] * 0.5])

    grid_uv, _ = _epipolar_grid(light_uv, num_slices, num_samples)

    # per-epipolar-sample ray setup from the depth buffer
    d_smp = bilinear_sample(depth[..., None], grid_uv)[..., 0]
    world = _uv_depth_to_world(grid_uv, d_smp, camera)
    origins = jnp.broadcast_to(camera.position, world.shape)
    delta = world - origins
    lengths = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-8))
    dirs = delta / lengths[..., None]

    tree = None
    make_shadow_fn = lambda slice_ids, du_cells: None
    if shadow_data is not None:
        att, smaps = shadow_data
        if use_tree:
            tree = build_shadow_line_tree(att, smaps, camera, world,
                                          num_slices, base_r=tree_res)

            def make_shadow_fn(slice_ids, du_cells):   # noqa: F811
                return make_tree_shadow_fn(tree, att, camera, slice_ids,
                                           du_cells)
        else:
            def pcf_fn(p):
                from diligentfx_tpu.components.shadow_map_manager import (
                    find_cascade, filter_shadow_pcf)
                plv = m3.transform_points(p, att.world_to_light_view)[..., :3]
                cam_z = -m3.transform_points(p, camera.view)[..., 2]
                info = find_cascade(att, plv, cam_z)
                lit = filter_shadow_pcf(smaps, info, 2, depth_bias=1e-3)
                return jnp.where(info.in_any, lit, 1.0)

            def make_shadow_fn(slice_ids, du_cells):   # noqa: F811
                return pcf_fn

    def du_cells_of(lengths_, dirs_, slice_ids):
        """Per-ray march-step span in tree base cells (level selector)."""
        if tree is None:
            return jnp.zeros_like(lengths_)
        d_xy = m3.transform_directions(
            dirs_, shadow_data[0].world_to_light_view)[..., :2]
        du = jnp.abs(jnp.sum(d_xy * tree.u_dir[slice_ids], axis=-1))
        return (lengths_ / _steps) * du / (tree.u_rng[slice_ids]
                                           / tree.base_r)

    if use_lut:
        cum, cum_tmax = _build_sctr_cumulative(
            lut, camera, sun_dir, s, jnp.maximum(jnp.max(lengths), 1e-3),
            ms_lut=ms_lut)

        def inscatter_eval(o_, d_, l_, shadow_fn_, jitter_=None):
            return _inscatter_lut(cum, cum_tmax, o_, d_, l_, sun_dir, s,
                                  shadow_fn=shadow_fn_, jitter=jitter_)
    else:
        def inscatter_eval(o_, d_, l_, shadow_fn_, jitter_=None):
            return _inscatter_march(lut, o_, d_, l_, sun_dir, s, shadow_fn_,
                                    ms_lut=ms_lut, jitter=jitter_)

    if refine_m <= 1:
        sl_ids = jax.lax.broadcasted_iota(jnp.int32, lengths.shape, 0)
        inscatter_e, trans_e = inscatter_eval(
            origins, dirs, lengths,
            make_shadow_fn(sl_ids, du_cells_of(lengths, dirs, sl_ids)))
    else:
        # ---- sample refinement + interpolation-source search ---------------
        # (RefineSampleLocations / the interpolation-source pass,
        # EpipolarLightScattering.cpp:2393-2700, recast as fixed-budget SPMD:
        # march every refine_m-th sample; detect depth breaks along each
        # slice; samples whose interpolation sources straddle a break are
        # COMPACTED into a fixed refinement buffer (the pair-compaction
        # trick) and marched exactly; everything else interpolates.)
        m_f = refine_m
        n_c = num_samples // m_f
        cap = max((num_slices * num_samples) // refine_div, 128)
        ic = jnp.arange(n_c) * m_f                               # coarse ids
        sl_c = jax.lax.broadcasted_iota(jnp.int32, (num_slices, n_c), 0)
        oc, dc, lc = origins[:, ic], dirs[:, ic], lengths[:, ic]
        ins_c, tr_c = inscatter_eval(
            oc, dc, lc, make_shadow_fn(sl_c, du_cells_of(lc, dc, sl_c)))

        # depth breaks between adjacent epipolar samples (linear view z)
        z_lin = depth_to_camera_z(d_smp, camera)                 # (S, N)
        brk = (jnp.abs(z_lin[:, 1:] - z_lin[:, :-1])
               > 0.1 * jnp.minimum(z_lin[:, 1:], z_lin[:, :-1]))  # (S, N-1)
        cum = jnp.concatenate(
            [jnp.zeros((num_slices, 1), jnp.int32),
             jnp.cumsum(brk.astype(jnp.int32), axis=1)], axis=1)  # (S, N)
        i_all = jnp.arange(num_samples)
        left = (i_all // m_f) * m_f
        right = jnp.minimum(left + m_f, num_samples - 1)
        # breaks strictly inside (left, right]: cum[right] - cum[left]
        span_brk = cum[:, right] - cum[:, left]                  # (S, N)
        is_coarse = (i_all % m_f == 0)[None, :]
        refined = (~is_coarse) & (span_brk > 0)

        # interpolate along the slice from the coarse sources
        li = left // m_f
        ri = jnp.minimum(li + 1, n_c - 1)
        f = ((i_all - left) / m_f)[None, :, None]
        ins_i = ins_c[:, li] * (1.0 - f) + ins_c[:, ri] * f
        tr_i = tr_c[:, li] * (1.0 - f) + tr_c[:, ri] * f

        # compact refined sample ids into the fixed budget
        flat_mask = refined.reshape(-1)
        pos = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
        flat_ids = jnp.arange(num_slices * num_samples, dtype=jnp.int32)
        buf = jnp.full((cap,), -1, jnp.int32)
        buf = buf.at[jnp.where(flat_mask & (pos < cap), pos, cap)].set(
            flat_ids, mode="drop")
        r_s = jnp.maximum(buf, 0) // num_samples                 # (cap,)
        r_i = jnp.maximum(buf, 0) % num_samples
        orr, drr, lrr = origins[r_s, r_i], dirs[r_s, r_i], lengths[r_s, r_i]
        jit_r = jnp.mod(0.618034 * r_s.astype(jnp.float32)
                        + 0.3247179 * r_i.astype(jnp.float32), 1.0)
        ins_r, tr_r = inscatter_eval(
            orr, drr, lrr, make_shadow_fn(r_s, du_cells_of(lrr, drr, r_s)),
            jitter_=jit_r)
        # scatter the exact marches over the interpolation (invalid slots
        # target an out-of-range row and drop)
        tgt_s = jnp.where(buf >= 0, r_s, num_slices)
        ins_e = ins_i.at[tgt_s, r_i].set(ins_r, mode="drop")
        tr_e = tr_i.at[tgt_s, r_i].set(tr_r, mode="drop")
        inscatter_e, trans_e = ins_e, tr_e

    # ---- unwarp epipolar → screen (depth-break-aware bilinear) -------------
    xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
    yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
    duv = jnp.stack([xg, yg], axis=-1) - light_uv
    ang = jnp.mod(jnp.arctan2(duv[..., 1], duv[..., 0]), 2.0 * PI)
    slice_f = ang / (2.0 * PI) * num_slices - 0.5
    # sample coordinate: radial fraction toward this slice's border exit
    _, ends = _epipolar_grid(light_uv, num_slices, num_samples)
    s0 = jnp.floor(slice_f).astype(jnp.int32) % num_slices
    s1 = (s0 + 1) % num_slices
    sf = (slice_f - jnp.floor(slice_f))[..., None]

    def frac_along(slice_idx):
        end = ends[slice_idx]                               # (H, W, 2)
        seg = end - light_uv
        seg_len2 = jnp.maximum(jnp.sum(seg * seg, -1), 1e-9)
        return jnp.clip(jnp.sum(duv * seg, -1) / seg_len2, 0.0, 1.0)

    cam_z_px = depth_to_camera_z(depth, camera)

    def gather_slice(slice_idx, f):
        smp_f = f * num_samples - 0.5
        i0 = jnp.clip(jnp.floor(smp_f).astype(jnp.int32), 0, num_samples - 1)
        i1 = jnp.minimum(i0 + 1, num_samples - 1)
        wf = (smp_f - i0.astype(jnp.float32))[..., None]

        def tap(ii):
            ins = inscatter_e[slice_idx, ii]
            tr = trans_e[slice_idx, ii]
            dz = depth_to_camera_z(d_smp[slice_idx, ii], camera)
            return ins, tr, dz

        a_ins, a_tr, a_z = tap(i0)
        b_ins, b_tr, b_z = tap(i1)
        # depth-break correction: discount taps whose depth differs strongly.
        # The weight floor keeps the blend a true average when BOTH taps
        # disagree with the pixel depth (otherwise transmittance collapses to
        # zero and thin silhouettes go black).
        wa = ((1.0 - wf[..., 0])
              * (0.02 + jnp.exp(-jnp.abs(a_z - cam_z_px) / (0.2 * cam_z_px + 1.0))))
        wb = (wf[..., 0]
              * (0.02 + jnp.exp(-jnp.abs(b_z - cam_z_px) / (0.2 * cam_z_px + 1.0))))
        tot = jnp.maximum(wa + wb, 1e-6)[..., None]
        return ((a_ins * wa[..., None] + b_ins * wb[..., None]) / tot,
                (a_tr * wa[..., None] + b_tr * wb[..., None]) / tot)

    f0 = frac_along(s0)
    f1 = frac_along(s1)
    ins0, tr0 = gather_slice(s0, f0)
    ins1, tr1 = gather_slice(s1, f1)
    inscatter = ins0 + (ins1 - ins0) * sf
    trans = tr0 + (tr1 - tr0) * sf

    # ---- sun disk (RenderSun analogue) --------------------------------------
    ray = _pixel_rays(camera, w, h)
    cos_sun = jnp.sum(ray * (-sun_dir), axis=-1)
    sky = depth >= 0.9999
    disk = jnp.clip((cos_sun - jnp.cos(s.sun_angular_radius))
                    / (1.0 - jnp.cos(s.sun_angular_radius)) * 4.0, 0.0, 1.0)
    sun_rgb = sun_intensity_rgb * s.sun_intensity
    sun = (disk * sky.astype(jnp.float32))[..., None] * sun_rgb

    out = color * trans + inscatter * sun_intensity_rgb + sun * trans
    return EpipolarOutput(color=out, inscatter=inscatter, transmittance=trans)


def apply_light_scattering(color: Array, depth: Array, camera: CameraAttribs,
                           sun_dir, lut: Array,
                           settings: EpipolarSettings = EpipolarSettings(),
                           sun_intensity_rgb=(1.0, 0.96, 0.90),
                           shadow_data=None, ms_lut=None) -> EpipolarOutput:
    """Full effect (PrepareForNewFrame + PerformPostProcessing + RenderSun,
    EpipolarLightScattering.cpp:2099-2789)."""
    sun_dir = m3.normalize(jnp.asarray(sun_dir, jnp.float32))
    static = (settings.num_epipolar_slices, settings.max_samples_in_slice,
              settings.num_ray_march_steps, settings.refinement_factor,
              settings.refinement_budget_div, settings.use_minmax_tree,
              settings.minmax_tree_res, settings.single_sctr_lut)
    return _apply_impl(color, depth, camera, sun_dir,
                       jnp.asarray(sun_intensity_rgb, jnp.float32), lut,
                       settings, shadow_data, ms_lut,
                       settings_static=static)


def _uv_depth_to_world(uv: Array, depth: Array, camera: CameraAttribs) -> Array:
    ndc = jnp.stack([uv[..., 0] * 2.0 - 1.0, 1.0 - uv[..., 1] * 2.0,
                     depth, jnp.ones_like(depth)], axis=-1)
    world = jnp.einsum("...i,ij->...j", ndc, camera.view_proj_inv,
                       precision=jax.lax.Precision.HIGHEST)
    return world[..., :3] / world[..., 3:4]


def _pixel_rays(camera: CameraAttribs, width: int, height: int) -> Array:
    from diligentfx_tpu.pbr.renderer import _camera_rays
    return _camera_rays(camera, width, height)
