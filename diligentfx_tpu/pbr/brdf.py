"""BRDF math — the analogue of Shaders/Common/public/PBR_Common.fxh.

Same physical model (Lambert diffuse, Schlick Fresnel, height-correlated
Smith-GGX visibility incl. anisotropic, GGX NDF, Charlie sheen), expressed as
vectorized jnp over arrays of shape (..., 3) / (..., 1): one call shades every
pixel of the framebuffer at once on the VPU instead of one HLSL invocation per
fragment.  Reference entry points cited per function.

Precision note: computed in fp32; safe to cast inputs to bfloat16 only for the
final resolve, not for the NDF/visibility denominators.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.math3d import dot, normalize, saturate

Array = jax.Array
PI = 3.141592653589793


def pow5(x):
    x2 = x * x
    return x2 * x2 * x


def lambertian_diffuse(diffuse_color: Array) -> Array:
    """PBR_Common.fxh:54-57."""
    return diffuse_color / PI


def schlick_reflection(vdoth: Array, r0: Array, r90: Array) -> Array:
    """Schlick Fresnel (PBR_Common.fxh:82-91)."""
    return r0 + (r90 - r0) * pow5(jnp.clip(1.0 - vdoth, 0.0, 1.0))


def schlick_to_f0(vdoth: Array, f: Array, f90: Array) -> Array:
    """Inverse Schlick (PBR_Common.fxh:92-104)."""
    x5 = jnp.clip(pow5(jnp.clip(1.0 - vdoth, 0.0, 1.0)), 0.0, 0.9999)
    return (f - f90 * x5) / (1.0 - x5)


def smith_ggx_visibility_correlated(ndotl: Array, ndotv: Array,
                                    alpha_roughness: Array) -> Array:
    """Height-correlated Smith GGX visibility = G2/(4 NdotL NdotV)
    (PBR_Common.fxh:107-123)."""
    a2 = alpha_roughness * alpha_roughness
    ggx_v = ndotl * jnp.sqrt(jnp.maximum(ndotv * ndotv * (1.0 - a2) + a2, 1e-7))
    ggx_l = ndotv * jnp.sqrt(jnp.maximum(ndotl * ndotl * (1.0 - a2) + a2, 1e-7))
    # Denominator clamp: keeps the forward value finite when NdotL=NdotV=0
    # (masked later) so reverse-mode AD never sees 0 * inf = NaN.
    return 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-9)


def smith_ggx_visibility_correlated_anisotropic(
        ndotl, ndotv, tdotl, tdotv, bdotl, bdotv, alpha_t, alpha_b) -> Array:
    """PBR_Common.fxh:126-138 (Filament anisotropic model)."""
    lv = ndotl * jnp.maximum(jnp.sqrt(
        (alpha_t * tdotv) ** 2 + (alpha_b * bdotv) ** 2 + ndotv * ndotv), 1e-3)
    ll = ndotv * jnp.maximum(jnp.sqrt(
        (alpha_t * tdotl) ** 2 + (alpha_b * bdotl) ** 2 + ndotl * ndotl), 1e-3)
    return 0.5 / jnp.maximum(lv + ll, 1e-9)


def ndf_ggx(ndoth: Array, alpha_roughness: Array) -> Array:
    """GGX normal distribution (PBR_Common.fxh:181-194)."""
    a = jnp.maximum(alpha_roughness, 1e-3)
    a2 = a * a
    nh2 = ndoth * ndoth
    f = nh2 * a2 + (1.0 - nh2)
    return a2 / jnp.maximum(PI * f * f, 1e-9)


def ndf_ggx_anisotropic(ndoth, tdoth, bdoth, alpha_t, alpha_b) -> Array:
    """PBR_Common.fxh:197-208."""
    a2 = alpha_t * alpha_b
    v2 = (alpha_b * tdoth) ** 2 + (alpha_t * bdoth) ** 2 + (a2 * ndoth) ** 2
    w2 = a2 / jnp.maximum(v2, 1e-6)
    return a2 * w2 * w2 * (1.0 / PI)


class AngularInfo(NamedTuple):
    """dot products shared by the BRDF terms (PBR_Common.fxh GetAngularInfo)."""
    ndotl: Array
    ndotv: Array
    ndoth: Array
    vdoth: Array
    h: Array


def get_angular_info(point_to_light: Array, normal: Array, view: Array) -> AngularInfo:
    l = normalize(point_to_light)
    v = normalize(view)
    h = normalize(l + v)
    return AngularInfo(
        ndotl=saturate(dot(normal, l)),
        ndotv=saturate(dot(normal, v)),
        ndoth=saturate(dot(normal, h)),
        vdoth=saturate(dot(v, h)),
        h=h,
    )


class SurfaceReflectanceInfo(NamedTuple):
    """PBR_Shading.fxh SurfaceReflectanceInfo (perceptual roughness, diffuse
    color, F0/F90); leaves shaped (..., 3) / (..., 1)."""
    perceptual_roughness: Array  # (..., 1)
    diffuse_color: Array         # (..., 3)
    reflectance0: Array          # (..., 3)
    reflectance90: Array         # (..., 3)


def smith_ggx_brdf(point_to_light: Array, normal: Array, view: Array,
                   srf: SurfaceReflectanceInfo) -> Tuple[Array, Array, Array]:
    """Cook-Torrance with correlated Smith-GGX (PBR_Common.fxh:371-404).
    Returns (diffuse_contrib, spec_contrib, ndotl); caller multiplies by
    light intensity * ndotl as the reference does."""
    ang = get_angular_info(point_to_light, normal, view)
    alpha = srf.perceptual_roughness * srf.perceptual_roughness
    d = ndf_ggx(ang.ndoth, alpha)
    vis = smith_ggx_visibility_correlated(ang.ndotl, ang.ndotv, alpha)
    f = schlick_reflection(ang.vdoth, srf.reflectance0, srf.reflectance90)
    lit = (ang.ndotl > 0.0) | (ang.ndotv > 0.0)
    diffuse = jnp.where(lit, (1.0 - f) * lambertian_diffuse(srf.diffuse_color), 0.0)
    spec = jnp.where(lit, f * (vis * d), 0.0)
    return diffuse, spec, ang.ndotl


def smith_ggx_brdf_anisotropic(point_to_light, normal, view, tangent, bitangent,
                               srf: SurfaceReflectanceInfo,
                               alpha_t, alpha_b) -> Tuple[Array, Array, Array]:
    """PBR_Common.fxh:407-457."""
    ang = get_angular_info(point_to_light, normal, view)
    l = normalize(point_to_light)
    v = normalize(view)
    tdoth = dot(tangent, ang.h)
    bdoth = dot(bitangent, ang.h)
    tdotl = dot(tangent, l)
    tdotv = dot(tangent, v)
    bdotl = dot(bitangent, l)
    bdotv = dot(bitangent, v)
    d = ndf_ggx_anisotropic(ang.ndoth, tdoth, bdoth, alpha_t, alpha_b)
    vis = smith_ggx_visibility_correlated_anisotropic(
        ang.ndotl, ang.ndotv, tdotl, tdotv, bdotl, bdotv, alpha_t, alpha_b)
    f = schlick_reflection(ang.vdoth, srf.reflectance0, srf.reflectance90)
    lit = (ang.ndotl > 0.0) | (ang.ndotv > 0.0)
    diffuse = jnp.where(lit, (1.0 - f) * lambertian_diffuse(srf.diffuse_color), 0.0)
    spec = jnp.where(lit, f * (vis * d), 0.0)
    return diffuse, spec, ang.ndotl


# ---------------------------------------------------------------------------
# Charlie sheen (PBR_Common.fxh:460-511)
# ---------------------------------------------------------------------------


def ndf_charlie(ndoth: Array, sheen_roughness: Array) -> Array:
    r = jnp.maximum(sheen_roughness, 1e-6)
    alpha = r * r
    inv_a = 1.0 / alpha
    sin2h = jnp.maximum(1.0 - ndoth * ndoth, 0.0078125)
    return (2.0 + inv_a) * jnp.power(sin2h, inv_a * 0.5) / (2.0 * PI)


def _lambda_sheen_helper(x, alpha_g):
    om = (1.0 - alpha_g) ** 2
    a = 21.5473 + (25.32450 - 21.5473) * om
    b = 3.82987 + (3.32435 - 3.82987) * om
    c = 0.19823 + (0.16801 - 0.19823) * om
    d = -1.97760 + (-1.27393 + 1.97760) * om
    e = -4.32054 + (-4.85967 + 4.32054) * om
    return a / (1.0 + b * jnp.power(jnp.maximum(x, 1e-12), c)) + d * x + e


def lambda_sheen(cos_theta, alpha_g):
    small = jnp.abs(cos_theta) < 0.5
    lo = jnp.exp(_lambda_sheen_helper(jnp.abs(cos_theta), alpha_g))
    hi = jnp.exp(2.0 * _lambda_sheen_helper(0.5, alpha_g)
                 - _lambda_sheen_helper(jnp.maximum(1.0 - jnp.abs(cos_theta), 1e-12), alpha_g))
    return jnp.where(small, lo, hi)


def sheen_visibility(ndotl, ndotv, sheen_roughness):
    r = jnp.maximum(sheen_roughness, 1e-6)
    alpha_g = r * r
    eps = 5e-8
    return saturate(1.0 / ((1.0 + lambda_sheen(ndotv, alpha_g) + lambda_sheen(ndotl, alpha_g))
                           * jnp.maximum(4.0 * ndotv * ndotl, eps)))


def sheen_specular_brdf(sheen_color, sheen_roughness, ndotl, ndotv, ndoth):
    """PBR_Common.fxh:504-509."""
    return sheen_color * ndf_charlie(ndoth, sheen_roughness) * sheen_visibility(
        ndotl, ndotv, sheen_roughness)


# ---------------------------------------------------------------------------
# Thin-film iridescence (Shaders/PBR/private/Iridescence.fxh analogue;
# Belcour & Barla 2017 as specified by KHR_materials_iridescence)
# ---------------------------------------------------------------------------


def _eval_sensitivity(opd_nm: Array, shift: Array) -> Array:
    """CIE-XYZ spectral sensitivity of thin-film interference at optical path
    difference `opd_nm` (Belcour & Barla fit).  shift: (..., 3) phase.
    Returns (..., 3) XYZ."""
    phase = 2.0 * PI * opd_nm[..., None] * 1e-9
    val = jnp.array([5.4856e-13, 4.4201e-13, 5.2481e-13])
    pos = jnp.array([1.6810e6, 1.7953e6, 2.2084e6])
    var = jnp.array([4.3278e9, 9.3046e9, 6.6121e9])
    xyz = (val * jnp.sqrt(2.0 * PI * var)
           * jnp.cos(pos * phase + shift)
           * jnp.exp(-var * phase * phase))
    x_extra = (9.7470e-14 * jnp.sqrt(2.0 * PI * 4.5282e9)
               * jnp.cos(2.2399e6 * phase[..., 0] + shift[..., 0])
               * jnp.exp(-4.5282e9 * phase[..., 0] ** 2))
    xyz = xyz.at[..., 0].add(x_extra)
    return xyz / 1.0685e-7


_XYZ_TO_RGB_ROWS = jnp.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252]], jnp.float32)


def _f0_to_ior(f0):
    s = jnp.sqrt(jnp.clip(f0, 0.0, 0.9999))
    return (1.0 + s) / jnp.maximum(1.0 - s, 1e-4)


def _ior_to_f0(ior_t, ior_i):
    r = (ior_t - ior_i) / jnp.maximum(ior_t + ior_i, 1e-6)
    return r * r


def iridescence_fresnel(outside_ior, iridescence_ior, base_f0: Array,
                        thickness_nm: Array, cos_theta1: Array) -> Array:
    """Thin-film iridescence Fresnel → (..., 3) RGB.

    The analogue of EvalIridescence (Shaders/PBR/private/Iridescence.fxh,
    used at RenderPBR.psh:245), following the KHR_materials_iridescence
    reference formulation (Belcour & Barla 2017, Schlick interfaces,
    interference orders m = 1, 2).

    Args broadcast together; thickness in nanometers; cos_theta1 (..., 1).
    """
    eta1 = jnp.asarray(outside_ior, jnp.float32)
    # as thickness → 0 the film vanishes: blend the film IOR to the outside
    thin = jnp.clip(thickness_nm / 400.0, 0.0, 1.0)
    eta2 = eta1 + (jnp.maximum(iridescence_ior, 1.0001) - eta1) * \
        (1.0 - (1.0 - thin) ** 1)  # smooth vanish
    eta2 = jnp.maximum(eta2, 1.0001)
    ct1 = jnp.clip(cos_theta1, 1e-4, 1.0)

    sin2 = (1.0 - ct1 * ct1) * (eta1 / eta2) ** 2
    ct2 = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))

    # air → film interface (Schlick, scalar)
    r0_12 = _ior_to_f0(eta2, eta1)
    r12 = schlick_reflection(ct1, r0_12, jnp.ones_like(r0_12))
    t121 = 1.0 - r12
    phi12 = jnp.where(eta2 < eta1, PI, 0.0)
    phi21 = PI - phi12

    # film → base interface (per RGB channel from base F0)
    base_ior = _f0_to_ior(base_f0)
    r0_23 = _ior_to_f0(base_ior, eta2)
    r23 = schlick_reflection(ct2, r0_23, jnp.ones_like(r0_23))
    phi23 = jnp.where(base_ior < eta2, PI, 0.0)

    opd = (2.0 * eta2 * thickness_nm * ct2)[..., 0]           # (...,)
    phi = phi21 + phi23                                       # (..., 3)

    r123 = jnp.clip(r12 * r23, 1e-5, 0.9999)
    sqrt_r123 = jnp.sqrt(r123)
    rs = (t121 * t121) * r23 / jnp.maximum(1.0 - r123, 1e-6)

    # m = 0 (DC)
    intensity = r12 + rs
    # m = 1, 2 interference orders
    cm = rs - t121
    for m in (1, 2):
        cm = cm * sqrt_r123
        sm = 2.0 * _eval_sensitivity(m * opd, m * phi)
        intensity = intensity + cm * sm
    rgb = jnp.einsum("ij,...j->...i", _XYZ_TO_RGB_ROWS, intensity)
    return jnp.clip(rgb, 0.0, 1.0)


# ---------------------------------------------------------------------------
# GGX importance sampling (for IBL precompute, PBR_Common.fxh:222-324)
# ---------------------------------------------------------------------------


def sample_ggx_half_vector(u1: Array, u2: Array, alpha_roughness: Array) -> Array:
    """Sample the GGX NDF (not VNDF) in tangent space, z-up.  Used by the
    split-sum prefilter (PrefilterEnvMap.psh) and BRDF LUT precompute."""
    a2 = alpha_roughness * alpha_roughness
    cos_theta2 = (1.0 - u1) / (1.0 + (a2 - 1.0) * u1)
    cos_theta = jnp.sqrt(jnp.maximum(cos_theta2, 0.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta2, 0.0))
    phi = 2.0 * PI * u2
    return jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)


def sample_hemisphere_cosine(u1: Array, u2: Array) -> Array:
    """Cosine-weighted hemisphere sample, tangent space z-up."""
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    return jnp.stack([x, y, z], axis=-1)


def smith_ggx_sample_visible_normal(view_ts: Array, ax, ay, u1, u2) -> Array:
    """VNDF sampling (Heitz 2018), PBR_Common.fxh:222-268. view_ts: (..., 3)
    tangent-space view, z-up."""
    v = normalize(view_ts * jnp.stack(
        [jnp.broadcast_to(ax, u1.shape), jnp.broadcast_to(ay, u1.shape),
         jnp.ones_like(u1)], axis=-1))
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-12))
    t1 = jnp.where(lensq[..., None] > 1e-9,
                   jnp.stack([-v[..., 1] * inv, v[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape))
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    n = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    n = jnp.stack([ax * n[..., 0], ay * n[..., 1], jnp.maximum(n[..., 2], 0.0)], axis=-1)
    return normalize(n)


def _cheb_basis(x: Array, k: int) -> Array:
    """Chebyshev polynomials T_0..T_{k-1} of 2x-1 → (..., k)."""
    t = 2.0 * x - 1.0
    outs = [jnp.ones_like(t), t]
    for _ in range(2, k):
        outs.append(2.0 * t * outs[-1] - outs[-2])
    return jnp.concatenate(outs[:k], axis=-1)


def _cheb_list(x: Array, k: int) -> list:
    """T_0..T_{k-1} of 2x-1 as a PYTHON list of per-pixel planes — no
    (..., K) tensor is ever materialized (the concatenate lowered to a
    DUS chain and the downstream einsum to a 33M-element convolution,
    PERF_NOTES.md round-2 HLO audit)."""
    t = 2.0 * x - 1.0
    outs = [jnp.ones_like(t), t]
    for _ in range(2, k):
        outs.append(2.0 * t * outs[-1] - outs[-2])
    return outs[:k]


def env_brdf_fitted(ndotv: Array, perceptual_roughness: Array,
                    coeffs: Array) -> Array:
    """Gather-free split-sum env BRDF (A, B): evaluates the per-renderer
    tensor-Chebyshev fit of the preintegrated GGX LUT (ibl.fit_env_brdf;
    max fit error < 0.03).  Fully-fused unrolled MADs on the VPU — neither
    a basis tensor nor a contraction is materialized."""
    k = coeffs.shape[0]
    tn = _cheb_list(ndotv[..., 0], k)
    tr = _cheb_list(perceptual_roughness[..., 0], k)
    a = jnp.zeros_like(tn[0])
    b = jnp.zeros_like(tn[0])
    for i in range(k):
        # factor the inner roughness sum per i: K + K² scalar-weighted MADs
        ai = jnp.zeros_like(tr[0])
        bi = jnp.zeros_like(tr[0])
        for j in range(k):
            ai = ai + tr[j] * coeffs[i, j, 0]
            bi = bi + tr[j] * coeffs[i, j, 1]
        a = a + tn[i] * ai
        b = b + tn[i] * bi
    return jnp.stack([a, b], axis=-1)
