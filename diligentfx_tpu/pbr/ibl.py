"""IBL precompute — the analogue of PBR_Renderer::PrecomputeBRDF /
PrecomputeCubemaps (PBR/src/PBR_Renderer.cpp:548, :729-970) and the shaders
PrecomputeBRDF.psh / ComputeIrradianceMap.psh / PrefilterEnvMap.psh.

TPU-first deviations from the reference:
  * Environment maps are **octahedral** squares, not cubemaps (see
    ops/sampling.py) — one draw-free jnp program per product, no per-face loop.
  * The irradiance map is computed by **spherical-harmonic (SH-9) projection +
    cosine convolution** instead of per-texel Monte-Carlo (exact for the
    cosine lobe up to l=2, error <3%, and turns the whole product into two
    small matmuls) — the reference uses 64 MC samples per texel
    (ComputeIrradianceMap.psh), which is noisier.
  * The GGX prefilter keeps the reference's split-sum importance sampling but
    evaluates all output texels × samples as one vectorized program.

All functions are jit-compatible; resolutions/sample counts are static.
Results should be cached on disk by the caller (utils/cache.py) — the
analogue of IRenderStateCache persistence (SURVEY.md §5.4).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.math3d import normalize, saturate
from diligentfx_tpu.ops.sampling import (
    build_mip_chain, oct_pixel_dirs, oct_solid_angles, sample_env_oct)
from diligentfx_tpu.pbr import brdf
from diligentfx_tpu.pbr.shading import IBLMaps

Array = jax.Array
PI = 3.141592653589793


def _hammersley(n: int) -> Tuple[Array, Array]:
    """Low-discrepancy sample set (matches the Hammersley sequence used by
    PBR_PrecomputeCommon.fxh)."""
    i = jnp.arange(n, dtype=jnp.uint32)
    # radical inverse base 2 via bit reversal
    bits = i
    bits = ((bits << 16) | (bits >> 16)) & jnp.uint32(0xFFFFFFFF)
    bits = ((bits & jnp.uint32(0x55555555)) << 1) | ((bits & jnp.uint32(0xAAAAAAAA)) >> 1)
    bits = ((bits & jnp.uint32(0x33333333)) << 2) | ((bits & jnp.uint32(0xCCCCCCCC)) >> 2)
    bits = ((bits & jnp.uint32(0x0F0F0F0F)) << 4) | ((bits & jnp.uint32(0xF0F0F0F0)) >> 4)
    bits = ((bits & jnp.uint32(0x00FF00FF)) << 8) | ((bits & jnp.uint32(0xFF00FF00)) >> 8)
    u2 = bits.astype(jnp.float32) * (1.0 / 4294967296.0)
    u1 = (i.astype(jnp.float32) + 0.5) / n
    return u1, u2


# ---------------------------------------------------------------------------
# Split-sum BRDF LUT (PrecomputeBRDF.psh; 512², 512 samples default)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("dim", "num_samples"))
def precompute_brdf_lut(dim: int = 512, num_samples: int = 512) -> Array:
    """Returns (dim, dim, 2): x-axis NdotV, y-axis perceptual roughness;
    channels = (F0 scale, F0 bias)."""
    ndotv = (jnp.arange(dim, dtype=jnp.float32) + 0.5) / dim          # u
    rough = (jnp.arange(dim, dtype=jnp.float32) + 0.5) / dim          # v
    nv, r = jnp.meshgrid(ndotv, rough, indexing="xy")                 # (dim, dim)
    nv = jnp.maximum(nv, 1e-3)
    v = jnp.stack([jnp.sqrt(1.0 - nv * nv), jnp.zeros_like(nv), nv], axis=-1)
    alpha = r * r

    u1, u2 = _hammersley(num_samples)

    def body(i, acc):
        h = brdf.sample_ggx_half_vector(u1[i], u2[i], alpha)          # (dim, dim, 3)
        l = 2.0 * jnp.sum(v * h, axis=-1, keepdims=True) * h - v
        ndotl = saturate(l[..., 2])
        ndoth = saturate(h[..., 2])
        vdoth = saturate(jnp.sum(v * h, axis=-1))
        # height-correlated visibility; G_vis = 4 * Vis * NdotL * VdotH / NdotH
        vis = brdf.smith_ggx_visibility_correlated(ndotl, nv, alpha)
        g_vis = jnp.where(ndotl > 0, 4.0 * vis * ndotl * vdoth / jnp.maximum(ndoth, 1e-6), 0.0)
        fc = brdf.pow5(1.0 - vdoth)
        return acc + jnp.stack([(1.0 - fc) * g_vis, fc * g_vis], axis=-1)

    acc = jax.lax.fori_loop(0, num_samples, body, jnp.zeros((dim, dim, 2), jnp.float32))
    return acc / num_samples


@functools.partial(jax.jit, static_argnames=("dim", "num_samples"))
def precompute_charlie_lut(dim: int = 64, num_samples: int = 256) -> Array:
    """Preintegrated Charlie sheen BRDF (directional albedo), (dim, dim, 1).
    The reference loads this from a texture (PreintegratedCharlieBRDFPath,
    PBR_Renderer.hpp:305); we compute it."""
    ndotv = (jnp.arange(dim, dtype=jnp.float32) + 0.5) / dim
    rough = (jnp.arange(dim, dtype=jnp.float32) + 0.5) / dim
    nv, r = jnp.meshgrid(ndotv, rough, indexing="xy")
    nv = jnp.maximum(nv, 1e-3)
    v = jnp.stack([jnp.sqrt(1.0 - nv * nv), jnp.zeros_like(nv), nv], axis=-1)

    u1, u2 = _hammersley(num_samples)

    def body(i, acc):
        # uniform hemisphere sampling of L
        cos_t = u1[i]
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = 2.0 * PI * u2[i]
        l = jnp.stack([sin_t * jnp.cos(phi) * jnp.ones_like(nv),
                       sin_t * jnp.sin(phi) * jnp.ones_like(nv),
                       cos_t * jnp.ones_like(nv)], axis=-1)
        h = normalize(v + l)
        ndotl = saturate(l[..., 2])
        ndoth = saturate(h[..., 2])
        val = brdf.ndf_charlie(ndoth, r) * brdf.sheen_visibility(ndotl, nv, r) * ndotl
        return acc + val

    acc = jax.lax.fori_loop(0, num_samples, body, jnp.zeros_like(nv))
    # pdf of uniform hemisphere = 1/(2π)
    return (acc * (2.0 * PI) / num_samples)[..., None]


# ---------------------------------------------------------------------------
# SH-9 irradiance (replaces ComputeIrradianceMap.psh)
# ---------------------------------------------------------------------------

_SH_A = jnp.array([PI,
                   2.0 * PI / 3.0, 2.0 * PI / 3.0, 2.0 * PI / 3.0,
                   PI / 4.0, PI / 4.0, PI / 4.0, PI / 4.0, PI / 4.0], jnp.float32)


def _sh9_basis(d: Array) -> Array:
    """(..., 3) dirs → (..., 9) real SH basis values."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        jnp.full_like(x, 0.282095),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], axis=-1)


@jax.jit
def project_sh9(env_oct: Array) -> Array:
    """Octahedral env → (9, 3) cosine-convolved SH irradiance coefficients
    scaled by 1/π (so eval(n) ≙ the reference's irradiance-map sample)."""
    r = env_oct.shape[0]
    dirs = oct_pixel_dirs(r).reshape(-1, 3)
    sa = oct_solid_angles(r).reshape(-1, 1)
    basis = _sh9_basis(dirs)
    l_coeff = jnp.matmul(basis.T, env_oct.reshape(-1, 3) * sa,
                         precision=jax.lax.Precision.HIGHEST)
    return l_coeff * (_SH_A / PI)[:, None]


@functools.partial(jax.jit, static_argnames=("out_dim",))
def precompute_irradiance_oct(env_oct: Array, out_dim: int = 64) -> Array:
    """Octahedral env (R, R, 3) → octahedral irradiance (out_dim, out_dim, 3):
    E(n) = ∫ L(ω) max(n·ω, 0) dω / π  (so that diffuse = E * albedo as in
    GetLambertianIBL, PBR_Shading.fxh:317)."""
    r = env_oct.shape[0]
    dirs = oct_pixel_dirs(r).reshape(-1, 3)
    sa = oct_solid_angles(r).reshape(-1, 1)
    basis = _sh9_basis(dirs)                                  # (P, 9)
    l_coeff = jnp.matmul(basis.T, env_oct.reshape(-1, 3) * sa,
                         precision=jax.lax.Precision.HIGHEST)  # (9, 3)
    e_coeff = l_coeff * (_SH_A / PI)[:, None]
    out_dirs = oct_pixel_dirs(out_dim)
    out_basis = _sh9_basis(out_dirs)                          # (D, D, 9)
    irr = jnp.einsum("hwk,kc->hwc", out_basis, e_coeff,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(irr, 0.0)


# ---------------------------------------------------------------------------
# GGX prefiltered environment chain (replaces PrefilterEnvMap.psh)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("base_dim", "num_mips", "num_samples"))
def prefilter_env_ggx_oct(env_oct: Array, base_dim: int = 256, num_mips: int = 7,
                          num_samples: int = 256):
    """Split-sum specular prefilter: mip m stores the environment convolved
    with GGX of roughness m/(num_mips-1).  Returns a tuple of octahedral mips
    ((base,base,3), (base/2,...), ...) — the analogue of the 256² RGBA16F
    prefiltered cube chain (PBR_Renderer.hpp:479, cpp:751)."""
    # A small mip chain of the source env is used for filtered importance
    # sampling (sample count stays modest without fireflies).
    src_mips = build_mip_chain(env_oct, 6)
    src_res = env_oct.shape[0]
    u1, u2 = _hammersley(num_samples)

    out = []
    for m in range(num_mips):
        dim = max(base_dim >> m, 4)
        rough = m / max(num_mips - 1, 1)
        alpha = max(rough * rough, 1e-4)
        n = oct_pixel_dirs(dim)                                # (D, D, 3) = N = V = R
        # tangent frame per texel
        up = jnp.where(jnp.abs(n[..., 1:2]) < 0.999,
                       jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), n.shape),
                       jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape))
        t = normalize(jnp.cross(up, n))
        b = jnp.cross(n, t)

        if m == 0:
            out.append(env_oct if env_oct.shape[0] == dim else
                       sample_env_oct([env_oct], n, jnp.zeros(n.shape[:-1])))
            continue

        def body(i, acc):
            h_ts = brdf.sample_ggx_half_vector(u1[i], u2[i], jnp.float32(alpha))
            h = (h_ts[0] * t + h_ts[1] * b + h_ts[2] * n)
            l = normalize(2.0 * jnp.sum(n * h, axis=-1, keepdims=True) * h - n)
            ndotl = saturate(jnp.sum(n * l, axis=-1))
            # filtered importance sampling: pick source mip from sample pdf
            ndoth = saturate(jnp.sum(n * h, axis=-1))
            pdf = brdf.ndf_ggx(ndoth, jnp.float32(alpha)) * ndoth / jnp.maximum(
                4.0 * ndoth, 1e-6) + 1e-6
            sa_sample = 1.0 / (num_samples * pdf)
            sa_texel = 4.0 * PI / (src_res * src_res)
            lod = jnp.clip(0.5 * jnp.log2(sa_sample / sa_texel), 0.0, len(src_mips) - 1.0)
            c = sample_env_oct(src_mips, l, lod)
            w = ndotl[..., None]
            color_acc, weight_acc = acc
            return (color_acc + c * w, weight_acc + w)

        color, weight = jax.lax.fori_loop(
            0, num_samples, body,
            (jnp.zeros((dim, dim, 3), jnp.float32), jnp.zeros((dim, dim, 1), jnp.float32)))
        out.append(color / jnp.maximum(weight, 1e-6))
    return tuple(out)


# ---------------------------------------------------------------------------
# Bundle
# ---------------------------------------------------------------------------


def precompute_ibl_maps(env_oct: Array, *, brdf_lut_dim: int = 512,
                        num_brdf_samples: int = 512, irradiance_dim: int = 64,
                        prefiltered_dim: int = 256, num_mips: int = 7,
                        num_spec_samples: int = 256,
                        charlie_dim: int = 64) -> IBLMaps:
    """One-stop IBL precompute (PBR_Renderer::PrecomputeCubemaps analogue)."""
    from diligentfx_tpu.ops.sampling import (build_packed_pyramid,
                                             flatten_mip_pyramid)
    lut = precompute_brdf_lut(brdf_lut_dim, num_brdf_samples)
    charlie = precompute_charlie_lut(charlie_dim, 256)
    irr = precompute_irradiance_oct(env_oct, irradiance_dim)
    sh = project_sh9(env_oct)
    pref = prefilter_env_ggx_oct(env_oct, prefiltered_dim, num_mips, num_spec_samples)
    flat, offsets, sizes = flatten_mip_pyramid(pref)
    # Sheen albedo-scaling LUT = directional albedo of the sheen layer
    # (reference loads it from SheenAlbedoScalingLUTPath, PBR_Renderer.hpp:300).
    return IBLMaps(
        irradiance=irr,
        prefiltered=pref,
        preintegrated_ggx=lut,
        preintegrated_charlie=charlie,
        sheen_albedo_scaling=charlie,  # E(NdotV, r) — same integral
        irradiance_sh=sh,
        pref_flat=flat,
        pref_offsets=offsets,
        pref_sizes=sizes,
        env_brdf_coeffs=fit_env_brdf(lut),
        pref_packed=build_packed_pyramid(pref),
    )


def fit_env_brdf(lut, k: int = 8) -> "jnp.ndarray":
    """Least-squares tensor-Chebyshev fit of the (L, L, 2) preintegrated GGX
    LUT → (k, k, 2) coefficients for brdf.env_brdf_fitted (max error < 0.03
    at k=8).  Runs once at precompute time on host numpy; lets the shading
    path skip the full-screen LUT gather."""
    import numpy as np
    a = np.asarray(lut, np.float64)
    dim = a.shape[0]
    nv = (np.arange(dim) + 0.5) / dim
    rg = (np.arange(dim) + 0.5) / dim
    NV, RG = np.meshgrid(nv, rg, indexing="xy")   # matches LUT layout

    def cheb(x):
        t = 2.0 * x - 1.0
        outs = [np.ones_like(t), t]
        for _ in range(2, k):
            outs.append(2.0 * t * outs[-1] - outs[-2])
        return np.stack(outs[:k], -1)

    bn = cheb(NV.ravel())
    br = cheb(RG.ravel())
    basis = (bn[:, :, None] * br[:, None, :]).reshape(-1, k * k)
    coeffs, *_ = np.linalg.lstsq(basis, a.reshape(-1, 2), rcond=None)
    return jnp.asarray(coeffs.reshape(k, k, 2), jnp.float32)
