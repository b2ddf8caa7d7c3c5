"""BRDF/shading physical-correctness tests (numerical, no golden images)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.pbr import brdf
from diligentfx_tpu.pbr.shading import (
    get_surface_reflectance_mr, get_surface_reflectance_sg)


def test_schlick_limits():
    r0 = jnp.array([0.04, 0.04, 0.04])
    r90 = jnp.array([1.0, 1.0, 1.0])
    # Normal incidence → F0
    np.testing.assert_allclose(
        np.asarray(brdf.schlick_reflection(jnp.float32(1.0), r0, r90)), [0.04] * 3, atol=1e-6)
    # Grazing → F90
    np.testing.assert_allclose(
        np.asarray(brdf.schlick_reflection(jnp.float32(0.0), r0, r90)), [1.0] * 3, atol=1e-6)


def test_schlick_to_f0_inverts():
    vdoth = jnp.float32(0.7)
    f0 = jnp.array([0.2, 0.3, 0.4])
    f90 = jnp.ones(3)
    f = brdf.schlick_reflection(vdoth, f0, f90)
    back = brdf.schlick_to_f0(vdoth, f, f90)
    np.testing.assert_allclose(np.asarray(back), np.asarray(f0), atol=1e-5)


def test_ggx_ndf_normalization():
    """∫ D(h) (n·h) dω ≈ 1 over the hemisphere (MC with uniform sampling)."""
    rng = np.random.default_rng(0)
    n = 200_000
    u = rng.uniform(size=n).astype(np.float32)
    cos_t = u  # uniform in cos → pdf = 1/(2π)
    ndoth = jnp.asarray(cos_t)
    for alpha in (0.1, 0.3, 0.7, 1.0):
        d = brdf.ndf_ggx(ndoth, jnp.float32(alpha))
        integral = float(jnp.mean(d * ndoth) * 2 * np.pi)
        assert abs(integral - 1.0) < 0.05, (alpha, integral)


def test_smith_ggx_brdf_white_furnace_upper_bound():
    """Energy: ∫ f_spec (n·l) dω ≤ 1 for F≡1 (single-scatter GGX loses energy)."""
    rng = np.random.default_rng(1)
    n = 100_000
    # cosine-weighted sample of L
    u1, u2 = rng.uniform(size=(2, n)).astype(np.float32)
    l_ts = np.asarray(brdf.sample_hemisphere_cosine(jnp.asarray(u1), jnp.asarray(u2)))
    normal = jnp.array([[0.0, 0.0, 1.0]])
    view = jnp.array([[0.4, 0.0, np.sqrt(1 - 0.16)]], dtype=jnp.float32)
    srf = brdf.SurfaceReflectanceInfo(
        perceptual_roughness=jnp.array([[0.5]]),
        diffuse_color=jnp.zeros((1, 3)),
        reflectance0=jnp.ones((1, 3)),
        reflectance90=jnp.ones((1, 3)),
    )
    _, spec, ndotl = brdf.smith_ggx_brdf(jnp.asarray(l_ts), normal, view, srf)
    # cosine-weighted pdf = ndotl/π → estimator = mean(spec * π)
    integral = float(jnp.mean(spec[..., 0]) * np.pi)
    assert 0.3 < integral <= 1.05, integral


def test_surface_reflectance_mr():
    base = jnp.array([[0.8, 0.2, 0.1]])
    # Dielectric
    srf = get_surface_reflectance_mr(base, jnp.array([[0.0]]), jnp.array([[0.5]]))
    np.testing.assert_allclose(np.asarray(srf.reflectance0), [[0.04] * 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(srf.diffuse_color), np.asarray(base) * 0.96, atol=1e-6)
    # Metal: F0 = base color, no diffuse
    srf_m = get_surface_reflectance_mr(base, jnp.array([[1.0]]), jnp.array([[0.5]]))
    np.testing.assert_allclose(np.asarray(srf_m.reflectance0), np.asarray(base), atol=1e-6)
    np.testing.assert_allclose(np.asarray(srf_m.diffuse_color), [[0.0] * 3], atol=1e-6)
    # R90 = min(maxR0*50, 1)
    assert float(srf.reflectance90[0, 0]) == pytest.approx(1.0)


def test_surface_reflectance_sg():
    base = jnp.array([[0.5, 0.5, 0.5]])
    spec = jnp.array([[0.1, 0.1, 0.1]])
    srf = get_surface_reflectance_sg(base, spec, jnp.array([[0.8]]))
    assert float(srf.perceptual_roughness[0, 0]) == pytest.approx(0.2, abs=1e-6)
    np.testing.assert_allclose(np.asarray(srf.diffuse_color), np.asarray(base) * 0.9, atol=1e-6)


def test_sheen_charlie_positive_and_bounded():
    ndoth = jnp.linspace(0.0, 1.0, 32)
    d = brdf.ndf_charlie(ndoth, jnp.float32(0.5))
    assert bool(jnp.all(d >= 0))
    v = brdf.sheen_visibility(jnp.float32(0.5), jnp.float32(0.5), jnp.float32(0.5))
    assert 0.0 <= float(v) <= 1.0


def test_vndf_sampling_valid():
    u1 = jnp.linspace(0.01, 0.99, 16)
    u2 = jnp.linspace(0.01, 0.99, 16)
    v = jnp.broadcast_to(jnp.array([0.3, 0.1, 0.95]), (16, 3))
    n = brdf.smith_ggx_sample_visible_normal(v, 0.3, 0.3, u1, u2)
    norms = jnp.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
    assert bool(jnp.all(n[:, 2] >= 0))
