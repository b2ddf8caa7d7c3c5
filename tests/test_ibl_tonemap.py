import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.config import ToneMappingMode
from diligentfx_tpu.ops.sampling import (
    bilinear_sample, build_mip_chain, dir_to_oct_uv, oct_pixel_dirs,
    oct_solid_angles, oct_uv_to_dir, sample_mip_trilinear)
from diligentfx_tpu.pbr.ibl import (
    precompute_brdf_lut, precompute_charlie_lut, precompute_irradiance_oct,
    prefilter_env_ggx_oct)
from diligentfx_tpu.postfx.tonemap import (
    ToneMappingAttribs, average_log_luminance, tone_map)


def test_octahedral_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    uv = dir_to_oct_uv(jnp.asarray(d, jnp.float32))
    back = oct_uv_to_dir(uv)
    np.testing.assert_allclose(np.asarray(back), d, atol=2e-6)


def test_oct_solid_angles_sum_4pi():
    sa = oct_solid_angles(64)
    assert abs(float(jnp.sum(sa)) - 4 * np.pi) < 1e-3


def test_bilinear_sample_exact_at_centers():
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    # Texel center (1,2): uv = ((1+0.5)/4, (2+0.5)/4)
    uv = jnp.array([[1.5 / 4, 2.5 / 4]])
    out = bilinear_sample(img, uv)
    assert float(out[0, 0]) == pytest.approx(9.0)  # img[2,1] = 2*4+1


def test_mip_trilinear_blend():
    img = jnp.ones((8, 8, 1), jnp.float32)
    mips = build_mip_chain(img * 2.0, 3)
    mips = [mips[0], mips[1] * 0.0, mips[2]]  # level1 forced to 0
    uv = jnp.array([[0.5, 0.5]])
    v0 = sample_mip_trilinear(mips, uv, jnp.array([0.0]))
    v_half = sample_mip_trilinear(mips, uv, jnp.array([0.5]))
    v1 = sample_mip_trilinear(mips, uv, jnp.array([1.0]))
    assert float(v0[0, 0]) == pytest.approx(2.0)
    assert float(v_half[0, 0]) == pytest.approx(1.0)
    assert float(v1[0, 0]) == pytest.approx(0.0)


def test_brdf_lut_properties():
    lut = precompute_brdf_lut(32, 64)
    a = np.asarray(lut[..., 0])
    b = np.asarray(lut[..., 1])
    assert (a >= -1e-4).all() and (b >= -1e-4).all()
    # Energy: scale + bias ≤ ~1 everywhere (split-sum bound)
    assert (a + b <= 1.05).all()
    # Smooth + head-on: F0-scale ≈ 1 (perfect mirror)
    assert a[0, -1] + b[0, -1] == pytest.approx(1.0, abs=0.05)


def test_irradiance_uniform_env():
    # Uniform radiance L → E/π = L (reference convention: diffuse = irr * albedo)
    env = jnp.ones((32, 32, 3), jnp.float32) * 2.0
    irr = precompute_irradiance_oct(env, 16)
    np.testing.assert_allclose(np.asarray(irr), 2.0, rtol=0.02)


def test_irradiance_directional_env():
    # Env bright only in +Y: irradiance at +Y normal must exceed -Y normal.
    dirs = oct_pixel_dirs(32)
    env = jnp.where(dirs[..., 1:2] > 0.8, 10.0, 0.0) * jnp.ones((1, 1, 3))
    irr = precompute_irradiance_oct(env, 16)
    up_uv = dir_to_oct_uv(jnp.array([[0.0, 1.0, 0.0]]))
    dn_uv = dir_to_oct_uv(jnp.array([[0.0, -1.0, 0.0]]))
    up = float(bilinear_sample(irr, up_uv)[0, 0])
    dn = float(bilinear_sample(irr, dn_uv)[0, 0])
    assert up > 4 * max(dn, 1e-3)


def test_prefilter_uniform_env_stays_uniform():
    env = jnp.ones((32, 32, 3), jnp.float32) * 3.0
    mips = prefilter_env_ggx_oct(env, base_dim=32, num_mips=3, num_samples=32)
    assert len(mips) == 3
    for m in mips:
        np.testing.assert_allclose(np.asarray(m), 3.0, rtol=0.05)


def test_charlie_lut_range():
    lut = precompute_charlie_lut(16, 64)
    v = np.asarray(lut)
    assert (v >= 0).all() and (v <= 1.2).all()


@pytest.mark.parametrize("mode", list(ToneMappingMode))
def test_tonemap_modes_sane(mode):
    hdr = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.3, 0.1], [50.0, 40.0, 30.0]])
    out = tone_map(hdr, mode, ToneMappingAttribs(), ave_log_lum=0.3)
    o = np.asarray(out)
    assert np.isfinite(o).all(), mode
    assert (o >= -1e-3).all(), mode
    # Bright input compresses to bounded output for the operators with a
    # hard shoulder. (NONE passes through; REINHARD_MOD / UNCHARTED2 /
    # LOGARITHMIC / ADAPTIVE_LOG legitimately exceed 1 above the white point.)
    bounded = (ToneMappingMode.EXP, ToneMappingMode.REINHARD,
               ToneMappingMode.FILMIC_ALU, ToneMappingMode.AGX,
               ToneMappingMode.AGX_CUSTOM, ToneMappingMode.PBR_NEUTRAL,
               ToneMappingMode.COMMERCE)
    if mode in bounded:
        assert o[2].max() < 1.6, (mode, o[2])


def test_tonemap_monotonic_luminance():
    xs = jnp.linspace(0.01, 20.0, 64)[:, None] * jnp.ones(3)
    out = tone_map(xs, ToneMappingMode.REINHARD)
    lum = np.asarray(out).sum(-1)
    assert (np.diff(lum) > -1e-6).all()


def test_average_log_luminance():
    img = jnp.ones((8, 8, 3), jnp.float32)
    assert float(average_log_luminance(img)) == pytest.approx(1.0, abs=1e-3)


def test_packed_pyramid_matches_two_tap_trilinear():
    """sample_pyramid_packed (ONE row gather) must reproduce the 8-tap
    trilinear of sample_oct_pyramid exactly (same clamp semantics)."""
    from diligentfx_tpu.ops.sampling import (build_packed_pyramid,
                                             flatten_mip_pyramid,
                                             sample_oct_pyramid,
                                             sample_pyramid_packed)
    rng = np.random.default_rng(7)
    mips = []
    n = 32
    while n >= 4:
        mips.append(jnp.asarray(rng.random((n, n, 3)), jnp.float32))
        n //= 2
    flat, offs, sizes = flatten_mip_pyramid(mips)
    packed = build_packed_pyramid(mips)
    assert packed.shape == (32 * 32 + 16 * 16 + 8 * 8, 40)

    d = rng.normal(size=(64, 33, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    lod = jnp.asarray(rng.uniform(-0.5, len(mips) - 0.3, (64, 33)), jnp.float32)

    ref = sample_oct_pyramid(flat, offs, sizes, d, lod)
    got = sample_pyramid_packed(packed, [m.shape[0] for m in mips],
                                dir_to_oct_uv(d), lod)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_packed_pyramid_repeated_tail_levels():
    """Prefiltered env chains clamp at 4×4 but keep emitting roughness
    levels (pbr/ibl.prefilter_env_ggx_oct) — the packed table must handle
    same-size coarse steps (the round-4 regression that broke the CSM
    golden: top_dim >> lvl assumed strict halving)."""
    from diligentfx_tpu.ops.sampling import (build_packed_pyramid,
                                             flatten_mip_pyramid,
                                             sample_oct_pyramid,
                                             sample_pyramid_packed)
    rng = np.random.default_rng(11)
    dims = [16, 8, 4, 4, 4, 4]
    mips = [jnp.asarray(rng.random((n, n, 3)), jnp.float32) for n in dims]
    flat, offs, sizes = flatten_mip_pyramid(mips)
    packed = build_packed_pyramid(mips)
    assert packed.shape[0] == sum(n * n for n in dims[:-1])

    d = rng.normal(size=(64, 33, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    lod = jnp.asarray(rng.uniform(-0.5, len(mips) - 0.3, (64, 33)), jnp.float32)

    ref = sample_oct_pyramid(flat, offs, sizes, d, lod)
    got = sample_pyramid_packed(packed, dims, dir_to_oct_uv(d), lod)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_packed_pyramid_edge_uv_clamps():
    """uv at the exact corners/edges must match edge-clamped bilinear."""
    from diligentfx_tpu.ops.sampling import (build_packed_pyramid,
                                             sample_pyramid_packed)
    rng = np.random.default_rng(3)
    mips = [jnp.asarray(rng.random((8, 8, 3)), jnp.float32),
            jnp.asarray(rng.random((4, 4, 3)), jnp.float32)]
    packed = build_packed_pyramid(mips)
    uv = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0],
                      [0.5, 0.0], [0.03, 0.97]], jnp.float32)
    got0 = sample_pyramid_packed(packed, (8, 4), uv, jnp.zeros(6))
    ref0 = bilinear_sample(mips[0], uv)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), atol=1e-6)
    got1 = sample_pyramid_packed(packed, (8, 4), uv, jnp.ones(6))
    ref1 = bilinear_sample(mips[1], uv)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), atol=1e-6)
