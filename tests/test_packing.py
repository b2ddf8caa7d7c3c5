"""Packed vertex formats (PackVertexNormal / PackVertexPos64 analogues,
PBR_Renderer.hpp:1064-1086)."""
import jax.numpy as jnp
import numpy as np

from diligentfx_tpu.ops import packing as pk


def _rand_units(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_normal_roundtrip():
    n = jnp.asarray(_rand_units(4096))
    p = pk.pack_normal(n)
    assert p.dtype == jnp.uint32 and p.shape == (4096,)
    back = np.asarray(pk.unpack_normal(p))
    dots = np.sum(back * np.asarray(n), axis=-1)
    assert dots.min() > 0.99999          # snorm16 oct: sub-0.01-degree error


def test_normal_axes_exact_z_sign():
    axes = jnp.asarray([[0, 0, 1], [0, 0, -1], [1, 0, 0], [0, -1, 0]],
                       jnp.float32)
    back = np.asarray(pk.unpack_normal(pk.pack_normal(axes)))
    np.testing.assert_allclose(back, np.asarray(axes), atol=1e-3)


def test_position_roundtrip():
    r = np.random.default_rng(1)
    pos = jnp.asarray(r.uniform(-50.0, 90.0, size=(8192, 3)).astype(np.float32))
    packed = pk.pack_positions(pos)
    assert packed.lo.dtype == jnp.uint32
    back = np.asarray(pk.unpack_positions(packed))
    extent = 140.0
    # 21-bit quantization: max error = extent / 2^21 / 2
    tol = extent / (1 << 21)
    np.testing.assert_allclose(back, np.asarray(pos), atol=tol)


def test_position_explicit_aabb():
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]], jnp.float32)
    packed = pk.pack_positions(pos, aabb=(jnp.zeros(3), jnp.asarray([1., 2., 3.])))
    back = np.asarray(pk.unpack_positions(packed))
    np.testing.assert_allclose(back, np.asarray(pos), atol=1e-5)


def test_uv_roundtrip():
    r = np.random.default_rng(2)
    uv = jnp.asarray(r.uniform(-4.0, 4.0, size=(4096, 2)).astype(np.float32))
    back = np.asarray(pk.unpack_uv(pk.pack_uv(uv)))
    np.testing.assert_allclose(back, np.asarray(uv), rtol=1e-3, atol=2e-3)
