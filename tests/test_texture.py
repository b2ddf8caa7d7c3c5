"""Texture atlas: packing, sampling, wrap modes, mip selection."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.ops.texture import (AtlasBuilder, apply_uv_transform,
                                        sample_atlas, white_atlas)


def test_atlas_packing_multiple_textures():
    b = AtlasBuilder(size=64)
    t0 = b.add(np.full((16, 16, 3), 0.25, np.float32))
    t1 = b.add(np.full((32, 16, 3), 0.5, np.float32))
    t2 = b.add((np.ones((8, 8)) * 255).astype(np.uint8))   # grayscale uint8
    atlas = b.build(num_mips=3)
    assert atlas.num_layers >= 1
    assert len(atlas.mips) == 3
    # sample each texture's center → its own color
    for tid, expect in [(t0, 0.25), (t1, 0.5), (t2, 1.0)]:
        v = sample_atlas(atlas, jnp.array([[tid]]), jnp.array([[[0.5, 0.5]]]),
                         jnp.array([[0.0]]))
        assert float(v[0, 0, 0]) == pytest.approx(expect, abs=0.02), tid


def test_atlas_overflow_to_new_layer():
    b = AtlasBuilder(size=32)
    ids = [b.add(np.full((24, 24, 3), i / 4, np.float32)) for i in range(4)]
    atlas = b.build(num_mips=1)
    assert atlas.num_layers >= 3
    for i, tid in enumerate(ids):
        v = sample_atlas(atlas, jnp.array([tid]), jnp.array([[0.5, 0.5]]),
                         jnp.array([0.0]))
        assert float(v[0, 0]) == pytest.approx(i / 4, abs=0.02)


def test_wrap_modes():
    b = AtlasBuilder(size=16)
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = 1.0   # left half white
    tid = b.add(img)
    atlas = b.build(num_mips=1)
    t = jnp.array([tid])
    # repeat: u=1.25 ≡ 0.25 → white
    v_rep = sample_atlas(atlas, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                         wrap_u=jnp.array([0]), wrap_v=jnp.array([0]))
    assert float(v_rep[0, 0]) > 0.9
    # clamp: u=1.25 → right edge → black
    v_clamp = sample_atlas(atlas, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                           wrap_u=jnp.array([2]), wrap_v=jnp.array([2]))
    assert float(v_clamp[0, 0]) < 0.1
    # mirror: u=1.25 → mirrored 0.75 → black side
    v_mir = sample_atlas(atlas, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                         wrap_u=jnp.array([1]), wrap_v=jnp.array([1]))
    assert float(v_mir[0, 0]) < 0.1


def test_mip_lod_blends_detail():
    b = AtlasBuilder(size=32)
    checker = np.indices((16, 16)).sum(0) % 2
    tid = b.add(np.repeat(checker[..., None], 3, -1).astype(np.float32))
    atlas = b.build(num_mips=4)
    t = jnp.array([tid])
    uv = jnp.array([[0.5, 0.5]])
    sharp = sample_atlas(atlas, t, uv, jnp.array([0.0]))
    blurred = sample_atlas(atlas, t, uv, jnp.array([2.5]))
    # high mip of a checkerboard approaches 0.5 gray
    assert abs(float(blurred[0, 0]) - 0.5) < abs(float(sharp[0, 0]) - 0.5) + 0.05
    assert abs(float(blurred[0, 0]) - 0.5) < 0.2


def test_uv_transform():
    uv = jnp.array([[0.25, 0.5]])
    # scale x2, offset (0.1, -0.2)
    sr = jnp.array([[2.0, 0.0, 0.0, 2.0]])
    bias = jnp.array([[0.1, -0.2]])
    out = apply_uv_transform(uv, sr, bias)
    np.testing.assert_allclose(np.asarray(out), [[0.6, 0.8]], atol=1e-6)


def test_white_atlas_default():
    atlas = white_atlas()
    v = sample_atlas(atlas, jnp.array([0]), jnp.array([[0.3, 0.7]]),
                     jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(v[0]), [1, 1, 1, 1], atol=1e-6)
