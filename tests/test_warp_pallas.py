"""Pallas warp kernel: interpret-mode correctness vs XLA bilinear."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from diligentfx_tpu.ops.sampling import bilinear_sample
from diligentfx_tpu.ops.warp_pallas import warp_bilinear_pallas


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))


def test_warp_matches_xla_bilinear(interpret_pallas):
    H, W = 32, 256
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
    off = jnp.asarray(rng.uniform(-5, 5, (H, W, 2)), jnp.float32)
    out = warp_bilinear_pallas(img, off, halo_r=8, halo_c=64)
    xg = jnp.arange(W, dtype=jnp.float32) + 0.5
    yg = jnp.arange(H, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(xg, yg, indexing="xy")
    uv = jnp.stack([(xx + off[..., 0]) / W, (yy + off[..., 1]) / H], -1)
    ref = bilinear_sample(img[..., None], uv)[..., 0]
    a, b = np.asarray(out), np.asarray(ref)
    # interior exact; window-edge clamping differs from uv clamping at borders
    assert np.abs(a - b)[10:-10, 70:-70].max() < 1e-4


def test_warp_multichannel_and_clamping(interpret_pallas):
    H, W = 16, 128
    img = jnp.asarray(np.random.rand(H, W, 3), jnp.float32)
    off = jnp.zeros((H, W, 2), jnp.float32)
    out = warp_bilinear_pallas(img, off, halo_r=8, halo_c=64)
    # zero offset → identity (within bilinear center-tap exactness)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # offsets beyond the halo are clamped, not wrapped
    big = jnp.full((H, W, 2), 500.0)
    out2 = warp_bilinear_pallas(img, big, halo_r=8, halo_c=64)
    assert np.isfinite(np.asarray(out2)).all()


def test_warp_right_halo_interior_tiles(interpret_pallas):
    """Regression (ADVICE r1): the window origin round-down used to leave
    zero right halo on interior tiles, so +x offsets at a tile's right
    columns clamped to the window edge and sampled wrong texels."""
    H, W = 32, 512
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
    off = np.zeros((H, W, 2), np.float32)
    off[..., 0] = 40.0          # rightward motion
    off[..., 1] = -5.0
    out = warp_bilinear_pallas(img, jnp.asarray(off), halo_r=16, halo_c=64)
    xg = jnp.arange(W, dtype=jnp.float32) + 0.5
    yg = jnp.arange(H, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(xg, yg, indexing="xy")
    uv = jnp.stack([(xx + off[..., 0]) / W, (yy + off[..., 1]) / H], -1)
    ref = bilinear_sample(img[..., None], uv)[..., 0]
    a, b = np.asarray(out), np.asarray(ref)
    # every interior tile's right columns must match (they were the bug)
    assert np.abs(a - b)[8:-8, 128:448].max() < 1e-4


def test_multi_tap_matches_single(monkeypatch):
    """warp_bilinear_multi_pallas == K independent warp_bilinear_pallas
    calls (one window DMA serving all taps)."""
    import functools
    from jax.experimental import pallas as pl
    from diligentfx_tpu.ops.warp_pallas import (warp_bilinear_multi_pallas,
                                                warp_bilinear_pallas)
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    rng = np.random.default_rng(3)
    h, w, k = 32, 256, 5
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    offs = jnp.asarray(
        rng.uniform(-20, 20, (k, h, w, 2)).astype(np.float32))
    multi = warp_bilinear_multi_pallas(img, offs, halo_r=16, halo_c=64)
    for i in range(k):
        single = warp_bilinear_pallas(img, offs[i], halo_r=16, halo_c=64)
        np.testing.assert_allclose(np.asarray(multi[i]), np.asarray(single),
                                   atol=1e-5, err_msg=str(i))
