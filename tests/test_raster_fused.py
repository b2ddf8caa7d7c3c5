"""Fused raster+interpolate+material kernel vs the two-pass reference path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.ops import raster as rz


def _scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    v = n * 3
    pos = rng.uniform(-2, 2, (v, 3)).astype(np.float32)
    pos[:, 2] = rng.uniform(-4, -1.5, v)
    idx = np.arange(v, dtype=np.int32).reshape(n, 3)
    attrs = rng.standard_normal((v, 5)).astype(np.float32)
    proj = np.asarray(m3.perspective(0.8, 1.0, 0.1, 50.0))
    clip4 = np.concatenate([pos, np.ones((v, 1), np.float32)], -1) @ proj
    return jnp.asarray(clip4), jnp.asarray(idx), jnp.asarray(attrs)


CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                       max_tiles_per_tri=8, big_tri_capacity=8, chunk=8)


def test_fused_matches_two_pass():
    W = H = 128
    clip, idx, attrs = _scene()
    winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
    n = idx.shape[0]
    rng = np.random.default_rng(1)
    mat_of_tri = jnp.asarray(rng.integers(0, 4, n).astype(np.float32))
    node_of_tri = jnp.asarray(rng.integers(0, 7, n).astype(np.float32))
    consts = jnp.stack([mat_of_tri, node_of_tri], -1)
    mat_table = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    ds = jnp.ones((n,), bool)    # double-sided: raster everything
    vb_f, out, _ = rz.rasterize_fused(
        clip, idx, attrs, winv, consts, mat_table,
        width=W, height=H, cfg=CFG, n_ch=5, deriv_channels=(3,),
        double_sided=ds, interpret=True)

    vb, _ = rz.rasterize(clip, idx, width=W, height=H, cfg=CFG,
                         double_sided=ds, backend="xla")
    np.testing.assert_array_equal(np.asarray(vb_f.tri_id),
                                  np.asarray(vb.tri_id))
    np.testing.assert_allclose(np.asarray(vb_f.depth), np.asarray(vb.depth),
                               atol=1e-5)

    ref = rz.interpolate_all(vb, idx, attrs, winv)
    hit = np.asarray(vb.tri_id) >= 0
    # out is channel-FIRST (C, H, W) — view as (H, W, C) for the checks
    got = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(got[..., :5][hit], np.asarray(ref)[hit],
                               atol=2e-4, rtol=2e-4)

    # derivatives of channel 3 vs interpolate_with_derivs
    setup_b = rz.bary_setup_from_clip(clip, idx, W, H)
    _, ddx, ddy = rz.interpolate_with_derivs(vb, idx, attrs[:, 3:4],
                                             setup_b, winv)
    np.testing.assert_allclose(got[..., 5][hit], np.asarray(ddx)[..., 0][hit],
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(got[..., 6][hit], np.asarray(ddy)[..., 0][hit],
                               atol=5e-3, rtol=5e-3)

    # constants: material and node id, exact
    tid = np.asarray(vb.tri_id)
    mt = np.asarray(mat_of_tri)
    nt = np.asarray(node_of_tri)
    np.testing.assert_array_equal(got[..., 7][hit], mt[tid[hit]])
    np.testing.assert_array_equal(got[..., 8][hit], nt[tid[hit]])

    # material rows
    mtab = np.asarray(mat_table)
    mrow_ref = mtab[:, mt[tid[hit]].astype(int)].T
    np.testing.assert_allclose(got[..., 9:25][hit], mrow_ref, atol=1e-6)


def test_sub_binned_matches_baseline():
    """cfg.sub_bins + cfg.big_tile_capacity (the round-4 z-loop reduction:
    segment candidates per (tile_h/sub, tile_w) sub-bin + exact per-tile big
    lists) must be BIT-exact vs the unsegmented kernel — same winner
    tie-break (submission order within segment, smalls before bigs)."""
    W = H = 256
    clip, idx, attrs = _scene(n=120, seed=3)
    # make a handful of screen-filling triangles so the big path is exercised
    clipn = np.asarray(clip).copy()
    clipn[:9, :2] *= 12.0
    clip = jnp.asarray(clipn)
    winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
    n = idx.shape[0]
    rng = np.random.default_rng(4)
    consts = jnp.stack([jnp.asarray(rng.integers(0, 4, n).astype(np.float32)),
                        jnp.asarray(rng.integers(0, 7, n).astype(np.float32))],
                       -1)
    mat_table = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    ds = jnp.ones((n,), bool)
    # at 8-px bin granularity more triangles classify as "big" (bbox rows
    # count in bins) — capacities must absorb them for a zero-overflow
    # comparison (overflow policies legitimately differ between the paths)
    base = dict(tile_w=128, bin_capacity=64, max_tiles_per_tri=8, chunk=8)
    cfg0 = RasterizerConfig(tile_h=32, big_tri_capacity=64, **base)
    cfg1 = RasterizerConfig(tile_h=32, sub_bins=4, big_tri_capacity=256,
                            big_tile_capacity=128, **base)
    vb0, out0, st0 = rz.rasterize_fused(
        clip, idx, attrs, winv, consts, mat_table, width=W, height=H,
        cfg=cfg0, n_ch=5, deriv_channels=(3,), double_sided=ds,
        interpret=True)
    vb1, out1, st1 = rz.rasterize_fused(
        clip, idx, attrs, winv, consts, mat_table, width=W, height=H,
        cfg=cfg1, n_ch=5, deriv_channels=(3,), double_sided=ds,
        interpret=True)
    assert int(st0.big_overflow) == 0 and int(st1.big_overflow) == 0
    assert int(st1.bin_overflow) == 0
    np.testing.assert_array_equal(np.asarray(vb0.tri_id),
                                  np.asarray(vb1.tri_id))
    np.testing.assert_array_equal(np.asarray(vb0.depth),
                                  np.asarray(vb1.depth))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-5)
