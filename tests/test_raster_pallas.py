"""Pallas raster kernel parity vs the XLA-scan backend (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.gltf.primitives import uv_sphere
from diligentfx_tpu.ops.raster import rasterize


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))


CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=128,
                       max_tiles_per_tri=8, big_tri_capacity=16, chunk=8)


def test_pallas_matches_xla_sphere(interpret_pallas):
    mesh = uv_sphere(1.0, stacks=8, slices=10)
    view = m3.look_at([0, 0, 3], [0, 0, 0])
    proj = m3.perspective(1.0, 2.0, 0.1, 10.0)
    clip = m3.transform_points(jnp.asarray(mesh.positions), m3.mul44(view, proj))
    idx = jnp.asarray(mesh.indices)
    vbx, _ = rasterize(clip, idx, width=256, height=64, cfg=CFG, backend="xla")
    vbp, _ = rasterize(clip, idx, width=256, height=64, cfg=CFG, backend="pallas")
    tx, tp = np.asarray(vbx.tri_id), np.asarray(vbp.tri_id)
    assert (tx == tp).all()
    both = tx >= 0
    np.testing.assert_allclose(np.asarray(vbp.depth)[both],
                               np.asarray(vbx.depth)[both], atol=1e-5)
    np.testing.assert_allclose(np.asarray(vbp.bary)[both],
                               np.asarray(vbx.bary)[both], atol=1e-5)


def test_pallas_big_triangle_and_reversed_z(interpret_pallas):
    verts = jnp.array([
        [-4.0, -4.0, 0.5, 1.0], [4.0, -4.0, 0.5, 1.0], [0.0, 6.0, 0.5, 1.0],
        [-0.5, -0.5, 0.7, 1.0], [0.5, -0.5, 0.7, 1.0], [0.0, 0.5, 0.7, 1.0],
    ], jnp.float32)
    idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vb, st = rasterize(verts, idx, width=128, height=64, cfg=CFG, backend="pallas")
    # Big triangle covers the full screen; small one is behind it.
    assert int(jnp.sum(vb.tri_id >= 0)) == 128 * 64
    assert int(jnp.sum(vb.tri_id == 1)) == 0
    # Reversed z: nearer = larger depth → small triangle (0.7) wins
    vbr, _ = rasterize(verts, idx, width=128, height=64, cfg=CFG,
                       backend="pallas", depth_less=False)
    assert int(jnp.sum(vbr.tri_id == 1)) > 50
