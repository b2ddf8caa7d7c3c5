"""K-layer OIT tests: layer ordering, overflow, composite correctness."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.pbr.oit import (composite_klayers, rasterize_klayers)

CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                       max_tiles_per_tri=8, big_tri_capacity=16, chunk=8)
W, H = 128, 64


def stacked_quads(depths):
    """Full-screen-ish triangles at given NDC depths (clip space, w=1)."""
    verts, idx = [], []
    for i, z in enumerate(depths):
        base = len(verts)
        verts += [[-2, -2, z, 1], [2, -2, z, 1], [0, 3, z, 1]]
        idx.append([base, base + 1, base + 2])
    return jnp.asarray(verts, jnp.float32), jnp.asarray(idx, jnp.int32)


def test_klayers_sorted_by_depth():
    # submit out of order; layers must come out depth-ascending
    verts, idx = stacked_quads([0.7, 0.2, 0.5, 0.9])
    kl = rasterize_klayers(verts, idx, width=W, height=H, cfg=CFG, num_layers=4)
    c = (H // 2, W // 2)
    ids = [int(kl.tri_id[k][c]) for k in range(4)]
    zs = [float(kl.depth[k][c]) for k in range(4)]
    assert ids == [1, 2, 0, 3]
    assert zs == sorted(zs)
    assert int(kl.overflow[c]) == 0


def test_klayers_overflow_counts():
    verts, idx = stacked_quads([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    kl = rasterize_klayers(verts, idx, width=W, height=H, cfg=CFG, num_layers=4)
    c = (H // 2, W // 2)
    assert int(kl.overflow[c]) == 2
    assert [int(kl.tri_id[k][c]) for k in range(4)] == [0, 1, 2, 3]


def test_composite_front_to_back():
    verts, idx = stacked_quads([0.3, 0.6])
    kl = rasterize_klayers(verts, idx, width=W, height=H, cfg=CFG, num_layers=4)
    opaque = jnp.full((H, W, 3), 1.0)       # white background
    opaque_depth = jnp.ones((H, W))
    k = kl.depth.shape[0]
    colors = jnp.zeros((k, H, W, 3)).at[0].set(jnp.array([1.0, 0.0, 0.0])) \
                                     .at[1].set(jnp.array([0.0, 1.0, 0.0]))
    alphas = jnp.full((k, H, W, 1), 0.5)
    out = composite_klayers(opaque, opaque_depth, kl, colors, alphas)
    c = np.asarray(out)[H // 2, W // 2]
    # 0.5 red over (0.5 green over white): r = .5, g = .25 + 0, bg white*.25
    np.testing.assert_allclose(c, [0.5 + 0.25, 0.25 + 0.25, 0.25], atol=1e-5)


def test_composite_respects_opaque_depth():
    verts, idx = stacked_quads([0.8])
    kl = rasterize_klayers(verts, idx, width=W, height=H, cfg=CFG, num_layers=2)
    opaque = jnp.full((H, W, 3), 0.2)
    opaque_depth = jnp.full((H, W), 0.5)    # opaque surface in FRONT of layer
    colors = jnp.ones((2, H, W, 3))
    alphas = jnp.full((2, H, W, 1), 1.0)
    out = composite_klayers(opaque, opaque_depth, kl, colors, alphas)
    np.testing.assert_allclose(np.asarray(out)[H // 2, W // 2], 0.2, atol=1e-5)


def test_tail_carries_dropped_fragments_own_color():
    # 3 quads, K=2: the FARTHEST fragment (blue, submitted first so it is
    # displaced by later nearer candidates) must fall into the tail with its
    # OWN alpha and color (OIT.fxh RGBA8 tail average semantics)
    verts, idx = stacked_quads([0.9, 0.2, 0.5])
    tri_alpha = jnp.asarray([0.25, 0.5, 0.5], jnp.float32)
    tri_rgb = jnp.asarray([[0.0, 0.0, 1.0],   # blue — the dropped one
                           [1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0]], jnp.float32)
    kl = rasterize_klayers(verts, idx, width=W, height=H, cfg=CFG,
                           num_layers=2, tri_alpha=tri_alpha, tri_rgb=tri_rgb)
    c = (H // 2, W // 2)
    assert [int(kl.tri_id[k][c]) for k in range(2)] == [1, 2]
    assert int(kl.overflow[c]) == 1
    np.testing.assert_allclose(float(kl.tail_alpha[c]), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(kl.tail_color[c]), [0, 0, 1],
                               atol=1e-6)


def test_tail_color_composite_adds_dropped_radiance():
    verts, idx = stacked_quads([0.9, 0.2, 0.5])
    tri_alpha = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    tri_rgb = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0]], jnp.float32)
    kl = rasterize_klayers(verts, idx, width=W, height=H, cfg=CFG,
                           num_layers=2, tri_alpha=tri_alpha, tri_rgb=tri_rgb)
    opaque = jnp.zeros((H, W, 3))
    opaque_depth = jnp.ones((H, W))
    colors = jnp.zeros((2, H, W, 3)).at[0].set(jnp.array([1.0, 0.0, 0.0])) \
                                    .at[1].set(jnp.array([0.0, 1.0, 0.0]))
    alphas = jnp.full((2, H, W, 1), 0.5)
    out = composite_klayers(opaque, opaque_depth, kl, colors, alphas)
    c = np.asarray(out)[H // 2, W // 2]
    # front-to-back: .5 red + .25 green + tail (.5 blue at transmittance .25)
    np.testing.assert_allclose(c, [0.5, 0.25, 0.125], atol=1e-5)
