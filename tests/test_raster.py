"""Rasterizer correctness vs a brute-force numpy reference.

Tile size is shrunk to 8x128 so tests exercise multi-tile binning even on
small framebuffers (CPU backend, 1 core)."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.ops.raster import (
    VisibilityBuffer, bary_setup_from_clip, interpolate, interpolate_with_derivs,
    pad_viewport, perspective_bary, rasterize,
)

CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                       max_tiles_per_tri=8, big_tri_capacity=16, chunk=8)
W, H = 128, 64


def brute_force_raster(clip, indices, width, height, double_sided=None,
                       front_ccw=True):
    """Per-pixel loop over all triangles (numpy reference)."""
    clip = np.asarray(clip, np.float64)
    w = clip[:, 3]
    ndc = clip[:, :3] / w[:, None]
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[:, 1] * 0.5) * height
    z = ndc[:, 2]
    depth = np.full((height, width), np.inf)
    tid = np.full((height, width), -1, np.int64)
    bary = np.zeros((height, width, 2))
    for t, (i0, i1, i2) in enumerate(np.asarray(indices)):
        if w[i0] <= 1e-6 or w[i1] <= 1e-6 or w[i2] <= 1e-6:
            continue
        x0, y0, x1, y1, x2, y2 = sx[i0], sy[i0], sx[i1], sy[i1], sx[i2], sy[i2]
        d = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        if abs(d) < 1e-12:
            continue
        front = d < 0 if front_ccw else d > 0
        ds = double_sided[t] if double_sided is not None else False
        if not (front or ds):
            continue
        xmin = max(int(np.floor(min(x0, x1, x2))), 0)
        xmax = min(int(np.ceil(max(x0, x1, x2))), width - 1)
        ymin = max(int(np.floor(min(y0, y1, y2))), 0)
        ymax = min(int(np.ceil(max(y0, y1, y2))), height - 1)
        for py in range(ymin, ymax + 1):
            for px in range(xmin, xmax + 1):
                x, y = px + 0.5, py + 0.5
                l0 = ((y1 - y2) * (x - x2) + (x2 - x1) * (y - y2)) / d
                l1 = ((y2 - y0) * (x - x2) + (x0 - x2) * (y - y2)) / d
                l2 = 1 - l0 - l1
                if l0 < 0 or l1 < 0 or l2 < 0:
                    continue
                zz = l0 * z[i0] + l1 * z[i1] + l2 * z[i2]
                if zz < depth[py, px]:
                    depth[py, px] = zz
                    tid[py, px] = t
                    bary[py, px] = (l0, l1)
    return depth, tid, bary


def compare(vb: VisibilityBuffer, ref_depth, ref_tid, tol_px_frac=0.02):
    """Compare allowing a small fraction of edge-pixel mismatches (fp order)."""
    tid = np.asarray(vb.tri_id)
    mismatch = (tid != ref_tid)
    frac = mismatch.mean()
    assert frac <= tol_px_frac, f"{mismatch.sum()} mismatched pixels ({frac:.2%})"
    both = (tid >= 0) & (ref_tid >= 0) & ~mismatch
    if both.any():
        np.testing.assert_allclose(
            np.asarray(vb.depth)[both], ref_depth[both], atol=1e-4)


def make_scene(n_tris=20, seed=0, depth_range=(0.2, 0.8)):
    """Random CCW-in-NDC triangles directly in clip space (w=1)."""
    rng = np.random.default_rng(seed)
    v = rng.uniform(-1.1, 1.1, size=(n_tris, 3, 2))
    z = rng.uniform(*depth_range, size=(n_tris, 3, 1))
    verts = np.concatenate([v, z, np.ones_like(z)], axis=-1).reshape(-1, 4)
    idx = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    # Make all front-facing (CCW in y-up NDC): ensure cross > 0
    p = verts.reshape(n_tris, 3, 4)
    cr = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
          - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1]))
    swap = cr < 0
    idx[swap] = idx[swap][:, [0, 2, 1]]
    return jnp.asarray(verts, jnp.float32), jnp.asarray(idx)


def test_single_triangle_coverage_and_depth():
    verts = jnp.array([
        [-0.5, -0.5, 0.5, 1.0],
        [0.5, -0.5, 0.5, 1.0],
        [0.0, 0.5, 0.5, 1.0],
    ], jnp.float32)
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    vb, stats = rasterize(verts, idx, width=W, height=H, cfg=CFG)
    ref_d, ref_t, _ = brute_force_raster(verts, idx, W, H)
    compare(vb, ref_d, ref_t, tol_px_frac=0.0)
    assert int(stats.bin_overflow) == 0
    # Interior pixel has depth 0.5
    assert abs(float(vb.depth[H // 2, W // 2]) - 0.5) < 1e-5
    assert int(vb.tri_id[H // 2, W // 2]) == 0
    # Corner is background
    assert int(vb.tri_id[0, 0]) == -1


def test_backface_culled_and_double_sided():
    verts = jnp.array([
        [-0.5, -0.5, 0.5, 1.0],
        [0.5, -0.5, 0.5, 1.0],
        [0.0, 0.5, 0.5, 1.0],
    ], jnp.float32)
    idx_cw = jnp.array([[0, 2, 1]], jnp.int32)  # backfacing
    vb, _ = rasterize(verts, idx_cw, width=W, height=H, cfg=CFG)
    assert int(jnp.sum(vb.tri_id >= 0)) == 0
    vb2, _ = rasterize(verts, idx_cw, width=W, height=H, cfg=CFG,
                       double_sided=jnp.array([True]))
    assert int(jnp.sum(vb2.tri_id >= 0)) > 100


def test_depth_ordering_two_triangles():
    # Same footprint, different depth: nearer wins regardless of order.
    def tri(z):
        return [[-0.8, -0.8, z, 1.0], [0.8, -0.8, z, 1.0], [0.0, 0.8, z, 1.0]]
    verts = jnp.array(tri(0.7) + tri(0.3), jnp.float32)
    idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vb, _ = rasterize(verts, idx, width=W, height=H, cfg=CFG)
    assert int(vb.tri_id[H // 2, W // 2]) == 1
    assert abs(float(vb.depth[H // 2, W // 2]) - 0.3) < 1e-5


def test_random_scene_matches_reference():
    verts, idx = make_scene(40, seed=3)
    vb, stats = rasterize(verts, idx, width=W, height=H, cfg=CFG)
    ref_d, ref_t, _ = brute_force_raster(verts, idx, W, H)
    compare(vb, ref_d, ref_t)
    assert int(stats.bin_overflow) == 0
    assert int(stats.big_overflow) == 0


def test_reversed_z():
    def tri(z):
        return [[-0.8, -0.8, z, 1.0], [0.8, -0.8, z, 1.0], [0.0, 0.8, z, 1.0]]
    verts = jnp.array(tri(0.7) + tri(0.3), jnp.float32)
    idx = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    # reversed-z: larger z is nearer
    vb, _ = rasterize(verts, idx, width=W, height=H, cfg=CFG, depth_less=False)
    assert int(vb.tri_id[H // 2, W // 2]) == 0


def test_big_triangle_path():
    # One triangle covering the whole screen goes through the big list.
    verts = jnp.array([
        [-4.0, -4.0, 0.5, 1.0], [4.0, -4.0, 0.5, 1.0], [0.0, 6.0, 0.5, 1.0],
    ], jnp.float32)
    idx = jnp.array([[0, 1, 2]], jnp.int32)
    vb, stats = rasterize(verts, idx, width=W, height=H, cfg=CFG)
    assert int(jnp.sum(vb.tri_id >= 0)) == W * H
    assert int(stats.big_overflow) == 0


def test_perspective_camera_sphere():
    """Full pipeline: world mesh → view/proj → raster, vs brute force."""
    from diligentfx_tpu.gltf.primitives import uv_sphere
    mesh = uv_sphere(1.0, stacks=8, slices=12)
    view = m3.look_at([0, 0, 3], [0, 0, 0])
    proj = m3.perspective(1.0, W / H, 0.1, 10.0)
    clip = m3.transform_points(jnp.asarray(mesh.positions), m3.mul44(view, proj))
    idx = jnp.asarray(mesh.indices)
    vb, stats = rasterize(clip, idx, width=W, height=H, cfg=CFG)
    ref_d, ref_t, _ = brute_force_raster(clip, idx, W, H)
    compare(vb, ref_d, ref_t)
    # Sphere covers center, background at corners
    assert int(vb.tri_id[H // 2, W // 2]) >= 0
    assert int(vb.tri_id[0, 0]) == -1


def test_interpolation_perspective_correct():
    # A quad going into depth; interpolate view-space z and check midpoint.
    # Vertices: near edge z_view=-1 (w=1), far edge z_view=-3 (w=3).
    verts = jnp.array([
        [-1.0, -1.0, 0.2, 1.0],
        [1.0, -1.0, 0.2, 1.0],
        [-3.0, 3.0, 2.4, 3.0],
        [3.0, 3.0, 2.4, 3.0],
    ], jnp.float32)
    idx = jnp.array([[0, 1, 2], [1, 3, 2]], jnp.int32)
    vb, _ = rasterize(verts, idx, width=W, height=H, cfg=CFG)
    winv = 1.0 / verts[:, 3]
    pb = perspective_bary(vb, idx, winv)
    attr = jnp.array([[1.0], [1.0], [3.0], [3.0]], jnp.float32)  # |z_view|
    out = interpolate(vb, idx, attr, pb)
    # At the vertical screen midpoint the perspective-correct value is the
    # harmonic-style mix: 1/z interpolates linearly in screen space.
    mid = float(out[H // 2, W // 2, 0])
    expected = 1.0 / ((0.5 / 1.0) + (0.5 / 3.0))
    assert abs(mid - expected) < 0.05, (mid, expected)


def test_interpolate_with_derivs_affine():
    # w=1 everywhere → derivative of attr = its screen-space plane slope.
    verts = jnp.array([
        [-1.0, -1.0, 0.5, 1.0], [1.0, -1.0, 0.5, 1.0],
        [-1.0, 1.0, 0.5, 1.0], [1.0, 1.0, 0.5, 1.0],
    ], jnp.float32)
    idx = jnp.array([[0, 1, 2], [1, 3, 2]], jnp.int32)
    vb, _ = rasterize(verts, idx, width=W, height=H, cfg=CFG)
    # attr = x_ndc → in pixels du/dx = 2/W
    attr = verts[:, 0:1]
    setup = bary_setup_from_clip(verts, idx, W, H)
    winv = 1.0 / verts[:, 3]
    val, ddx, ddy = interpolate_with_derivs(vb, idx, attr, setup, winv)
    inside = np.asarray(vb.tri_id) >= 0
    np.testing.assert_allclose(np.asarray(ddx[..., 0])[inside], 2.0 / W, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ddy[..., 0])[inside], 0.0, atol=1e-5)


def test_pad_viewport():
    assert pad_viewport(500, 300, CFG) == (512, 304)


def test_pair_compaction_parity():
    """pair_compaction_cap rewrites the binning sort over a compacted pair
    buffer — the visibility buffer must be IDENTICAL to the legacy path."""
    import dataclasses
    rng = np.random.default_rng(5)
    verts = jnp.asarray(rng.normal(0, 0.8, (60, 4)).astype(np.float32)
                        + np.array([0, 0, 0.5, 1.2], np.float32))
    idx = jnp.asarray(rng.integers(0, 60, (40, 3)).astype(np.int32))
    cfg0 = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                            max_tiles_per_tri=8, big_tri_capacity=16, chunk=8)
    cfg1 = dataclasses.replace(cfg0, pair_compaction_cap=512)
    vb0, _ = rasterize(verts, idx, width=256, height=64, cfg=cfg0)
    vb1, _ = rasterize(verts, idx, width=256, height=64, cfg=cfg1)
    np.testing.assert_array_equal(np.asarray(vb0.tri_id), np.asarray(vb1.tri_id))
    np.testing.assert_array_equal(np.asarray(vb0.depth), np.asarray(vb1.depth))


def test_near_clip_compaction_renders_straddling_triangle():
    """A ground quad extending from in front of the camera to behind it must
    render its visible part via the compacted slot-2 sub-triangles (the
    round-5 compaction replaced the fixed 2x clip expansion)."""
    view = m3.look_at([0.0, 1.0, 0.0], [0.0, 1.0, -10.0])
    proj = m3.perspective(0.9, W / H, 0.1, 100.0)
    vp = m3.mul44(view, proj)
    # ground plane quad straddling the near plane (z from +2 behind the eye
    # to -20 in front)
    pos = np.array([[-5, 0, 2], [5, 0, 2], [5, 0, -20], [-5, 0, -20]],
                   np.float32)
    idx = jnp.asarray([[0, 2, 1], [0, 3, 2]], jnp.int32)
    clip = m3.transform_points(jnp.asarray(pos), vp)
    vb, stats = rasterize(clip, idx, width=W, height=H, cfg=CFG,
                          double_sided=jnp.ones((2,), bool))
    covered = np.asarray(vb.tri_id) >= 0
    # the visible ground fills the lower half of the frame broadly
    assert covered[H - 4, :].mean() > 0.9
    assert covered[H // 2 + 6, W // 4:3 * W // 4].mean() > 0.5
    assert int(stats.bin_overflow) == 0
    # depth increases toward the horizon (farther ground rows)
    d = np.asarray(vb.depth)
    row_lo, row_hi = H - 4, H // 2 + 8
    assert d[row_hi, W // 2] > d[row_lo, W // 2]


def test_near_clip_overflow_is_counted():
    """More straddling triangles than the overflow capacity → the dropped
    slot-2 sub-tris are reported, not silently lost."""
    from diligentfx_tpu.ops.raster import _clip_near_plane
    n = 12
    tris = []
    for i in range(n):
        x = (i - n / 2) * 0.1
        # two verts in front (w > eps), one behind → n_in == 2 → slot 2 alive
        tris.append([[x, -0.5, 0.0, 1.0], [x + 0.05, 0.5, 0.0, 1.0],
                     [x + 0.02, 0.0, 0.0, -1.0]])
    clip = jnp.asarray(np.array(tris, np.float32).reshape(-1, 4))
    idx = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
    verts, barys, alive, orig, ovf = _clip_near_plane(clip, idx, 1e-3,
                                                      clip_cap=4)
    assert verts.shape[0] == n + 4
    assert int(ovf) == n - 4
    assert int(alive[n:].sum()) == 4
