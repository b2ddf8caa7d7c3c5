"""Component tests: env map, bbox, grid, vector field, depth range,
selection jump-flood."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs

H, W = 64, 128


def make_camera(eye=(0, 2, 6)):
    view = m3.look_at(list(eye), [0, 0, 0])
    proj = m3.perspective(1.0, W / H, 0.5, 50.0)
    return CameraAttribs.create(view, proj, list(eye), 0.5, 50.0, W, H)


def test_env_map_renderer():
    from diligentfx_tpu.components.renderers import render_env_map
    from diligentfx_tpu.ops.sampling import oct_pixel_dirs
    d = oct_pixel_dirs(32)
    env = jnp.where(d[..., 1:2] > 0, 2.0, 0.1) * jnp.ones((1, 1, 3))
    cam = make_camera()
    img = render_env_map(env, cam, W, H)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    # sky (top rows) brighter than ground (bottom rows)
    assert a[:8].mean() > a[-8:].mean() * 2


def test_bound_box_renderer():
    from diligentfx_tpu.components.renderers import render_bound_box
    cam = make_camera()
    color = jnp.zeros((H, W, 3))
    depth = jnp.ones((H, W))
    out = render_bound_box(color, depth, cam, [-1, -1, -1], [1, 1, 1])
    a = np.asarray(out)
    assert a.max() > 0.5           # some edge pixels drawn
    assert (a.sum(-1) > 0).sum() < H * W * 0.2  # sparse lines
    # fully occluded box draws nothing
    out2 = render_bound_box(color, jnp.zeros((H, W)), cam, [-1, -1, -1], [1, 1, 1])
    assert float(out2.max()) == 0.0


def test_coordinate_grid():
    from diligentfx_tpu.components.renderers import render_coordinate_grid
    cam = make_camera()
    color = jnp.zeros((H, W, 3))
    depth = jnp.ones((H, W))
    out = np.asarray(render_coordinate_grid(color, depth, cam))
    assert np.isfinite(out).all()
    # grid appears only below the horizon (plane y=0 seen from y=2)
    assert out[-16:].sum() > out[:16].sum()
    assert out.max() > 0.1


def test_vector_field_overlay():
    from diligentfx_tpu.components.renderers import (VectorFieldAttribs,
                                                     render_vector_field)
    color = jnp.zeros((H, W, 3))
    field = jnp.full((H, W, 2), 0.02)
    out = np.asarray(render_vector_field(color, field,
                                         VectorFieldAttribs(grid_size=8)))
    assert out.max() > 0.5
    assert (out.sum(-1) > 0).sum() > 8 * 8  # lines cover more than the dots


def test_depth_range():
    from diligentfx_tpu.components.depth_range import compute_depth_range
    cam = make_camera()
    depth = jnp.full((H, W), 1.0).at[10:20, 10:20].set(0.3).at[30:40, 30:40].set(0.8)
    r = compute_depth_range(depth, cam)
    assert float(r.scene_near_depth) == pytest.approx(0.3)
    assert float(r.scene_far_depth) == pytest.approx(0.8)
    assert float(r.scene_near_z) < float(r.scene_far_z)
    # empty scene
    r2 = compute_depth_range(jnp.ones((H, W)), cam)
    assert np.isfinite(float(r2.scene_far_z))


def test_selection_jump_flood_outline():
    from diligentfx_tpu.components.selection import (closest_selected_location,
                                                     desaturate_unselected,
                                                     selection_outline)
    sel = jnp.zeros((H, W), bool).at[30:34, 60:64].set(True)
    loc = closest_selected_location(sel)
    # at a selected pixel the closest location is itself
    np.testing.assert_allclose(np.asarray(loc[31, 61]), [61, 31], atol=0.1)
    # nearby pixel points into the selected block
    lx, ly = np.asarray(loc[31, 70])
    assert 59 <= lx <= 64 and 29 <= ly <= 34
    color = jnp.full((H, W, 3), 0.2)
    out = np.asarray(selection_outline(color, sel, outline_width=2.0))
    ring = out[30, 58]   # 2px left of block edge
    assert ring[0] > 0.5                      # outline color applied
    assert (out[31, 61] == 0.2).all()         # interior untouched
    des = np.asarray(desaturate_unselected(jnp.asarray(
        np.tile(np.array([0.8, 0.1, 0.1], np.float32), (H, W, 1))), sel))
    assert abs(des[0, 0, 0] - des[0, 0, 1]) < abs(0.8 - 0.1)  # desaturated
    assert des[31, 61, 0] == pytest.approx(0.8, abs=1e-5)     # selected kept
