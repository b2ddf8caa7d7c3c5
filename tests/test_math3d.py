import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3


def test_translation_row_vector():
    t = m3.translation([1.0, 2.0, 3.0])
    p = m3.transform_points(jnp.array([0.0, 0.0, 0.0]), t)
    np.testing.assert_allclose(np.asarray(p), [1, 2, 3, 1], atol=1e-6)


def test_compose_order_scale_rotate_translate():
    # TRS: scale applied first, translation last.
    m = m3.compose_trs([10.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0], [2.0, 2.0, 2.0])
    p = m3.transform_points(jnp.array([1.0, 0.0, 0.0]), m)
    np.testing.assert_allclose(np.asarray(p[:3]), [12, 0, 0], atol=1e-6)


def test_quat_identity_and_z90():
    ident = m3.quat_to_matrix([0, 0, 0, 1])
    np.testing.assert_allclose(np.asarray(ident), np.eye(4), atol=1e-6)
    # 90° about +Z: x axis → y axis
    s = np.sin(np.pi / 4)
    q = [0, 0, s, np.cos(np.pi / 4)]
    m = m3.quat_to_matrix(q)
    p = m3.transform_points(jnp.array([1.0, 0.0, 0.0]), m)
    np.testing.assert_allclose(np.asarray(p[:3]), [0, 1, 0], atol=1e-6)


def test_look_at_basic():
    # Camera at +5z looking at origin: a point at origin lands at view z = -5.
    v = m3.look_at([0.0, 0.0, 5.0], [0.0, 0.0, 0.0])
    p = m3.transform_points(jnp.array([0.0, 0.0, 0.0]), v)
    np.testing.assert_allclose(np.asarray(p[:3]), [0, 0, -5], atol=1e-5)
    # World +x is to the camera's right, +y up.
    px = m3.transform_points(jnp.array([1.0, 0.0, 0.0]), v)
    np.testing.assert_allclose(np.asarray(px[:3]), [1, 0, -5], atol=1e-5)


def test_perspective_depth_range():
    proj = m3.perspective(np.pi / 2, 1.0, 1.0, 100.0)
    near = m3.project_to_ndc(m3.transform_points(jnp.array([0.0, 0.0, -1.0]), proj))
    far = m3.project_to_ndc(m3.transform_points(jnp.array([0.0, 0.0, -100.0]), proj))
    assert abs(float(near[2]) - 0.0) < 1e-5
    assert abs(float(far[2]) - 1.0) < 1e-5


def test_perspective_reversed_z():
    proj = m3.perspective(np.pi / 2, 1.0, 1.0, 100.0, reversed_z=True)
    near = m3.project_to_ndc(m3.transform_points(jnp.array([0.0, 0.0, -1.0]), proj))
    far = m3.project_to_ndc(m3.transform_points(jnp.array([0.0, 0.0, -100.0]), proj))
    assert abs(float(near[2]) - 1.0) < 1e-5
    assert abs(float(far[2]) - 0.0) < 1e-4


def test_orthographic_depth():
    proj = m3.orthographic(10.0, 10.0, 0.0, 50.0)
    p = m3.project_to_ndc(m3.transform_points(jnp.array([0.0, 0.0, -25.0]), proj))
    assert abs(float(p[2]) - 0.5) < 1e-6


def test_view_proj_roundtrip():
    view = m3.look_at([3.0, 4.0, 5.0], [0.0, 0.0, 0.0])
    proj = m3.perspective(1.0, 16 / 9, 0.1, 100.0)
    vp = view @ proj
    inv = m3.inverse(vp)
    p = jnp.array([0.3, -0.2, 1.5])
    clip = m3.transform_points(p, vp)
    back = m3.transform_points(m3.project_to_ndc(clip) * 0 + 0, inv)  # smoke: invertible
    assert np.isfinite(np.asarray(back)).all()
    # Proper roundtrip through NDC:
    ndc = m3.project_to_ndc(clip)
    ndc4 = jnp.concatenate([ndc, jnp.ones(1)])
    world = ndc4 @ inv
    world = world[:3] / world[3]
    np.testing.assert_allclose(np.asarray(world), np.asarray(p), rtol=1e-3, atol=1e-3)


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        np.asarray(m3.srgb_to_linear(m3.linear_to_srgb(c))), np.asarray(c), atol=1e-5)


def test_normalize_and_reflect():
    v = m3.normalize(jnp.array([[3.0, 0.0, 4.0]]))
    np.testing.assert_allclose(np.asarray(v), [[0.6, 0.0, 0.8]], atol=1e-6)
    r = m3.reflect(jnp.array([[1.0, -1.0, 0.0]]), jnp.array([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(r), [[1.0, 1.0, 0.0]], atol=1e-6)
