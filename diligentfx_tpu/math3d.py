"""3D math for the TPU renderer.

Conventions (mirrors reference Radient/docs/CameraConventions.md and
Radient/interface/RadientMath.h:1-308):
  * Row-vector matrices: a point ``p`` is transformed as ``p @ M``; matrix
    concatenation reads left-to-right (``p @ (A @ B)`` applies A first).
  * Right-handed world space; cameras look down **-Z** (glTF / USD style).
  * Clip space: x,y in [-1, 1], z in [0, 1] (D3D-style depth, as produced by
    DiligentCore device projections).  ``reversed_z=True`` maps near→1, far→0.
  * Angles in radians.

Everything here is pure jnp and works under jit on any backend.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# Basic constructors
# ---------------------------------------------------------------------------


def identity44(dtype=jnp.float32) -> Array:
    return jnp.eye(4, dtype=dtype)


def mul44(a: Array, b: Array) -> Array:
    """4x4 matrix concat at full fp32 precision.

    Geometry transforms must not go through reduced-precision MXU passes
    (default matmul precision may round fp32 inputs to bf16), or depth
    precision and cascade stabilization break.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def translation(t) -> Array:
    """Row-vector translation matrix: p @ T adds ``t``."""
    t = jnp.asarray(t, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[3, :3].set(t)


def scale(s) -> Array:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def rotation_x(angle) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array(
        [[1, 0, 0, 0],
         [0, 1, 0, 0],
         [0, 0, 1, 0],
         [0, 0, 0, 1]], jnp.float32
    ).at[1, 1].set(c).at[1, 2].set(s).at[2, 1].set(-s).at[2, 2].set(c)


def rotation_y(angle) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return (
        jnp.eye(4, dtype=jnp.float32)
        .at[0, 0].set(c).at[0, 2].set(-s)
        .at[2, 0].set(s).at[2, 2].set(c)
    )


def rotation_z(angle) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return (
        jnp.eye(4, dtype=jnp.float32)
        .at[0, 0].set(c).at[0, 1].set(s)
        .at[1, 0].set(-s).at[1, 1].set(c)
    )


def quat_to_matrix(q) -> Array:
    """Unit quaternion (x, y, z, w) → 4x4 row-vector rotation matrix."""
    q = jnp.asarray(q, jnp.float32)
    x, y, z, w = q[0], q[1], q[2], q[3]
    # Row-vector form: rows are the images of the basis vectors.
    m = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w), jnp.zeros_like(x)]),
        jnp.stack([2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w), jnp.zeros_like(x)]),
        jnp.stack([2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y), jnp.zeros_like(x)]),
        jnp.stack([jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x)]),
    ])
    return m


def compose_trs(translation_v, rotation_q, scale_v) -> Array:
    """glTF node TRS → row-vector world matrix (scale, then rotate, then translate)."""
    return scale(scale_v) @ quat_to_matrix(rotation_q) @ translation(translation_v)


# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> Array:
    """View matrix (world → view), row-vector. Camera looks down -Z."""
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    # degenerate up (parallel to fwd, e.g. a light looking straight down):
    # fall back to +Z so shadow/cube-face views stay well-defined
    fallback = jnp.where(jnp.abs(fwd[2]) > 0.9,
                         jnp.array([1.0, 0.0, 0.0], jnp.float32),
                         jnp.array([0.0, 0.0, 1.0], jnp.float32))
    up = jnp.where(jnp.abs(jnp.dot(fwd, up)) > 0.999, fallback, up)
    # Right-handed: right = fwd × up (camera -Z = fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    cup = jnp.cross(right, fwd)
    # World axes expressed in view space; view z axis = -fwd.
    r = jnp.stack([right, cup, -fwd], axis=1)  # 3x3, columns = view basis
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(r)
    m = m.at[3, :3].set(-jnp.array([jnp.dot(eye, right), jnp.dot(eye, cup), jnp.dot(eye, -fwd)]))
    return m


def perspective(fov_y: float, aspect: float, near: float, far: float,
                reversed_z: bool = False) -> Array:
    """Row-vector perspective projection, right-handed view (-Z forward) →
    D3D clip space with z in [0, 1] and w = view distance.

    Mirrors DiligentCore SetNearFarClipPlanes semantics (D3D NDC).
    """
    f = 1.0 / math.tan(fov_y * 0.5)
    if reversed_z:
        a = near / (near - far)
        b = -far * near / (near - far)
    else:
        a = far / (far - near)
        b = -near * far / (far - near)
    # view point (x,y,z,1) with z negative in front; w_clip = -z_view.
    return jnp.array(
        [
            [f / aspect, 0.0, 0.0, 0.0],
            [0.0, f, 0.0, 0.0],
            [0.0, 0.0, -a, -1.0],
            [0.0, 0.0, b, 0.0],
        ],
        jnp.float32,
    )


def orthographic(width: float, height: float, near: float, far: float,
                 reversed_z: bool = False) -> Array:
    """Row-vector orthographic projection (right-handed, -Z forward, z∈[0,1])."""
    if reversed_z:
        a = 1.0 / (near - far)
        b = -far / (near - far)
    else:
        a = -1.0 / (far - near)
        b = -near / (far - near)
    return jnp.array(
        [
            [2.0 / width, 0, 0, 0],
            [0, 2.0 / height, 0, 0],
            [0, 0, a, 0],
            [0, 0, b, 1.0],
        ],
        jnp.float32,
    )


# ---------------------------------------------------------------------------
# Vector helpers (operate on trailing dim 3)
# ---------------------------------------------------------------------------


def normalize(v: Array, eps: float = 1e-20) -> Array:
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def dot(a: Array, b: Array, keepdims: bool = True) -> Array:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v: Array, keepdims: bool = True) -> Array:
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=keepdims), 0.0))


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def reflect(i: Array, n: Array) -> Array:
    """HLSL reflect: i - 2*dot(i,n)*n."""
    return i - 2.0 * dot(i, n) * n


def saturate(x: Array) -> Array:
    return jnp.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    return a + (b - a) * t


def transform_points(points: Array, m: Array) -> Array:
    """(..., 3) points @ 4x4 row-vector matrix → (..., 4) homogeneous."""
    p4 = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return jnp.matmul(p4, m, precision=jax.lax.Precision.HIGHEST)


def transform_directions(dirs: Array, m: Array) -> Array:
    """(..., 3) directions through the upper 3x3 of a row-vector matrix."""
    return jnp.matmul(dirs, m[:3, :3], precision=jax.lax.Precision.HIGHEST)


def project_to_ndc(clip: Array, eps: float = 1e-9) -> Array:
    """Homogeneous clip (..., 4) → NDC (..., 3) by perspective divide."""
    w = clip[..., 3:4]
    safe_w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return clip[..., :3] / safe_w


def inverse(m: Array) -> Array:
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# Color
# ---------------------------------------------------------------------------


def srgb_to_linear(c: Array) -> Array:
    """Exact IEC 61966-2-1 sRGB EOTF (reference uses fast approx in some paths)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: Array) -> Array:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055)


def luminance(rgb: Array) -> Array:
    """Rec.709 luminance (matches reference GetLuminance weights)."""
    w = jnp.array([0.212671, 0.715160, 0.072169], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1, keepdims=True)
