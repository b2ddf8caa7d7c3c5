"""Small rendering components — analogues of Components/:

  * EnvMapRenderer   (interface:54-81): environment/skybox as a full-screen
    ray pass with optional tone map + sRGB.
  * BoundBoxRenderer (interface:47-74 + BoundBox.{vsh,psh}): selected-object
    bounding-box line rendering with pattern support.
  * CoordinateGridRenderer (interface:55-86 + CoordinateGrid.fxh): infinite
    ground plane grid + axes via per-pixel ray/plane intersection.
  * VectorFieldRenderer (interface:45-70 + VectorField.vsh): grid of motion-
    vector lines for debugging.

All are pure image-space jnp passes composited over an existing frame.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.config import ToneMappingMode
from diligentfx_tpu.ops.sampling import sample_env_oct
from diligentfx_tpu.postfx.tonemap import ToneMappingAttribs, tone_map

Array = jax.Array


# ---------------------------------------------------------------------------
# EnvMapRenderer
# ---------------------------------------------------------------------------


def render_env_map(env_oct_mips, camera: CameraAttribs, width: int, height: int,
                   *, mip_level: float = 0.0, scale: float = 1.0,
                   tone_mapping_mode: ToneMappingMode = ToneMappingMode.NONE,
                   convert_to_srgb: bool = False,
                   ave_log_lum: float = 0.3) -> Array:
    """Full-screen environment pass (EnvMapRenderer::Render)."""
    from diligentfx_tpu.pbr.renderer import _camera_rays
    ray = _camera_rays(camera, width, height)
    mips = env_oct_mips if isinstance(env_oct_mips, (list, tuple)) else [env_oct_mips]
    color = sample_env_oct(list(mips), ray,
                           jnp.full(ray.shape[:-1], mip_level)) * scale
    if tone_mapping_mode != ToneMappingMode.NONE:
        color = tone_map(color, tone_mapping_mode, ToneMappingAttribs(),
                         ave_log_lum=ave_log_lum)
    if convert_to_srgb:
        color = m3.linear_to_srgb(color)
    return color


# ---------------------------------------------------------------------------
# BoundBoxRenderer
# ---------------------------------------------------------------------------


class BoundBoxAttribs(NamedTuple):
    """BoundBoxRenderer::RenderAttribs analogue."""
    # plain-Python defaults: this module is lazily imported inside traced
    # frame functions; jnp defaults created mid-trace leak tracers
    color: tuple = (1.0, 0.75, 0.0, 1.0)
    pattern_length: float = 16.0  # dashed pattern in pixels
    pattern_mask: int = 0xFFFFFFFF


def render_bound_box(color_buf: Array, depth_buf: Array, camera: CameraAttribs,
                     box_min, box_max, transform: Optional[Array] = None,
                     attribs: BoundBoxAttribs = BoundBoxAttribs(),
                     thickness: float = 1.0) -> Array:
    """Rasterize the 12 box edges as screen-space segments over the frame
    (depth-tested against the scene depth buffer)."""
    h, w = depth_buf.shape
    mn = jnp.asarray(box_min, jnp.float32)
    mx = jnp.asarray(box_max, jnp.float32)
    corners = jnp.stack([jnp.stack([
        jnp.where(i & 1, mx[0], mn[0]),
        jnp.where(i & 2, mx[1], mn[1]),
        jnp.where(i & 4, mx[2], mn[2])]) for i in range(8)])
    if transform is not None:
        corners = m3.transform_points(corners, transform)[..., :3]
    clip = m3.transform_points(corners, camera.view_proj)
    wc = jnp.maximum(clip[:, 3:4], 1e-6)
    ndc = clip[:, :3] / wc
    sx = (ndc[:, 0] * 0.5 + 0.5) * w
    sy = (0.5 - ndc[:, 1] * 0.5) * h
    sz = ndc[:, 2]
    behind = clip[:, 3] < 1e-5

    edges = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    xg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    yg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    out = color_buf
    for a, b in edges:
        ax, ay, az = sx[a], sy[a], sz[a]
        bx, by, bz = sx[b], sy[b], sz[b]
        dx, dy = bx - ax, by - ay
        len2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
        t = jnp.clip(((xg - ax) * dx + (yg - ay) * dy) / len2, 0.0, 1.0)
        px, py = ax + t * dx, ay + t * dy
        dist2 = (xg - px) ** 2 + (yg - py) ** 2
        on_line = dist2 < thickness * thickness
        z = az + t * (bz - az)
        visible = (z <= depth_buf + 1e-3) & ~(behind[a] | behind[b])
        # dashed pattern by arclength
        arc = t * jnp.sqrt(len2)
        dash = jnp.mod(arc / attribs.pattern_length, 1.0) < 0.75
        mask = (on_line & visible & dash)[..., None]
        out = jnp.where(mask, jnp.asarray(attribs.color[:3]), out)
    return out


# ---------------------------------------------------------------------------
# CoordinateGridRenderer
# ---------------------------------------------------------------------------


class CoordinateGridAttribs(NamedTuple):
    """CoordinateGridRenderer::Attribs analogue."""
    grid_scale: float = 1.0
    grid_subdivision: float = 10.0
    thickness_px: float = 1.0
    color_x_axis: tuple = (1.0, 0.3, 0.3)
    color_z_axis: tuple = (0.3, 0.3, 1.0)
    color_grid: tuple = (0.5, 0.5, 0.5)


def render_coordinate_grid(color_buf: Array, depth_buf: Array,
                           camera: CameraAttribs,
                           attribs: CoordinateGridAttribs = CoordinateGridAttribs()
                           ) -> Array:
    """Infinite XZ grid by per-pixel ray/plane intersection
    (CoordinateGridPS.psh analogue), blended where nearer than scene depth."""
    from diligentfx_tpu.pbr.renderer import _camera_rays
    h, w = depth_buf.shape
    ray = _camera_rays(camera, w, h)
    eye = camera.position
    t = -eye[1] / jnp.where(jnp.abs(ray[..., 1]) < 1e-6, 1e-6, ray[..., 1])
    hit_plane = t > 0
    p = eye + ray * t[..., None]

    # anti-aliased grid lines via distance to nearest line in world units,
    # scaled by footprint (approximate pixel derivative of world pos)
    dist = t
    foot = dist * 2.0 / (h * jnp.abs(camera.proj[1, 1]))
    foot = jnp.maximum(foot, 1e-6)

    def line_mask(coord, period):
        f = jnp.abs(coord / period - jnp.round(coord / period)) * period
        return jnp.clip(1.0 - f / (foot * attribs.thickness_px), 0.0, 1.0)

    cell = attribs.grid_scale
    fine = jnp.maximum(line_mask(p[..., 0], cell), line_mask(p[..., 2], cell)) * 0.4
    coarse = jnp.maximum(line_mask(p[..., 0], cell * attribs.grid_subdivision),
                         line_mask(p[..., 2], cell * attribs.grid_subdivision)) * 0.8
    axis_x = line_mask(p[..., 2], 1e30)   # z == 0 → x axis line
    axis_z = line_mask(p[..., 0], 1e30)

    # depth test: grid point vs scene depth
    clip = m3.transform_points(p, camera.view_proj)
    gz = clip[..., 2] / jnp.maximum(clip[..., 3], 1e-6)
    visible = hit_plane & (gz <= depth_buf)
    # distance fade
    fade = jnp.exp(-dist * 0.02)

    g = jnp.maximum(fine, coarse)
    color = jnp.where(axis_x[..., None] > 0.5, jnp.asarray(attribs.color_x_axis),
                      jnp.where(axis_z[..., None] > 0.5,
                                jnp.asarray(attribs.color_z_axis),
                                jnp.asarray(attribs.color_grid)))
    alpha = (jnp.maximum(g, jnp.maximum(axis_x, axis_z)) * fade
             * visible.astype(jnp.float32))[..., None]
    return color_buf + (color - color_buf) * alpha


# ---------------------------------------------------------------------------
# VectorFieldRenderer
# ---------------------------------------------------------------------------


class VectorFieldAttribs(NamedTuple):
    """VectorFieldRenderer::RenderAttribs analogue."""
    grid_size: int = 32            # static: lines per axis
    scale: float = 20.0
    start_color: tuple = (1.0, 0.0, 0.0)
    end_color: tuple = (1.0, 1.0, 0.0)


def render_vector_field(color_buf: Array, field: Array,
                        attribs: VectorFieldAttribs = VectorFieldAttribs()
                        ) -> Array:
    """Draw a grid of motion-vector line segments over the frame
    (the HnPostProcessTask motion-vector debug overlay, cpp:928-943)."""
    h, w = color_buf.shape[:2]
    # keep the grid sparse at small resolutions (≥ 8 px between anchors)
    n = min(attribs.grid_size, max(h // 8, 1), max(w // 8, 1))
    ys = (jnp.arange(n) + 0.5) / n * h
    xs = (jnp.arange(n) + 0.5) / n * w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    mv = field[gy.astype(jnp.int32), gx.astype(jnp.int32)]     # (n, n, 2)
    ex = gx + mv[..., 0] * w * attribs.scale / 20.0
    ey = gy + mv[..., 1] * h * attribs.scale / 20.0

    xg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    yg = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    out = color_buf
    # rasterize all n*n segments via per-pixel nearest-segment (vectorized
    # over the small grid with a scan to bound memory)
    segs = jnp.stack([gx.ravel(), gy.ravel(), ex.ravel(), ey.ravel()], axis=-1)

    def body(carry, seg):
        out = carry
        ax, ay, bx, by = seg[0], seg[1], seg[2], seg[3]
        dx, dy = bx - ax, by - ay
        len2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
        t = jnp.clip(((xg - ax) * dx + (yg - ay) * dy) / len2, 0.0, 1.0)
        d2 = (xg - (ax + t * dx)) ** 2 + (yg - (ay + t * dy)) ** 2
        mask = (d2 < 1.0)[..., None]
        c0 = jnp.asarray(attribs.start_color)
        c1 = jnp.asarray(attribs.end_color)
        col = c0 + (c1 - c0) * t[..., None]
        return jnp.where(mask, col, out), None

    out, _ = jax.lax.scan(body, out, segs)
    return out
