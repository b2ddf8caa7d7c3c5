"""Cascaded shadow maps — the analogue of Components/ShadowMapManager
(interface/ShadowMapManager.hpp:50-196, src/ShadowMapManager.cpp:134-396) and
the filtering library Shaders/Common/public/Shadows.fxh + PCF.fxh.

Structure:
  * `distribute_cascades` — cascade partitioning (linear↔log blend via
    partitioning_factor), bounding-sphere extent stabilization, texel
    snapping, filter margins, z-extension (ShadowMapManager.cpp:134-396).
    Pure jnp host math producing a `ShadowMapAttribs` pytree.
  * `render_cascade_shadow_maps` — depth-only raster passes into a
    (C, S, S) cascade array (the analogue of per-cascade DSV passes).
  * `filter_shadow_pcf` / VSM / EVSM — the Shadows.fxh filtering modes.
    On TPU the *prefilterable* modes (VSM/EVSM: one bilinear tap after a
    separable blur) are preferred over many-tap PCF; both are provided.

Depth convention: cascade projections produce z in [0, 1], standard (less =
nearer), matching the D3D path of the reference.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import MAX_CASCADES, RasterizerConfig, ShadowMode
from diligentfx_tpu.ops import raster as rz

Array = jax.Array


class ShadowMapAttribs(NamedTuple):
    """Mirrors ShadowMapAttribs/CascadeAttribs (BasicStructures.fxh:29-100):
    everything the filtering shader needs, leading dim C = cascades."""
    world_to_light_view: Array       # (4, 4)
    cascade_cam_z_end: Array         # (C,)
    cascade_start_end_z: Array       # (C, 2)
    light_space_scale: Array         # (C, 3)
    light_space_bias: Array          # (C, 3)
    margin_proj_space: Array         # (C, 4) x,y margins + z ext
    world_to_uv_depth: Array         # (C, 4, 4)
    shadow_map_dim: Array            # (4,) = (S, S, 1/S, 1/S)
    cascade_transition_region: Array  # ()
    receiver_plane_depth_bias_clamp: Array  # ()
    fixed_depth_bias: Array          # ()

    @property
    def num_cascades(self) -> int:
        return self.cascade_cam_z_end.shape[0]


def adjust_cascade_range(depth_range, cam_near, cam_far):
    """AdjustCascadeRange (DistributeCascadeInfo.AdjustCascadeRange,
    Components/src/ShadowMapManager.cpp:134-396): tighten the cascade span
    to the scene's visible depth range (ComputeDepthBounds product,
    components/depth_range.py) so cascade resolution isn't wasted on empty
    depth.  Returns (near, far) to feed distribute_cascades."""
    import jax.numpy as jnp
    near = jnp.maximum(jnp.asarray(cam_near, jnp.float32),
                       depth_range.scene_near_z * 0.99)
    far = jnp.minimum(jnp.asarray(cam_far, jnp.float32),
                      depth_range.scene_far_z * 1.01)
    far = jnp.maximum(far, near * 1.05)
    return near, far


def basis_from_direction(direction) -> Array:
    """Build a world→light-view row-vector matrix looking along `direction`
    (BasisFromDirection + ViewFromBasis in the reference)."""
    d = jnp.asarray(direction, jnp.float32)
    d = d / jnp.linalg.norm(d)
    up = jnp.where(jnp.abs(d[1]) > 0.99,
                   jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    x = jnp.cross(up, d)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(d, x)
    # Rows of the world→view matrix transform (row-vector): columns are basis.
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(x).at[:3, 1].set(y).at[:3, 2].set(d)
    return m


def _frustum_min_bounding_sphere(proj_00: float, proj_11: float,
                                 near: Array, far: Array):
    """Minimum bounding sphere of a camera sub-frustum
    (GetFrustumMinimumBoundingSphere).  Returns (center_view (3,), radius)."""
    # half extents of the far plane in view space
    k2 = (1.0 / proj_00) ** 2 + (1.0 / proj_11) ** 2
    # Optimal sphere center along the view axis
    center_z = jnp.minimum(far, 0.5 * (near + far) * (1.0 + k2))
    r_far = jnp.sqrt(far * far * k2 + (far - center_z) ** 2)
    r_near = jnp.sqrt(near * near * k2 + (center_z - near) ** 2)
    radius = jnp.maximum(r_far, r_near)
    # camera looks down -Z
    return jnp.stack([0.0 * center_z, 0.0 * center_z, -center_z]), radius


@functools.partial(jax.jit, static_argnames=(
    "num_cascades", "shadow_map_size", "stabilize_extents", "snap_cascades",
    "equalize_extents", "filter_size"))
def distribute_cascades(camera_view: Array, camera_world: Array,
                        proj_00, proj_11, cam_near, cam_far,
                        light_dir, *, num_cascades: int = 4,
                        shadow_map_size: int = 1024,
                        partitioning_factor: float = 0.95,
                        stabilize_extents: bool = True,
                        snap_cascades: bool = True,
                        equalize_extents: bool = True,
                        filter_size: int = 3,
                        transition_region: float = 0.1,
                        receiver_plane_bias_clamp: float = 10.0,
                        fixed_depth_bias: float = 1e-4,
                        z_caster_extension: float = 50.0,
                        ) -> ShadowMapAttribs:
    """ShadowMapManager::DistributeCascades (cpp:134-396)."""
    assert num_cascades <= MAX_CASCADES
    world_to_light = basis_from_direction(light_dir)
    sm = float(shadow_map_size)

    z_ends = []
    z_prev = jnp.asarray(cam_near, jnp.float32)
    starts, ends = [], []
    scales, biases = [], []
    margins = []
    mats_uv = []

    ratio = cam_far / cam_near
    rng = cam_far - cam_near

    fixed_margin = 0.5 if snap_cascades else 0.0
    filter_margin = filter_size / 2.0
    margin_px = fixed_margin + filter_margin
    extension_px = 2.0 * margin_px

    for i in range(num_cascades):
        near_i = z_prev
        if i < num_cascades - 1:
            power = (i + 1) / num_cascades
            log_z = cam_near * jnp.power(ratio, power)
            uni_z = cam_near + rng * power
            far_i = partitioning_factor * (log_z - uni_z) + uni_z
        else:
            far_i = jnp.asarray(cam_far, jnp.float32)
        z_prev = far_i
        z_ends.append(far_i)
        starts.append(near_i)
        ends.append(far_i)

        if stabilize_extents:
            center_view, radius = _frustum_min_bounding_sphere(
                proj_00, proj_11, near_i, far_i)
            center_ls = m3.transform_points(
                m3.transform_points(center_view, camera_world)[:3], world_to_light)[:3]
            mn = center_ls - radius
            mx = center_ls + radius
        else:
            # light-space AABB of the 8 sub-frustum corners
            sub_proj = jnp.array([[proj_00, 0, 0, 0],
                                  [0, proj_11, 0, 0],
                                  [0, 0, -far_i / (far_i - near_i), -1.0],
                                  [0, 0, -near_i * far_i / (far_i - near_i), 0]],
                                 jnp.float32)
            inv = jnp.linalg.inv(m3.mul44(camera_view, sub_proj))
            corners = jnp.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                                 for z in (0, 1)], jnp.float32)
            world_h = m3.transform_points(corners, inv)
            world = world_h[..., :3] / world_h[..., 3:4]
            ls = m3.transform_points(world, world_to_light)[..., :3]
            mn = jnp.min(ls, axis=0)
            mx = jnp.max(ls, axis=0)

        extent = mx - mn
        center = (mx + mn) * 0.5
        if equalize_extents:
            e = jnp.maximum(extent[0], extent[1])
            extent = extent.at[0].set(e).at[1].set(e)

        # remap N x N → (N - ext) x (N - ext)
        extent = extent.at[0].mul(sm / (sm - extension_px))
        extent = extent.at[1].mul(sm / (sm - extension_px))

        if snap_cascades:
            texel = extent[:2] / sm
            center = center.at[:2].set(jnp.round(center[:2] / texel) * texel)

        # z range: pull the near plane toward the light so off-frustum casters
        # still cast into the view (the reference relies on depth clamp).
        z_min = mn[2] - z_caster_extension
        z_max = mx[2]
        z_ext_frac = jnp.minimum(margin_px / sm * receiver_plane_bias_clamp, 0.25)
        z_extent = (z_max - z_min) / (1.0 - 2.0 * z_ext_frac)

        mn2 = jnp.concatenate([center[:2] - extent[:2] * 0.5, z_min[None]])
        scale = jnp.stack([2.0 / extent[0], 2.0 / extent[1], 1.0 / z_extent])
        bias = jnp.stack([
            -mn2[0] * scale[0] - 1.0,
            -mn2[1] * scale[1] - 1.0,
            -mn2[2] * scale[2],
        ])
        scales.append(scale)
        biases.append(bias)
        margins.append(jnp.stack([
            margin_px * 2.0 / sm, margin_px * 2.0 / sm, z_ext_frac, z_ext_frac]))

        # world → light proj [-1,1]²×[0,1] → UV-depth
        proj = jnp.diag(jnp.concatenate([scale, jnp.ones(1)]))
        proj = proj.at[3, :3].set(bias)
        wl_proj = m3.mul44(world_to_light, proj)
        uv_m = jnp.array([[0.5, 0, 0, 0], [0, -0.5, 0, 0],
                          [0, 0, 1, 0], [0.5, 0.5, 0, 1]], jnp.float32)
        mats_uv.append(m3.mul44(wl_proj, uv_m))

    return ShadowMapAttribs(
        world_to_light_view=world_to_light,
        cascade_cam_z_end=jnp.stack(z_ends),
        cascade_start_end_z=jnp.stack([jnp.stack([s, e]) for s, e in zip(starts, ends)]),
        light_space_scale=jnp.stack(scales),
        light_space_bias=jnp.stack(biases),
        margin_proj_space=jnp.stack(margins),
        world_to_uv_depth=jnp.stack(mats_uv),
        shadow_map_dim=jnp.array([sm, sm, 1.0 / sm, 1.0 / sm], jnp.float32),
        cascade_transition_region=jnp.asarray(transition_region, jnp.float32),
        receiver_plane_depth_bias_clamp=jnp.asarray(receiver_plane_bias_clamp, jnp.float32),
        fixed_depth_bias=jnp.asarray(fixed_depth_bias, jnp.float32),
    )


def render_cascade_shadow_maps(world_positions: Array, indices: Array,
                               attribs: ShadowMapAttribs, *,
                               shadow_map_size: int,
                               cfg: RasterizerConfig = RasterizerConfig(),
                               backend: str = "auto") -> Array:
    """Depth-only raster pass per cascade → (C, S, S) depth array
    (the analogue of HnRenderShadowsTask / RenderPassType::Shadow draws).
    Background (no caster) = 1.0 (far)."""
    maps = []
    c = attribs.num_cascades
    for i in range(c):
        # world → cascade clip: xy in [-1,1], z in [0,1], w = 1 (ortho)
        lv = m3.transform_points(world_positions, attribs.world_to_light_view)[..., :3]
        p = lv * attribs.light_space_scale[i] + attribs.light_space_bias[i]
        clip = jnp.concatenate([p[..., :2], p[..., 2:3], jnp.ones_like(p[..., :1])], -1)
        # Shadow pass rasterizes both faces (the reference uses depth clamp +
        # no culling for casters).
        vb, _ = rz.rasterize(
            clip, indices, width=shadow_map_size, height=shadow_map_size,
            cfg=cfg, double_sided=jnp.ones((indices.shape[0],), bool),
            backend=backend)
        maps.append(jnp.where(vb.tri_id >= 0, jnp.clip(vb.depth, 0.0, 1.0), 1.0))
    return jnp.stack(maps)


# ---------------------------------------------------------------------------
# Sampling / filtering (Shadows.fxh)
# ---------------------------------------------------------------------------


class CascadeSamplingInfo(NamedTuple):
    """Shadows.fxh CascadeSamplingInfo — per-pixel leaves."""
    uv: Array              # (..., 2)
    depth: Array           # (..., 1)
    cascade_idx: Array     # (...,) int32
    min_dist_to_margin: Array  # (..., 1)
    in_any: Array          # (...,) bool


def find_cascade(attribs: ShadowMapAttribs, pos_light_view: Array,
                 cam_view_z: Array) -> CascadeSamplingInfo:
    """Cascade selection by camera-space z (Shadows.fxh FindCascade, the
    vectorized non-search variant at :94-110), then scale/bias lookup."""
    c = attribs.num_cascades
    z = cam_view_z[..., None]                                  # (..., 1)
    idx = jnp.sum((attribs.cascade_cam_z_end < z).astype(jnp.int32), axis=-1)
    in_any = idx < c
    ci = jnp.minimum(idx, c - 1)
    scale = attribs.light_space_scale[ci]                      # (..., 3)
    bias = attribs.light_space_bias[ci]
    p = pos_light_view * scale + bias                          # NDC-ish
    margin = attribs.margin_proj_space[ci]
    dist = jnp.minimum(
        jnp.minimum(1.0 - margin[..., 0:1] - jnp.abs(p[..., 0:1]),
                    1.0 - margin[..., 1:2] - jnp.abs(p[..., 1:2])),
        jnp.minimum(p[..., 2:3] - margin[..., 2:3],
                    1.0 - margin[..., 3:4] - p[..., 2:3]))
    uv = jnp.stack([p[..., 0] * 0.5 + 0.5, 0.5 - p[..., 1] * 0.5], axis=-1)
    return CascadeSamplingInfo(uv=uv, depth=p[..., 2:3], cascade_idx=ci,
                               min_dist_to_margin=dist, in_any=in_any)


def _gather_cascade(shadow_maps: Array, cascade_idx: Array, y: Array, x: Array) -> Array:
    """shadow_maps (C, S, S); per-pixel (cascade, y, x) gather via flat index."""
    c, s, _ = shadow_maps.shape
    flat = shadow_maps.reshape(-1)
    yc = jnp.clip(y, 0, s - 1)
    xc = jnp.clip(x, 0, s - 1)
    return flat[cascade_idx * (s * s) + yc * s + xc]


def filter_shadow_pcf(shadow_maps: Array, info: CascadeSamplingInfo,
                      kernel_size: int = 3, depth_bias: float = 1e-3,
                      receiver_plane_bias: Optional[Array] = None,
                      bias_clamp=10.0) -> Array:
    """Fixed-size PCF (PCF.fxh:7-155 fixed 2/3/5/7 kernels): bilinear-weighted
    comparison taps.  Returns (...,) light fraction in [0, 1].

    receiver_plane_bias: optional (..., 2) d(shadow z)/d(shadow uv) — the
    receiver-plane depth bias (Shadows.fxh:148 ComputeReceiverPlaneDepthBias):
    each tap's reference depth follows the receiver's plane instead of using
    one fixed bias, removing slope acne without Peter-Panning; the adjustment
    is clamped by bias_clamp texels of slope (ShadowMapAttribs
    .receiver_plane_depth_bias_clamp)."""
    s = shadow_maps.shape[-1]
    fx = info.uv[..., 0] * s - 0.5
    fy = info.uv[..., 1] * s - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    ref = info.depth[..., 0] - depth_bias
    bu = bv = None
    if receiver_plane_bias is not None:
        bu = receiver_plane_bias[..., 0]
        bv = receiver_plane_bias[..., 1]
        # fractional-sampling error term: the bilinear footprint spans one
        # texel, so shift ref by the worst-case in-footprint depth slope
        err = (jnp.abs(bu) + jnp.abs(bv)) / s
        ref = ref - jnp.minimum(err, bias_clamp / s)

    # Tap weight = overlap of texel [d, d+1) with the K-wide filter footprint
    # centered at the (fractional) sample position — the same bilinear-tap
    # structure as the optimized fixed kernels in PCF.fxh:7-155.
    half = kernel_size / 2.0
    r = kernel_size // 2 + 1
    total = jnp.zeros_like(fx)
    wsum = jnp.zeros_like(fx)
    for dy in range(-r, r + 1):
        wy = jnp.clip(jnp.minimum(dy + 1.0, ty + half)
                      - jnp.maximum(jnp.float32(dy), ty - half), 0.0, 1.0)
        for dx in range(-r, r + 1):
            wx = jnp.clip(jnp.minimum(dx + 1.0, tx + half)
                          - jnp.maximum(jnp.float32(dx), tx - half), 0.0, 1.0)
            d = _gather_cascade(shadow_maps, info.cascade_idx, y0 + dy, x0 + dx)
            ref_t = ref
            if bu is not None:
                adj = (bu * dx + bv * dy) / s
                ref_t = ref + jnp.clip(adj, -bias_clamp / s, bias_clamp / s)
            lit = (ref_t <= d).astype(jnp.float32)
            w = wx * wy
            total = total + lit * w
            wsum = wsum + w
    return total / jnp.maximum(wsum, 1e-6)


# --- filterable (VSM / EVSM) modes ----------------------------------------


def convert_to_filterable(shadow_maps: Array, mode: ShadowMode,
                          positive_exp: float = 40.0,
                          negative_exp: float = 8.0,
                          emulate_16bit: bool = False) -> Array:
    """Depth (C,S,S) → moment maps (ShadowConversions.fx):
    VSM: (z, z²); EVSM2: (e^{pz}, e^{2pz}); EVSM4: + negative warp.

    emulate_16bit quantizes VSM moments to RG16_UNORM steps — the reference
    stores VSM in a 16-bit UNORM target (ShadowMapManager.cpp Is32BitFilterable
    path), and light-bleeding behavior depends on that quantization; enable it
    when matching the reference's VSM output (SURVEY.md §7 hard part f)."""
    z = shadow_maps
    if mode == ShadowMode.VSM:
        m = jnp.stack([z, z * z], axis=-1)
        if emulate_16bit:
            m = jnp.round(jnp.clip(m, 0.0, 1.0) * 65535.0) / 65535.0
        return m
    ep = jnp.exp(positive_exp * z)
    if mode == ShadowMode.EVSM2:
        return jnp.stack([ep, ep * ep], axis=-1)
    en = -jnp.exp(-negative_exp * z)
    return jnp.stack([ep, ep * ep, en, en * en], axis=-1)


def gaussian_blur_separable(maps: Array, radius: int = 2, sigma: float = 1.5) -> Array:
    """Separable Gaussian over the last two spatial dims of (C, S, S, M)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    out = maps
    # blur along S dims (1 and 2)
    for axis in (1, 2):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (radius, radius)
        p = jnp.pad(out, pad, mode="edge")
        acc = jnp.zeros_like(out)
        for j, w in enumerate(k):
            sl = [slice(None)] * out.ndim
            sl[axis] = slice(j, j + out.shape[axis])
            acc = acc + p[tuple(sl)] * w
        out = acc
    return out


def _chebyshev_upper_bound(mean: Array, mean_sq: Array, ref: Array,
                           min_variance: Array) -> Array:
    """Chebyshev inequality bound (Shadows.fxh ChebyshevUpperBound :265-278)."""
    variance = jnp.maximum(mean_sq - mean * mean, min_variance)
    d = ref - mean
    p_max = variance / (variance + d * d)
    # light-bleeding reduction
    p_max = jnp.clip((p_max - 0.2) / 0.8, 0.0, 1.0)
    return jnp.where(ref <= mean, 1.0, p_max)


def _bilinear_cascade(moments: Array, cascade_idx: Array, uv: Array) -> Array:
    """moments (C, S, S, M) bilinear at per-pixel cascade → (..., M)."""
    s = moments.shape[1]
    m = moments.shape[-1]
    fx = uv[..., 0] * s - 0.5
    fy = uv[..., 1] * s - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    flat = moments.reshape(-1, m)

    def tap(yy, xx):
        yc = jnp.clip(yy, 0, s - 1)
        xc = jnp.clip(xx, 0, s - 1)
        return flat[cascade_idx * (s * s) + yc * s + xc]

    c00 = tap(y0, x0)
    c10 = tap(y0, x0 + 1)
    c01 = tap(y0 + 1, x0)
    c11 = tap(y0 + 1, x0 + 1)
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def filter_shadow_vsm(moments: Array, info: CascadeSamplingInfo,
                      mode: ShadowMode, positive_exp: float = 40.0,
                      negative_exp: float = 8.0,
                      min_variance: float = 1e-5) -> Array:
    """Shadows.fxh SampleFilterableShadowMap (:332-388)."""
    mom = _bilinear_cascade(moments, info.cascade_idx, info.uv)
    ref = info.depth[..., 0]
    if mode == ShadowMode.VSM:
        return _chebyshev_upper_bound(mom[..., 0], mom[..., 1], ref,
                                      jnp.float32(min_variance))
    ref_p = jnp.exp(positive_exp * ref)
    p = _chebyshev_upper_bound(mom[..., 0], mom[..., 1], ref_p,
                               jnp.float32(min_variance) * positive_exp ** 2)
    if mode == ShadowMode.EVSM2:
        return p
    ref_n = -jnp.exp(-negative_exp * ref)
    n = _chebyshev_upper_bound(mom[..., 2], mom[..., 3], ref_n,
                               jnp.float32(min_variance) * negative_exp ** 2)
    return jnp.minimum(p, n)


def sample_cascaded_shadows(world_pos: Array, cam_view_z: Array,
                            attribs: ShadowMapAttribs,
                            shadow_maps: Array,
                            mode: ShadowMode = ShadowMode.PCF,
                            pcf_kernel_size: int = 3,
                            moments: Optional[Array] = None,
                            blend_cascades: bool = True) -> Array:
    """Full cascade shadow factor per pixel: select cascade, filter, blend
    with the next cascade near the transition edge
    (Shadows.fxh FilterShadowMap + GetNextCascadeBlendAmount)."""
    plv = m3.transform_points(world_pos, attribs.world_to_light_view)[..., :3]
    info = find_cascade(attribs, plv, cam_view_z)

    # receiver-plane depth bias (Shadows.fxh:148): d(shadow z)/d(shadow uv)
    # from screen-space derivatives of the shadow-space position (roll
    # differences replace the GPU's quad ddx/ddy); only for image-shaped
    # inputs (H, W, ...)
    rp_bias = None
    if mode == ShadowMode.PCF and world_pos.ndim == 3:
        def _plane_bias(info_):
            uvz = jnp.concatenate([info_.uv, info_.depth], axis=-1)

            def _clamped_diff(a, axis):
                # forward differences, duplicating the last difference at the
                # image border — jnp.roll would wrap to the opposite edge and
                # produce bogus plane slopes on the 1-px frame border
                # (ADVICE r2)
                d = jnp.diff(a, axis=axis)
                pad = [(0, 0)] * a.ndim
                pad[axis] = (0, 1)
                return jnp.pad(d, pad, mode="edge")

            ddx = _clamped_diff(uvz, 1)
            ddy = _clamped_diff(uvz, 0)
            det = ddx[..., 0] * ddy[..., 1] - ddx[..., 1] * ddy[..., 0]
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            b_u = (ddy[..., 1] * ddx[..., 2] - ddx[..., 1] * ddy[..., 2]) * inv
            b_v = (ddx[..., 0] * ddy[..., 2] - ddy[..., 0] * ddx[..., 2]) * inv
            return jnp.stack([b_u, b_v], axis=-1)
        rp_bias = _plane_bias(info)

    def one(info_):
        if mode == ShadowMode.PCF:
            return filter_shadow_pcf(
                shadow_maps, info_, pcf_kernel_size,
                depth_bias=attribs.fixed_depth_bias,
                receiver_plane_bias=rp_bias,
                bias_clamp=attribs.receiver_plane_depth_bias_clamp)
        return filter_shadow_vsm(moments, info_, mode)

    lit = one(info)

    if blend_cascades:
        c = attribs.num_cascades
        next_idx = jnp.minimum(info.cascade_idx + 1, c - 1)
        scale = attribs.light_space_scale[next_idx]
        bias = attribs.light_space_bias[next_idx]
        p = plv * scale + bias
        margin = attribs.margin_proj_space[next_idx]
        dist_n = jnp.minimum(
            jnp.minimum(1.0 - margin[..., 0:1] - jnp.abs(p[..., 0:1]),
                        1.0 - margin[..., 1:2] - jnp.abs(p[..., 1:2])),
            jnp.minimum(p[..., 2:3] - margin[..., 2:3],
                        1.0 - margin[..., 3:4] - p[..., 2:3]))
        uv_n = jnp.stack([p[..., 0] * 0.5 + 0.5, 0.5 - p[..., 1] * 0.5], axis=-1)
        info_n = CascadeSamplingInfo(uv=uv_n, depth=p[..., 2:3],
                                     cascade_idx=next_idx,
                                     min_dist_to_margin=dist_n,
                                     in_any=info.in_any)
        start_end = attribs.cascade_start_end_z[info.cascade_idx]
        dist_edge = (start_end[..., 1] - cam_view_z) / jnp.maximum(
            start_end[..., 1] - start_end[..., 0], 1e-6)
        blend = (jnp.clip(1.0 - dist_edge / attribs.cascade_transition_region, 0.0, 1.0)
                 * jnp.clip(dist_n[..., 0] / 0.01, 0.0, 1.0)
                 * (info.cascade_idx < c - 1))
        lit_n = one(info_n)
        lit = lit + (lit_n - lit) * blend

    # outside all cascades → fully lit
    return jnp.where(info.in_any, lit, 1.0)


# ---------------------------------------------------------------------------
# Per-light (spot / point) shadow maps — the analogue of the HnLight shadow
# atlas slices (HnLight.cpp shadow view/proj per light) managed by
# HnShadowMapManager (include/HnShadowMapManager.hpp:47-66).  Spot lights use
# one perspective slice; point lights use six 90-degree cube-face slices
# selected per pixel by the dominant axis of the light→surface vector.
# ---------------------------------------------------------------------------


def spot_view_proj(position, direction, outer_angle, near: float = 0.05,
                   far: float = 100.0) -> Array:
    """World → spot-light clip (fov = 2 * outer cone angle, square aspect)."""
    position = jnp.asarray(position, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    view = m3.look_at(position, position + direction)
    proj = m3.perspective(2.0 * float(outer_angle), 1.0, near, far)
    return m3.mul44(view, proj)


_CUBE_FACE_DIRS = (
    (1.0, 0.0, 0.0), (-1.0, 0.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, -1.0, 0.0),
    (0.0, 0.0, 1.0), (0.0, 0.0, -1.0),
)


def point_view_projs(position, near: float = 0.05, far: float = 100.0) -> Array:
    """World → clip for the 6 cube faces of a point light → (6, 4, 4).
    Face order +X -X +Y -Y +Z -Z (matching `point_shadow_face`)."""
    import math
    position = jnp.asarray(position, jnp.float32)
    proj = m3.perspective(math.pi / 2.0, 1.0, near, far)
    vps = []
    for d in _CUBE_FACE_DIRS:
        dv = jnp.asarray(d, jnp.float32)
        vps.append(m3.mul44(m3.look_at(position, position + dv), proj))
    return jnp.stack(vps)


def point_shadow_face(v: Array) -> Array:
    """Cube-face index (0..5) from the light→surface vector by dominant axis."""
    av = jnp.abs(v)
    axis = jnp.argmax(av, axis=-1)                       # 0=x, 1=y, 2=z
    comp = jnp.take_along_axis(v, axis[..., None], axis=-1)[..., 0]
    return (axis * 2 + (comp < 0).astype(jnp.int32)).astype(jnp.int32)


def render_light_shadow_maps(world_positions: Array, indices: Array,
                             view_projs: Array, *, shadow_map_size: int,
                             cfg: RasterizerConfig = RasterizerConfig(),
                             backend: str = "auto") -> Array:
    """Depth-only raster per slice: view_projs (K, 4, 4) → (K, S, S) depth
    in [0, 1], background (no caster) = 1.  One slice per spot light, six
    consecutive slices per point light (HnRenderShadowsTask analogue)."""
    maps = []
    for i in range(view_projs.shape[0]):
        clip = m3.transform_points(world_positions, view_projs[i])
        vb, _ = rz.rasterize(
            clip, indices, width=shadow_map_size, height=shadow_map_size,
            cfg=cfg, double_sided=jnp.ones((indices.shape[0],), bool),
            backend=backend)
        maps.append(jnp.where(vb.tri_id >= 0, jnp.clip(vb.depth, 0.0, 1.0), 1.0))
    return jnp.stack(maps)


def sample_light_shadow(world_pos: Array, view_projs: Array, maps: Array,
                        face_idx: Optional[Array] = None,
                        pcf_kernel_size: int = 3,
                        depth_bias: float = 2e-3) -> Array:
    """Shadow factor from per-light slices.

    world_pos (..., 3); view_projs (F, 4, 4) — the light's own slices (F=1
    spot, F=6 point); maps (F, S, S); face_idx (...,) int32 per-pixel slice
    (None = slice 0).  Points outside the slice frustum are lit.  Reuses the
    PCF bilinear-tap filter (PCF.fxh analogue) with the slice as "cascade"."""
    f = view_projs.shape[0]
    # project by every slice (tiny einsum), select per pixel — avoids a
    # per-pixel (4,4) matrix gather
    ph = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    clip_all = jnp.einsum("...i,fij->f...j", ph, view_projs,
                          precision=jax.lax.Precision.HIGHEST)  # (F,...,4)
    if face_idx is None:
        clip = clip_all[0]
        fi = jnp.zeros(world_pos.shape[:-1], jnp.int32)
    else:
        fi = face_idx
        onehot = jax.nn.one_hot(face_idx, f, axis=0, dtype=world_pos.dtype)
        clip = jnp.sum(clip_all * onehot[..., None], axis=0)
    w = clip[..., 3]
    valid = w > 1e-6
    wi = 1.0 / jnp.maximum(w, 1e-6)
    u = clip[..., 0] * wi * 0.5 + 0.5
    v = 0.5 - clip[..., 1] * wi * 0.5
    z = clip[..., 2] * wi
    inside = (valid & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
              & (z >= 0) & (z <= 1))
    info = CascadeSamplingInfo(
        uv=jnp.stack([u, v], axis=-1), depth=z[..., None], cascade_idx=fi,
        min_dist_to_margin=jnp.zeros_like(z[..., None]),
        in_any=inside)
    lit = filter_shadow_pcf(maps, info, kernel_size=pcf_kernel_size,
                            depth_bias=depth_bias)
    return jnp.where(inside, lit, 1.0)
