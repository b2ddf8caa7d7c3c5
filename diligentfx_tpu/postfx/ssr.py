"""Screen-space reflections — the analogue of
PostProcess/ScreenSpaceReflection (FidelityFX-SSSR-style stochastic SSR;
passes at interface:145-154: depth hierarchy, ray march, spatial
reconstruction, temporal accumulation, bilateral cleanup).

Ray marching: screen-space march in uv/depth space over a min-depth pyramid —
a fixed-budget coarse march with per-pixel early-exit masking plus a binary
refinement, rather than the reference's per-ray variable-length hi-Z DDA
(data-dependent loop lengths are hostile to SPMD; the fixed budget matches
`MaxTraversalIntersections` = 64 default, SSR README:70).

Stochastic roughness: ray directions jitter by GGX-VNDF sampling driven by the
analytic R2 noise (context.py), matching the blue-noise VNDF sampling of the
reference; rough-surface results are averaged by the spatial reconstruction
pass and stabilized temporally.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.math3d import normalize, reflect, saturate
from diligentfx_tpu.ops.sampling import bilinear_sample
from diligentfx_tpu.pbr.brdf import smith_ggx_sample_visible_normal
from diligentfx_tpu.postfx.context import r2_noise_pair
from diligentfx_tpu.postfx.ssao import view_space_position

Array = jax.Array


class SSRSettings(NamedTuple):
    """ScreenSpaceReflectionAttribs analogue."""
    max_traversal_intersections: int = 48      # static: march budget
    depth_buffer_thickness: Array = jnp.float32(0.15)  # world units
    roughness_threshold: Array = jnp.float32(0.4)      # fade out above
    ggx_importance_sample_bias: Array = jnp.float32(0.3)
    temporal_stability_factor: Array = jnp.float32(0.9)
    spatial_reconstruction_radius: Array = jnp.float32(3.0)


class SSRState(NamedTuple):
    radiance: Array   # (h, w, 4) rgb + confidence history, at PROCESSING res


def ssr_state_shape(height: int, width: int,
                    resolution_divisor: int = 0,
                    half_resolution: bool = False) -> Tuple[int, int]:
    """Shape of the temporal history (temporal accumulation runs at the
    march resolution, not full res — 16x fewer history gathers at d=4)."""
    d = resolution_divisor or (2 if half_resolution else 1)
    return (-(-height // d), -(-width // d))


def build_min_depth_pyramid(depth: Array, levels: int = 5):
    """Hierarchical min-depth chain (the ComputeHierarchicalDepthBuffer pass)."""
    mips = [depth]
    cur = depth
    for _ in range(levels - 1):
        h, w = cur.shape
        if h < 2 or w < 2:
            break
        h2, w2 = h // 2 * 2, w // 2 * 2
        c = cur[:h2, :w2]
        cur = jnp.minimum(
            jnp.minimum(c[0::2, 0::2], c[1::2, 0::2]),
            jnp.minimum(c[0::2, 1::2], c[1::2, 1::2]))
        mips.append(cur)
    return mips


def _march(depth_mips, origin_uvz: Array, dir_uvz: Array, steps: int,
           thickness_ndc: Array, coarse_mip: int = 2) -> Tuple[Array, Array]:
    """Fixed-budget coarse march (at `coarse_mip`) + binary refinement.
    origin/dir in (u, v, ndc_z) space.  Returns (hit_uvz, hit_mask)."""
    coarse = depth_mips[min(coarse_mip, len(depth_mips) - 1)]
    fine = depth_mips[0]

    t = jnp.zeros(origin_uvz.shape[:-1], jnp.float32)
    dt = 1.0 / steps
    hit_t = jnp.ones_like(t)
    hit = jnp.zeros(t.shape, bool)

    def step_fn(i, carry):
        t, hit_t, hit = carry
        tc = t + dt
        p = origin_uvz + dir_uvz * tc[..., None]
        # nearest tap during the coarse march (min-depth mip is conservative);
        # the binary refinement below uses bilinear on the fine buffer
        from diligentfx_tpu.ops.sampling import point_sample
        d = point_sample(coarse[..., None], p[..., :2])[..., 0]
        below = (p[..., 2] > d) & (p[..., 2] < d + thickness_ndc)
        inside = ((p[..., 0] > 0) & (p[..., 0] < 1)
                  & (p[..., 1] > 0) & (p[..., 1] < 1))
        new_hit = below & inside & ~hit
        hit_t = jnp.where(new_hit, tc, hit_t)
        hit = hit | new_hit
        t = jnp.where(hit, t, tc)
        return t, hit_t, hit

    t, hit_t, hit = jax.lax.fori_loop(0, steps, step_fn, (t, hit_t, hit))

    # binary refinement on the fine buffer
    lo = jnp.maximum(hit_t - dt, 0.0)
    hi = hit_t

    def refine(i, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        p = origin_uvz + dir_uvz * mid[..., None]
        d = bilinear_sample(fine[..., None], p[..., :2])[..., 0]
        below = p[..., 2] > d
        return jnp.where(below, lo, mid), jnp.where(below, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 6, refine, (lo, hi))
    hit_uvz = origin_uvz + dir_uvz * hi[..., None]
    return hit_uvz, hit


@jax.named_scope("hn.ssr")
def compute_ssr(color: Array, depth: Array, normal_vs: Array, roughness: Array,
                camera: CameraAttribs, frame_index,
                settings: SSRSettings = SSRSettings(),
                state: Optional[SSRState] = None,
                motion: Optional[Array] = None,
                half_resolution: bool = False,
                resolution_divisor: int = 0) -> Tuple[Array, SSRState]:
    """Full SSR: returns ((H, W, 4) radiance+confidence, new state).

    color: scene radiance to reflect (pre-tonemap); normal_vs view-space.
    """
    full_h, full_w = depth.shape
    d = resolution_divisor or (2 if half_resolution else 1)
    if d > 1:
        depth_r = depth[::d, ::d]
        normal_r = normal_vs[::d, ::d]
        rough_r = roughness[::d, ::d]
        half_resolution = True
    else:
        depth_r, normal_r, rough_r = depth, normal_vs, roughness
    h, w = depth_r.shape

    pos = view_space_position(depth_r, camera)
    v = normalize(-pos)

    # GGX-VNDF jittered reflection direction in view space
    noise = r2_noise_pair(h, w, frame_index)
    n = normal_r
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.99,
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape))
    t_b = normalize(jnp.cross(up, n))
    b_b = jnp.cross(n, t_b)
    v_ts = jnp.stack([jnp.sum(v * t_b, -1), jnp.sum(v * b_b, -1),
                      jnp.sum(v * n, -1)], axis=-1)
    alpha = jnp.clip(rough_r * rough_r * (1.0 - settings.ggx_importance_sample_bias),
                     1e-4, 1.0)
    h_ts = smith_ggx_sample_visible_normal(
        v_ts, alpha[..., 0], alpha[..., 0], noise[..., 0], noise[..., 1])
    h_vs = (h_ts[..., 0:1] * t_b + h_ts[..., 1:2] * b_b + h_ts[..., 2:3] * n)
    r_dir = normalize(reflect(-v, normalize(h_vs)))

    # endpoints in uv/ndc-z space
    p0 = pos
    ray_len = jnp.maximum(-p0[..., 2:3] * 0.75, 0.5)
    p1 = pos + r_dir * ray_len

    def to_uvz(p_vs):
        clip = jnp.stack([
            p_vs[..., 0] * camera.proj[0, 0],
            p_vs[..., 1] * camera.proj[1, 1],
            p_vs[..., 2] * camera.proj[2, 2] + camera.proj[3, 2],
            -p_vs[..., 2],
        ], axis=-1)
        wc = jnp.maximum(clip[..., 3:4], 1e-5)
        ndc = clip[..., :3] / wc
        return jnp.stack([ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5,
                          ndc[..., 2]], axis=-1)

    o_uvz = to_uvz(p0)
    e_uvz = to_uvz(p1)
    dir_uvz = e_uvz - o_uvz
    # small offset off the surface to avoid self-intersection
    o_uvz = o_uvz + dir_uvz * 0.01

    mips = build_min_depth_pyramid(depth_r, 4)
    # thickness in NDC at this depth (approximate scale)
    thick = settings.depth_buffer_thickness / jnp.maximum(
        camera.far_z - camera.near_z, 1e-3)
    hit_uvz, hit = _march(mips, o_uvz, dir_uvz,
                          settings.max_traversal_intersections, thick)

    refl = bilinear_sample(color, hit_uvz[..., :2])
    # fades: screen edge, ray facing camera, roughness
    edge = (saturate(10.0 * (0.5 - jnp.abs(hit_uvz[..., 0:1] - 0.5)))
            * saturate(10.0 * (0.5 - jnp.abs(hit_uvz[..., 1:2] - 0.5))))
    rough_fade = saturate((settings.roughness_threshold - rough_r)
                          / jnp.maximum(settings.roughness_threshold, 1e-3) * 4.0)
    conf = hit[..., None].astype(jnp.float32) * edge * rough_fade
    radiance = jnp.concatenate([refl * conf, conf], axis=-1)

    # spatial reconstruction: small cross-bilateral average for rough pixels
    rad_blur = radiance
    for dxy in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        rad_blur = rad_blur + jnp.roll(radiance, dxy, axis=(0, 1))
    rad_blur = rad_blur / 5.0
    blur_amt = saturate(rough_r * 4.0)
    radiance = radiance + (rad_blur - radiance) * blur_amt

    # temporal accumulation at the PROCESSING resolution — the history
    # buffer and its reprojection gathers live on the (h, w) grid, which
    # is d^2 cheaper than full-res accumulation and just as stable (the
    # upsample after it smooths residual quarter-res ghosting).
    if state is not None and motion is not None:
        motion_r = motion[::d, ::d] if d > 1 else motion
        xg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) / w
        yg = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) / h
        prev_uv = jnp.stack([xg, yg], axis=-1) - motion_r
        hist = bilinear_sample(state.radiance, prev_uv)
        in_b = ((prev_uv[..., 0] >= 0) & (prev_uv[..., 0] <= 1)
                & (prev_uv[..., 1] >= 0) & (prev_uv[..., 1] <= 1))[..., None]
        a = jnp.where(in_b, 1.0 - settings.temporal_stability_factor, 1.0)
        radiance = hist + (radiance - hist) * a
    new_state = SSRState(radiance=radiance)

    if half_resolution:
        radiance = jax.image.resize(radiance, (full_h, full_w, 4), method="bilinear")
    return radiance, new_state
