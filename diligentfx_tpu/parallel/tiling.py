"""Multi-chip tile-band rendering — SPMD over the framebuffer's row axis.

The reference scales by GPU SIMT over pixels (SURVEY.md §2.6 item 6); the
TPU-native equivalent shards the framebuffer's tile-row bands across the
mesh's 'sp' axis with `shard_map`: every device rasterizes and shades ONLY its
band (geometry/material state replicated — small next to framebuffers), using
the rasterizer's viewport-band support, so no triangle-level communication
exists.  Screen-space neighborhoods (SSAO/SSR/TAA) use
`parallel.mesh.band_halo_exchange` (ppermute over ICI).

`render_forward_banded` is the reference multi-chip path: forward PBR+IBL.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.ops import raster as rz
from diligentfx_tpu.ops.sampling import sample_env_oct
from diligentfx_tpu.pbr import shading as sh
from diligentfx_tpu.pbr.renderer import RenderInfo, ScenePrimitives, transform_vertices

Array = jax.Array


def _shade_band(scene, info, ibl_maps, env_oct, vb, clip, world_pos, world_nrm,
                band_y0, width, band_h, full_h, use_ibl):
    winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
    packed = jnp.concatenate([world_pos, world_nrm], axis=-1)
    interp = rz.interpolate_all(vb, scene.indices, packed, winv)
    pos_px = interp[..., 0:3]
    nrm_px = m3.normalize(interp[..., 3:6])
    hit = vb.tri_id >= 0

    tid = jnp.maximum(vb.tri_id, 0)
    mat_id = scene.tri_material[tid]
    mats = scene.materials
    base_color = mats.base_color_factor[mat_id][..., :3]
    metallic = mats.metallic_factor[mat_id][..., None]
    roughness = mats.roughness_factor[mat_id][..., None]

    view = m3.normalize(info.camera.position - pos_px)
    srf = sh.get_surface_reflectance_mr(base_color, metallic, roughness)
    ndotv = jnp.clip(m3.dot(nrm_px, view), 0.0, 1.0)
    shading = sh.SurfaceShadingInfo(
        pos=pos_px, view=view, occlusion=jnp.ones_like(metallic),
        emissive=mats.emissive_factor[mat_id],
        base=sh.BaseLayerShadingInfo(srf=srf, metallic=metallic,
                                     normal=nrm_px, ndotv=ndotv),
        ibl_scale=info.renderer_params.ibl_scale[:3])
    lighting = sh.default_lighting(pos_px)
    lighting = sh.apply_punctual_lights(shading, info.lights, lighting)
    if use_ibl and ibl_maps is not None:
        lighting = sh.apply_ibl(shading, ibl_maps, lighting)
    color = sh.resolve_lighting(shading, lighting)

    # band-local background rays
    x = (jax.lax.broadcasted_iota(jnp.float32, (band_h, width), 1) + 0.5) / width * 2 - 1
    yg = (band_y0 + jax.lax.broadcasted_iota(jnp.float32, (band_h, width), 0) + 0.5)
    y = 1.0 - yg / full_h * 2.0
    ndc = jnp.stack([x, y, jnp.full_like(x, 0.5), jnp.ones_like(x)], axis=-1)
    wpt = jnp.einsum("hwi,ij->hwj", ndc, info.camera.view_proj_inv,
                     precision=jax.lax.Precision.HIGHEST)
    ray = m3.normalize(wpt[..., :3] / wpt[..., 3:4] - info.camera.position)
    bg = sample_env_oct([env_oct], ray, jnp.zeros(ray.shape[:-1]))
    return jnp.where(hit[..., None], color, bg)


def render_forward_banded(scene: ScenePrimitives, info: RenderInfo, ibl_maps,
                          env_oct, mesh: Mesh, *, width: int, height: int,
                          cfg: RasterizerConfig = RasterizerConfig(),
                          use_ibl: bool = True,
                          axis_name: str = "sp") -> Array:
    """Render one forward frame with the framebuffer row-sharded over
    `axis_name`. Returns the assembled (height, width, 3) image (sharded)."""
    n_bands = mesh.shape[axis_name]
    assert height % (n_bands * cfg.tile_h) == 0, \
        f"height {height} must split into {n_bands} tile-aligned bands"
    band_h = height // n_bands

    other_axes = tuple(a for a in mesh.axis_names if a != axis_name)

    def band_fn(scene_, info_, ibl_, env_):
        b = jax.lax.axis_index(axis_name)
        world_pos, world_nrm, _ = transform_vertices(scene_, info_.model_transform)
        clip = m3.transform_points(world_pos, info_.camera.view_proj)
        vb, _ = rz.rasterize(
            clip, scene_.indices, width=width, height=band_h, cfg=cfg,
            double_sided=scene_.tri_double_sided,
            screen_size=(width, height),
            screen_offset=(jnp.int32(0), b * band_h),
            backend="xla" if jax.default_backend() != "tpu" else "pallas")
        color = _shade_band(scene_, info_, ibl_, env_, vb, clip,
                            world_pos, world_nrm,
                            (b * band_h).astype(jnp.float32),
                            width, band_h, height, use_ibl)
        return color

    fn = shard_map(
        band_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(axis_name, None, None),
        check_rep=False)
    return fn(scene, info, ibl_maps, env_oct)
