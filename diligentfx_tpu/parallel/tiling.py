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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.ops import raster as rz
from diligentfx_tpu.ops.sampling import sample_env_oct
from diligentfx_tpu.pbr import shading as sh
from diligentfx_tpu.parallel.mesh import band_halo_exchange
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


# ---------------------------------------------------------------------------
# Full deferred pipeline, sp-banded (the flagship multi-chip path)
# ---------------------------------------------------------------------------


class BandedFrameState(NamedTuple):
    """Temporal history for the banded pipeline: image-shaped entries live
    band-sharded on their device; SSR history (at march resolution) is
    replicated (the march reads the whole screen)."""
    frame_index: Array
    prev_view_proj: Array
    taa_color: Optional[Array] = None        # (H, W, 3) band-sharded
    taa_count: Optional[Array] = None        # (H, W) band-sharded
    ssao_history: Optional[Array] = None     # (H, W) band-sharded
    ssr_radiance: Optional[Array] = None     # (h', w', 4) replicated
    prev_depth: Optional[Array] = None       # (H, W) band-sharded


def _edge_clamped_halo(x: Array, halo: int, axis_name: str) -> Array:
    """band_halo_exchange, but global-edge halos replicate the edge row
    (matching single-device clamp-to-edge sampling) instead of zeros."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    ext = band_halo_exchange(x, halo, axis_name)
    top = jnp.broadcast_to(x[:1], ext[:halo].shape)
    bot = jnp.broadcast_to(x[-1:], ext[-halo:].shape)
    ext = ext.at[:halo].set(jnp.where(i == 0, top, ext[:halo]))
    ext = ext.at[-halo:].set(jnp.where(i == n - 1, bot, ext[-halo:]))
    return ext


def initial_banded_state(width: int, height: int, mesh: Mesh, *,
                         enable_taa=True, enable_ssao=True, enable_ssr=True,
                         ssr_divisor: int = 2,
                         axis_name: str = "sp") -> BandedFrameState:
    from diligentfx_tpu.parallel.mesh import band_sharding, replicated
    n = mesh.shape[axis_name]
    band = NamedSharding(mesh, P(axis_name))
    repl = replicated(mesh)
    z1 = jnp.zeros((height, width), jnp.float32)
    z3 = jnp.zeros((height, width, 3), jnp.float32)
    hs, ws = -(-height // ssr_divisor), -(-width // ssr_divisor)
    put = jax.device_put
    return BandedFrameState(
        frame_index=put(jnp.int32(0), repl),
        prev_view_proj=put(jnp.eye(4, dtype=jnp.float32), repl),
        taa_color=put(z3, band) if enable_taa else None,
        taa_count=put(z1, band) if enable_taa else None,
        ssao_history=put(z1 + 1.0, band) if enable_ssao else None,
        ssr_radiance=(put(jnp.zeros((hs, ws, 4), jnp.float32), repl)
                      if enable_ssr else None),
        prev_depth=put(z1 + 1.0, band),
    )


def render_frame_banded(scene: ScenePrimitives, info: RenderInfo, ibl_maps,
                        env_oct, state: BandedFrameState, mesh: Mesh, *,
                        width: int, height: int,
                        cfg: RasterizerConfig = RasterizerConfig(),
                        use_ibl: bool = True,
                        enable_ssao: bool = True,
                        enable_ssr: bool = True,
                        enable_taa: bool = True,
                        enable_bloom: bool = True,
                        ssr_divisor: int = 2,
                        ssr_steps: int = 24,
                        ssao_num_slices: int = 2, ssao_num_steps: int = 4,
                        tone_mapping_mode=None,
                        halo: int = 16,
                        axis_name: str = "sp"):
    """The FULL deferred frame (G-buffer → SSAO → SSR → composite → TAA →
    bloom → tone map) with the framebuffer row-banded over `axis_name` — the
    multi-chip analogue of HnTaskManager.execute (SURVEY.md §5.7/§5.8: the
    pixel grid is the long dimension; this is the CP/SP design).

    Communication pattern per frame, all over ICI:
      * G-buffer: none (viewport-banded raster, pixel-local shading),
      * SSAO: `halo`-row edge-clamped halo exchange (ppermute) for taps +
        bilateral blur; taps clamp to the halo (the same contract as the
        Pallas warp kernel's fixed halo),
      * SSR: all_gather of the march-resolution inputs (the hi-Z march reads
        the whole screen, like the reference's global-memory DDA),
      * TAA: halo exchange for the 3×3 variance neighborhood; history
        reprojection is band-local with motion rows clamped to the halo,
      * bloom: all_gather of the pre-bloom color (the mip pyramid is global).

    Returns (color (H, W, 3) band-sharded, new BandedFrameState).
    """
    from diligentfx_tpu.pbr.deferred import render_gbuffer_band_sp
    from diligentfx_tpu.postfx import bloom as fx_bloom
    from diligentfx_tpu.postfx import ssao as fx_ssao
    from diligentfx_tpu.postfx import ssr as fx_ssr
    from diligentfx_tpu.postfx import taa as fx_taa
    from diligentfx_tpu.postfx.tonemap import ToneMappingAttribs, tone_map

    n_bands = mesh.shape[axis_name]
    assert height % (n_bands * cfg.tile_h) == 0, (height, n_bands, cfg.tile_h)
    band_h = height // n_bands
    assert band_h % 2 == 0

    def band_fn(scene_, info_, ibl_, env_, st):
        b = jax.lax.axis_index(axis_name)
        y0 = b * band_h
        first = st.frame_index == 0
        info_ = info_._replace(prev_view_proj=jnp.where(
            first, info_.camera.view_proj, st.prev_view_proj))

        gb = render_gbuffer_band_sp(
            scene_, info_, ibl_, env_, width=width, band_h=band_h,
            full_height=height, band_y0=y0, cfg=cfg, use_ibl=use_ibl)

        # strip the leading sharded dim shard_map gives image-shaped state
        def band_of(x):
            return None if x is None else x

        # ---- SSAO (halo-exchanged taps at half res) -----------------------
        ao = jnp.ones((band_h, width), jnp.float32)
        new_ssao = band_of(st.ssao_history)
        if enable_ssao:
            # Parity contract (banded == 1-band): every AO row that can
            # influence an interior output row must see its FULL vertical tap
            # extent inside the extended array.  Influence chain: upsample
            # reads ±1 half row, bilateral blur reads ±3, GTAO taps read
            # ±tap_v with +1 for the bilinear floor.  So the half-res halo
            # must satisfy h2 >= 1 + 3 + tap_v + 1; h2 is the SAME for every
            # band count (min over band height caps it only on tiny bands).
            band2 = band_h // 2
            blur_r = 3
            h2 = min(12, band2)
            tap_v = float(max(h2 - (blur_r + 2), 1))
            d2 = gb.depth[::2, ::2]
            n2 = gb.normal_view[::2, ::2]
            d2x = _edge_clamped_halo(d2, h2, axis_name)
            n2x = _edge_clamped_halo(n2, h2, axis_name)
            row0_half = (y0 // 2) - h2
            ao_x = fx_ssao.compute_gtao(
                d2x, n2x, info_.camera, st.frame_index,
                num_slices=ssao_num_slices, num_steps=ssao_num_steps,
                row0=row0_half, full_h=height // 2,
                max_tap_px=(63.0, tap_v), use_mips=False)
            ao_x = fx_ssao.bilateral_blur(ao_x, d2x, info_.camera,
                                          radius=blur_r)
            # upsample WITH one half-res halo row so the 2x bilinear resize
            # (which samples input row i/2 - 0.25) never clamps at interior
            # band edges; crop the 2 full-res halo rows after
            ao2e = ao_x[h2 - 1: h2 + band2 + 1]
            from diligentfx_tpu.ops.sampling import upsample_bilinear
            ao_e = upsample_bilinear(ao2e, 2, 2)[:band_h + 4, :width]
            ao = ao_e[2:band_h + 2]
            if st.ssao_history is not None:
                hist = st.ssao_history
                acc = jnp.zeros_like(ao); acc2 = jnp.zeros_like(ao)
                aox = _edge_clamped_halo(ao, 1, axis_name)
                for dy in (0, 1, 2):
                    for dx in (-1, 0, 1):
                        sroll = jnp.roll(aox, dx, axis=1)[dy:dy + band_h]
                        acc = acc + sroll
                        acc2 = acc2 + sroll * sroll
                mean = acc / 9.0
                std = jnp.sqrt(jnp.maximum(acc2 / 9.0 - mean * mean, 0.0))
                hist = jnp.clip(hist, mean - 2.0 * std, mean + 2.0 * std)
                a = jnp.where(first, 1.0, 0.1)
                ao = hist + (ao - hist) * a
            new_ssao = ao

        # ---- SSR (march-resolution inputs gathered across bands) ----------
        spec = gb.ambient_specular
        new_ssr = st.ssr_radiance
        ssr_rad = None
        if enable_ssr:
            refl_src = jnp.where(gb.hit[..., None],
                                 gb.direct + gb.ambient_diffuse
                                 + gb.ambient_specular, gb.background)
            d = ssr_divisor
            gath = lambda x: jax.lax.all_gather(x, axis_name, axis=0,
                                                tiled=True)
            color_g = gath(refl_src[::d, ::d])
            depth_g = gath(gb.depth[::d, ::d])
            normal_g = gath(gb.normal_view[::d, ::d])
            rough_g = gath(gb.material_data[::d, ::d, 1:2])
            rad_full, ssr_state = fx_ssr.compute_ssr(
                color_g, depth_g, normal_g, rough_g, info_.camera,
                st.frame_index,
                fx_ssr.SSRSettings(max_traversal_intersections=ssr_steps),
                state=(fx_ssr.SSRState(radiance=st.ssr_radiance)
                       if st.ssr_radiance is not None else None),
                motion=None, half_resolution=False, resolution_divisor=0)
            new_ssr = ssr_state.radiance
            from diligentfx_tpu.ops.sampling import upsample_bilinear
            rad_up = upsample_bilinear(rad_full, d, d)[:height, :width]
            ssr_rad = jax.lax.dynamic_slice(
                rad_up, (y0, 0, 0), (band_h, width, 4))

        # ---- composite -----------------------------------------------------
        ao1 = ao[..., None]
        if ssr_rad is not None:
            conf = jnp.clip(ssr_rad[..., 3:4], 0.0, 1.0)
            ssr_term = ssr_rad[..., :3] * gb.spec_env_factor
            spec = spec + (ssr_term - spec) * conf
        color = gb.direct + ao1 * gb.ambient_diffuse + ao1 * spec
        color = jnp.where(gb.hit[..., None], color, gb.background)

        # ---- TAA (banded: halo'd moments, motion-clamped history) ----------
        new_taa_c, new_taa_n = st.taa_color, st.taa_count
        if enable_taa and st.taa_color is not None:
            hist_c = jnp.where(first, color, st.taa_color)
            hist_n = jnp.where(first, jnp.ones((band_h, width), jnp.float32),
                               st.taa_count)
            # history reprojection: band-local uv, motion clamped to ±halo
            xg = (jax.lax.broadcasted_iota(jnp.float32, (band_h, width), 1)
                  + 0.5) / width
            ygl = (jax.lax.broadcasted_iota(jnp.float32, (band_h, width), 0)
                   + 0.5) / band_h
            m = gb.motion
            my = jnp.clip(m[..., 1] * height, -(halo - 1.0), halo - 1.0)
            prev_uv = jnp.stack(
                [xg - m[..., 0], ygl - my / band_h], axis=-1)
            packed = jnp.concatenate([hist_c, hist_n[..., None]], axis=-1)
            packed_x = _edge_clamped_halo(packed, halo, axis_name)
            # sample in extended-band coordinates
            prev_uv_x = jnp.stack(
                [prev_uv[..., 0],
                 (prev_uv[..., 1] * band_h + halo) / (band_h + 2 * halo)],
                axis=-1)
            from diligentfx_tpu.ops.sampling import bilinear_sample
            warped = bilinear_sample(packed_x, prev_uv_x)
            hist = warped[..., :3]
            hist_count = warped[..., 3]
            cx = _edge_clamped_halo(color, 1, axis_name)
            acc = jnp.zeros_like(color); acc2 = jnp.zeros_like(color)
            for dy in (0, 1, 2):
                for dx in (-1, 0, 1):
                    sroll = jnp.roll(cx, dx, axis=1)[dy:dy + band_h]
                    acc = acc + sroll
                    acc2 = acc2 + sroll * sroll
            mean = acc / 9.0
            std = jnp.sqrt(jnp.maximum(acc2 / 9.0 - mean * mean, 0.0))
            hist = jnp.clip(hist, mean - std, mean + std)
            count = hist_count + 1.0
            alpha = jnp.maximum(1.0 / count, 0.1)[..., None]
            color = hist + (color - hist) * alpha
            new_taa_c, new_taa_n = color, jnp.minimum(count, 64.0)

        # ---- bloom (global mip pyramid via all_gather) ----------------------
        if enable_bloom:
            color_full = jax.lax.all_gather(color, axis_name, axis=0,
                                            tiled=True)
            bloomed = fx_bloom.apply_bloom(color_full)
            color = jax.lax.dynamic_slice(bloomed, (y0, 0, 0),
                                          (band_h, width, 3))

        if tone_mapping_mode is not None:
            color = tone_map(color, tone_mapping_mode, ToneMappingAttribs())

        new_state = BandedFrameState(
            frame_index=st.frame_index + 1,
            prev_view_proj=info_.camera.view_proj,
            taa_color=new_taa_c, taa_count=new_taa_n,
            ssao_history=new_ssao, ssr_radiance=new_ssr,
            prev_depth=gb.depth)
        return color, new_state

    band = P(axis_name)
    state_specs = BandedFrameState(
        frame_index=P(), prev_view_proj=P(),
        taa_color=band if state.taa_color is not None else None,
        taa_count=band if state.taa_count is not None else None,
        ssao_history=band if state.ssao_history is not None else None,
        ssr_radiance=P() if state.ssr_radiance is not None else None,
        prev_depth=band)
    fn = shard_map(
        band_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), state_specs),
        out_specs=(band, state_specs),
        check_rep=False)
    return fn(scene, info, ibl_maps, env_oct, state)
