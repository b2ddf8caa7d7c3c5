"""Deferred G-buffer rendering — the analogue of USD_Renderer's MRT outputs
(PBR/interface/USD_Renderer.hpp:55-84: color, mesh id, motion vectors, normal,
base color, material data, IBL) and Hydrogent's HnFrameRenderTargets
(interface/HnFrameRenderTargets.hpp:42-52).

The frame is produced in two phases:
  1. visibility: rasterize → interpolate → material gather (ops/raster.py),
  2. shading split into layers the post chain needs to composite:
     direct (punctual + emissive), ambient diffuse, ambient specular, and the
     split-sum environment factor so SSR can *replace* the specular IBL term
     per pixel (the role of the reference's separate IBL render target).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.ops import raster as rz
from diligentfx_tpu.ops.sampling import bilinear_sample, sample_env_oct
from diligentfx_tpu.pbr import brdf, shading as sh
from diligentfx_tpu.pbr.renderer import (RenderInfo, ScenePrimitives,
                                         _camera_rays, transform_vertices)

Array = jax.Array


class GBufferData(NamedTuple):
    """HnFrameRenderTargets analogue: every AOV the tasks consume."""
    depth: Array             # (H, W) NDC depth (background = 1)
    mesh_id: Array           # (H, W) int32 material/prim id, -1 background
    normal_world: Array      # (H, W, 3)
    normal_view: Array       # (H, W, 3)
    base_color: Array        # (H, W, 3)
    material_data: Array     # (H, W, 3) = metallic, roughness, occlusion
    motion: Array            # (H, W, 2) uv motion (camera + object)
    world_pos: Array         # (H, W, 3)
    direct: Array            # (H, W, 3) punctual + emissive (shadowed)
    ambient_diffuse: Array   # (H, W, 3) diffuse IBL * scale
    ambient_specular: Array  # (H, W, 3) specular IBL * scale
    spec_env_factor: Array   # (H, W, 3) k_s * A + B (for SSR substitution)
    background: Array        # (H, W, 3) env radiance where no geometry
    hit: Array               # (H, W) bool
    # extra per-pixel products for the 35 DebugViewType AOVs
    # (PBR_Renderer.hpp:401-439); only populated when emit_debug=True
    debug: Optional[dict] = None


def _material_table(mats) -> Array:
    """The aligned (M, 20) material table — ONE per-pixel row gather (or the
    fused kernel's in-VMEM fetch) instead of one gather per field."""
    return jnp.concatenate([
        mats.base_color_factor,                       # 0:4
        mats.emissive_factor,                         # 4:7
        mats.metallic_factor[:, None],                # 7
        mats.roughness_factor[:, None],               # 8
        mats.normal_scale[:, None],                   # 9
        mats.occlusion_factor[:, None],               # 10
        mats.workflow[:, None].astype(jnp.float32),   # 11
        mats.clearcoat_factor[:, None],               # 12
        mats.clearcoat_roughness_factor[:, None],     # 13
        mats.specular_factor,                         # 14:17 (spec-gloss)
        mats.alpha_mask_cutoff[:, None],              # 17
        jnp.zeros((mats.metallic_factor.shape[0], 2), jnp.float32),
    ], axis=-1)


def _vertex_inputs(scene: ScenePrimitives, info: RenderInfo,
                   use_textures: bool, include_pos: bool = True):
    """Per-vertex data shared by the fused and two-pass deferred paths:
    (clip, winv, packed attrs (V, C), n_ch).

    include_pos=False drops the world-position channels from the packing —
    the fused path reconstructs position from depth instead (3 fewer
    channels = 9 fewer plane rows in the kernel epilogue's per-winner
    gather, the raster block's hot loop)."""
    world_pos, world_nrm, _ = transform_vertices(scene, info.model_transform)
    clip = m3.transform_points(world_pos, info.camera.view_proj)
    winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
    prev_world, _, _ = transform_vertices(scene, info.model_transform,
                                          previous=True)
    prev_vp = (info.prev_view_proj if info.prev_view_proj is not None
               else info.camera.view_proj)
    prev_clip = m3.transform_points(prev_world, prev_vp)
    # interpolate prev CLIP components (x, y, w) and divide per PIXEL:
    # dividing per vertex breaks for triangles crossing the previous near
    # plane (a big ground plane behind the camera produced multi-screen
    # bogus motion vectors); clip components are linear in object space so
    # perspective-correct interpolation of them is exact
    prev_cxyw = jnp.stack([prev_clip[:, 0], prev_clip[:, 1],
                           prev_clip[:, 3]], axis=-1)
    attrs_list = ([world_pos] if include_pos else []) + [world_nrm, prev_cxyw]
    if use_textures:
        # transform tangents like normals (rigid/uniform assumption)
        vm3 = scene.node_matrices[scene.vertex_node][:, :3, :3]
        tan3 = m3.normalize(jnp.einsum("vi,vij->vj", scene.tangents[:, :3], vm3,
                                       precision=jax.lax.Precision.HIGHEST))
        attrs_list += [scene.uvs, tan3, scene.tangents[:, 3:4]]
    packed = jnp.concatenate(attrs_list, axis=-1)
    return clip, winv, packed, packed.shape[1]


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "cfg", "use_ibl", "use_lights", "shadow_mode",
    "pcf_kernel_size", "use_textures", "enable_clearcoat", "fast_env",
    "light_shadow_kinds", "fuse", "emit_debug", "vis_only"))
def render_gbuffer(scene: ScenePrimitives, info: RenderInfo, ibl_maps, env_oct,
                   *, width: int, height: int, cfg: RasterizerConfig,
                   use_ibl: bool = True, use_lights: bool = True,
                   shadow_mode=None, pcf_kernel_size: int = 3,
                   atlas=None, use_textures: bool = False,
                   enable_clearcoat: bool = False,
                   fast_env: bool = False,
                   light_shadow_kinds: tuple = (),
                   fuse: str = "auto",
                   emit_debug: bool = False,
                   vis_only: bool = False) -> GBufferData:
    pad_w, pad_h = rz.pad_viewport(width, height, cfg)
    # ALPHA_MODE_MASK tris are the tail of the index buffer: the opaque
    # raster takes the static prefix, the tail goes through the K-layer
    # alpha-test resolve below (oit.resolve_alpha_mask)
    n_op = scene.indices.shape[0] - (
        scene.mask_indices.shape[0] if scene.mask_indices is not None else 0)
    if _fuse_ok(scene, fuse, use_textures):
        vb, fused_px, clip, winv = _fused_raster(
            scene, info, n_op, pad_w=pad_w, pad_h=pad_h, cfg=cfg,
            use_textures=use_textures)
    else:
        clip, winv, packed, _ = _vertex_inputs(scene, info, use_textures)
        vb, _stats = rz.rasterize(clip, scene.indices[:n_op],
                                  width=pad_w, height=pad_h, cfg=cfg,
                                  double_sided=scene.tri_double_sided[:n_op])
        if scene.mask_indices is not None:
            from diligentfx_tpu.pbr.oit import resolve_alpha_mask
            vb = resolve_alpha_mask(vb, clip, scene, winv,
                                    width=pad_w, height=pad_h, cfg=cfg,
                                    atlas=atlas, use_textures=use_textures)
        fused_px = None
    if vis_only:
        # profiling: raster + binning in isolation.  Channels are filled
        # with depth-derived (non-constant) values so XLA cannot
        # algebraically fold the downstream consumers away.
        hit = vb.tri_id >= 0
        d1 = jnp.where(hit, vb.depth, 1.0)
        c1 = d1[..., None]
        c3 = jnp.concatenate([c1, c1, c1], axis=-1)
        gb = GBufferData(
            depth=d1, mesh_id=vb.tri_id, normal_world=c3, normal_view=c3,
            base_color=c3, material_data=c3,
            motion=jnp.concatenate([c1, c1], axis=-1) * 1e-3,
            world_pos=c3, direct=c3, ambient_diffuse=c3,
            ambient_specular=c3, spec_env_factor=c3, background=c3,
            hit=hit, debug=None)
        return jax.tree.map(lambda x: x[:height, :width], gb)
    gb = _shade_band(scene, info, ibl_maps, env_oct, vb, clip, winv,
                     jnp.int32(0),
                     band_h=pad_h, pad_w=pad_w, pad_h=pad_h,
                     use_ibl=use_ibl, use_lights=use_lights,
                     shadow_mode=shadow_mode,
                     pcf_kernel_size=pcf_kernel_size, atlas=atlas,
                     use_textures=use_textures,
                     enable_clearcoat=enable_clearcoat, fast_env=fast_env,
                     light_shadow_kinds=light_shadow_kinds,
                     fused_px=fused_px, emit_debug=emit_debug)
    return jax.tree.map(lambda x: x[:height, :width], gb)


def _fuse_ok(scene: ScenePrimitives, fuse: str, use_textures: bool) -> bool:
    """Whether the fused raster kernel can serve this scene: Pallas backend,
    no alpha-mask tail (its resolve rewrites winners after raster), and
    tangents available when anisotropy needs them (they ride the textured
    attr packing)."""
    import os
    env = os.environ.get("DFX_FUSE", "")       # A/B perf override
    if env in ("on", "off"):
        fuse = env
    if fuse == "off":
        return False
    if fuse == "on":
        return True
    return (jax.default_backend() == "tpu"
            and scene.mask_indices is None
            and (use_textures or scene.materials_anisotropy is None))


def _recon_pos() -> bool:
    """Whether the fused path reconstructs world position from depth
    instead of interpolating it (DFX_RECON=off restores interpolation for
    A/B measurement)."""
    import os
    return os.environ.get("DFX_RECON", "on") != "off"


def _fused_raster(scene: ScenePrimitives, info: RenderInfo, n_op: int, *,
                  pad_w: int, pad_h: int, cfg: RasterizerConfig,
                  use_textures: bool, screen_size=None,
                  screen_offset=(0, 0)):
    """Raster + in-kernel attribute interpolation + material fetch
    (rasterize_fused).  Returns (vb, fused channels (C, H, W) channel-FIRST,
    clip, winv)."""
    include_pos = not _recon_pos()
    clip, winv, packed, n_ch = _vertex_inputs(scene, info, use_textures,
                                              include_pos=include_pos)
    tri_node = scene.vertex_node[scene.indices[:n_op, 0]]
    consts = jnp.stack([scene.tri_material[:n_op].astype(jnp.float32),
                        tri_node.astype(jnp.float32)], axis=-1)
    mat_tableT = _material_table(scene.materials).T         # (20, M)
    # uv channels follow (pos3 if interpolated) + nrm3 + prevclip3
    uv0 = (9 if include_pos else 6)
    deriv = (uv0, uv0 + 1) if use_textures else ()
    vb, out, _stats = rz.rasterize_fused(
        clip, scene.indices[:n_op], packed, winv, consts, mat_tableT,
        width=pad_w, height=pad_h, cfg=cfg, n_ch=n_ch,
        deriv_channels=deriv,
        double_sided=scene.tri_double_sided[:n_op],
        screen_size=screen_size, screen_offset=screen_offset)
    return vb, out, clip, winv


def _shade_band(scene: ScenePrimitives, info: RenderInfo, ibl_maps, env_oct,
                vb, clip, winv, row0, *,
                band_h: int, pad_w: int, pad_h: int,
                use_ibl: bool, use_lights: bool, shadow_mode,
                pcf_kernel_size: int, atlas, use_textures: bool,
                enable_clearcoat: bool, fast_env: bool,
                light_shadow_kinds: tuple,
                fused_px: Optional[Array] = None,
                emit_debug: bool = False,
                vb_local: bool = False) -> GBufferData:
    """Deferred shading of rows [row0, row0 + band_h) of the visibility
    buffer (row0 may be traced).  Shading is pixel-local, so very large
    framebuffers can shade in bands compiled as ONE reusable program —
    the monolithic 4K shading graph overwhelms the remote compiler
    (render_gbuffer_banded below; PERF_NOTES.md).  Returns the PADDED band
    (no viewport crop).

    fused_px: when the fused raster ran (_fused_raster), the per-pixel
    [attrs, uv-derivs, mat/node id, material row] channels as a channel-FIRST
    (C, H, W) array — all the per-pixel gathers below are then skipped."""
    r0 = jnp.asarray(row0, jnp.int32)
    if band_h != pad_h and not vb_local:
        vb = rz.VisibilityBuffer(
            depth=jax.lax.dynamic_slice(vb.depth, (r0, 0), (band_h, pad_w)),
            tri_id=jax.lax.dynamic_slice(vb.tri_id, (r0, 0), (band_h, pad_w)),
            bary=jax.lax.dynamic_slice(vb.bary, (r0, 0, 0),
                                       (band_h, pad_w, 2)))
        if fused_px is not None:
            fused_px = jax.lax.dynamic_slice(
                fused_px, (0, r0, 0), (fused_px.shape[0], band_h, pad_w))

    recon = fused_px is not None and _recon_pos()
    base_ch = 6 if recon else 9          # (pos3 if interpolated) + nrm3 + prev3
    n_ch = (base_ch + 6) if use_textures else base_ch
    duv_dx = duv_dy = None
    if fused_px is not None:
        # fused_px is channel-FIRST (C, band_h, pad_w) — the kernel writes
        # that layout directly (channel-last forced a multi-second XLA
        # relayout, PERF_NOTES.md).  Stack only the small channel groups the
        # shading needs, masking misses like interpolate_all does (slot-0
        # garbage would leak into world_pos).
        hit_m = (vb.tri_id >= 0)[..., None]

        def grp(a, b):
            g = jnp.stack([fused_px[c] for c in range(a, b)], axis=-1)
            return jnp.where(hit_m, g, 0.0)

        interp = None                      # channel-last view unused
        o = n_ch
        if use_textures:
            duv_dx = grp(o, o + 2)
            duv_dy = grp(o + 2, o + 4)
            o += 4
        mat_id = fused_px[o].astype(jnp.int32)
        mat_id = jnp.where(hit_m[..., 0], mat_id, 0)
        node_id = fused_px[o + 1].astype(jnp.int32)
        node_id = jnp.where(hit_m[..., 0], node_id, 0)
        m0 = o + 2                         # material-table row channels

        def mgrp(a, b):                    # mrow[..., a:b]
            return grp(m0 + a, m0 + b)
    else:
        _, _, packed, _ = _vertex_inputs(scene, info, use_textures)
        interp = rz.interpolate_all(vb, scene.indices, packed, winv)
        tid = jnp.maximum(vb.tri_id, 0)
        # mesh-id AOV is the per-prim (node) id, NOT the material slot —
        # picking must distinguish meshes sharing a material
        # (HnReadRprimIdTask.cpp).  Pack node<<16|material so both ride ONE
        # per-pixel gather (the TPU cost unit, PERF_NOTES.md).
        tri_node = scene.vertex_node[scene.indices[:, 0]]
        tri_packed = (tri_node << 16) | scene.tri_material
        packed_px = tri_packed[tid]
        mat_id = packed_px & 0xFFFF
        node_id = packed_px >> 16
        mrow = _material_table(scene.materials)[mat_id]   # (H, W, 20)

        def grp(a, b):
            return interp[..., a:b]

        def mgrp(a, b):
            return mrow[..., a:b]

    ao = 0 if recon else 3                # channel offset of the normal
    if recon:
        # world position reconstructed from raster depth (deferred classic):
        # drops 3 interpolated channels = 9 plane rows from the kernel
        # epilogue's per-winner gather.  view_proj_inv is the exact inverse
        # of the rasterization transform (jitter included).
        from diligentfx_tpu.postfx.context import reconstruct_world_pos
        pos_px = reconstruct_world_pos(vb.depth, info.camera,
                                       row0=r0, full_h=pad_h)
        pos_px = jnp.where((vb.tri_id >= 0)[..., None], pos_px, 0.0)
    else:
        pos_px = grp(0, 3)
    nrm_px = m3.normalize(grp(ao, ao + 3))
    pw = grp(ao + 5, ao + 6)
    pw = jnp.where(jnp.abs(pw) > 1e-9, pw, 1e-9)
    prev_ndc_px = grp(ao + 3, ao + 5) / pw
    prev_uv_px = jnp.stack([prev_ndc_px[..., 0] * 0.5 + 0.5,
                            0.5 - prev_ndc_px[..., 1] * 0.5], axis=-1)
    if use_textures:
        uv_px = grp(ao + 6, ao + 8)
        tan_px = grp(ao + 8, ao + 11)
        tan_sign = grp(ao + 11, ao + 12)

    hit = vb.tri_id >= 0
    xg = (jax.lax.broadcasted_iota(jnp.float32, (band_h, pad_w), 1) + 0.5) / pad_w
    yg = (jax.lax.broadcasted_iota(jnp.float32, (band_h, pad_w), 0)
          + r0.astype(jnp.float32) + 0.5) / pad_h
    cur_uv = jnp.stack([xg, yg], axis=-1)
    motion = jnp.where(hit[..., None], cur_uv - prev_uv_px, 0.0)

    base_color = mgrp(0, 3)
    emissive = mgrp(4, 7)
    metallic = mgrp(7, 8)
    roughness = mgrp(8, 9)
    occlusion = jnp.ones_like(metallic)

    if use_textures and atlas is not None:
        # material texture fetch indirection (PBR_Textures.fxh analogue):
        # every slot samples unconditionally (uniform SPMD work); unbound
        # slots resolve to neutral values via the -1 mask.  `atlas` may be
        # either binding mode (TextureAtlas or TextureHeap — the
        # SHADER_TEXTURE_ARRAY_MODE_DYNAMIC analogue); the dispatcher picks
        # the sampling path by container type.
        from diligentfx_tpu.ops.texture import (apply_uv_transform,
                                                sample_material_texture,
                                                texture_base_size)
        from diligentfx_tpu.ops.raster import bary_setup_from_clip
        if duv_dx is None:
            setup_b = bary_setup_from_clip(clip, scene.indices, pad_w, pad_h)
            _, duv_dx, duv_dy = rz.interpolate_with_derivs(
                vb, scene.indices, scene.uvs, setup_b, winv)

        def slot_sample(slot):
            s_tid = scene.tex_ids[mat_id, slot]               # (H, W)
            bound = (s_tid >= 0)[..., None]
            xf = scene.tex_uv_transform[mat_id, slot]         # (H, W, 6)
            wraps = scene.tex_wraps[mat_id, slot]
            uv_t = apply_uv_transform(uv_px, xf[..., :4], xf[..., 4:6])
            eff_w, eff_h = texture_base_size(atlas, jnp.maximum(s_tid, 0))
            dx = duv_dx * jnp.stack([eff_w, eff_h], -1)
            dy = duv_dy * jnp.stack([eff_w, eff_h], -1)
            rho2 = jnp.maximum(jnp.sum(dx * dx, -1), jnp.sum(dy * dy, -1))
            lod = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
            lod = lod + info.renderer_params.mip_bias
            val = sample_material_texture(
                atlas, jnp.maximum(s_tid, 0), uv_t, lod,
                wrap_u=wraps[..., 0], wrap_v=wraps[..., 1])
            return val, bound

        bc_t, bc_on = slot_sample(0)
        base_color = jnp.where(
            bc_on, base_color * m3.srgb_to_linear(bc_t[..., :3]), base_color)
        n_t, n_on = slot_sample(1)
        # tangent-space normal perturbation (PerturbNormal analogue)
        t_b = m3.normalize(tan_px - nrm_px * m3.dot(tan_px, nrm_px))
        b_b = jnp.cross(nrm_px, t_b) * tan_sign
        nscale = mgrp(9, 10)
        n_ts = n_t[..., :3] * 2.0 - 1.0
        n_ts = n_ts * jnp.concatenate(
            [nscale, nscale, jnp.ones_like(nscale)], axis=-1)
        n_mapped = m3.normalize(
            n_ts[..., 0:1] * t_b + n_ts[..., 1:2] * b_b + n_ts[..., 2:3] * nrm_px)
        nrm_px = jnp.where(n_on, n_mapped, nrm_px)
        pd_t, pd_on = slot_sample(2)
        roughness = jnp.where(pd_on, roughness * pd_t[..., 1:2], roughness)
        metallic = jnp.where(pd_on, metallic * pd_t[..., 2:3], metallic)
        em_t, em_on = slot_sample(3)
        emissive = jnp.where(em_on, emissive * m3.srgb_to_linear(em_t[..., :3]),
                             emissive)
        ao_t, ao_on = slot_sample(4)
        occl_strength = mgrp(10, 11)
        occlusion = jnp.where(
            ao_on, 1.0 + occl_strength * (ao_t[..., 0:1] - 1.0), occlusion)

    view = m3.normalize(info.camera.position - pos_px)
    srf = sh.get_surface_reflectance_mr(base_color, metallic, roughness)
    # specular-glossiness workflow (GetSurfaceReflectance SG branch,
    # PBR_Shading.fxh:390-402): base=diffuse, specular factor=F0,
    # roughness field carries (1 - glossiness) already
    workflow = mgrp(11, 12)
    is_sg = workflow == float(sh.PBR_WORKFLOW_SPECULAR_GLOSSINESS)
    srf_sg = sh.get_surface_reflectance_sg(base_color, mgrp(14, 17),
                                           1.0 - roughness)
    srf = sh.SurfaceReflectanceInfo(
        perceptual_roughness=jnp.where(is_sg, srf_sg.perceptual_roughness,
                                       srf.perceptual_roughness),
        diffuse_color=jnp.where(is_sg, srf_sg.diffuse_color, srf.diffuse_color),
        reflectance0=jnp.where(is_sg, srf_sg.reflectance0, srf.reflectance0),
        reflectance90=jnp.where(is_sg, srf_sg.reflectance90, srf.reflectance90))
    ndotv = jnp.clip(m3.dot(nrm_px, view), 0.0, 1.0)

    # ---- material extension layers (statically enabled by presence of the
    # stacked attribs, the analogue of the ENABLE_* macros) ------------------
    clearcoat = None
    if enable_clearcoat:
        cc_rough = mgrp(13, 14)
        clearcoat = sh.ClearcoatShadingInfo(
            srf=sh.get_surface_reflectance_clearcoat(cc_rough),
            normal=nrm_px,
            factor=mgrp(12, 13))
    sheen = None
    if scene.materials_sheen is not None:
        ms = scene.materials_sheen
        sheen = sh.SheenShadingInfo(
            color=ms.color_factor[mat_id],
            roughness=jnp.maximum(ms.roughness_factor[mat_id][..., None], 0.03))
    anisotropy = None
    if scene.materials_anisotropy is not None:
        ma = scene.materials_anisotropy
        strength = ma.strength[mat_id][..., None]
        rot = ma.rotation[mat_id][..., None]
        if not use_textures:
            # tangents weren't interpolated — do it here
            vm3a = scene.node_matrices[scene.vertex_node][:, :3, :3]
            tan3a = m3.normalize(jnp.einsum(
                "vi,vij->vj", scene.tangents[:, :3], vm3a,
                precision=jax.lax.Precision.HIGHEST))
            packed_t = jnp.concatenate([tan3a, scene.tangents[:, 3:4]], -1)
            ti = rz.interpolate_all(vb, scene.indices, packed_t, winv)
            tan_v, tan_s = ti[..., :3], ti[..., 3:4]
        else:
            tan_v, tan_s = tan_px, tan_sign
        t_o = m3.normalize(tan_v - nrm_px * m3.dot(tan_v, nrm_px))
        b_o = jnp.cross(nrm_px, t_o) * tan_s
        cr, sr = jnp.cos(rot), jnp.sin(rot)
        t_rot = m3.normalize(t_o * cr + b_o * sr)
        b_rot = m3.normalize(jnp.cross(nrm_px, t_rot))
        alpha_r = jnp.maximum(roughness * roughness, 1e-3)
        anisotropy = sh.AnisotropyShadingInfo(
            strength=strength, tangent=t_rot, bitangent=b_rot,
            alpha_roughness_t=jnp.maximum(
                alpha_r * (1.0 + strength), 1e-3),
            alpha_roughness_b=alpha_r)
    iridescence = None
    if scene.materials_iridescence is not None:
        mi = scene.materials_iridescence
        factor = mi.factor[mat_id][..., None]
        thickness = mi.thickness_maximum[mat_id][..., None]
        iri_ior = mi.ior[mat_id][..., None]
        iri_f = brdf.iridescence_fresnel(1.0, iri_ior, srf.reflectance0,
                                         thickness, ndotv)
        iri_f0 = brdf.schlick_to_f0(ndotv, iri_f, jnp.ones_like(iri_f))
        # mix base F0 toward the thin-film response (RenderPBR.psh:236-255)
        srf = srf._replace(reflectance0=srf.reflectance0
                           + (iri_f0 - srf.reflectance0) * factor)
        iridescence = sh.IridescenceShadingInfo(
            factor=factor, thickness=thickness, fresnel=iri_f, f0=iri_f0)
    transmission = None
    if scene.materials_transmission is not None:
        transmission = scene.materials_transmission.factor[mat_id][..., None]
    volume_thickness = None
    volume_attenuation = None
    if scene.materials_volume is not None:
        mv = scene.materials_volume
        volume_thickness = mv.thickness_factor[mat_id][..., None]
        # per-material Beer-Lambert sigma_t = -ln(atten_color)/atten_distance
        # (KHR_materials_volume; PBR_Structures.fxh:229-239), gathered with
        # the same mat_id row the other extension attribs ride
        sigma = (-jnp.log(jnp.maximum(mv.attenuation_color, 1e-4))
                 / jnp.maximum(mv.attenuation_distance[..., None], 1e-6))
        volume_attenuation = sigma[mat_id]

    shading = sh.SurfaceShadingInfo(
        pos=pos_px, view=view, occlusion=occlusion,
        emissive=emissive * info.renderer_params.emission_scale,
        base=sh.BaseLayerShadingInfo(srf=srf, metallic=metallic,
                                     normal=nrm_px, ndotv=ndotv),
        ibl_scale=info.renderer_params.ibl_scale[:3],
        clearcoat=clearcoat, sheen=sheen, anisotropy=anisotropy,
        iridescence=iridescence, transmission=transmission,
        volume_thickness=volume_thickness,
        volume_attenuation=volume_attenuation)

    lighting = sh.default_lighting(pos_px, with_sheen=sheen is not None,
                                   with_clearcoat=clearcoat is not None)
    if use_lights:
        shadow_factors = None
        csm_factor = None
        if shadow_mode is not None:
            from diligentfx_tpu.components.shadow_map_manager import (
                sample_cascaded_shadows)
            cam_view_z = -m3.transform_points(pos_px, info.camera.view)[..., 2]
            csm_factor = sample_cascaded_shadows(
                pos_px, cam_view_z, info.shadow_attribs, info.shadow_maps,
                mode=shadow_mode, pcf_kernel_size=pcf_kernel_size,
                moments=info.shadow_moments)
        if light_shadow_kinds:
            # per-light dispatch (HnLight shadow slices); the kinds tuple is
            # static, so each light gets exactly the sampling code it needs
            from diligentfx_tpu.components import shadow_map_manager as smm
            ones = jnp.ones(pos_px.shape[:-1], jnp.float32)
            factors, base = [], 0
            for i in range(info.lights.count):
                kind = (light_shadow_kinds[i]
                        if i < len(light_shadow_kinds) else "none")
                if kind == "csm" and csm_factor is not None:
                    factors.append(csm_factor)
                elif kind in ("spot", "dir"):
                    # one slice each: spot perspective or fitted-ortho
                    # directional (shadow_atlas.directional_view_proj — the
                    # HnLight single-slice directional path)
                    factors.append(smm.sample_light_shadow(
                        pos_px, info.light_shadow_view_projs[base:base + 1],
                        info.light_shadow_maps[base:base + 1],
                        pcf_kernel_size=pcf_kernel_size))
                    base += 1
                elif kind == "point":
                    face = smm.point_shadow_face(
                        pos_px - info.lights.position[i])
                    factors.append(smm.sample_light_shadow(
                        pos_px, info.light_shadow_view_projs[base:base + 6],
                        info.light_shadow_maps[base:base + 6], face_idx=face,
                        pcf_kernel_size=pcf_kernel_size))
                    base += 6
                else:
                    factors.append(ones)
            shadow_factors = jnp.stack(factors, axis=0)
        elif csm_factor is not None:
            ones = jnp.ones_like(csm_factor)
            shadow_factors = jnp.stack(
                [jnp.where(info.lights.shadow_map_index[i] >= 0,
                           csm_factor, ones)
                 for i in range(info.lights.count)], axis=0)
        lighting = sh.apply_punctual_lights(shading, info.lights, lighting,
                                            shadow_factors=shadow_factors)

    scale = info.renderer_params.ibl_scale[:3]
    if use_ibl and ibl_maps is not None:
        lighting = sh.apply_ibl(shading, ibl_maps, lighting,
                                fast_env=fast_env)
        amb_d = lighting.base.diffuse_ibl * scale
        amb_s = lighting.base.specular_ibl * scale
        # split-sum env factor for SSR substitution
        if fast_env and ibl_maps.env_brdf_coeffs is not None:
            pre_int = brdf.env_brdf_fitted(ndotv, srf.perceptual_roughness,
                                           ibl_maps.env_brdf_coeffs)
        else:
            lut_uv = jnp.concatenate([ndotv, srf.perceptual_roughness],
                                     axis=-1)
            pre_int = bilinear_sample(ibl_maps.preintegrated_ggx, lut_uv)
        one_minus_r = 1.0 - srf.perceptual_roughness
        refl90 = jnp.maximum(jnp.broadcast_to(one_minus_r, srf.reflectance0.shape),
                             srf.reflectance0)
        k_s = brdf.schlick_reflection(ndotv, srf.reflectance0, refl90)
        spec_factor = k_s * pre_int[..., 0:1] + pre_int[..., 1:2]
    else:
        amb_d = jnp.zeros_like(base_color)
        amb_s = jnp.zeros_like(base_color)
        spec_factor = jnp.zeros_like(base_color)

    direct = lighting.base.punctual + shading.emissive
    # unlit workflow (PBR_WORKFLOW_UNLIT, RenderPBR.psh UNSHADED path):
    # final color is the base color, no lighting terms
    unlit = workflow == float(sh.PBR_WORKFLOW_UNLIT)
    direct = jnp.where(unlit, base_color, direct)
    amb_d = jnp.where(unlit, 0.0, amb_d)
    amb_s = jnp.where(unlit, 0.0, amb_s)
    spec_factor = jnp.where(unlit, 0.0, spec_factor)
    # fold extension layers into the direct / ambient-specular split,
    # matching ResolveLighting's composition (PBR_Shading.fxh:847-879)
    if sheen is not None and lighting.sheen is not None:
        direct = direct + lighting.sheen.punctual
        amb_s = amb_s + lighting.sheen.specular_ibl * scale
    if clearcoat is not None and lighting.clearcoat is not None:
        cc_ndotv = jnp.maximum(m3.dot(clearcoat.normal, view), 0.1)
        cc_fresnel = brdf.schlick_reflection(
            cc_ndotv, clearcoat.srf.reflectance0[..., 0:1],
            clearcoat.srf.reflectance90[..., 0:1])
        atten = 1.0 - clearcoat.factor * cc_fresnel
        direct = direct * atten + lighting.clearcoat.punctual * clearcoat.factor
        amb_d = amb_d * atten
        amb_s = (amb_s * atten
                 + lighting.clearcoat.specular_ibl * scale * clearcoat.factor)

    ray = _camera_rays(info.camera, pad_w, pad_h, row0=r0, band_h=band_h)
    if fast_env:
        # half-res point taps + gather-free phase upsample: the background
        # is a smooth low-res env map and gathers are the TPU cost unit —
        # this quarters the full-screen gather rows (PERF_NOTES.md)
        from diligentfx_tpu.ops.sampling import (dir_to_oct_uv, point_sample,
                                                 upsample_bilinear)
        bg2 = point_sample(env_oct, dir_to_oct_uv(ray[::2, ::2]))
        bg = upsample_bilinear(bg2, 2, 2)[:band_h, :pad_w]
    else:
        bg = sample_env_oct([env_oct], ray, jnp.zeros(ray.shape[:-1]))

    nrm_view = m3.transform_directions(nrm_px, info.camera.view)

    def crop(x):
        return x

    debug = None
    if emit_debug:
        # per-pixel products for the full DebugViewType table
        # (PBR_Renderer.hpp:401-439, RenderPBR.psh:574-613); absent
        # extensions render as zeros, matching a shader compiled without them
        z1 = jnp.zeros_like(ndotv)
        z3 = jnp.zeros_like(base_color)
        debug = dict(
            texcoord0=(uv_px if use_textures else jnp.zeros_like(motion)),
            transparency=mgrp(3, 4),
            emissive=emissive,
            diffuse_color=srf.diffuse_color,
            specular_color=srf.reflectance0,
            reflectance90=srf.reflectance90,
            ndotv=ndotv,
            clearcoat_factor=(clearcoat.factor if clearcoat is not None else z1),
            clearcoat_roughness=(clearcoat.srf.perceptual_roughness
                                 if clearcoat is not None else z1),
            clearcoat_normal=(clearcoat.normal if clearcoat is not None else z3),
            clearcoat_lit=(lighting.clearcoat.punctual
                           if clearcoat is not None
                           and lighting.clearcoat is not None else z3),
            sheen_color=(sheen.color if sheen is not None else z3),
            sheen_roughness=(sheen.roughness if sheen is not None else z1),
            sheen_lit=(lighting.sheen.punctual
                       if sheen is not None and lighting.sheen is not None
                       else z3),
            anisotropy_strength=(anisotropy.strength
                                 if anisotropy is not None else z1),
            anisotropy_direction=(anisotropy.tangent
                                  if anisotropy is not None else z3),
            iridescence_fresnel=(iridescence.fresnel
                                 if iridescence is not None else z3),
            iridescence_factor=(iridescence.factor
                                if iridescence is not None else z1),
            iridescence_thickness=(iridescence.thickness
                                   if iridescence is not None else z1),
            transmission=(transmission if transmission is not None else z1),
            thickness=(volume_thickness if volume_thickness is not None else z1),
        )

    depth = jnp.where(hit, vb.depth, 1.0)
    return GBufferData(
        debug=debug,
        depth=crop(depth),
        mesh_id=crop(jnp.where(hit, node_id, -1)),
        normal_world=crop(jnp.where(hit[..., None], nrm_px, 0.0)),
        normal_view=crop(jnp.where(hit[..., None], nrm_view, 0.0)),
        base_color=crop(jnp.where(hit[..., None], base_color, 0.0)),
        material_data=crop(jnp.where(
            hit[..., None],
            jnp.concatenate([metallic, roughness, occlusion], axis=-1), 0.0)),
        motion=crop(motion),
        world_pos=crop(pos_px),
        direct=crop(jnp.where(hit[..., None], direct, 0.0)),
        ambient_diffuse=crop(jnp.where(hit[..., None], amb_d, 0.0)),
        ambient_specular=crop(jnp.where(hit[..., None], amb_s, 0.0)),
        spec_env_factor=crop(jnp.where(hit[..., None], spec_factor, 0.0)),
        background=crop(bg),
        hit=crop(hit),
    )


@functools.partial(jax.jit, static_argnames=("pad_w", "pad_h", "cfg",
                                             "use_textures", "fuse"))
def _raster_stage(scene: ScenePrimitives, info: RenderInfo, atlas, *,
                  pad_w: int, pad_h: int, cfg: RasterizerConfig,
                  use_textures: bool, fuse: str = "auto"):
    """Vertex transform + visibility raster + alpha-mask resolve, compiled
    standalone (it compiles fine at 4K; the fused shading graph doesn't)."""
    n_op = scene.indices.shape[0] - (
        scene.mask_indices.shape[0] if scene.mask_indices is not None else 0)
    if _fuse_ok(scene, fuse, use_textures):
        vb, fused_px, clip, winv = _fused_raster(
            scene, info, n_op, pad_w=pad_w, pad_h=pad_h, cfg=cfg,
            use_textures=use_textures)
        return vb, clip, winv, fused_px
    clip, winv, _, _ = _vertex_inputs(scene, info, use_textures)
    vb, _stats = rz.rasterize(clip, scene.indices[:n_op],
                              width=pad_w, height=pad_h, cfg=cfg,
                              double_sided=scene.tri_double_sided[:n_op])
    if scene.mask_indices is not None:
        from diligentfx_tpu.pbr.oit import resolve_alpha_mask
        vb = resolve_alpha_mask(vb, clip, scene, winv,
                                width=pad_w, height=pad_h, cfg=cfg,
                                atlas=atlas, use_textures=use_textures)
    return vb, clip, winv, None


_shade_band_jit = functools.partial(jax.jit, static_argnames=(
    "band_h", "pad_w", "pad_h", "use_ibl", "use_lights", "shadow_mode",
    "pcf_kernel_size", "use_textures", "enable_clearcoat", "fast_env",
    "light_shadow_kinds", "emit_debug"))(_shade_band)


def render_gbuffer_banded(scene: ScenePrimitives, info: RenderInfo, ibl_maps,
                          env_oct, *, width: int, height: int,
                          cfg: RasterizerConfig, bands: int = 4,
                          use_ibl: bool = True, use_lights: bool = True,
                          shadow_mode=None, pcf_kernel_size: int = 3,
                          atlas=None, use_textures: bool = False,
                          enable_clearcoat: bool = False,
                          fast_env: bool = False,
                          light_shadow_kinds: tuple = ()) -> GBufferData:
    """render_gbuffer compiled as 1 raster program + 1 REUSABLE band-shading
    program executed `bands` times (row offset is a traced scalar, so every
    band shares the compile).  For very large framebuffers (4K) whose
    monolithic shading graph overwhelms the compiler; costs band-seam HBM
    round-trips, numerically identical otherwise (shading is pixel-local)."""
    pad_w, pad_h = rz.pad_viewport(width, height, cfg)
    while pad_h % bands:
        bands -= 1
    band_h = pad_h // bands
    vb, clip, winv, fused_px = _raster_stage(
        scene, info, atlas, pad_w=pad_w, pad_h=pad_h, cfg=cfg,
        use_textures=use_textures)
    parts = [
        _shade_band_jit(scene, info, ibl_maps, env_oct, vb, clip, winv,
                        jnp.int32(b * band_h),
                        band_h=band_h, pad_w=pad_w, pad_h=pad_h,
                        use_ibl=use_ibl, use_lights=use_lights,
                        shadow_mode=shadow_mode,
                        pcf_kernel_size=pcf_kernel_size, atlas=atlas,
                        use_textures=use_textures,
                        enable_clearcoat=enable_clearcoat, fast_env=fast_env,
                        light_shadow_kinds=light_shadow_kinds,
                        fused_px=fused_px)
        for b in range(bands)]
    gb = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    return jax.tree.map(lambda x: x[:height, :width], gb)


def render_gbuffer_band_sp(scene: ScenePrimitives, info: RenderInfo, ibl_maps,
                           env_oct, *, width: int, band_h: int,
                           full_height: int, band_y0, cfg: RasterizerConfig,
                           use_ibl: bool = True, use_lights: bool = True,
                           shadow_mode=None, pcf_kernel_size: int = 3,
                           atlas=None, use_textures: bool = False,
                           enable_clearcoat: bool = False,
                           fast_env: bool = False,
                           light_shadow_kinds: tuple = (),
                           fuse: str = "auto") -> GBufferData:
    """One sp-band of the deferred G-buffer: raster the band's viewport
    window (rows [band_y0, band_y0 + band_h) of a full_height frame) and
    shade it band-locally — the building block of the multi-chip deferred
    pipeline (parallel/tiling.render_frame_banded; SURVEY.md §5.7: the pixel
    grid is the renderer's long dimension).  band_y0 may be traced
    (jax.lax.axis_index inside shard_map)."""
    assert width % cfg.tile_w == 0 and band_h % cfg.tile_h == 0
    n_op = scene.indices.shape[0] - (
        scene.mask_indices.shape[0] if scene.mask_indices is not None else 0)
    y0 = jnp.asarray(band_y0, jnp.int32)
    if _fuse_ok(scene, fuse, use_textures):
        vb, fused_px, clip, winv = _fused_raster(
            scene, info, n_op, pad_w=width, pad_h=band_h, cfg=cfg,
            use_textures=use_textures,
            screen_size=(width, full_height), screen_offset=(0, y0))
    else:
        clip, winv, packed, _ = _vertex_inputs(scene, info, use_textures)
        vb, _stats = rz.rasterize(clip, scene.indices[:n_op],
                                  width=width, height=band_h, cfg=cfg,
                                  double_sided=scene.tri_double_sided[:n_op],
                                  screen_size=(width, full_height),
                                  screen_offset=(0, y0))
        fused_px = None
    return _shade_band(scene, info, ibl_maps, env_oct, vb, clip, winv, y0,
                       band_h=band_h, pad_w=width, pad_h=full_height,
                       use_ibl=use_ibl, use_lights=use_lights,
                       shadow_mode=shadow_mode,
                       pcf_kernel_size=pcf_kernel_size, atlas=atlas,
                       use_textures=use_textures,
                       enable_clearcoat=enable_clearcoat, fast_env=fast_env,
                       light_shadow_kinds=light_shadow_kinds,
                       fused_px=fused_px, vb_local=True)
