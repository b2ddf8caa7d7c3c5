"""Order-independent transparency — the analogue of the reference's K-layer
OIT (Shaders/Common/public/OIT.fxh:1-26 packed depth|transmittance layers,
ClearOITLayers.csh / UpdateOITLayers.psh / ApplyOITAttenuation.psh, managed by
PBR_Renderer OIT resources, PBR_Renderer.hpp:787-793, cpp:2274-2500).

TPU design: instead of a per-pixel atomic sorted list in a structured buffer,
transparent triangles rasterize into a **K-layer visibility buffer** — the
per-tile scan keeps the K nearest fragments per pixel via an unrolled
insertion network (a fixed-K sorting network, SURVEY.md §7 step 8).  Each
layer is then shaded like the opaque path and composited front-to-back; the
reference's RGBA8 "tail" average of overflow layers (OIT.fxh:1-26) maps to a
per-pixel accumulated tail opacity (fragments dropped past K attenuate and
tint via the mean shaded layer color in composite_klayers) plus an overflow
count for diagnostics.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig
from diligentfx_tpu.ops import raster as rz

Array = jax.Array


class KLayerBuffer(NamedTuple):
    """Per-pixel K nearest transparent fragments, depth-ascending."""
    depth: Array     # (K, H, W)
    tri_id: Array    # (K, H, W) int32, -1 empty
    bary: Array      # (K, H, W, 2)
    overflow: Array  # (H, W) int32 — fragments dropped past K (the "tail")
    # accumulated opacity of the dropped fragments: 1 - prod(1 - a_i) over
    # the tail (the OIT.fxh tail average's attenuation term)
    tail_alpha: Optional[Array] = None
    # alpha-weighted mean color of the DROPPED fragments themselves (the
    # OIT.fxh RGBA8 tail average) — each overflow fragment contributes its
    # own color, carried through the insertion network alongside its alpha
    tail_color: Optional[Array] = None  # (H, W, 3)


def _klayer_raster_tiles(setup, candidates, width, height,
                         cfg: RasterizerConfig, num_layers: int,
                         tri_alpha=None, tri_rgb=None,
                         screen_offset=(0, 0)):
    tiles_x = width // cfg.tile_w
    tiles_y = height // cfg.tile_h
    num_tiles = tiles_x * tiles_y
    th, tw = cfg.tile_h, cfg.tile_w
    total_cap = candidates.shape[1]
    chunk = min(cfg.chunk, total_cap)
    n_steps = -(-total_cap // chunk)
    pad = n_steps * chunk - total_cap
    if pad:
        candidates = jnp.pad(candidates, ((0, 0), (0, pad)), constant_values=-1)

    # integer viewport offset added before the float convert — band-sharded
    # K-layer rasters are then bit-exact vs the monolithic frame (the same
    # contract as ops/raster.py)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_px0 = (tile_ids % tiles_x) * tw + jnp.asarray(screen_offset[0], jnp.int32)
    tile_py0 = (tile_ids // tiles_x) * th + jnp.asarray(screen_offset[1], jnp.int32)
    ly = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0) + 0.5
    lx = jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1) + 0.5
    px = tile_px0[:, None, None].astype(jnp.float32) + lx[None]
    py = tile_py0[:, None, None].astype(jnp.float32) + ly[None]

    k = num_layers

    # extra per-fragment channels carried through the insertion network:
    # column 0 = alpha, columns 1:4 = unshaded fragment color (for the
    # OIT.fxh tail average — the DROPPED fragment's own color must reach
    # the tail, so color swaps with the fragment exactly like alpha)
    tri_extra = None
    if tri_alpha is not None:
        cols = [tri_alpha]
        if tri_rgb is not None:
            cols += [tri_rgb[:, 0], tri_rgb[:, 1], tri_rgb[:, 2]]
        tri_extra = jnp.stack(cols, axis=-1)                 # (T, E)
    n_ex = tri_extra.shape[1] if tri_extra is not None else 0

    def step(state, cand_k):
        if tri_extra is not None:
            zs, ids, b0s, b1s, exs, ovf, ttrans, trgb, twt = state
        else:
            zs, ids, b0s, b1s, ovf, ttrans = state
            exs = trgb = twt = None
        live = cand_k >= 0
        s = setup[jnp.maximum(cand_k, 0)]                    # (tiles, K, 16)
        if tri_extra is not None:
            extra_k = tri_extra[jnp.maximum(cand_k, 0)]      # (tiles, K, E)

        def plane(ai, bi, ci):
            return (s[..., ai, None, None] * px[:, None]
                    + s[..., bi, None, None] * py[:, None]
                    + s[..., ci, None, None])

        l0 = plane(0, 1, 2)
        l1 = plane(3, 4, 5)
        l2 = 1.0 - l0 - l1
        z = plane(6, 7, 8)
        lo0 = plane(9, 10, 11)
        lo1 = plane(12, 13, 14)
        orig_ids = s[..., 15].astype(jnp.int32)
        cover = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & live[..., None, None]

        # insert each candidate into the per-pixel sorted K-layer list
        for c in range(cand_k.shape[1]):
            cz = jnp.where(cover[:, c], z[:, c], jnp.inf)
            cid = jnp.where(cover[:, c], orig_ids[:, c, None, None], -1)
            cb0 = lo0[:, c]
            cb1 = lo1[:, c]
            cex = ([extra_k[:, c, e, None, None] * jnp.ones_like(cb0)
                    for e in range(n_ex)] if tri_extra is not None else None)
            for slot in range(k):
                closer = cz < zs[slot]
                nz = jnp.where(closer, cz, zs[slot])
                nid = jnp.where(closer, cid, ids[slot])
                nb0 = jnp.where(closer, cb0, b0s[slot])
                nb1 = jnp.where(closer, cb1, b1s[slot])
                cz = jnp.where(closer, zs[slot], cz)
                cid = jnp.where(closer, ids[slot], cid)
                cb0 = jnp.where(closer, b0s[slot], cb0)
                cb1 = jnp.where(closer, b1s[slot], cb1)
                zs = [*zs[:slot], nz, *zs[slot + 1:]]
                ids = [*ids[:slot], nid, *ids[slot + 1:]]
                b0s = [*b0s[:slot], nb0, *b0s[slot + 1:]]
                b1s = [*b1s[:slot], nb1, *b1s[slot + 1:]]
                if tri_extra is not None:
                    # extras swap WITH the fragment: when a nearer candidate
                    # displaces a layer, the displaced fragment's own
                    # alpha/color must be what eventually falls into the
                    # tail (ADVICE r2: tail opacity was attributed to the
                    # inserted candidate, not the dropped fragment)
                    for e in range(n_ex):
                        ne = jnp.where(closer, cex[e], exs[e][slot])
                        cex[e] = jnp.where(closer, exs[e][slot], cex[e])
                        exs[e] = [*exs[e][:slot], ne, *exs[e][slot + 1:]]
            # whatever is left in the candidate after K swaps overflowed:
            # count it, and accumulate its opacity + premultiplied color
            # into the tail (OIT.fxh:1-26 RGBA8 tail average)
            dropped = jnp.isfinite(cz) & (cid >= 0)
            ovf = ovf + dropped.astype(jnp.int32)
            if tri_extra is not None:
                ca = cex[0]
                w = jnp.where(dropped, ca, 0.0)
                ttrans = ttrans * (1.0 - w)
                twt = twt + w
                if n_ex > 1:
                    trgb = [trgb[i] + w * cex[1 + i] for i in range(3)]
        if tri_extra is not None:
            return (zs, ids, b0s, b1s, exs, ovf, ttrans, trgb, twt), None
        return (zs, ids, b0s, b1s, ovf, ttrans), None

    def planes(fill=0.0, dtype=jnp.float32):
        return [jnp.full((num_tiles, th, tw), fill, dtype) for _ in range(k)]

    init = (planes(jnp.inf), planes(-1, jnp.int32), planes(), planes())
    if tri_extra is not None:
        init = init + ([planes() for _ in range(n_ex)],)
    init = init + (
        jnp.zeros((num_tiles, th, tw), jnp.int32),
        jnp.ones((num_tiles, th, tw), jnp.float32),
    )
    if tri_extra is not None:
        init = init + (
            [jnp.zeros((num_tiles, th, tw), jnp.float32) for _ in range(3)],
            jnp.zeros((num_tiles, th, tw), jnp.float32),
        )
    cand_steps = candidates.reshape(num_tiles, n_steps, chunk).transpose(1, 0, 2)
    fin, _ = jax.lax.scan(step, init, cand_steps)
    zs, ids, b0s, b1s = fin[:4]
    if tri_extra is not None:
        ovf, ttrans, trgb, twt = fin[5], fin[6], fin[7], fin[8]
    else:
        ovf, ttrans = fin[-2:]
        trgb = twt = None

    def untile(x):
        c = x.reshape(tiles_y, tiles_x, th, tw).transpose(0, 2, 1, 3)
        return c.reshape(height, width)

    tail_color = None
    if tri_rgb is not None:
        w = jnp.maximum(untile(twt), 1e-6)
        tail_color = jnp.stack([untile(c) for c in trgb], axis=-1) / w[..., None]
    return KLayerBuffer(
        depth=jnp.stack([untile(z) for z in zs]),
        tri_id=jnp.stack([untile(i) for i in ids]),
        bary=jnp.stack([jnp.stack([untile(a), untile(b)], axis=-1)
                        for a, b in zip(b0s, b1s)]),
        overflow=untile(ovf),
        tail_alpha=(1.0 - untile(ttrans)) if tri_alpha is not None else None,
        tail_color=tail_color,
    )


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg",
                                             "num_layers"))
def rasterize_klayers(clip: Array, indices: Array, *, width: int, height: int,
                      cfg: RasterizerConfig = RasterizerConfig(),
                      num_layers: int = 4,
                      tri_alpha: Optional[Array] = None,
                      tri_rgb: Optional[Array] = None,
                      screen_size=None, screen_offset=(0, 0)) -> KLayerBuffer:
    """Rasterize (transparent) triangles keeping the K nearest fragments per
    pixel (UpdateOITLayers analogue; transparent geometry is double-sided).

    tri_alpha: optional (T,) per-triangle opacity — enables the OIT.fxh tail:
    fragments dropped past K accumulate 1-prod(1-a) into KLayerBuffer.tail_alpha.
    tri_rgb: optional (T, 3) per-triangle color — additionally accumulates the
    dropped fragments' alpha-weighted mean color into KLayerBuffer.tail_color
    (the OIT.fxh RGBA8 tail average).  tri_rgb without tri_alpha implies
    opaque tail fragments (alpha = 1)."""
    if tri_rgb is not None and tri_alpha is None:
        tri_alpha = jnp.ones((indices.shape[0],), jnp.float32)
    t_in = indices.shape[0]
    setup, valid, bbox, orig, _clip_ovf = rz._triangle_setup(
        clip, indices, width, height,
        jnp.ones((t_in,), bool), True, 1e-3,
        screen_size=screen_size, screen_offset=screen_offset)
    candidates, _compact, _counts, *_ = rz._bin_triangles(
        valid, bbox, width, height, cfg)
    orig2 = orig[t_in:]   # near-clip overflow rows map back to original tris
    ta2 = (jnp.concatenate([tri_alpha, tri_alpha[orig2]])
           if tri_alpha is not None else None)
    tr2 = (jnp.concatenate([tri_rgb, tri_rgb[orig2]], axis=0)
           if tri_rgb is not None else None)
    return _klayer_raster_tiles(setup, candidates, width, height, cfg,
                                num_layers, tri_alpha=ta2, tri_rgb=tr2,
                                screen_offset=screen_offset)


def resolve_alpha_mask(vb, clip: Array, scene, winv: Array, *,
                       width: int, height: int,
                       cfg: RasterizerConfig = RasterizerConfig(),
                       atlas=None, use_textures: bool = False,
                       num_layers: int = 2):
    """ALPHA_MODE_MASK resolve (the reference's alpha-cutoff PSO variants,
    RenderPBR.psh `BaseColor.a < AlphaMaskCutoff → discard`).

    A visibility buffer can't discard during the z-test, so masked triangles
    (the tail of scene.indices, see ScenePrimitives.mask_indices) rasterize
    into a small K-layer buffer; each fragment's alpha (factor x optional
    base-color texture) is tested against the material cutoff, and the
    nearest PASSING fragment depth-merges into the opaque visibility buffer.
    Downstream shading then treats the survivors like any opaque pixel, so
    masked geometry gets full PBR + SSAO/SSR/TAA.  K=2 handles one level of
    masked-over-masked overlap; raise num_layers for dense foliage."""
    from diligentfx_tpu.ops import raster as rzo

    mask_idx = scene.mask_indices
    base = scene.indices.shape[0] - mask_idx.shape[0]
    klb = rasterize_klayers(clip, mask_idx, width=width, height=height,
                            cfg=cfg, num_layers=num_layers)

    mats = scene.materials
    # aligned (M, 2) alpha table → one row gather per layer
    alpha_tab = jnp.stack([mats.base_color_factor[:, 3],
                           mats.alpha_mask_cutoff], axis=-1)

    best_z = jnp.full(vb.depth.shape, jnp.inf, jnp.float32)
    best_id = jnp.full(vb.tri_id.shape, -1, jnp.int32)
    best_b = jnp.zeros(vb.bary.shape, jnp.float32)
    for k in range(klb.depth.shape[0]):
        tri_l = klb.tri_id[k]
        valid = tri_l >= 0
        gtid = jnp.where(valid, tri_l + base, 0)
        mat = scene.tri_material[gtid]
        av = alpha_tab[mat]
        alpha = av[..., 0]
        if use_textures and atlas is not None and scene.tex_ids is not None:
            from diligentfx_tpu.ops.texture import (
                apply_uv_transform, sample_material_texture)
            lvb = rzo.VisibilityBuffer(depth=klb.depth[k],
                                       tri_id=jnp.where(valid, gtid, -1),
                                       bary=klb.bary[k])
            uv_px = rzo.interpolate_all(lvb, scene.indices, scene.uvs, winv)
            s_tid = scene.tex_ids[mat, 0]
            xf = scene.tex_uv_transform[mat, 0]
            wraps = scene.tex_wraps[mat, 0]
            uv_t = apply_uv_transform(uv_px, xf[..., :4], xf[..., 4:6])
            # lod 0: the alpha test wants the crispest available cutout
            tex = sample_material_texture(atlas, jnp.maximum(s_tid, 0), uv_t,
                                          jnp.zeros_like(alpha),
                                          wrap_u=wraps[..., 0],
                                          wrap_v=wraps[..., 1])
            alpha = alpha * jnp.where(s_tid >= 0, tex[..., 3], 1.0)
        passed = valid & (alpha >= av[..., 1])
        # layers are depth-ascending, so the first pass wins
        take = passed & (best_id < 0)
        best_z = jnp.where(take, klb.depth[k], best_z)
        best_id = jnp.where(take, gtid, best_id)
        best_b = jnp.where(take[..., None], klb.bary[k], best_b)

    win = (best_id >= 0) & (best_z < vb.depth)
    return rzo.VisibilityBuffer(
        depth=jnp.where(win, best_z, vb.depth),
        tri_id=jnp.where(win, best_id, vb.tri_id),
        bary=jnp.where(win[..., None], best_b, vb.bary))


def shade_klayers(scene, info, ibl_maps, layers: KLayerBuffer,
                  world_pos: Array, world_nrm: Array, winv: Array,
                  use_ibl: bool = True) -> Tuple[Array, Array]:
    """Shade each transparent layer like the opaque path (factors-only
    materials) → (colors (K, H, W, 3), alphas (K, H, W, 1))."""
    from diligentfx_tpu.pbr import shading as sh

    def shade_one(depth_l, tri_l, bary_l):
        vb = rz.VisibilityBuffer(depth=depth_l, tri_id=tri_l, bary=bary_l)
        packed = jnp.concatenate([world_pos, world_nrm], axis=-1)
        interp = rz.interpolate_all(vb, scene.indices, packed, winv)
        pos_px = interp[..., 0:3]
        nrm_px = m3.normalize(interp[..., 3:6])
        tid = jnp.maximum(tri_l, 0)
        mat_id = scene.tri_material[tid]
        mats = scene.materials
        base_rgba = mats.base_color_factor[mat_id]
        metallic = mats.metallic_factor[mat_id][..., None]
        roughness = mats.roughness_factor[mat_id][..., None]
        view = m3.normalize(info.camera.position - pos_px)
        srf = sh.get_surface_reflectance_mr(base_rgba[..., :3], metallic, roughness)
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
        alpha = jnp.where((tri_l >= 0)[..., None], base_rgba[..., 3:4], 0.0)
        hit3 = (tri_l >= 0)[..., None]
        return (jnp.where(hit3, color, 0.0), alpha,
                jnp.where(hit3, base_rgba[..., :3], 0.0))

    colors, alphas, albedos = jax.vmap(shade_one)(
        layers.depth, layers.tri_id, layers.bary)
    return colors, alphas, albedos


def composite_klayers(opaque_color: Array, opaque_depth: Array,
                      layers: KLayerBuffer, layer_colors: Array,
                      layer_alphas: Array,
                      layer_albedos: Optional[Array] = None) -> Array:
    """Front-to-back composite of shaded transparent layers over the opaque
    frame (ApplyOITAttenuation analogue).

    layer_colors (K, H, W, 3) premultipliable radiance; layer_alphas (K, H, W, 1).
    layer_albedos (K, H, W, 3) optional unshaded base colors of the kept
    layers — used to scale the tail color to local lighting (see below).
    Layers behind the opaque depth are rejected (z-test vs opaque)."""
    k = layers.depth.shape[0]
    out = jnp.zeros_like(opaque_color)
    transmittance = jnp.ones_like(layer_alphas[0])
    csum = jnp.zeros_like(opaque_color)
    asum = jnp.zeros_like(layer_alphas[0])
    albsum = jnp.zeros_like(opaque_color)
    for i in range(k):
        valid = ((layers.tri_id[i] >= 0)
                 & (layers.depth[i] <= opaque_depth))[..., None]
        a = jnp.where(valid, layer_alphas[i], 0.0)
        out = out + transmittance * a * layer_colors[i]
        transmittance = transmittance * (1.0 - a)
        csum = csum + a * layer_colors[i]
        asum = asum + a
        if layer_albedos is not None:
            albsum = albsum + a * layer_albedos[i]
    # OIT.fxh tail semantics: fragments past K attenuate what is behind and
    # add radiance from the tail average.  The reference shades tail
    # fragments fully in the forward pass (RenderPBR.psh:412-414; the RGBA8
    # tail holds count+transmittance) — here the tail carries the dropped
    # fragments' UNSHADED base color (tail_color), so scale it by the kept
    # layers' shaded/albedo luminance ratio to track local lighting instead
    # of assuming ~unit light intensity (ADVICE r3).  Overflow implies all K
    # slots were occupied, so kept-layer statistics exist wherever the tail
    # is non-zero.
    if layers.tail_alpha is not None:
        ta = layers.tail_alpha[..., None]
        if layers.tail_color is not None:
            tail_color = layers.tail_color
            if layer_albedos is not None:
                lum = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)
                shade_l = jnp.sum(csum * lum, axis=-1, keepdims=True)
                alb_l = jnp.sum(albsum * lum, axis=-1, keepdims=True)
                ratio = shade_l / jnp.maximum(alb_l, 1e-6)
                tail_color = tail_color * jnp.where(asum > 1e-6, ratio, 1.0)
        else:
            tail_color = csum / jnp.maximum(asum, 1e-6)
            any_kept = asum > 1e-6
            ta = jnp.where(any_kept, ta, 0.0)
        out = out + transmittance * ta * tail_color
        transmittance = transmittance * (1.0 - ta)
    return out + transmittance * opaque_color
