"""Forward PBR renderer — the analogue of PBR_Renderer + GLTF_PBR_Renderer
(PBR/interface/PBR_Renderer.hpp:51, GLTF_PBR_Renderer.hpp:47).

TPU-first architecture (vs the reference's per-draw hot loop,
GLTF_PBR_Renderer.cpp:606-784):

  * The whole scene is packed into one "mega draw": a single vertex/index soup
    with per-vertex node ids and per-triangle material ids.  There is no
    per-primitive loop, no PSO binding, no SRB commit — a frame is ONE traced
    XLA program: node-matrix gather + batched vertex transform (MXU) →
    rasterize (visibility buffer) → per-pixel material gather → vectorized
    BRDF/IBL shading → tone map.
  * The PSO cache becomes the jit cache: `RenderInfo`-style static options
    (PSOKey / PSOFlags, config.py) select Python branches, so each used
    combination traces one executable — the analogue of
    PBR_Renderer::GetPSO (PBR_Renderer.cpp:2173).
  * Material/per-primitive constant buffers become stacked attrib pytrees
    indexed by the per-pixel material id (the analogue of
    WritePBRMaterialShaderAttribs, GLTF_PBR_Renderer.cpp:742-770).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (
    CameraAttribs, PBRLightAttribs, PBRMaterialBasicAttribs,
    PBRRendererShaderParameters, stack_materials)
from diligentfx_tpu.config import (
    AlphaMode, DebugViewType, PBRRendererCreateInfo, PSOFlags, RasterizerConfig)
from diligentfx_tpu.gltf.primitives import MeshData
from diligentfx_tpu.ops import raster as rz
from diligentfx_tpu.ops.sampling import sample_env_oct
from diligentfx_tpu.pbr import shading as sh
from diligentfx_tpu.pbr.ibl import precompute_ibl_maps
from diligentfx_tpu.postfx.tonemap import ToneMappingAttribs, tone_map
from diligentfx_tpu.config import ToneMappingMode

Array = jax.Array


class ScenePrimitives(NamedTuple):
    """Device-resident packed scene — the analogue of the committed geometry
    pool + render lists (HnGeometryPool include:66, GLTF_PBR_Renderer render
    lists cpp:565-586), fully merged for SPMD."""
    positions: Array       # (V, 3) object space
    normals: Array         # (V, 3)
    uvs: Array             # (V, 2)
    tangents: Array        # (V, 4)
    indices: Array         # (T, 3) int32
    vertex_node: Array     # (V,) int32 node index per vertex
    tri_material: Array    # (T,) int32 material index per triangle
    tri_double_sided: Array  # (T,) bool
    node_matrices: Array   # (N, 4, 4) current world transforms
    prev_node_matrices: Array  # (N, 4, 4) previous frame (motion vectors)
    materials: PBRMaterialBasicAttribs  # stacked, leading dim = materials
    # Per-material texture bindings (PBRMaterialTextureAttribs analogue),
    # slot order: [base_color, normal, phys_desc, emissive, occlusion].
    # None when the scene is untextured (factors only).
    tex_ids: Array = None          # (M, 5) int32, -1 = unbound
    tex_uv_transform: Array = None  # (M, 5, 6) = 2x2 scale-rotation + bias
    tex_wraps: Array = None        # (M, 5, 2) int32 wrap u/v
    # Stacked material-extension attribs (PBR_Structures.fxh:185-239);
    # None disables the corresponding shading layer statically (the analogue
    # of the ENABLE_* shader macros).
    materials_sheen: object = None         # PBRMaterialSheenAttribs stacked
    materials_anisotropy: object = None    # PBRMaterialAnisotropyAttribs
    materials_iridescence: object = None   # PBRMaterialIridescenceAttribs
    materials_transmission: object = None  # PBRMaterialTransmissionAttribs
    materials_volume: object = None        # PBRMaterialVolumeAttribs
    # ALPHA_MODE_BLEND geometry, rendered through K-layer OIT (pbr/oit.py);
    # None when the scene has no transparency.
    blend_indices: Array = None            # (Tb, 3) int32
    blend_tri_material: Array = None       # (Tb,) int32
    # ALPHA_MODE_MASK geometry (GLTF_PBR_Renderer alpha-cutoff PSOs).
    # Invariant: these triangles are the TAIL of `indices` — the opaque
    # raster uses indices[:T-Tm] and the masked tail rasterizes through a
    # K-layer pass with per-fragment alpha test (pbr/oit.py
    # resolve_alpha_mask), then depth-merges into the visibility buffer.
    mask_indices: Array = None             # (Tm, 3) int32 == indices[-Tm:]
    # Skinning (WriteSkinningData / HnSkinningComputation analogue).
    # joint_matrices are world-space skin matrices (jointWorld @ inverseBind
    # pre-multiplied on host); prev_* double-buffers them for motion vectors.
    joints: Array = None                   # (V, 4) int32, -1 = unskinned vertex
    weights: Array = None                  # (V, 4) f32
    joint_matrices: Array = None           # (J, 4, 4)
    prev_joint_matrices: Array = None      # (J, 4, 4)

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]


def build_scene(meshes: Sequence[Tuple[MeshData, np.ndarray, PBRMaterialBasicAttribs]],
                double_sided_flags: Optional[Sequence[bool]] = None) -> ScenePrimitives:
    """Pack (mesh, node_matrix, material) tuples into one ScenePrimitives."""
    pos, nrm, uv, tan, idx = [], [], [], [], []
    vnode, tmat, tds = [], [], []
    mats, nodes = [], []
    v_off = 0
    for i, (mesh, node, mat) in enumerate(meshes):
        pos.append(mesh.positions)
        nrm.append(mesh.normals)
        uv.append(mesh.uvs)
        tan.append(mesh.tangents)
        idx.append(mesh.indices + v_off)
        nv = mesh.positions.shape[0]
        nt = mesh.indices.shape[0]
        vnode.append(np.full(nv, i, np.int32))
        tmat.append(np.full(nt, i, np.int32))
        ds = double_sided_flags[i] if double_sided_flags else False
        tds.append(np.full(nt, ds, bool))
        nodes.append(np.asarray(node, np.float32))
        mats.append(mat)
        v_off += nv
    node_m = jnp.asarray(np.stack(nodes))
    idx_np = np.concatenate(idx)
    tmat_np = np.concatenate(tmat)
    tds_np = np.concatenate(tds)
    # ALPHA_MODE_MASK triangles move to the tail so the opaque raster can
    # exclude them with a static slice (see ScenePrimitives.mask_indices).
    is_mask = np.array([int(m.alpha_mode) == 1 for m in mats])[tmat_np]
    mask_idx = None
    if is_mask.any():
        order = np.argsort(is_mask, kind="stable")
        idx_np, tmat_np, tds_np = idx_np[order], tmat_np[order], tds_np[order]
        mask_idx = jnp.asarray(idx_np[-int(is_mask.sum()):])
    return ScenePrimitives(
        positions=jnp.asarray(np.concatenate(pos)),
        normals=jnp.asarray(np.concatenate(nrm)),
        uvs=jnp.asarray(np.concatenate(uv)),
        tangents=jnp.asarray(np.concatenate(tan)),
        indices=jnp.asarray(idx_np),
        vertex_node=jnp.asarray(np.concatenate(vnode)),
        tri_material=jnp.asarray(tmat_np),
        tri_double_sided=jnp.asarray(tds_np),
        mask_indices=mask_idx,
        node_matrices=node_m,
        prev_node_matrices=node_m,
        materials=stack_materials(mats),
    )


class RenderInfo(NamedTuple):
    """Dynamic per-frame inputs (the analogue of GLTF_PBR_Renderer::RenderInfo,
    GLTF_PBR_Renderer.hpp:71-105, + the frame constant buffer)."""
    camera: CameraAttribs
    lights: PBRLightAttribs
    renderer_params: PBRRendererShaderParameters
    model_transform: Array = None  # (4,4) optional extra scene transform
    # Cascaded-shadow inputs for the first shadow-casting light
    # (PBRShadowMapInfo analogue); None disables shadows.
    shadow_attribs: object = None       # components.shadow_map_manager.ShadowMapAttribs
    shadow_maps: Array = None           # (C, S, S) depth
    shadow_moments: Array = None        # (C, S, S, M) for VSM/EVSM modes
    # Per-light spot/point shadow slices (HnLight shadow atlas analogue;
    # see shadow_map_manager.render_light_shadow_maps). Layout follows the
    # static `light_shadow_kinds` tuple: 1 slice per spot, 6 per point.
    light_shadow_maps: Array = None        # (K, S, S) depth
    light_shadow_view_projs: Array = None  # (K, 4, 4)
    # Previous frame's (unjittered) view-proj for motion vectors.
    prev_view_proj: Array = None


def transform_vertices(scene: ScenePrimitives, model: Optional[Array] = None,
                       previous: bool = False):
    """Vertex stage: gather node matrix per vertex + batched transform.
    With skinning data present, blends 4 joint matrices per vertex
    (RenderPBR.vsh skinning incl. prev-frame matrices for motion vectors).
    Returns (world_pos (V,3), world_normal (V,3), world_tangent (V,3))."""
    mats = scene.prev_node_matrices if previous else scene.node_matrices
    if model is not None:
        mats = jnp.einsum("nij,jk->nik", mats, model,
                          precision=jax.lax.Precision.HIGHEST)
    # gather node matrices as aligned (N, 16) rows (row gathers are ~10x
    # cheaper than strided (4,4) gathers — PERF_NOTES.md)
    vm = mats.reshape(-1, 16)[scene.vertex_node].reshape(-1, 4, 4)  # (V, 4, 4)
    if scene.joints is not None:
        jm = (scene.prev_joint_matrices if previous and
              scene.prev_joint_matrices is not None
              else scene.joint_matrices)                          # (J, 4, 4)
        jidx = jnp.maximum(scene.joints, 0)                       # (V, 4)
        jw = scene.weights                                        # (V, 4)
        skin_m = jnp.einsum("vk,vkij->vij", jw, jm[jidx],
                            precision=jax.lax.Precision.HIGHEST)  # (V, 4, 4)
        skinned = jnp.sum(jw, axis=-1, keepdims=True) > 1e-6
        vm = jnp.where(skinned[..., None], skin_m, vm)
    p4 = jnp.concatenate([scene.positions, jnp.ones_like(scene.positions[:, :1])], -1)
    world = jnp.einsum("vi,vij->vj", p4, vm, precision=jax.lax.Precision.HIGHEST)[:, :3]
    # normals: inverse-transpose; for rigid+uniform-scale transforms the 3x3
    # works directly with renormalization (matches RenderPBR.vsh behavior).
    n3 = jnp.einsum("vi,vij->vj", scene.normals, vm[:, :3, :3],
                    precision=jax.lax.Precision.HIGHEST)
    t3 = jnp.einsum("vi,vij->vj", scene.tangents[:, :3], vm[:, :3, :3],
                    precision=jax.lax.Precision.HIGHEST)
    return world, m3.normalize(n3), m3.normalize(t3)


class PBRRenderer:
    """Owns precomputed IBL resources + default env; renders ScenePrimitives.

    The analogue of PBR_Renderer construction (BRDF LUT at ctor,
    PBR_Renderer.cpp:548) + PrecomputeCubemaps (cpp:729) + GLTF render loop.
    """

    def __init__(self, ci: PBRRendererCreateInfo = PBRRendererCreateInfo(),
                 env_oct: Optional[Array] = None,
                 raster_cfg: RasterizerConfig = RasterizerConfig(),
                 ibl_cache_dir: Optional[str] = None):
        self.ci = ci
        self.raster_cfg = raster_cfg
        if env_oct is None:
            # Default gradient sky (replaces CreateDefaultTextures / white env)
            from diligentfx_tpu.ops.sampling import oct_pixel_dirs
            d = oct_pixel_dirs(128)
            sky = jnp.array([0.35, 0.5, 0.85])
            ground = jnp.array([0.18, 0.16, 0.14])
            t = (d[..., 1:2] * 0.5 + 0.5)
            env_oct = ground + (sky - ground) * t
        self.env_oct = env_oct
        if ci.enable_ibl:
            cache_path = None
            if ibl_cache_dir:
                from diligentfx_tpu.utils.cache import (ibl_cache_key,
                                                        load_ibl_maps)
                import os as _os
                cache_path = _os.path.join(
                    ibl_cache_dir, f"ibl_{ibl_cache_key(env_oct, ci)}.npz")
                cached = load_ibl_maps(cache_path)
                if cached is not None:
                    self.ibl_maps = cached
                    return
            self.ibl_maps = precompute_ibl_maps(
                env_oct,
                brdf_lut_dim=ci.brdf_lut_dim,
                num_brdf_samples=ci.num_brdf_samples,
                irradiance_dim=ci.irradiance_cube_dim,
                prefiltered_dim=ci.prefiltered_env_map_dim,
                num_spec_samples=ci.num_specular_env_samples)
            if cache_path:
                from diligentfx_tpu.utils.cache import save_ibl_maps
                save_ibl_maps(cache_path, self.ibl_maps)
        else:
            self.ibl_maps = None

    # -- frame ---------------------------------------------------------------

    def render(self, scene: ScenePrimitives, info: RenderInfo, *,
               width: int, height: int,
               flags: PSOFlags = None,
               debug_view: DebugViewType = DebugViewType.NONE,
               tone_mapping_mode: ToneMappingMode = ToneMappingMode.UNCHARTED2,
               convert_output_to_srgb: bool = True,
               shadow_mode: "ShadowMode" = None) -> Array:
        """Render one frame → (height, width, 3).  Static args select the
        traced variant (jit/PSO-cache analogue)."""
        if flags is None:
            flags = PSOFlags.DEFAULT()
        use_shadows = bool(self.ci.enable_shadows
                           and info.shadow_attribs is not None)
        from diligentfx_tpu.config import ShadowMode as SM
        return _render_frame(
            scene, info, self.ibl_maps, self.env_oct,
            width=width, height=height, cfg=self.raster_cfg,
            use_ibl=bool(self.ci.enable_ibl and (PSOFlags.USE_IBL in flags)),
            use_lights=bool(PSOFlags.USE_LIGHTS in flags),
            debug_view=debug_view,
            tone_mapping_mode=(tone_mapping_mode
                               if PSOFlags.ENABLE_TONE_MAPPING in flags
                               else ToneMappingMode.NONE),
            convert_output_to_srgb=convert_output_to_srgb,
            shadow_mode=(shadow_mode or SM.PCF) if use_shadows else None,
            pcf_kernel_size=self.ci.pcf_kernel_size,
        )


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "cfg", "use_ibl", "use_lights", "debug_view",
    "tone_mapping_mode", "convert_output_to_srgb", "shadow_mode",
    "pcf_kernel_size", "fuse"))
def _render_frame(scene: ScenePrimitives, info: RenderInfo, ibl_maps, env_oct,
                  *, width: int, height: int, cfg: RasterizerConfig,
                  use_ibl: bool, use_lights: bool, debug_view: DebugViewType,
                  tone_mapping_mode: ToneMappingMode,
                  convert_output_to_srgb: bool,
                  shadow_mode=None, pcf_kernel_size: int = 3,
                  fuse: str = "auto") -> Array:
    pad_w, pad_h = rz.pad_viewport(width, height, cfg)

    # ---- vertex stage -------------------------------------------------------
    world_pos, world_nrm, world_tan = transform_vertices(scene, info.model_transform)
    clip = m3.transform_points(world_pos, info.camera.view_proj)

    # ---- rasterize (opaque prefix; ALPHA_MODE_MASK tail resolves after) -----
    n_op = scene.indices.shape[0] - (
        scene.mask_indices.shape[0] if scene.mask_indices is not None else 0)
    winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
    packed_attrs = jnp.concatenate([world_pos, world_nrm], axis=-1)
    fused_ok = (fuse == "on" or (fuse == "auto"
                                 and jax.default_backend() == "tpu"
                                 and scene.mask_indices is None))
    if fused_ok:
        # fused raster + interpolation + material fetch (one Pallas kernel;
        # kills the per-pixel attribute/material gathers — PERF_NOTES.md)
        from diligentfx_tpu.pbr.deferred import _material_table
        consts = scene.tri_material[:n_op].astype(jnp.float32)[:, None]
        vb, fused_cx, _stats = rz.rasterize_fused(
            clip, scene.indices[:n_op], packed_attrs, winv, consts,
            _material_table(scene.materials).T,
            width=pad_w, height=pad_h, cfg=cfg, n_ch=6,
            double_sided=scene.tri_double_sided[:n_op])
        hit = vb.tri_id >= 0
        hm = hit[..., None]

        # fused_cx is channel-FIRST (C, H, W); stack only the small groups
        # needed (channel-last kernel output forced a multi-second XLA
        # relayout, PERF_NOTES.md), masking misses like interpolate_all does
        def grp(a, b, o=0):
            g = jnp.stack([fused_cx[c] for c in range(o + a, o + b)], -1)
            return jnp.where(hm, g, 0.0)

        interp = grp(0, 6)
        m0 = 7                                       # after the 1 const
        base_color = grp(0, 3, m0)
        emissive = grp(4, 7, m0)
        metallic = grp(7, 8, m0)
        roughness = grp(8, 9, m0)
    else:
        vb, _stats = rz.rasterize(clip, scene.indices[:n_op],
                                  width=pad_w, height=pad_h, cfg=cfg,
                                  double_sided=scene.tri_double_sided[:n_op])
        if scene.mask_indices is not None:
            from diligentfx_tpu.pbr.oit import resolve_alpha_mask
            vb = resolve_alpha_mask(vb, clip, scene, winv,
                                    width=pad_w, height=pad_h, cfg=cfg)
        # ---- interpolate G-buffer inputs (single fused gather) --------------
        interp = rz.interpolate_all(vb, scene.indices, packed_attrs, winv)
        hit = vb.tri_id >= 0
        # ---- per-pixel material ---------------------------------------------
        tid = jnp.maximum(vb.tri_id, 0)
        mat_id = scene.tri_material[tid]                        # (H, W)
        mats = scene.materials
        base_color = mats.base_color_factor[mat_id][..., :3]    # (H, W, 3)
        metallic = mats.metallic_factor[mat_id][..., None]
        roughness = mats.roughness_factor[mat_id][..., None]
        emissive = mats.emissive_factor[mat_id]
    pos_px = interp[..., 0:3]
    nrm_px = m3.normalize(interp[..., 3:6])
    occlusion = jnp.ones_like(metallic)

    # ---- shading ------------------------------------------------------------
    view = m3.normalize(info.camera.position - pos_px)
    srf = sh.get_surface_reflectance_mr(base_color, metallic, roughness)
    ndotv = jnp.clip(m3.dot(nrm_px, view), 0.0, 1.0)
    shading = sh.SurfaceShadingInfo(
        pos=pos_px, view=view, occlusion=occlusion,
        emissive=emissive * info.renderer_params.emission_scale,
        base=sh.BaseLayerShadingInfo(srf=srf, metallic=metallic,
                                     normal=nrm_px, ndotv=ndotv),
        ibl_scale=info.renderer_params.ibl_scale[:3],
    )
    lighting = sh.default_lighting(pos_px)
    if use_lights:
        shadow_factors = None
        if shadow_mode is not None:
            # Cascaded shadow factor for the first shadow-casting light
            # (the analogue of inline FilterShadowMapFixedPCF at
            # PBR_Shading.fxh:646-668, run as a vectorized pass).
            from diligentfx_tpu.components.shadow_map_manager import (
                sample_cascaded_shadows)
            cam_view_z = -m3.transform_points(pos_px, info.camera.view)[..., 2]
            factor = sample_cascaded_shadows(
                pos_px, cam_view_z, info.shadow_attribs, info.shadow_maps,
                mode=shadow_mode, pcf_kernel_size=pcf_kernel_size,
                moments=info.shadow_moments)
            n_lights = info.lights.count
            ones = jnp.ones_like(factor)
            shadow_factors = jnp.stack(
                [jnp.where(info.lights.shadow_map_index[i] >= 0, factor, ones)
                 for i in range(n_lights)], axis=0)
        lighting = sh.apply_punctual_lights(shading, info.lights, lighting,
                                            shadow_factors=shadow_factors)
    if use_ibl and ibl_maps is not None:
        lighting = sh.apply_ibl(shading, ibl_maps, lighting)
    color = sh.resolve_lighting(shading, lighting)

    # ---- background: env map along the view ray (EnvMapRenderer analogue) ---
    ray = _camera_rays(info.camera, pad_w, pad_h)
    bg = sample_env_oct([env_oct], ray, jnp.zeros(ray.shape[:-1]))
    color = jnp.where(hit[..., None], color, bg)

    # ---- debug views (RenderPBR.psh:574-613) --------------------------------
    if debug_view != DebugViewType.NONE:
        color = _debug_color(debug_view, vb, base_color, metallic, roughness,
                             nrm_px, ndotv, emissive, srf, lighting, color)
        return color[:height, :width]

    # ---- tone map + sRGB (RenderPBR.psh:530-542, :639-643) ------------------
    if tone_mapping_mode != ToneMappingMode.NONE:
        color = tone_map(color, tone_mapping_mode, ToneMappingAttribs(
            middle_gray=info.renderer_params.middle_gray,
            white_point=info.renderer_params.white_point),
            ave_log_lum=info.renderer_params.average_log_lum)
    if convert_output_to_srgb:
        color = m3.linear_to_srgb(color)
    return color[:height, :width]


def _camera_rays(camera: CameraAttribs, width: int, height: int,
                 row0=None, band_h: Optional[int] = None) -> Array:
    """World-space view ray per pixel (for env background / SSR).
    row0/band_h restrict to a horizontal band of a `height`-tall frame
    (row0 may be a traced scalar — banded G-buffer shading)."""
    x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    rows = jnp.arange(band_h if band_h is not None else height,
                      dtype=jnp.float32)
    if row0 is not None:
        rows = rows + jnp.asarray(row0, jnp.float32)
    y = 1.0 - (rows + 0.5) / height * 2.0
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    ndc = jnp.stack([xx, yy, jnp.full_like(xx, 0.5), jnp.ones_like(xx)], axis=-1)
    world = jnp.einsum("hwi,ij->hwj", ndc, camera.view_proj_inv,
                       precision=jax.lax.Precision.HIGHEST)
    world = world[..., :3] / world[..., 3:4]
    return m3.normalize(world - camera.position)


def _debug_color(view: DebugViewType, vb, base_color, metallic, roughness,
                 normal, ndotv, emissive, srf, lighting, color):
    ones3 = jnp.ones_like(base_color)
    if view == DebugViewType.BASE_COLOR:
        out = base_color
    elif view == DebugViewType.METALLIC:
        out = metallic * ones3
    elif view == DebugViewType.ROUGHNESS:
        out = roughness * ones3
    elif view == DebugViewType.DIFFUSE_COLOR:
        out = srf.diffuse_color
    elif view == DebugViewType.SPECULAR_COLOR:
        out = srf.reflectance0
    elif view == DebugViewType.REFLECTANCE90:
        out = srf.reflectance90
    elif view == DebugViewType.SHADING_NORMAL:
        out = normal * 0.5 + 0.5
    elif view == DebugViewType.NDOTV:
        out = ndotv * ones3
    elif view == DebugViewType.PUNCTUAL_LIGHTING:
        out = lighting.base.punctual
    elif view == DebugViewType.DIFFUSE_IBL:
        out = lighting.base.diffuse_ibl
    elif view == DebugViewType.SPECULAR_IBL:
        out = lighting.base.specular_ibl
    elif view == DebugViewType.EMISSIVE:
        out = emissive
    elif view == DebugViewType.SCENE_DEPTH:
        d = jnp.where(vb.tri_id >= 0, vb.depth, 1.0)
        out = d[..., None] * ones3
    else:
        out = color
    return jnp.where((vb.tri_id >= 0)[..., None], out, 0.0)
