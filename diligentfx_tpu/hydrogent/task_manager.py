"""Frame task graph — the analogue of Hydrogent's HnTaskManager
(interface/Tasks/HnTaskManager.hpp:53-158) + HnPostProcessTask
(src/Tasks/HnPostProcessTask.cpp:743-943).

Task mapping (reference task UID → here):
  BeginFrame            → jittered camera + frame constants (this fn)
  RenderShadows         → cascade distribution + depth passes
  BeginMainPass/RenderRprims(Default/Masked) → render_gbuffer (one mega pass;
                          alpha-mode ordering is irrelevant in a visibility
                          buffer — masked/blend handled by OIT, see oit.py)
  RenderEnvMap          → G-buffer background layer
  ComputeDepthBounds    → components/depth_range.py
  ReadRprimId           → the mesh_id AOV (picking = array indexing; the
                          GPU→CPU readback boundary becomes device_get)
  ProcessSelection      → components/selection.py (jump flood)
  PostProcess           → PostFXContext + SSAO + SSR + composite + TAA +
                          DoF + Bloom + tone map (this fn)

Deviation from the reference, by design: tone mapping runs AFTER bloom on HDR
radiance (the reference blooms after tone mapping in the LDR jittered chain,
HnPostProcessTask.cpp:911-925) — bloom on HDR is strictly more correct and
costs nothing here since the whole frame is one fused XLA program.

The whole frame is one jit: `FrameState` carries all temporal history.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.config import (DebugViewType, RasterizerConfig,
                                   ShadowMode, ToneMappingMode)
from diligentfx_tpu.pbr.deferred import GBufferData, render_gbuffer
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, ScenePrimitives
from diligentfx_tpu.postfx import bloom as fx_bloom
from diligentfx_tpu.postfx import dof as fx_dof
from diligentfx_tpu.postfx import ssao as fx_ssao
from diligentfx_tpu.postfx import ssr as fx_ssr
from diligentfx_tpu.postfx import taa as fx_taa
from diligentfx_tpu.postfx.context import (apply_jitter_to_proj,
                                           dilate_closest_motion,
                                           jitter_to_ndc, taa_jitter_sequence)
from diligentfx_tpu.postfx.tonemap import ToneMappingAttribs, tone_map

Array = jax.Array


@dataclass(frozen=True)
class TaskManagerCreateInfo:
    """Static pipeline configuration (the enable/disable task switches of
    HnTaskManager + HnPostProcessTask params)."""
    enable_shadows: bool = False
    shadow_mode: ShadowMode = ShadowMode.PCF
    num_cascades: int = 4
    shadow_map_size: int = 1024
    enable_ssao: bool = True
    ssao_half_resolution: bool = True
    enable_ssr: bool = True
    ssr_half_resolution: bool = False
    ssr_resolution_divisor: int = 0  # 0 = derive from half_resolution
    enable_taa: bool = True
    enable_dof: bool = False
    enable_bloom: bool = True
    tone_mapping_mode: ToneMappingMode = ToneMappingMode.UNCHARTED2
    convert_output_to_srgb: bool = True
    ssr_scale: float = 1.0
    ssao_scale: float = 1.0
    oit_layer_count: int = 4   # K layers for ALPHA_MODE_BLEND geometry
    # quality/perf knobs (gathers are the TPU cost unit — see PERF_NOTES.md)
    taa_feature_flags: int = (fx_taa.TAAFeatureFlags.BICUBIC_FILTER
                              | fx_taa.TAAFeatureFlags.YCOCG_COLOR_SPACE
                              | fx_taa.TAAFeatureFlags.GAUSSIAN_WEIGHTING)
    ssao_num_slices: int = 3
    ssao_num_steps: int = 6
    ssao_use_pallas: bool = False   # gather-free tap path (TPU only)
    ssr_use_pallas: bool = False    # VMEM-resident coarse march (TPU only)
    # SSR interior passes (profiling/quality knobs; reference always runs
    # spatial reconstruction + bilateral, ScreenSpaceReflection.hpp:145-154)
    ssr_enable_spatial: bool = True
    ssr_enable_bilateral: bool = True
    # profiling bisect: truncate the SSR graph after {setup, march, taps}
    # and fabricate the rest (postfx/ssr.py _fabricate).  "" = off.
    ssr_stage_cut: str = ""
    # march row-sweep lowering: "dyn" (bounded fori_loop) | "static" |
    # "unroll" (ops/march_pallas.py _march_kernel)
    ssr_march_sweep: str = "dyn"
    fast_env_taps: bool = False     # nearest-mip env + point LUT sampling
    dof_use_pallas: bool = False    # gather-free bokeh taps (TPU only)
    # Debug AOV output (HN_VIEW_MODE_* analogue, HnTypes.hpp:76+): when not
    # NONE the frame output is the selected AOV visualization.
    view_mode: DebugViewType = DebugViewType.NONE
    # Epipolar light scattering (HnPostProcessTask's scattering stage)
    enable_light_scattering: bool = False
    epipolar_slices: int = 256
    epipolar_samples: int = 128
    epipolar_march_steps: int = 24
    # round-4 quality/perf features (default-off; measured in PERF_NOTES r5)
    epipolar_use_minmax_tree: bool = False
    epipolar_refinement_factor: int = 1
    # single-scattering LUT fast mode (SINGLE_SCTR_MODE_LUT analogue)
    epipolar_single_sctr_lut: bool = False
    # Auto-exposure (average-log-luminance measurement + temporal adaptation,
    # the UpdateAverageLuminance analogue)
    enable_auto_exposure: bool = False
    exposure_adaptation_rate: float = 0.05
    # ---- task switches for the remaining HnTaskManager task UIDs
    # (HnTaskManager.hpp:57-78) ------------------------------------------------
    # ProcessSelection (jump-flood outline) + unselected desaturation in the
    # composite (HnPostProcessTask.cpp:834-869); selection ids arrive per
    # frame in FrameSettings.selected_ids
    enable_selection: bool = False
    selection_outline_width: float = 3.0
    desaturation_factor: float = 0.5
    # CoordinateGrid composite term (HnPostProcess.psh grid)
    enable_grid: bool = False
    # RenderBoundBox task (bound box arrives in FrameSettings.bound_box)
    enable_bound_box: bool = False
    # Motion-vector field overlay (HnPostProcessTask.cpp:928-943)
    enable_vector_field: bool = False
    # ComputeDepthBounds task: FrameOutput.depth_range feeds the next
    # frame's cascade fitting (AdjustCascadeRange, ShadowMapManager.cpp)
    enable_depth_bounds: bool = False
    # Emit every G-buffer AOV in FrameOutput.gbuffer (the full
    # HnFrameRenderTargets set).  When False, only the products an
    # interactive app reads back survive (color, depth, mesh id for picking,
    # motion) — the shading-only AOVs die inside the one-program frame and
    # their output materialization cost disappears.  The reference
    # analogue: a Hydra app requests only the AOV Bprims it binds.
    emit_aovs: bool = True
    # Profiling/ablation switch: disable punctual-light evaluation in the
    # G-buffer (in-frame delta attribution; not a production knob)
    use_lights: bool = True
    # Profiling/ablation switch: skip ALL interpolation/material/shading and
    # emit a visibility-only G-buffer (raster + binning cost in isolation)
    vis_only: bool = False


class BoundBoxParams(NamedTuple):
    """Per-frame bound box (HnRenderBoundBoxTask input)."""
    box_min: Array
    box_max: Array
    transform: Optional[Array] = None


class FrameSettings(NamedTuple):
    """Dynamic per-frame effect parameters."""
    ssr: fx_ssr.SSRSettings = fx_ssr.SSRSettings()
    ssao: fx_ssao.SSAOSettings = fx_ssao.SSAOSettings()
    taa: fx_taa.TAASettings = fx_taa.TAASettings()
    dof: fx_dof.DoFSettings = fx_dof.DoFSettings()
    bloom: fx_bloom.BloomSettings = fx_bloom.BloomSettings()
    tone_mapping: ToneMappingAttribs = ToneMappingAttribs()
    # selected prim (node) ids, -1 padded (ProcessSelection input); requires
    # ci.enable_selection
    selected_ids: Optional[Array] = None
    # bound box to draw (requires ci.enable_bound_box)
    bound_box: Optional[BoundBoxParams] = None


class FrameState(NamedTuple):
    """Temporal history carried between frames (the history Bprims)."""
    frame_index: Array
    prev_view_proj: Array
    taa: Optional[fx_taa.TAAState] = None
    ssr: Optional[fx_ssr.SSRState] = None
    ssao: Optional[fx_ssao.SSAOState] = None
    dof: Optional[fx_dof.DoFState] = None
    average_log_lum: Optional[Array] = None   # () adapted exposure
    # previous-frame depth buffer (PostFXContext prev/reprojected depth
    # products, hpp:178-188) — drives history disocclusion for SSR/SSAO/TAA
    prev_depth: Optional[Array] = None


class FrameOutput(NamedTuple):
    color: Array          # (H, W, 3) final
    gbuffer: GBufferData  # all AOVs (incl. mesh_id for picking)
    state: FrameState
    # ComputeDepthBounds product (when ci.enable_depth_bounds): feed into
    # shadow_map_manager.adjust_cascade_range for next-frame cascade fitting
    depth_range: Optional["DepthRange"] = None


class FrameBegin(NamedTuple):
    """Typed seam between the G-buffer program and the effects program
    (execute_split's first boundary) — shared by execute/execute_split/banded
    so the three paths cannot drift (stringly-typed dicts did, VERDICT r3)."""
    gb: GBufferData
    info: RenderInfo
    first_frame: Array


class FrameFx(NamedTuple):
    """Typed seam between the screen-space-effects program and the temporal
    + tonemap program (execute_split's second boundary)."""
    color: Array
    gb: GBufferData
    ao: Array
    info: RenderInfo
    resources: object               # PostFXResources
    first_frame: Array
    new_ssao: Optional[object] = None
    new_ssr: Optional[object] = None
    new_exposure: Optional[Array] = None
    disocclusion: Optional[Array] = None
    depth_range: Optional[object] = None


class HnTaskManager:
    """Owns the renderer + pipeline config; `execute` runs one frame
    (the analogue of HdEngine::Execute over GetTasks())."""

    def __init__(self, renderer: PBRRenderer,
                 ci: TaskManagerCreateInfo = TaskManagerCreateInfo(),
                 atlas=None):
        self.renderer = renderer
        self.ci = ci
        self.atlas = atlas
        self.jitter_seq = taa_jitter_sequence(16)
        self.atmosphere_lut = None
        if ci.enable_light_scattering:
            from diligentfx_tpu.postfx.epipolar import (
                precompute_multiple_scattering_lut,
                precompute_optical_depth_lut)
            od = precompute_optical_depth_lut()
            self.atmosphere_lut = (od, precompute_multiple_scattering_lut(od))

    def initial_state(self, width: int, height: int) -> FrameState:
        z2 = jnp.zeros((height, width, 2), jnp.float32)
        z1 = jnp.zeros((height, width), jnp.float32)
        z3 = jnp.zeros((height, width, 3), jnp.float32)
        return FrameState(
            frame_index=jnp.int32(0),
            prev_view_proj=jnp.eye(4, dtype=jnp.float32),
            taa=fx_taa.TAAState(color=z3, sample_count=z1) if self.ci.enable_taa else None,
            ssr=fx_ssr.SSRState(radiance=jnp.zeros(
                fx_ssr.ssr_state_shape(height, width,
                                       self.ci.ssr_resolution_divisor,
                                       self.ci.ssr_half_resolution) + (4,),
                jnp.float32)) if self.ci.enable_ssr else None,
            ssao=(fx_ssao.SSAOState(history=z1 + 1.0, depth_history=z1 + 1.0)
                  if self.ci.enable_ssao else None),
            dof=fx_dof.DoFState(coc_history=z1) if self.ci.enable_dof else None,
            average_log_lum=(jnp.float32(0.3)
                             if self.ci.enable_auto_exposure else None),
            prev_depth=(z1 + 1.0 if (self.ci.enable_taa or self.ci.enable_ssr
                                     or self.ci.enable_ssao) else None),
        )

    def reset_taa(self, state: FrameState) -> FrameState:
        """HnTaskManager::ResetTAA (HnTaskManager.hpp:248-252): force history
        rejection on the next frame (camera cut / viewport resize) without
        discarding the other temporal products."""
        if state.taa is None:
            return state
        return state._replace(taa=state.taa._replace(
            sample_count=jnp.zeros_like(state.taa.sample_count)))

    def suspend_super_sampling(self, state: FrameState) -> FrameState:
        """HnTaskManager::SuspendSuperSampling: alias of reset_taa — the
        jitter sequence is stateless here, so dropping accumulated samples is
        the entire suspension."""
        return self.reset_taa(state)

    def execute(self, scene: ScenePrimitives, info: RenderInfo,
                state: FrameState, *, width: int, height: int,
                settings: FrameSettings = FrameSettings(),
                light_shadow_kinds: tuple = ()) -> FrameOutput:
        return _execute_frame(
            scene, info, state, self.renderer.ibl_maps, self.renderer.env_oct,
            self.jitter_seq, settings, self.atlas, self.atmosphere_lut,
            width=width, height=height, cfg=self.renderer.raster_cfg, ci=self.ci,
            use_ibl=self.renderer.ci.enable_ibl,
            use_textures=self.atlas is not None,
            pcf_kernel_size=self.renderer.ci.pcf_kernel_size,
            enable_clearcoat=self.renderer.ci.enable_clear_coat,
            ssr_steps=int(settings.ssr.max_traversal_intersections),
            light_shadow_kinds=light_shadow_kinds)

    def execute_split(self, scene: ScenePrimitives, info: RenderInfo,
                      state: FrameState, *, width: int, height: int,
                      settings: FrameSettings = FrameSettings(),
                      light_shadow_kinds: tuple = (),
                      gbuffer_bands: int = 1) -> FrameOutput:
        """Same frame as `execute`, compiled as THREE programs (g-buffer,
        screen-space effects, temporal + tonemap).  Use for very large
        framebuffers (4K) where the monolithic program overwhelms the
        compiler; costs two extra HBM round-trips at the seams.
        gbuffer_bands > 1 additionally shades the G-buffer in row bands
        through one reusable band program (render_gbuffer_banded) — the 4K
        shading graph is itself too large to compile as one unit."""
        if gbuffer_bands > 1:
            from diligentfx_tpu.pbr.deferred import render_gbuffer_banded
            info2, first_frame, shadow_mode = _begin_camera(
                info, state, self.jitter_seq, self.ci, width, height)
            gb = render_gbuffer_banded(
                scene, info2, self.renderer.ibl_maps, self.renderer.env_oct,
                width=width, height=height, cfg=self.renderer.raster_cfg,
                bands=gbuffer_bands, use_ibl=self.renderer.ci.enable_ibl,
                use_lights=True, shadow_mode=shadow_mode,
                pcf_kernel_size=self.renderer.ci.pcf_kernel_size,
                atlas=self.atlas, use_textures=self.atlas is not None,
                enable_clearcoat=self.renderer.ci.enable_clear_coat,
                fast_env=self.ci.fast_env_taps,
                light_shadow_kinds=light_shadow_kinds)
            begin = FrameBegin(gb=gb, info=info2, first_frame=first_frame)
        else:
            begin = _frame_begin_jit(
                scene, info, state, self.renderer.ibl_maps,
                self.renderer.env_oct, self.jitter_seq, self.atlas,
                width=width, height=height, cfg=self.renderer.raster_cfg,
                ci=self.ci, use_ibl=self.renderer.ci.enable_ibl,
                use_textures=self.atlas is not None,
                pcf_kernel_size=self.renderer.ci.pcf_kernel_size,
                enable_clearcoat=self.renderer.ci.enable_clear_coat,
                light_shadow_kinds=light_shadow_kinds)
        pre = _frame_fx_jit(
            begin, scene, state, self.renderer.ibl_maps, settings,
            self.atmosphere_lut, width=width, height=height,
            cfg=self.renderer.raster_cfg, ci=self.ci,
            use_ibl=self.renderer.ci.enable_ibl,
            ssr_steps=int(settings.ssr.max_traversal_intersections))
        return _frame_post_jit(pre, state, settings, width=width,
                               height=height, ci=self.ci)


_FRAME_STATICS = ("width", "height", "cfg", "ci", "use_ibl", "use_textures",
                  "pcf_kernel_size", "enable_clearcoat", "ssr_steps",
                  "light_shadow_kinds")


@functools.partial(jax.jit, static_argnames=_FRAME_STATICS)
def _execute_frame(scene, info: RenderInfo, state: FrameState, ibl_maps,
                   env_oct, jitter_seq, settings: FrameSettings, atlas,
                   atmosphere_lut, *,
                   width: int, height: int, cfg: RasterizerConfig,
                   ci: TaskManagerCreateInfo, use_ibl: bool,
                   use_textures: bool, pcf_kernel_size: int,
                   enable_clearcoat: bool = False,
                   ssr_steps: int = 48,
                   light_shadow_kinds: tuple = ()) -> FrameOutput:
    pre = _frame_pre(scene, info, state, ibl_maps, env_oct, jitter_seq,
                     settings, atlas, atmosphere_lut, width=width,
                     height=height, cfg=cfg, ci=ci, use_ibl=use_ibl,
                     use_textures=use_textures,
                     pcf_kernel_size=pcf_kernel_size,
                     enable_clearcoat=enable_clearcoat, ssr_steps=ssr_steps,
                     light_shadow_kinds=light_shadow_kinds)
    return _frame_post(pre, state, settings, width=width, height=height,
                       ci=ci)


def _frame_pre(scene, info: RenderInfo, state: FrameState, ibl_maps,
               env_oct, jitter_seq, settings: FrameSettings, atlas,
               atmosphere_lut, *,
               width: int, height: int, cfg: RasterizerConfig,
               ci: TaskManagerCreateInfo, use_ibl: bool,
               use_textures: bool, pcf_kernel_size: int,
               enable_clearcoat: bool = False,
               ssr_steps: int = 48,
               light_shadow_kinds: tuple = ()):
    begin = _frame_begin(scene, info, state, ibl_maps, env_oct, jitter_seq,
                         atlas, width=width, height=height, cfg=cfg, ci=ci,
                         use_ibl=use_ibl, use_textures=use_textures,
                         pcf_kernel_size=pcf_kernel_size,
                         enable_clearcoat=enable_clearcoat,
                         light_shadow_kinds=light_shadow_kinds)
    return _frame_fx(begin, scene, state, ibl_maps, settings, atmosphere_lut,
                     width=width, height=height, cfg=cfg, ci=ci,
                     use_ibl=use_ibl, ssr_steps=ssr_steps)


def _begin_camera(info: RenderInfo, state: FrameState, jitter_seq,
                  ci: TaskManagerCreateInfo, width: int, height: int):
    """BeginFrame: TAA camera jitter + prev view-proj + shadow mode."""
    cam = info.camera
    first_frame = state.frame_index == 0
    if ci.enable_taa:
        j_px = jitter_seq[jnp.mod(state.frame_index, jitter_seq.shape[0])]
        j_ndc = jitter_to_ndc(j_px, width, height)
        proj_j = apply_jitter_to_proj(cam.proj, j_ndc)
        cam_j = CameraAttribs.create(
            cam.view, proj_j, cam.position, cam.near_z, cam.far_z,
            width, height, jitter=j_ndc)
        info = info._replace(camera=cam_j)
    prev_vp = jnp.where(first_frame, info.camera.view_proj,
                        state.prev_view_proj)
    info = info._replace(prev_view_proj=prev_vp)
    shadow_mode = None
    if ci.enable_shadows and info.shadow_attribs is not None:
        shadow_mode = ci.shadow_mode
    return info, first_frame, shadow_mode


def _frame_begin(scene, info: RenderInfo, state: FrameState, ibl_maps,
                 env_oct, jitter_seq, atlas, *,
                 width: int, height: int, cfg: RasterizerConfig,
                 ci: TaskManagerCreateInfo, use_ibl: bool,
                 use_textures: bool, pcf_kernel_size: int,
                 enable_clearcoat: bool = False,
                 light_shadow_kinds: tuple = ()):
    """BeginFrame (TAA jitter) + the G-buffer main pass."""
    info, first_frame, shadow_mode = _begin_camera(info, state, jitter_seq,
                                                   ci, width, height)

    # ---- Main pass: G-buffer -------------------------------------------------
    with jax.named_scope("hn.render_rprims"):
        gb = render_gbuffer(scene, info, ibl_maps, env_oct,
                        width=width, height=height, cfg=cfg,
                        use_ibl=use_ibl, use_lights=ci.use_lights,
                        vis_only=ci.vis_only,
                        shadow_mode=shadow_mode,
                        pcf_kernel_size=pcf_kernel_size,
                        atlas=atlas, use_textures=use_textures,
                        enable_clearcoat=enable_clearcoat,
                        fast_env=ci.fast_env_taps,
                        light_shadow_kinds=light_shadow_kinds,
                        emit_debug=ci.view_mode != DebugViewType.NONE)
    return FrameBegin(gb=gb, info=info, first_frame=first_frame)


def _frame_fx(begin: FrameBegin, scene, state: FrameState, ibl_maps,
              settings: FrameSettings, atmosphere_lut, *,
              width: int, height: int, cfg: RasterizerConfig,
              ci: TaskManagerCreateInfo, use_ibl: bool,
              ssr_steps: int = 48):
    """Screen-space effects + composite + OIT + scattering + exposure."""
    gb, info, first_frame = begin.gb, begin.info, begin.first_frame

    # ---- PostFXContext -------------------------------------------------------
    from diligentfx_tpu.postfx.context import (disocclusion_mask,
                                               prepare_postfx_resources)
    prev_depth = state.prev_depth if state.prev_depth is not None else gb.depth
    resources = prepare_postfx_resources(
        gb.depth, info.camera, info.camera, prev_depth, state.frame_index,
        object_motion=gb.motion)
    # shared history-disocclusion mask (prev-depth vs reprojected depth):
    # one prev-depth tap serves SSR + SSAO + TAA
    disocclusion = None
    if state.prev_depth is not None:
        use_pl = bool(ci.ssao_use_pallas
                      or (ci.taa_feature_flags & fx_taa.TAAFeatureFlags.PALLAS_WARP))
        disocclusion = disocclusion_mask(
            gb.depth, prev_depth, gb.motion, info.camera,
            state.prev_view_proj, use_pallas=use_pl)
        disocclusion = disocclusion | first_frame

    # ---- SSAO ----------------------------------------------------------------
    ao = jnp.ones_like(gb.depth)
    new_ssao = state.ssao
    if ci.enable_ssao:
        ao, new_ssao = fx_ssao.apply_ssao(
            gb.depth, gb.normal_view, info.camera, state.frame_index,
            settings.ssao, state=state.ssao, motion=gb.motion,
            half_resolution=ci.ssao_half_resolution,
            num_slices=ci.ssao_num_slices, num_steps=ci.ssao_num_steps,
            use_pallas=ci.ssao_use_pallas, disocclusion=disocclusion)
        ao = 1.0 - (1.0 - ao) * ci.ssao_scale

    # ---- SSR -----------------------------------------------------------------
    ssr_rad = None
    new_ssr = state.ssr
    if ci.enable_ssr:
        # reflect the currently-lit scene (direct + ambient + background)
        refl_src = jnp.where(
            gb.hit[..., None],
            gb.direct + gb.ambient_diffuse + gb.ambient_specular,
            gb.background)
        ssr_rad, new_ssr = fx_ssr.compute_ssr(
            refl_src, gb.depth, gb.normal_view,
            gb.material_data[..., 1:2], info.camera, state.frame_index,
            settings.ssr._replace(max_traversal_intersections=ssr_steps),
            state=state.ssr, motion=gb.motion,
            half_resolution=ci.ssr_half_resolution,
            resolution_divisor=ci.ssr_resolution_divisor,
            disocclusion=disocclusion, use_pallas=ci.ssr_use_pallas,
            enable_spatial=ci.ssr_enable_spatial,
            enable_bilateral=ci.ssr_enable_bilateral,
            stage_cut=ci.ssr_stage_cut,
            march_sweep=ci.ssr_march_sweep)

    # ---- Composite (HnPostProcess.psh analogue) -------------------------------
    ao1 = ao[..., None]
    spec = gb.ambient_specular
    if ssr_rad is not None:
        conf = jnp.clip(ssr_rad[..., 3:4] * ci.ssr_scale, 0.0, 1.0)
        ssr_term = ssr_rad[..., :3] * gb.spec_env_factor
        spec = spec + (ssr_term - spec) * conf
    color = gb.direct + ao1 * gb.ambient_diffuse + ao1 * spec
    color = jnp.where(gb.hit[..., None], color, gb.background)

    # ---- OIT (BeginOITPass / RenderRprims OITLayers / EndOITPass) --------------
    if scene.blend_indices is not None and ci.oit_layer_count > 0:
        from diligentfx_tpu.ops.raster import pad_viewport
        from diligentfx_tpu.pbr import oit
        from diligentfx_tpu.pbr.renderer import transform_vertices
        pad_w, pad_h = pad_viewport(width, height, cfg)
        wp, wn, _ = transform_vertices(scene, info.model_transform)
        clip_b = m3.transform_points(wp, info.camera.view_proj)
        winv_b = jnp.where(jnp.abs(clip_b[:, 3]) > 1e-12, 1.0 / clip_b[:, 3], 0.0)
        blend_scene = scene._replace(tri_material=scene.blend_tri_material,
                                     indices=scene.blend_indices)
        blend_bc = scene.materials.base_color_factor[scene.blend_tri_material]
        tri_alpha = blend_bc[:, 3]
        # tail color: the dropped fragment's own unshaded base color tinted
        # by its emissive-free diffuse — the OIT.fxh RGBA8 tail stores the
        # fragment's shaded color; base color is the visibility-buffer
        # analogue (the tail is never shaded)
        kl = oit.rasterize_klayers(clip_b, scene.blend_indices,
                                   width=pad_w, height=pad_h, cfg=cfg,
                                   num_layers=ci.oit_layer_count,
                                   tri_alpha=tri_alpha,
                                   tri_rgb=blend_bc[:, :3])
        kl = oit.KLayerBuffer(
            depth=kl.depth[:, :height, :width],
            tri_id=kl.tri_id[:, :height, :width],
            bary=kl.bary[:, :height, :width],
            overflow=kl.overflow[:height, :width],
            tail_alpha=(kl.tail_alpha[:height, :width]
                        if kl.tail_alpha is not None else None),
            tail_color=(kl.tail_color[:height, :width]
                        if kl.tail_color is not None else None))
        lcol, lalpha, lalb = oit.shade_klayers(blend_scene, info, ibl_maps, kl,
                                               wp, wn, winv_b, use_ibl=use_ibl)
        color = oit.composite_klayers(color, gb.depth, kl, lcol, lalpha,
                                      layer_albedos=lalb)

    # ---- CoordinateGrid / BoundBox / ProcessSelection tasks ---------------------
    # (HnTaskManager task UIDs renderBoundBox/processSelection + the grid,
    # selection-outline and desaturation terms of HnPostProcess.psh,
    # HnPostProcessTask.cpp:834-869)
    if ci.enable_grid:
        from diligentfx_tpu.components.renderers import render_coordinate_grid
        color = render_coordinate_grid(color, gb.depth, info.camera)
    if ci.enable_bound_box and settings.bound_box is not None:
        from diligentfx_tpu.components.renderers import render_bound_box
        bb = settings.bound_box
        color = render_bound_box(color, gb.depth, info.camera,
                                 bb.box_min, bb.box_max, transform=bb.transform)
    if ci.enable_selection and settings.selected_ids is not None:
        from diligentfx_tpu.components.selection import (
            desaturate_unselected, selection_outline)
        from diligentfx_tpu.postfx.tonemap import reverse_exp_tone_map
        ids = settings.selected_ids
        selected = ((gb.mesh_id[..., None] == ids[None, None, :])
                    & (ids >= 0)[None, None, :]).any(-1)
        color = desaturate_unselected(color, selected,
                                      desaturation=ci.desaturation_factor)
        # pre-compensate the (post-tonemap) outline color so it survives the
        # tone map, like the reference's ReverseExpToneMap
        # (HnPostProcessTask.cpp:844-850; Components ToneMapping host helper).
        # Clamp below 1: ReverseExp(1) is infinite, and an inf outline color
        # NaN-floods the frame through (inf - c) * 0.
        oc = reverse_exp_tone_map(
            jnp.array([0.95, 0.6, 0.1], jnp.float32),
            ave_log_lum=info.renderer_params.average_log_lum)
        oc = jnp.minimum(oc, 20.0)
        color = selection_outline(color, selected,
                                  outline_width=ci.selection_outline_width,
                                  outline_color=oc)

    # ---- ComputeDepthBounds task -------------------------------------------------
    depth_range = None
    if ci.enable_depth_bounds:
        from diligentfx_tpu.components.depth_range import compute_depth_range
        depth_range = compute_depth_range(gb.depth, info.camera)

    # ---- Epipolar light scattering (god rays + atmosphere) ---------------------
    if ci.enable_light_scattering and atmosphere_lut is not None:
        from diligentfx_tpu.postfx.epipolar import (EpipolarSettings,
                                                    apply_light_scattering)
        sun_dir = info.lights.direction[0]
        shadow_data = None
        if info.shadow_attribs is not None and info.shadow_maps is not None:
            shadow_data = (info.shadow_attribs, info.shadow_maps)
        eps = EpipolarSettings(num_epipolar_slices=ci.epipolar_slices,
                               max_samples_in_slice=ci.epipolar_samples,
                               num_ray_march_steps=ci.epipolar_march_steps,
                               use_minmax_tree=ci.epipolar_use_minmax_tree,
                               refinement_factor=ci.epipolar_refinement_factor,
                               single_sctr_lut=ci.epipolar_single_sctr_lut)
        od_lut, ms_lut = atmosphere_lut
        scat = apply_light_scattering(color, gb.depth, info.camera, sun_dir,
                                      od_lut, eps,
                                      shadow_data=shadow_data, ms_lut=ms_lut)
        color = scat.color

    # ---- Auto exposure (UpdateAverageLuminance analogue) ------------------------
    new_exposure = state.average_log_lum
    if ci.enable_auto_exposure:
        from diligentfx_tpu.postfx.tonemap import average_log_luminance
        measured = average_log_luminance(color)
        adapted = jnp.where(first_frame, measured,
                            state.average_log_lum
                            + (measured - state.average_log_lum)
                            * ci.exposure_adaptation_rate)
        new_exposure = adapted
        info = info._replace(renderer_params=info.renderer_params.replace(
            average_log_lum=adapted))

    return FrameFx(color=color, gb=gb, ao=ao, info=info, resources=resources,
                   first_frame=first_frame, new_ssao=new_ssao, new_ssr=new_ssr,
                   new_exposure=new_exposure, disocclusion=disocclusion,
                   depth_range=depth_range)


def _frame_post(pre: FrameFx, state: FrameState, settings: FrameSettings, *,
                width: int, height: int,
                ci: TaskManagerCreateInfo) -> FrameOutput:
    """Temporal stack + tone map — the second half of the frame program."""
    color, gb, ao = pre.color, pre.gb, pre.ao
    info, resources = pre.info, pre.resources
    first_frame = pre.first_frame
    new_ssao, new_ssr = pre.new_ssao, pre.new_ssr
    new_exposure = pre.new_exposure

    # ---- TAA ------------------------------------------------------------------
    new_taa = state.taa
    if ci.enable_taa:
        taa_state = jax.tree.map(
            lambda h, c: jnp.where(first_frame, c, h),
            state.taa, fx_taa.TAAState(color=color,
                                       sample_count=jnp.ones_like(gb.depth)))
        color, new_taa = fx_taa.taa_accumulate(
            color, taa_state, resources, settings.taa,
            feature_flags=ci.taa_feature_flags,
            disocclusion=pre.disocclusion)

    # ---- DoF / Bloom -----------------------------------------------------------
    new_dof = state.dof
    if ci.enable_dof:
        color, new_dof = fx_dof.apply_dof(color, gb.depth, info.camera,
                                          settings.dof, state=state.dof,
                                          motion=gb.motion, use_temporal=True,
                                          use_pallas=ci.dof_use_pallas)
    if ci.enable_bloom:
        color = fx_bloom.apply_bloom(color, settings.bloom)

    # ---- Debug AOV view (HN_VIEW_MODE) ------------------------------------------
    if ci.view_mode != DebugViewType.NONE:
        color = _debug_aov(ci.view_mode, gb, ao)

    # ---- Tone map + sRGB --------------------------------------------------------
    if ci.view_mode == DebugViewType.NONE and ci.tone_mapping_mode != ToneMappingMode.NONE:
        color = tone_map(color, ci.tone_mapping_mode, settings.tone_mapping,
                         ave_log_lum=info.renderer_params.average_log_lum)
    if ci.view_mode == DebugViewType.NONE and ci.convert_output_to_srgb:
        color = m3.linear_to_srgb(color)

    # ---- motion-vector field debug overlay (HnPostProcessTask.cpp:928-943) ----
    if ci.enable_vector_field:
        from diligentfx_tpu.components.renderers import render_vector_field
        color = render_vector_field(color, gb.motion)

    new_state = FrameState(
        frame_index=state.frame_index + 1,
        prev_view_proj=info.camera.view_proj,
        taa=new_taa, ssr=new_ssr, ssao=new_ssao, dof=new_dof,
        average_log_lum=new_exposure if ci.enable_auto_exposure else state.average_log_lum,
        prev_depth=gb.depth if state.prev_depth is not None else None)
    if not (ci.emit_aovs or ci.view_mode != DebugViewType.NONE):
        # keep only the app-read-back products; the rest never materialize
        gb = gb._replace(
            normal_world=None, normal_view=None, base_color=None,
            material_data=None, world_pos=None, direct=None,
            ambient_diffuse=None, ambient_specular=None,
            spec_env_factor=None, background=None, debug=None)
    return FrameOutput(color=color, gbuffer=gb, state=new_state,
                       depth_range=pre.depth_range)


_frame_begin_jit = functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "ci", "use_ibl",
                              "use_textures", "pcf_kernel_size",
                              "enable_clearcoat",
                              "light_shadow_kinds"))(_frame_begin)
_frame_fx_jit = functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "ci", "use_ibl",
                              "ssr_steps"))(_frame_fx)
_frame_post_jit = functools.partial(
    jax.jit, static_argnames=("width", "height", "ci"))(_frame_post)


def _debug_aov(view: DebugViewType, gb: GBufferData, ao):
    """Visualize a G-buffer AOV — the full 35-view DebugViewType table
    (PBR_Renderer.hpp:401-439, RenderPBR.psh:574-613, HN_VIEW_MODE_*).
    Extension views read gb.debug (render with emit_debug=True); absent
    extensions render black, matching a shader compiled without them."""
    V = DebugViewType
    ones3 = jnp.ones_like(gb.base_color)
    hitm = gb.hit[..., None]
    dbg = gb.debug or {}

    def d(key, default_ch=3):
        if key in dbg:
            v = dbg[key]
            return v * jnp.ones_like(ones3) if v.shape[-1] == 1 else v
        return jnp.zeros_like(ones3)

    if view == V.TEXCOORD0 or view == V.TEXCOORD1:
        # single UV set (TEXCOORD1 aliases 0, like a shader with one set)
        uv = dbg.get("texcoord0")
        out = (jnp.concatenate([uv % 1.0, jnp.zeros_like(uv[..., :1])], -1)
               if uv is not None else jnp.zeros_like(ones3))
    elif view == V.BASE_COLOR:
        out = gb.base_color
    elif view == V.TRANSPARENCY:
        out = d("transparency")
    elif view == V.OCCLUSION:
        out = (gb.material_data[..., 2:3] * ao[..., None]) * ones3
    elif view == V.EMISSIVE:
        out = d("emissive")
    elif view == V.METALLIC:
        out = gb.material_data[..., 0:1] * ones3
    elif view == V.ROUGHNESS:
        out = gb.material_data[..., 1:2] * ones3
    elif view == V.DIFFUSE_COLOR:
        out = d("diffuse_color")
    elif view == V.SPECULAR_COLOR:
        out = d("specular_color")
    elif view == V.REFLECTANCE90:
        out = d("reflectance90")
    elif view == V.MESH_NORMAL:
        out = gb.normal_view * 0.5 + 0.5
    elif view == V.SHADING_NORMAL:
        out = gb.normal_world * 0.5 + 0.5
    elif view == V.MOTION_VECTORS:
        out = jnp.concatenate([jnp.abs(gb.motion) * 20.0,
                               jnp.zeros_like(gb.motion[..., :1])], axis=-1)
    elif view == V.NDOTV:
        out = d("ndotv")
    elif view == V.PUNCTUAL_LIGHTING:
        out = gb.direct
    elif view == V.DIFFUSE_IBL:
        out = gb.ambient_diffuse
    elif view == V.SPECULAR_IBL:
        out = gb.ambient_specular
    elif view == V.WHITE_BASE_COLOR:
        # lighting response with base color forced to white: direct light +
        # ambient, base-color factor divided out of the diffuse terms
        denom = jnp.maximum(gb.base_color, 1e-3)
        out = gb.direct + (gb.ambient_diffuse / denom)
    elif view == V.CLEAR_COAT:
        out = d("clearcoat_lit")
    elif view == V.CLEAR_COAT_FACTOR:
        out = d("clearcoat_factor")
    elif view == V.CLEAR_COAT_ROUGHNESS:
        out = d("clearcoat_roughness")
    elif view == V.CLEAR_COAT_NORMAL:
        out = d("clearcoat_normal") * 0.5 + 0.5
    elif view == V.SHEEN:
        out = d("sheen_lit")
    elif view == V.SHEEN_COLOR:
        out = d("sheen_color")
    elif view == V.SHEEN_ROUGHNESS:
        out = d("sheen_roughness")
    elif view == V.ANISOTROPY_STRENGTH:
        out = d("anisotropy_strength")
    elif view == V.ANISOTROPY_DIRECTION:
        out = d("anisotropy_direction") * 0.5 + 0.5
    elif view == V.IRIDESCENCE:
        out = d("iridescence_fresnel")
    elif view == V.IRIDESCENCE_FACTOR:
        out = d("iridescence_factor")
    elif view == V.IRIDESCENCE_THICKNESS:
        # normalized against the glTF-typical 1200 nm ceiling
        out = d("iridescence_thickness") / 1200.0
    elif view == V.TRANSMISSION:
        out = d("transmission")
    elif view == V.THICKNESS:
        out = d("thickness")
    elif view == V.SCENE_DEPTH:
        out = gb.depth[..., None] * ones3
    else:
        out = gb.base_color
    return jnp.where(hitm, out, 0.0)
