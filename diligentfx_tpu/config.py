"""Static configuration: the TPU analogue of the reference's shader-variant engine.

In DiligentFX, renderer features are selected by `PBR_Renderer::CreateInfo`
(PBR/interface/PBR_Renderer.hpp:143-375) and per-draw `PSO_FLAGS`
(PBR_Renderer.hpp:538-616); `DefineMacros` (PBR/src/PBR_Renderer.cpp:1352-1607)
turns those into ~60 HLSL `#define`s and the `PSOKey` hash cache
(PBR_Renderer.cpp:2173) bounds the variant explosion.

Here the same roles are played by hashable frozen dataclasses / IntFlags:
they are *static* arguments to `jax.jit`, so each used combination traces to
one concrete XLA graph — the jit cache IS the PSO cache.  Dynamic per-frame
values (transforms, material factors, light params) travel as pytrees of
arrays instead (see attribs.py).
"""
from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Optional, Tuple


class PSOFlags(enum.IntFlag):
    """Per-draw feature flags. Mirrors PBR_Renderer.hpp:538-616 bit-for-bit."""
    NONE = 0
    # Texture flags (TEXTURE_ATTRIB_ID order, PBR_Renderer.hpp:88-123)
    USE_COLOR_MAP = 1 << 0
    USE_NORMAL_MAP = 1 << 1
    USE_PHYS_DESC_MAP = 1 << 2
    USE_METALLIC_MAP = 1 << 3
    USE_ROUGHNESS_MAP = 1 << 4
    USE_AO_MAP = 1 << 5
    USE_EMISSIVE_MAP = 1 << 6
    USE_CLEAR_COAT_MAP = 1 << 7
    USE_CLEAR_COAT_ROUGHNESS_MAP = 1 << 8
    USE_CLEAR_COAT_NORMAL_MAP = 1 << 9
    USE_SHEEN_COLOR_MAP = 1 << 10
    USE_SHEEN_ROUGHNESS_MAP = 1 << 11
    USE_ANISOTROPY_MAP = 1 << 12
    USE_IRIDESCENCE_MAP = 1 << 13
    USE_IRIDESCENCE_THICKNESS_MAP = 1 << 14
    USE_TRANSMISSION_MAP = 1 << 15
    USE_THICKNESS_MAP = 1 << 16

    USE_VERTEX_COLORS = 1 << 17
    USE_VERTEX_NORMALS = 1 << 18
    USE_VERTEX_TANGENTS = 1 << 19
    USE_TEXCOORD0 = 1 << 20
    USE_TEXCOORD1 = 1 << 21
    USE_JOINTS = 1 << 22
    ENABLE_CLEAR_COAT = 1 << 23
    ENABLE_SHEEN = 1 << 24
    ENABLE_ANISOTROPY = 1 << 25
    ENABLE_IRIDESCENCE = 1 << 26
    ENABLE_TRANSMISSION = 1 << 27
    ENABLE_VOLUME = 1 << 28

    USE_IBL = 1 << 29
    USE_LIGHTS = 1 << 30
    USE_TEXTURE_ATLAS = 1 << 31
    ENABLE_TEXCOORD_TRANSFORM = 1 << 32
    CONVERT_OUTPUT_TO_SRGB = 1 << 33
    ENABLE_CUSTOM_DATA_OUTPUT = 1 << 34
    ENABLE_TONE_MAPPING = 1 << 35
    UNSHADED = 1 << 36
    COMPUTE_MOTION_VECTORS = 1 << 37
    ENABLE_SHADOWS = 1 << 38

    @classmethod
    def ALL_TEXTURES(cls):
        return cls((1 << 17) - 1)

    @classmethod
    def VERTEX_ATTRIBS(cls):
        return (cls.USE_VERTEX_COLORS | cls.USE_VERTEX_NORMALS | cls.USE_VERTEX_TANGENTS
                | cls.USE_TEXCOORD0 | cls.USE_TEXCOORD1 | cls.USE_JOINTS)

    @classmethod
    def DEFAULT_TEXTURES(cls):
        return (cls.USE_COLOR_MAP | cls.USE_NORMAL_MAP | cls.USE_PHYS_DESC_MAP
                | cls.USE_AO_MAP | cls.USE_EMISSIVE_MAP)

    @classmethod
    def DEFAULT(cls):
        return (cls.VERTEX_ATTRIBS() | cls.DEFAULT_TEXTURES() | cls.USE_IBL
                | cls.USE_LIGHTS | cls.ENABLE_TONE_MAPPING)


class AlphaMode(enum.IntEnum):
    """PBR_Renderer.hpp:396-398 / glTF alphaMode."""
    OPAQUE = 0
    MASK = 1
    BLEND = 2


class RenderPassType(enum.IntEnum):
    """PBR_Renderer.hpp:449-455."""
    MAIN = 0
    SHADOW = 1
    OIT_LAYERS = 2


class DebugViewType(enum.IntEnum):
    """35 debug AOVs, PBR_Renderer.hpp:401-439 / RenderPBR.psh:574-613."""
    NONE = 0
    TEXCOORD0 = 1
    TEXCOORD1 = 2
    BASE_COLOR = 3
    TRANSPARENCY = 4
    OCCLUSION = 5
    EMISSIVE = 6
    METALLIC = 7
    ROUGHNESS = 8
    DIFFUSE_COLOR = 9
    SPECULAR_COLOR = 10
    REFLECTANCE90 = 11
    MESH_NORMAL = 12
    SHADING_NORMAL = 13
    MOTION_VECTORS = 14
    NDOTV = 15
    PUNCTUAL_LIGHTING = 16
    DIFFUSE_IBL = 17
    SPECULAR_IBL = 18
    WHITE_BASE_COLOR = 19
    CLEAR_COAT = 20
    CLEAR_COAT_FACTOR = 21
    CLEAR_COAT_ROUGHNESS = 22
    CLEAR_COAT_NORMAL = 23
    SHEEN = 24
    SHEEN_COLOR = 25
    SHEEN_ROUGHNESS = 26
    ANISOTROPY_STRENGTH = 27
    ANISOTROPY_DIRECTION = 28
    IRIDESCENCE = 29
    IRIDESCENCE_FACTOR = 30
    IRIDESCENCE_THICKNESS = 31
    TRANSMISSION = 32
    THICKNESS = 33
    SCENE_DEPTH = 34


class ToneMappingMode(enum.IntEnum):
    """12 modes, Shaders/PostProcess/ToneMapping/public/ToneMappingStructures.fxh:11-22."""
    NONE = 0
    EXP = 1
    REINHARD = 2
    REINHARD_MOD = 3
    UNCHARTED2 = 4
    FILMIC_ALU = 5
    LOGARITHMIC = 6
    ADAPTIVE_LOG = 7
    AGX = 8
    AGX_CUSTOM = 9
    PBR_NEUTRAL = 10
    COMMERCE = 11


class ShadowMode(enum.IntEnum):
    """Shaders/Common/public/BasicStructures.fxh:19-27."""
    PCF = 1
    VSM = 2
    EVSM2 = 3
    EVSM4 = 4


MAX_CASCADES = 8  # BasicStructures.fxh:27


class TextureAttribId(enum.IntEnum):
    """PBR_Renderer.hpp TEXTURE_ATTRIB_ID_* ordering."""
    BASE_COLOR = 0
    NORMAL = 1
    PHYS_DESC = 2
    METALLIC = 3
    ROUGHNESS = 4
    OCCLUSION = 5
    EMISSIVE = 6
    CLEAR_COAT = 7
    CLEAR_COAT_ROUGHNESS = 8
    CLEAR_COAT_NORMAL = 9
    SHEEN_COLOR = 10
    SHEEN_ROUGHNESS = 11
    ANISOTROPY = 12
    IRIDESCENCE = 13
    IRIDESCENCE_THICKNESS = 14
    TRANSMISSION = 15
    THICKNESS = 16

    @classmethod
    def count(cls) -> int:
        return 17


class LoadingAnimationMode(enum.IntEnum):
    NONE = 0
    ALWAYS = 1
    TRANSITIONING = 2


@dataclass(frozen=True)
class PBRRendererCreateInfo:
    """Static renderer features. Mirrors PBR_Renderer::CreateInfo
    (PBR/interface/PBR_Renderer.hpp:143-375) minus GPU-API-only knobs
    (samplers/input layout/CB pointers) which have no TPU analogue.
    """
    enable_ibl: bool = True
    enable_ao: bool = True
    enable_emissive: bool = True
    enable_clear_coat: bool = False
    enable_sheen: bool = False
    enable_anisotropy: bool = False
    enable_iridescence: bool = False
    enable_transmission: bool = False
    enable_volume: bool = False
    use_separate_metallic_roughness_textures: bool = False
    create_default_textures: bool = True
    enable_shadows: bool = False
    pcf_kernel_size: int = 3            # allowed 2, 3, 5, 7
    max_light_count: int = 16
    max_shadow_casting_light_count: int = 8
    oit_layer_count: int = 0            # 0 disables OIT
    max_joint_count: int = 64
    num_brdf_samples: int = 512         # BRDF LUT sample count (cpp:988)
    # IBL precompute resolutions (PBR_Renderer.hpp:477-480)
    brdf_lut_dim: int = 512
    irradiance_cube_dim: int = 64
    prefiltered_env_map_dim: int = 256
    num_specular_env_samples: int = 256  # cpp:751
    num_diffuse_env_samples: int = 64
    # TPU-specific
    dtype: str = "float32"               # shading compute dtype
    reversed_z: bool = False

    def __post_init__(self):
        if self.pcf_kernel_size not in (2, 3, 5, 7):
            raise ValueError(f"PCFKernelSize must be 2/3/5/7, got {self.pcf_kernel_size}")


@dataclass(frozen=True)
class RasterizerConfig:
    """Static configuration of the TPU tile rasterizer (no reference analogue:
    the reference delegates rasterization to the GPU; SURVEY.md §2.6 item 5).

    The screen is split into tiles of tile_h × tile_w pixels.  Triangles are
    binned to tiles through a bounded expansion (max_tiles_per_tri) + sort;
    triangles whose bbox covers more tiles go to the "big triangle" list that
    every tile tests.  Per tile, up to bin_capacity candidate triangles are
    rasterized with edge functions evaluated as an MXU matmul
    ([x y 1] @ edge-coefficient matrix).
    """
    tile_h: int = 32
    tile_w: int = 128          # lane-aligned
    bin_capacity: int = 256    # max binned triangles rasterized per tile
    max_tiles_per_tri: int = 16
    big_tri_capacity: int = 64  # triangles covering > max_tiles_per_tri tiles
    chunk: int = 64            # triangles rasterized per inner-loop step
    # > 0: scatter the valid (tile, tri) pairs into a buffer of this size
    # before the binning sort (exclusive-cumsum offsets, unique indices) —
    # the sort then runs over ~#real-pairs elements instead of
    # T x max_tiles_per_tri mostly-sentinel slots (the dominant binning
    # cost at high triangle counts).  Pairs past the cap are dropped and
    # counted in the overflow stat.  0 disables (bit-exact legacy path).
    pair_compaction_cap: int = 0
    # > 1: bin small triangles at (tile_h / sub_bins, tile_w) granularity and
    # have the fused kernel's z-loop evaluate each candidate only on its
    # sub-bin's pixel rows.  The median bench triangle covers ~46 px but a
    # full (32, 128) tile costs 4096 candidate-pixel evaluations — (8, 128)
    # sub-bins cut the measured z-loop work 269 -> 100 Mpx at 1080p.  Each
    # sub-bin holds up to bin_capacity // sub_bins candidates.  Fused-kernel
    # path only; must divide tile_h into multiples of 8.
    sub_bins: int = 1
    # > 0: bin "big" triangles (bbox covering > max_tiles_per_tri bins) by
    # EXACT per-tile bbox overlap into per-tile lists of this capacity,
    # instead of appending the global big list to every tile (a full-screen
    # ground plane costs every tile big_tri_capacity full-tile evaluations:
    # 88 of 357 Mpx measured at 1080p; exact overlap is 3 Mpx).
    big_tile_capacity: int = 0
    # Sort the raw (P*max_tiles_per_tri) pair array directly instead of
    # compacting valid pairs into the pair_compaction_cap buffer first
    # (invalid pairs carry the sentinel bin and sort to the end).  The
    # round-5 bisect measured the compaction scatter at ~6 ms while the
    # sort itself was ~free; which side wins depends on the pair count.
    skip_pair_compaction: bool = False
    # Profiling bisect: truncate the sub-binning pipeline after
    # {setup, pairs, scatter, sort} and fabricate shape-compatible outputs
    # (candidates empty) — in-frame deltas between settings attribute the
    # stage costs.  "" = off.  Frame output is garbage when set.
    bin_cut: str = ""

    def __post_init__(self):
        if self.tile_w % 128 != 0:
            raise ValueError("tile_w must be a multiple of 128 (TPU lanes)")
        if self.tile_h % 8 != 0:
            raise ValueError("tile_h must be a multiple of 8 (f32 sublanes)")
        if self.sub_bins > 1:
            if self.tile_h % self.sub_bins or (self.tile_h // self.sub_bins) % 8:
                raise ValueError("tile_h / sub_bins must be a multiple of 8")
            if self.bin_capacity % self.sub_bins:
                raise ValueError("bin_capacity must divide into sub_bins")


@dataclass(frozen=True)
class PSOKey:
    """Jit-cache key: the analogue of PBR_Renderer::PSOKey
    (PBR_Renderer.hpp:622-785).  Hashable + frozen → usable as a static
    jit argument; each distinct key compiles one XLA executable.
    """
    flags: PSOFlags = PSOFlags.NONE
    alpha_mode: AlphaMode = AlphaMode.OPAQUE
    pass_type: RenderPassType = RenderPassType.MAIN
    debug_view: DebugViewType = DebugViewType.NONE
    double_sided: bool = False
    user_value: int = 0


def replace(cfg, **kw):
    """dataclasses.replace that keeps frozen-ness."""
    return dataclasses.replace(cfg, **kw)
