"""Dynamic per-frame / per-material / per-light attribute pytrees.

These mirror the constant-buffer structs shared bit-exact between C++ and HLSL
in the reference (Shaders/PBR/public/PBR_Structures.fxh:126-359,
Shaders/Common/public/BasicStructures.fxh) — field names preserved in
snake_case, padding dropped, scalar triples folded into vec3 arrays.

They are registered as JAX pytrees, so they flow through jit as *dynamic*
arguments: changing a value here never triggers recompilation (the analogue of
updating a constant buffer without rebuilding the PSO).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def _vec(x, n, dtype=jnp.float32):
    return jnp.broadcast_to(jnp.asarray(x, dtype), (n,))


class LightType:
    """PBRLightAttribs.Type (PBR_Structures.fxh:318)."""
    DIRECTIONAL = 1
    POINT = 2
    SPOT = 3


@struct.dataclass
class CameraAttribs:
    """Mirrors CameraAttribs (Shaders/Common/public/BasicStructures.fxh:56-100)."""
    view: Array          # 4x4 world→view (row-vector)
    proj: Array          # 4x4 view→clip
    view_proj: Array     # 4x4 world→clip
    view_proj_inv: Array
    position: Array      # (3,) world-space camera position
    near_z: Array        # ()
    far_z: Array         # ()
    viewport_size: Array  # (4,) = (w, h, 1/w, 1/h)
    f2_jitter: Array     # (2,) TAA sub-pixel jitter in NDC units

    @classmethod
    def create(cls, view, proj, position, near_z, far_z, width, height,
               jitter=(0.0, 0.0)):
        from diligentfx_tpu.math3d import mul44
        view = jnp.asarray(view, jnp.float32)
        proj = jnp.asarray(proj, jnp.float32)
        vp = mul44(view, proj)
        return cls(
            view=view, proj=proj, view_proj=vp,
            view_proj_inv=jnp.linalg.inv(vp),
            position=jnp.asarray(position, jnp.float32),
            near_z=jnp.asarray(near_z, jnp.float32),
            far_z=jnp.asarray(far_z, jnp.float32),
            viewport_size=jnp.array([width, height, 1.0 / width, 1.0 / height], jnp.float32),
            f2_jitter=jnp.asarray(jitter, jnp.float32),
        )


@struct.dataclass
class PBRMaterialBasicAttribs:
    """Mirrors PBRMaterialBasicAttribs (PBR_Structures.fxh:154-180).

    All leaves carry a leading material-index dimension when batched
    (stack_materials), scalar otherwise.
    """
    base_color_factor: Array        # (4,)
    emissive_factor: Array          # (3,)
    normal_scale: Array             # ()
    specular_factor: Array          # (3,)
    clearcoat_normal_scale: Array   # ()
    workflow: Array                 # () int32: 0=metallic-roughness, 1=spec-gloss, 2=unlit
    alpha_mode: Array               # () int32
    alpha_mask_cutoff: Array        # ()
    metallic_factor: Array          # ()
    roughness_factor: Array         # ()
    occlusion_factor: Array         # ()
    clearcoat_factor: Array         # ()
    clearcoat_roughness_factor: Array  # ()
    custom_data: Array              # (4,)

    @classmethod
    def create(cls, base_color_factor=(1, 1, 1, 1), emissive_factor=(0, 0, 0),
               normal_scale=1.0, specular_factor=(1, 1, 1),
               clearcoat_normal_scale=1.0, workflow=0, alpha_mode=0,
               alpha_mask_cutoff=0.5, metallic_factor=1.0, roughness_factor=1.0,
               occlusion_factor=1.0, clearcoat_factor=0.0,
               clearcoat_roughness_factor=0.0, custom_data=(0, 0, 0, 0)):
        f32 = jnp.float32
        return cls(
            base_color_factor=_vec(base_color_factor, 4),
            emissive_factor=_vec(emissive_factor, 3),
            normal_scale=jnp.asarray(normal_scale, f32),
            specular_factor=_vec(specular_factor, 3),
            clearcoat_normal_scale=jnp.asarray(clearcoat_normal_scale, f32),
            workflow=jnp.asarray(workflow, jnp.int32),
            alpha_mode=jnp.asarray(alpha_mode, jnp.int32),
            alpha_mask_cutoff=jnp.asarray(alpha_mask_cutoff, f32),
            metallic_factor=jnp.asarray(metallic_factor, f32),
            roughness_factor=jnp.asarray(roughness_factor, f32),
            occlusion_factor=jnp.asarray(occlusion_factor, f32),
            clearcoat_factor=jnp.asarray(clearcoat_factor, f32),
            clearcoat_roughness_factor=jnp.asarray(clearcoat_roughness_factor, f32),
            custom_data=_vec(custom_data, 4),
        )


@struct.dataclass
class PBRMaterialSheenAttribs:
    """PBR_Structures.fxh:185-191."""
    color_factor: Array    # (3,)
    roughness_factor: Array  # ()

    @classmethod
    def create(cls, color_factor=(0, 0, 0), roughness_factor=0.0):
        return cls(_vec(color_factor, 3), jnp.asarray(roughness_factor, jnp.float32))


@struct.dataclass
class PBRMaterialAnisotropyAttribs:
    """PBR_Structures.fxh:196-202."""
    strength: Array
    rotation: Array

    @classmethod
    def create(cls, strength=0.0, rotation=0.0):
        return cls(jnp.asarray(strength, jnp.float32), jnp.asarray(rotation, jnp.float32))


@struct.dataclass
class PBRMaterialIridescenceAttribs:
    """PBR_Structures.fxh:207-213."""
    factor: Array
    ior: Array
    thickness_minimum: Array
    thickness_maximum: Array

    @classmethod
    def create(cls, factor=0.0, ior=1.3, thickness_minimum=100.0, thickness_maximum=400.0):
        f32 = jnp.float32
        return cls(jnp.asarray(factor, f32), jnp.asarray(ior, f32),
                   jnp.asarray(thickness_minimum, f32), jnp.asarray(thickness_maximum, f32))


@struct.dataclass
class PBRMaterialTransmissionAttribs:
    """PBR_Structures.fxh:218-224."""
    factor: Array

    @classmethod
    def create(cls, factor=0.0):
        return cls(jnp.asarray(factor, jnp.float32))


@struct.dataclass
class PBRMaterialVolumeAttribs:
    """PBR_Structures.fxh:229-239."""
    attenuation_color: Array  # (3,)
    thickness_factor: Array
    attenuation_distance: Array

    @classmethod
    def create(cls, attenuation_color=(1, 1, 1), thickness_factor=0.0,
               attenuation_distance=1e9):
        return cls(_vec(attenuation_color, 3),
                   jnp.asarray(thickness_factor, jnp.float32),
                   jnp.asarray(attenuation_distance, jnp.float32))


@struct.dataclass
class PBRMaterialTextureAttribs:
    """PBR_Structures.fxh:244-255: per-texture UV transform + atlas placement."""
    uv_selector: Array            # () float: -1 = texture absent, 0/1 = UV set
    texture_slice: Array          # () slice in texture array / atlas
    uv_bias: Array                # (2,)
    uv_scale_and_rotation: Array  # (4,) 2x2 row-major UV transform
    atlas_uv_scale_and_bias: Array  # (4,) = (su, sv, bu, bv)
    wrap_u: Array                 # () int32: 0=repeat 1=mirror 2=clamp
    wrap_v: Array                 # () int32

    @classmethod
    def create(cls, uv_selector=-1.0, texture_slice=0.0, uv_bias=(0, 0),
               uv_scale_and_rotation=(1, 0, 0, 1),
               atlas_uv_scale_and_bias=(1, 1, 0, 0), wrap_u=0, wrap_v=0):
        return cls(
            uv_selector=jnp.asarray(uv_selector, jnp.float32),
            texture_slice=jnp.asarray(texture_slice, jnp.float32),
            uv_bias=_vec(uv_bias, 2),
            uv_scale_and_rotation=_vec(uv_scale_and_rotation, 4),
            atlas_uv_scale_and_bias=_vec(atlas_uv_scale_and_bias, 4),
            wrap_u=jnp.asarray(wrap_u, jnp.int32),
            wrap_v=jnp.asarray(wrap_v, jnp.int32),
        )


@struct.dataclass
class PBRLightAttribs:
    """Mirrors PBRLightAttribs (PBR_Structures.fxh:316-334).

    Arrays carry a leading light dimension (N, ...) — the analogue of the
    fixed-size light array in the frame constant buffer; inactive slots have
    intensity 0.
    """
    type: Array              # (N,) int32, LightType
    position: Array          # (N, 3)
    direction: Array         # (N, 3) normalized
    shadow_map_index: Array  # (N,) int32, -1 = no shadow
    intensity: Array         # (N, 3) linear RGB intensity
    range4: Array            # (N,) range^4 (point/spot falloff window)
    spot_angle_scale: Array  # (N,)
    spot_angle_offset: Array  # (N,)

    @classmethod
    def directional(cls, direction, intensity, shadow_map_index=-1):
        d = jnp.asarray(direction, jnp.float32).reshape(1, 3)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return cls(
            type=jnp.array([LightType.DIRECTIONAL], jnp.int32),
            position=jnp.zeros((1, 3), jnp.float32),
            direction=d,
            shadow_map_index=jnp.array([shadow_map_index], jnp.int32),
            intensity=jnp.asarray(intensity, jnp.float32).reshape(1, 3),
            range4=jnp.array([jnp.inf], jnp.float32),
            spot_angle_scale=jnp.zeros((1,), jnp.float32),
            spot_angle_offset=jnp.zeros((1,), jnp.float32),
        )

    @classmethod
    def point(cls, position, intensity, range=100.0, shadow_map_index=-1):
        return cls(
            type=jnp.array([LightType.POINT], jnp.int32),
            position=jnp.asarray(position, jnp.float32).reshape(1, 3),
            direction=jnp.array([[0.0, 0.0, -1.0]], jnp.float32),
            shadow_map_index=jnp.array([shadow_map_index], jnp.int32),
            intensity=jnp.asarray(intensity, jnp.float32).reshape(1, 3),
            range4=jnp.array([float(range) ** 4], jnp.float32),
            spot_angle_scale=jnp.zeros((1,), jnp.float32),
            spot_angle_offset=jnp.zeros((1,), jnp.float32),
        )

    @classmethod
    def spot(cls, position, direction, intensity, inner_cone_angle, outer_cone_angle,
             range=100.0, shadow_map_index=-1):
        import math
        ci, co = math.cos(inner_cone_angle), math.cos(outer_cone_angle)
        s = 1.0 / max(ci - co, 1e-4)
        d = jnp.asarray(direction, jnp.float32).reshape(1, 3)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return cls(
            type=jnp.array([LightType.SPOT], jnp.int32),
            position=jnp.asarray(position, jnp.float32).reshape(1, 3),
            direction=d,
            shadow_map_index=jnp.array([shadow_map_index], jnp.int32),
            intensity=jnp.asarray(intensity, jnp.float32).reshape(1, 3),
            range4=jnp.array([float(range) ** 4], jnp.float32),
            spot_angle_scale=jnp.array([s], jnp.float32),
            spot_angle_offset=jnp.array([-co * s], jnp.float32),
        )

    @classmethod
    def concat(cls, lights):
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *lights)

    @property
    def count(self) -> int:
        return self.type.shape[0]


@struct.dataclass
class PBRShadowMapInfo:
    """PBR_Structures.fxh:339-351: per-shadow-map projection + atlas placement.
    Leading dimension = shadow-casting light count."""
    world_to_light_proj_space: Array  # (N, 4, 4)
    uv_scale: Array                   # (N, 2)
    uv_bias: Array                    # (N, 2)
    shadow_map_slice: Array           # (N,) int32


@struct.dataclass
class PBRRendererShaderParameters:
    """Mirrors PBRRendererShaderParameters (PBR_Structures.fxh:126-149)."""
    average_log_lum: Array
    middle_gray: Array
    white_point: Array
    prefiltered_cube_last_mip: Array
    ibl_scale: Array          # (4,)
    occlusion_strength: Array
    emission_scale: Array
    mip_bias: Array
    time: Array
    unshaded_color: Array     # (4,)
    highlight_color: Array    # (4,)

    @classmethod
    def create(cls, average_log_lum=0.3, middle_gray=0.18, white_point=3.0,
               prefiltered_cube_last_mip=4.0, ibl_scale=(1, 1, 1, 1),
               occlusion_strength=1.0, emission_scale=1.0, mip_bias=0.0,
               time=0.0, unshaded_color=(0.5, 0.5, 0.5, 1.0),
               highlight_color=(0, 0, 0, 0)):
        f32 = jnp.float32
        return cls(
            average_log_lum=jnp.asarray(average_log_lum, f32),
            middle_gray=jnp.asarray(middle_gray, f32),
            white_point=jnp.asarray(white_point, f32),
            prefiltered_cube_last_mip=jnp.asarray(prefiltered_cube_last_mip, f32),
            ibl_scale=_vec(ibl_scale, 4),
            occlusion_strength=jnp.asarray(occlusion_strength, f32),
            emission_scale=jnp.asarray(emission_scale, f32),
            mip_bias=jnp.asarray(mip_bias, f32),
            time=jnp.asarray(time, f32),
            unshaded_color=_vec(unshaded_color, 4),
            highlight_color=_vec(highlight_color, 4),
        )


def stack_materials(mats):
    """Stack a list of per-material attrib pytrees into one batched pytree
    (leading dim = material id), the analogue of the material attribs
    structured buffer (GLTF_PBR_Renderer.cpp:742-770)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *mats)


def gather_material(batched, index):
    """Select one material's attribs from a stacked pytree by (traced) index."""
    return jax.tree.map(lambda x: x[index], batched)
