"""glTF model → render-ready scene bundle.

The analogue of GLTF_PBR_Renderer's model consumption (building vertex pools,
per-material SRBs and attribs from GLTF::Model, GLTF_PBR_Renderer.cpp:373-786)
and Radient's GLTF converter (RadientGLTFConverter).

Alpha modes: ALPHA_MODE_MASK triangles go to the index-buffer tail and
resolve through the K-layer alpha-test pass (pbr/oit.resolve_alpha_mask);
BLEND renders through K-layer OIT (pbr/oit.py) when enabled, else opaque.
JPEG images decode through Pillow when available, else a neutral gray.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from diligentfx_tpu.attribs import PBRLightAttribs, PBRMaterialBasicAttribs, stack_materials
from diligentfx_tpu.gltf.loader import GLTFModel, GLTFTextureRef
from diligentfx_tpu.gltf.primitives import compute_tangents
from diligentfx_tpu.ops.texture import AtlasBuilder, TextureAtlas

# texture slot order in ScenePrimitives.tex_ids
SLOT_BASE_COLOR = 0
SLOT_NORMAL = 1
SLOT_PHYS_DESC = 2
SLOT_EMISSIVE = 3
SLOT_OCCLUSION = 4
NUM_SLOTS = 5


class RenderScene(NamedTuple):
    scene: object               # pbr.renderer.ScenePrimitives
    atlas: object               # TextureAtlas | TextureHeap (binding mode)
    lights: Optional[PBRLightAttribs]
    mesh_node_ids: tuple = ()   # model node index per scene node slot


def update_animation(rs: RenderScene, model: GLTFModel, player, t: float,
                     prev_t: Optional[float] = None) -> RenderScene:
    """Advance animations: re-evaluates node worlds + skin matrices at time t
    (and prev_t for motion vectors), returning an updated RenderScene.
    The double-buffering mirrors HnSkinningComputation (include:45-73)."""
    import jax.numpy as jnp
    from diligentfx_tpu.gltf.animation import compute_skin_matrices

    worlds = player.evaluate(t)
    scene = rs.scene
    node_m = jnp.asarray(np.stack([worlds[ni].astype(np.float32)
                                   for ni in rs.mesh_node_ids]))
    prev_node_m = scene.node_matrices
    jm = prev_jm = None
    if model.skins and scene.joint_matrices is not None:
        jm = jnp.asarray(np.concatenate(
            [compute_skin_matrices(model, s, worlds)
             for s in range(len(model.skins))]))
        prev_jm = scene.joint_matrices
    if prev_t is not None:
        prev_worlds = player.evaluate(prev_t)
        prev_node_m = jnp.asarray(np.stack(
            [prev_worlds[ni].astype(np.float32) for ni in rs.mesh_node_ids]))
        if jm is not None:
            prev_jm = jnp.asarray(np.concatenate(
                [compute_skin_matrices(model, s, prev_worlds)
                 for s in range(len(model.skins))]))
    scene = scene._replace(
        node_matrices=node_m, prev_node_matrices=prev_node_m,
        joint_matrices=jm if jm is not None else scene.joint_matrices,
        prev_joint_matrices=(prev_jm if prev_jm is not None
                             else scene.prev_joint_matrices))
    return rs._replace(scene=scene)


def build_render_scene(model: GLTFModel, atlas_size: int = 1024,
                       extra_lights: Optional[PBRLightAttribs] = None,
                       texture_binding_mode: str = "atlas") -> RenderScene:
    """Flatten the default scene's node hierarchy into one ScenePrimitives +
    a packed texture container.

    texture_binding_mode selects the SHADER_TEXTURE_ARRAY_MODE analogue
    (PBR_Renderer.hpp:100-119): "atlas" packs every texture into fixed-size
    layers (GLTF::ResourceManager suballocation — cheapest sampling, caps
    resolution at atlas_size); "array" keeps native resolutions in a texture
    heap (the DYNAMIC per-material slice mode — no repacking, exact wrap)."""
    import jax.numpy as jnp
    from diligentfx_tpu.pbr.renderer import ScenePrimitives

    if texture_binding_mode == "array":
        from diligentfx_tpu.ops.texture import TextureHeapBuilder
        builder = TextureHeapBuilder()
    else:
        assert texture_binding_mode == "atlas", texture_binding_mode
        builder = AtlasBuilder(size=atlas_size)
    image_to_tex = {}

    def atlas_id(ref: Optional[GLTFTextureRef], srgb: bool) -> int:
        if ref is None or ref.image < 0:
            return -1
        key = ref.image
        if key not in image_to_tex:
            img = model.images[ref.image]
            if img is None:
                img = np.full((4, 4, 4), 0.5, np.float32)  # JPEG stub
            image_to_tex[key] = builder.add(img)
        return image_to_tex[key]

    # materials (default material when none)
    mats = model.materials or []
    basic = []
    tex_ids = np.full((max(len(mats), 1), NUM_SLOTS), -1, np.int32)
    tex_xform = np.tile(np.array([1, 0, 0, 1, 0, 0], np.float32),
                        (max(len(mats), 1), NUM_SLOTS, 1))
    tex_wraps = np.zeros((max(len(mats), 1), NUM_SLOTS, 2), np.int32)
    alpha_map = {"OPAQUE": 0, "MASK": 1, "BLEND": 2}
    for mi, m in enumerate(mats):
        basic.append(PBRMaterialBasicAttribs.create(
            base_color_factor=m.base_color_factor,
            emissive_factor=tuple(np.asarray(m.emissive_factor)
                                  * m.emissive_strength),
            normal_scale=m.normal_scale,
            workflow=2 if m.unlit else 0,
            alpha_mode=alpha_map.get(m.alpha_mode, 0),
            alpha_mask_cutoff=m.alpha_cutoff,
            metallic_factor=m.metallic_factor,
            roughness_factor=m.roughness_factor,
            occlusion_factor=m.occlusion_strength,
            clearcoat_factor=m.clearcoat_factor,
            clearcoat_roughness_factor=m.clearcoat_roughness,
        ))
        for slot, (ref, srgb) in enumerate([
                (m.base_color_texture, True),
                (m.normal_texture, False),
                (m.metallic_roughness_texture, False),
                (m.emissive_texture, True),
                (m.occlusion_texture, False)]):
            tid = atlas_id(ref, srgb)
            tex_ids[mi, slot] = tid
            if ref is not None:
                tex_xform[mi, slot, :4] = ref.uv_scale_rotation
                tex_xform[mi, slot, 4:] = ref.uv_offset
                if 0 <= ref.sampler < len(model.sampler_wraps):
                    tex_wraps[mi, slot] = model.sampler_wraps[ref.sampler]
    if not basic:
        basic.append(PBRMaterialBasicAttribs.create())

    # stacked extension attribs, only when any material uses the extension
    from diligentfx_tpu.attribs import (
        PBRMaterialAnisotropyAttribs, PBRMaterialIridescenceAttribs,
        PBRMaterialSheenAttribs, PBRMaterialTransmissionAttribs,
        PBRMaterialVolumeAttribs)
    from diligentfx_tpu.attribs import stack_materials as _stack
    src = mats if mats else []
    ext_sheen = ext_aniso = ext_irid = ext_trans = ext_vol = None
    if any(np.any(np.asarray(m.sheen_color) > 0) for m in src):
        ext_sheen = _stack([PBRMaterialSheenAttribs.create(
            m.sheen_color, m.sheen_roughness) for m in src])
    if any(m.anisotropy_strength != 0 for m in src):
        ext_aniso = _stack([PBRMaterialAnisotropyAttribs.create(
            m.anisotropy_strength, m.anisotropy_rotation) for m in src])
    if any(m.iridescence_factor != 0 for m in src):
        ext_irid = _stack([PBRMaterialIridescenceAttribs.create(
            m.iridescence_factor, m.iridescence_ior,
            m.iridescence_thickness_min, m.iridescence_thickness_max)
            for m in src])
    if any(m.transmission_factor != 0 for m in src):
        ext_trans = _stack([PBRMaterialTransmissionAttribs.create(
            m.transmission_factor) for m in src])
    if any(m.volume_thickness != 0 for m in src):
        ext_vol = _stack([PBRMaterialVolumeAttribs.create(
            m.volume_attenuation_color, m.volume_thickness,
            min(m.volume_attenuation_distance, 1e9)) for m in src])

    atlas = builder.build() if builder.images else None
    if atlas is None:
        from diligentfx_tpu.ops.texture import white_atlas
        atlas = white_atlas()

    # flatten scene nodes with meshes (BLEND geometry splits into the OIT set)
    pos, nrm, uv, tan = [], [], [], []
    idx, vnode, tmat, tds = [], [], [], []
    bidx, btmat = [], []
    node_mats = []
    joints_l, weights_l = [], []
    any_skin = any(model.nodes[ni].skin >= 0 and model.nodes[ni].mesh >= 0
                   for ni in model.default_scene_nodes)
    # per-skin offset into the concatenated joint-matrix array
    skin_offsets = []
    off = 0
    for s in model.skins:
        skin_offsets.append(off)
        off += len(s["joints"])
    total_joints = max(off, 1)
    mesh_node_ids = []
    v_off = 0
    node_slot = 0
    for ni in model.default_scene_nodes:
        node = model.nodes[ni]
        if node.mesh < 0:
            continue
        for prim in model.meshes[node.mesh]:
            v = prim.positions.shape[0]
            p = prim.positions
            n = prim.normals
            if n is None:
                # flat-ish fallback: area-weighted vertex normals
                n = np.zeros_like(p)
                t0, t1, t2 = (prim.indices[:, k] for k in range(3))
                fn = np.cross(p[t1] - p[t0], p[t2] - p[t0])
                for k in (t0, t1, t2):
                    np.add.at(n, k, fn)
                ln = np.linalg.norm(n, axis=-1, keepdims=True)
                n = n / np.maximum(ln, 1e-12)
            u = prim.uv0 if prim.uv0 is not None else np.zeros((v, 2), np.float32)
            t = prim.tangents
            if t is None:
                t = compute_tangents(p, n, u, prim.indices)
            pos.append(p)
            nrm.append(n.astype(np.float32))
            uv.append(u.astype(np.float32))
            tan.append(t.astype(np.float32))
            vnode.append(np.full(v, node_slot, np.int32))
            if any_skin:
                if (node.skin >= 0 and prim.joints is not None
                        and prim.weights is not None):
                    jo = skin_offsets[node.skin]
                    joints_l.append(prim.joints.astype(np.int32) + jo)
                    w4 = prim.weights.astype(np.float32)
                    wsum = np.maximum(w4.sum(-1, keepdims=True), 1e-9)
                    weights_l.append(w4 / wsum)
                else:
                    joints_l.append(np.full((v, 4), -1, np.int32))
                    weights_l.append(np.zeros((v, 4), np.float32))
            mat_i = prim.material if prim.material >= 0 else 0
            nt = prim.indices.shape[0]
            is_blend = (mat_i < len(mats) and mats[mat_i].alpha_mode == "BLEND")
            if is_blend:
                bidx.append(prim.indices + v_off)
                btmat.append(np.full(nt, mat_i, np.int32))
            else:
                idx.append(prim.indices + v_off)
                tmat.append(np.full(nt, mat_i, np.int32))
                ds = mats[mat_i].double_sided if mat_i < len(mats) else False
                tds.append(np.full(nt, ds, bool))
            v_off += v
        node_mats.append(node.world.astype(np.float32))
        mesh_node_ids.append(ni)
        node_slot += 1

    if not pos:
        raise ValueError("glTF scene contains no triangle geometry")
    if not idx:
        # all-transparent scene: keep a degenerate opaque triangle so the
        # main pass has static nonzero shapes
        idx.append(np.zeros((1, 3), np.int32))
        tmat.append(np.zeros(1, np.int32))
        tds.append(np.zeros(1, bool))

    node_m = jnp.asarray(np.stack(node_mats))
    idx_np = np.concatenate(idx)
    tmat_np = np.concatenate(tmat)
    tds_np = np.concatenate(tds)
    # ALPHA_MODE_MASK tris to the tail (ScenePrimitives.mask_indices invariant)
    mat_is_mask = np.array([m.alpha_mode == "MASK" for m in mats], bool)
    is_mask = (mat_is_mask[np.clip(tmat_np, 0, max(len(mats) - 1, 0))]
               if len(mats) else np.zeros(tmat_np.shape[0], bool))
    mask_idx = None
    if is_mask.any():
        order = np.argsort(is_mask, kind="stable")
        idx_np, tmat_np, tds_np = idx_np[order], tmat_np[order], tds_np[order]
        mask_idx = jnp.asarray(idx_np[-int(is_mask.sum()):])
    scene = ScenePrimitives(
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
        materials=stack_materials(basic),
        tex_ids=jnp.asarray(tex_ids),
        tex_uv_transform=jnp.asarray(tex_xform),
        tex_wraps=jnp.asarray(tex_wraps),
        materials_sheen=ext_sheen,
        materials_anisotropy=ext_aniso,
        materials_iridescence=ext_irid,
        materials_transmission=ext_trans,
        materials_volume=ext_vol,
        blend_indices=jnp.asarray(np.concatenate(bidx)) if bidx else None,
        blend_tri_material=jnp.asarray(np.concatenate(btmat)) if btmat else None,
        joints=jnp.asarray(np.concatenate(joints_l)) if joints_l else None,
        weights=jnp.asarray(np.concatenate(weights_l)) if joints_l else None,
        joint_matrices=(jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                                 (total_joints, 1, 1)) if joints_l else None),
        prev_joint_matrices=(jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                                      (total_joints, 1, 1)) if joints_l else None),
    )

    # lights from node hierarchy
    lights = []
    for ni in model.default_scene_nodes:
        node = model.nodes[ni]
        if node.light < 0 or node.light >= len(model.lights):
            continue
        l = model.lights[node.light]
        w = node.world
        lpos = w[3, :3]
        ldir = -w[2, :3]  # glTF lights point down local -Z
        ldir = ldir / max(np.linalg.norm(ldir), 1e-9)
        intensity = tuple(np.asarray(l.color) * l.intensity)
        rng = l.range if l.range > 0 else 100.0
        if l.type == "directional":
            lights.append(PBRLightAttribs.directional(ldir, intensity))
        elif l.type == "point":
            lights.append(PBRLightAttribs.point(lpos, intensity, range=rng))
        else:
            lights.append(PBRLightAttribs.spot(
                lpos, ldir, intensity, l.inner_cone_angle,
                l.outer_cone_angle, range=rng))
    if extra_lights is not None:
        lights.append(extra_lights)
    all_lights = PBRLightAttribs.concat(lights) if lights else None
    return RenderScene(scene=scene, atlas=atlas, lights=all_lights,
                       mesh_node_ids=tuple(mesh_node_ids))
