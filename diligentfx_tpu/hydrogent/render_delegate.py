"""Hydra render delegate — the analogue of Hydrogent's HnRenderDelegate
(interface/HnRenderDelegate.hpp:156-539) and its prims HnMesh / HnMaterial /
HnMaterialNetwork / HnLight / HnCamera / HnRenderBuffer, HnRenderParam, and
the memory-stats surface (interface:68-146).

OpenUSD is not present in this image, so the delegate exposes Hydra's
prim-oriented protocol directly (create prims by id → set primvars/topology →
CommitResources → execute task graph).  When `pxr` IS importable, `bind_usd`
returns an adapter registering these prims against pxr.HdRenderDelegate so
USD scenes render unchanged (the north-star path) — the adapter is gated and
untested here for lack of pxr.

Topology handling mirrors HnMeshUtils: arbitrary polygon face sets are
fan-triangulated through the native module (dfx_triangulate_faces).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import functools as _functools

import jax as _jax
import numpy as np

from diligentfx_tpu.native import binding as native


# ---------------------------------------------------------------------------
# Render param (HnRenderParam: include/HnRenderParam.hpp:67-154)
# ---------------------------------------------------------------------------


class HnGeometryMode:
    SOLID = 0
    EDGES = 1
    POINTS = 2


@dataclass
class HnRenderParam:
    """Global mutable state with per-attribute version counters
    (MakeAttribDirty include:126)."""
    geometry_mode: int = HnGeometryMode.SOLID
    view_mode: int = 0               # HN_VIEW_MODE_* ≙ DebugViewType
    use_shadows: bool = False
    frame_number: int = 0
    elapsed_time: float = 0.0
    _versions: Dict[str, int] = field(default_factory=dict)

    def make_attrib_dirty(self, name: str) -> None:
        self._versions[name] = self._versions.get(name, 0) + 1

    def get_attrib_version(self, name: str) -> int:
        return self._versions.get(name, 0)


# ---------------------------------------------------------------------------
# Prims
# ---------------------------------------------------------------------------


class HnMesh:
    """Rprim: topology + primvars + transform (HnMesh.cpp:192-1408)."""

    def __init__(self, prim_id: str, delegate: "HnRenderDelegate"):
        self.id = prim_id
        self._d = delegate
        self.points: Optional[np.ndarray] = None
        self.normals: Optional[np.ndarray] = None
        self.uvs: Optional[np.ndarray] = None
        self.indices: Optional[np.ndarray] = None
        self.transform = np.eye(4, dtype=np.float32)
        self.material_id: str = ""
        self.visible = True
        self.dirty = True
        # geometry subsets (HdGeomSubset): per-face-set material bindings
        # (HnMesh.cpp geometry-subset draw items)
        self.geom_subsets: list = []
        self.tri_face: Optional[np.ndarray] = None   # (T,) original face id

    def set_topology(self, face_counts, face_indices) -> None:
        """Arbitrary polygons → triangles (HnMeshUtils proxy indices)."""
        fc = np.asarray(face_counts, np.int32)
        self.indices = native.triangulate_faces(
            fc, np.asarray(face_indices, np.int32))
        # fan triangulation emits each face's triangles consecutively →
        # the face-of-triangle map is a repeat over (count - 2)
        self.tri_face = np.repeat(np.arange(len(fc), dtype=np.int32),
                                  np.maximum(fc - 2, 0))
        self.dirty = True
        self._d._bump("mesh_topology")

    def set_triangles(self, indices) -> None:
        self.indices = np.asarray(indices, np.int32).reshape(-1, 3)
        self.tri_face = np.arange(self.indices.shape[0], dtype=np.int32)
        self.dirty = True
        self._d._bump("mesh_topology")

    def set_geom_subsets(self, subsets) -> None:
        """HdGeomSubset face sets: [(material_id, face_indices), ...] — faces
        index the ORIGINAL (pre-triangulation) faces.  Later subsets win on
        overlap, unassigned faces keep the mesh material (HnMesh.cpp
        geometry-subset draw-item splitting; here it is a per-triangle
        material relabel — the mega-draw needs no draw-item split)."""
        self.geom_subsets = [(str(mid), np.asarray(f, np.int32))
                             for mid, f in subsets]
        self.dirty = True
        self._d._bump("mesh_topology")

    def set_points(self, points) -> None:
        self.points = np.asarray(points, np.float32)
        self.dirty = True
        self._d._bump("mesh_geometry")

    def set_primvar(self, name: str, value) -> None:
        v = np.asarray(value, np.float32)
        if name == "normals":
            self.normals = v
        elif name in ("st", "uv", "uv0"):
            self.uvs = v
        self.dirty = True
        self._d._bump("mesh_geometry")

    def set_transform(self, m) -> None:
        self.transform = np.asarray(m, np.float32)
        # transform-only change: NOT a scene rebuild — execute() updates the
        # node matrices in place (the HnGeometryPool dirty-range analogue:
        # commit stays O(changed), not O(scene))
        self._d._transform_dirty.add(self.id)
        self._d.render_param.make_attrib_dirty("mesh_transform")

    def set_material(self, material_id: str) -> None:
        self.material_id = material_id
        self.dirty = True
        self._d._bump("mesh_material")

    def set_visibility(self, visible: bool) -> None:
        self.visible = bool(visible)
        self._d._bump("mesh_visibility")


# The real node-graph parse (UsdPreviewSurface + UsdUVTexture + primvar
# readers + transform2d) lives in material_network.py; re-exported here for
# backward compatibility with the old flat-dict shim location.
from diligentfx_tpu.hydrogent.material_network import (  # noqa: E402
    HnMaterialNetwork, TextureDescriptor, normalized_payload)


class HnMaterial:
    """Sprim (HnMaterial.cpp:1375)."""

    def __init__(self, prim_id: str, delegate: "HnRenderDelegate"):
        self.id = prim_id
        self._d = delegate
        self.network = HnMaterialNetwork()
        self.dirty = True

    def set_network(self, network: dict) -> None:
        self.network = HnMaterialNetwork(network)
        self.dirty = True
        self._d._bump("material")


class HnLight:
    """Sprim for dir/point/spot/dome lights (HnLight.cpp:699)."""

    def __init__(self, prim_id: str, delegate: "HnRenderDelegate"):
        self.id = prim_id
        self._d = delegate
        self.type = "distant"
        self.color = (1.0, 1.0, 1.0)
        self.intensity = 1.0
        self.direction = (0.0, -1.0, 0.0)
        self.position = (0.0, 0.0, 0.0)
        self.cone_angles = (0.0, 0.785)
        self.range = 100.0
        self.cast_shadows = False
        self.dome_env: Optional[np.ndarray] = None   # octahedral env for dome

    def set_params(self, **kw) -> None:
        for k, v in kw.items():
            setattr(self, k, v)
        self._d._bump("light")


class HnCamera:
    """Sprim camera (HnCamera 143 LoC)."""

    def __init__(self, prim_id: str, delegate: "HnRenderDelegate"):
        self.id = prim_id
        self._d = delegate
        self.eye = (0.0, 1.0, 5.0)
        self.target = (0.0, 0.0, 0.0)
        self.fov_y = 1.0
        self.near_z = 0.1
        self.far_z = 100.0

    def set_params(self, **kw) -> None:
        for k, v in kw.items():
            setattr(self, k, v)
        self._d._bump("camera")


class HnRenderBuffer:
    """Bprim: a named AOV view over the last frame's G-buffer."""

    def __init__(self, prim_id: str, delegate: "HnRenderDelegate", aov: str):
        self.id = prim_id
        self.aov = aov
        self._d = delegate

    def read(self):
        out = self._d.last_output
        if out is None:
            return None
        if self.aov == "color":
            return out.color
        return getattr(out.gbuffer, self.aov)


# ---------------------------------------------------------------------------
# Delegate
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HnRenderDelegateCreateInfo:
    """HnRenderDelegate::CreateInfo (interface:159-278, the TPU-relevant subset)."""
    atlas_size: int = 1024
    texture_load_budget_bytes: int = 32 << 20
    geometry_load_budget_bytes: int = 64 << 20
    oit_layer_count: int = 4
    enable_shadows: bool = False
    shadow_map_size: int = 1024
    allow_parallel_sync: bool = True


@dataclass
class HnRenderDelegateMemoryStats:
    """interface:68-146 analogue."""
    vertex_pool_capacity: int = 0
    vertex_pool_used: int = 0
    index_pool_capacity: int = 0
    index_pool_used: int = 0
    atlas_bytes: int = 0
    num_meshes: int = 0
    num_materials: int = 0
    num_lights: int = 0


class HnRenderDelegate:
    """Owns prims + pools + the frame task graph; CommitResources packs dirty
    prims into the device scene (HnRenderDelegate::CommitResources,
    interface:402)."""

    SUPPORTED_RPRIMS = ("mesh",)
    SUPPORTED_SPRIMS = ("material", "light", "camera")
    SUPPORTED_BPRIMS = ("renderBuffer",)

    def __init__(self, ci: HnRenderDelegateCreateInfo = HnRenderDelegateCreateInfo(),
                 renderer=None, task_manager_ci=None):
        self.ci = ci
        self.meshes: Dict[str, HnMesh] = {}
        self.materials: Dict[str, HnMaterial] = {}
        self.lights: Dict[str, HnLight] = {}
        self.cameras: Dict[str, HnCamera] = {}
        self.buffers: Dict[str, HnRenderBuffer] = {}
        self.render_param = HnRenderParam()
        # content-deduplicated, budgeted geometry pool with persistent device
        # storage (HnGeometryPool.cpp dedup + dirty-range commit + budget)
        from diligentfx_tpu.hydrogent.geometry_pool import HnGeometryPool
        self.geometry_pool = HnGeometryPool(
            load_budget_bytes=ci.geometry_load_budget_bytes)
        self._scene = None
        self._tm = None
        self._tm_ci = task_manager_ci
        self._renderer = renderer
        self._state = None
        self.last_output = None
        self._mesh_geo: Dict[str, bytes] = {}   # prim id → pool content key
        # HnTextureRegistry analogue: async loads + dedup + budgeted commit
        from diligentfx_tpu.hydrogent.texture_registry import HnTextureRegistry
        self.texture_registry = HnTextureRegistry(
            atlas_dim=ci.atlas_size,
            upload_budget_bytes=ci.texture_load_budget_bytes)
        self._atlas = None
        self._transform_dirty: set = set()
        self._mesh_slots: Dict[str, int] = {}

    # -- prim factories (HnRenderDelegate prim factories, interface:344-387) --

    def create_rprim(self, type_id: str, prim_id: str) -> HnMesh:
        assert type_id == "mesh", type_id
        m = HnMesh(prim_id, self)
        self.meshes[prim_id] = m
        return m

    def create_sprim(self, type_id: str, prim_id: str):
        if type_id == "material":
            p = HnMaterial(prim_id, self)
            self.materials[prim_id] = p
        elif type_id == "light":
            p = HnLight(prim_id, self)
            self.lights[prim_id] = p
        elif type_id == "camera":
            p = HnCamera(prim_id, self)
            self.cameras[prim_id] = p
        else:
            raise ValueError(type_id)
        return p

    def create_bprim(self, type_id: str, prim_id: str, aov: str = "color"):
        assert type_id == "renderBuffer"
        b = HnRenderBuffer(prim_id, self, aov)
        self.buffers[prim_id] = b
        return b

    def destroy_prim(self, prim_id: str) -> None:
        for store in (self.meshes, self.materials, self.lights,
                      self.cameras, self.buffers):
            if prim_id in store:
                if store is self.meshes and prim_id in self._mesh_geo:
                    self.geometry_pool.release(self._mesh_geo.pop(prim_id))
                del store[prim_id]
                self._bump("prims")
                # 'prims' bumps alone don't dirty the scene (creation happens
                # before data arrives), but removal must force a rebuild or
                # the destroyed mesh keeps rendering (ADVICE r1).
                self._scene_dirty = True
                return

    def _bump(self, what: str) -> None:
        self.render_param.make_attrib_dirty(what)
        if what != "prims":
            self._scene_dirty = True

    # -- commit (geometry-pool commit + scene build) ---------------------------

    def commit_resources(self):
        """Packs all visible meshes into one ScenePrimitives (the upload
        point of HnGeometryPool::Commit + texture registry commit)."""
        import jax.numpy as jnp
        from diligentfx_tpu.attribs import PBRMaterialBasicAttribs, stack_materials
        from diligentfx_tpu.pbr.renderer import ScenePrimitives

        entries = []
        mats: List = []
        mat_index: Dict[str, int] = {}
        mat_tex: List[List[int]] = []      # per material: 5 slot tex ids
        mat_uvxf: List[List[Tuple[float, ...]]] = []  # (5, 6) uv transforms
        mat_wraps: List[List[Tuple[int, int]]] = []   # (5, 2) wrap u/v

        def material_slot(mid: str) -> int:
            if mid in mat_index:
                return mat_index[mid]
            net = (self.materials[mid].network if mid in self.materials
                   else HnMaterialNetwork())
            alpha_mode = {"default": 0, "masked": 1, "translucent": 2}[net.tag]
            mats.append(PBRMaterialBasicAttribs.create(
                base_color_factor=(*net.diffuse_color, net.opacity),
                emissive_factor=net.emissive_color,
                metallic_factor=net.metallic,
                roughness_factor=net.roughness,
                alpha_mode=alpha_mode,
                alpha_mask_cutoff=net.opacity_threshold,
                clearcoat_factor=net.clearcoat,
                clearcoat_roughness_factor=net.clearcoat_roughness))
            # per-slot texture descriptors carry sampler state (wrap modes,
            # UV transform from UsdTransform2d, channel swizzle) — the
            # HnMaterial texture-allocation path (HnMaterial.cpp) with
            # PBRMaterialTextureAttribs semantics (PBR_Structures.fxh:245-255)
            slots = [-1, -1, -1, -1, -1]
            uvxfs = [(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)] * 5
            wraps = [(0, 0)] * 5
            for slot in range(5):
                desc = net.texture_for_slot(slot)
                if desc is None:
                    continue
                payload = normalized_payload(desc, slot)
                if payload is None:
                    continue
                slots[slot] = self.texture_registry.allocate(
                    np.asarray(payload) if not callable(payload) else payload)
                uvxfs[slot] = desc.uv_transform
                wraps[slot] = (desc.wrap_u, desc.wrap_v)
            mat_tex.append(slots)
            mat_uvxf.append(uvxfs)
            mat_wraps.append(wraps)
            mat_index[mid] = len(mats) - 1
            return mat_index[mid]

        # ---- geometry: route every mesh through the deduplicated pool -------
        # (HnGeometryPool::Commit) — identical content shares ONE entry;
        # dirty meshes upload O(their bytes); scene expansion is a
        # device-side gather from the resident pool.
        #
        # Parallel prim sync (HnRenderDelegate::IsParallelSyncEnabled,
        # interface:405): the per-mesh pure-host prep (content hash, area
        # normals, tangent generation) fans out across a thread pool; the
        # stateful pool registration then runs serially in prim order, so
        # offsets/dedup NEVER depend on thread completion order (determinism
        # contract, tested).
        pool = self.geometry_pool
        dirty = [(pid, mesh) for pid, mesh in self.meshes.items()
                 if (mesh.visible and mesh.points is not None
                     and mesh.indices is not None
                     and (mesh.dirty or pid not in self._mesh_geo))]
        if self.ci.allow_parallel_sync and len(dirty) > 1:
            import os
            from concurrent.futures import ThreadPoolExecutor
            workers = min(len(dirty), max(os.cpu_count() or 1, 2), 16)
            with ThreadPoolExecutor(max_workers=workers) as ex:
                prepped = list(ex.map(
                    lambda pm: pool.prepare_content(
                        pm[1].points, pm[1].normals, pm[1].uvs,
                        pm[1].indices),
                    dirty))
        else:
            prepped = [pool.prepare_content(m.points, m.normals, m.uvs,
                                            m.indices) for _, m in dirty]
        for (pid, mesh), (key, staged) in zip(dirty, prepped):
            new_key = pool.acquire_prepared(key, staged)
            old = self._mesh_geo.get(pid)
            if old is not None:
                pool.release(old)
            self._mesh_geo[pid] = new_key
            mesh.dirty = False
        pool_dev = pool.commit()        # budgeted: entries past the budget
                                        # stay PENDING until a later commit

        instances = []                  # (pid, mesh, key) resident this frame
        # slots are valid only for meshes in THIS expansion: a stale slot from
        # a budget-deferred (PENDING) mesh would alias another instance's
        # node_matrices row on the next transform-only commit
        self._mesh_slots = {}
        vnode, tmat, tds, node_m = [], [], [], []
        v_off = 0
        slot = 0
        for pid, mesh in self.meshes.items():
            key = self._mesh_geo.get(pid)
            if (not mesh.visible or mesh.points is None
                    or mesh.indices is None or key is None
                    or not pool.is_resident(key)):
                continue
            v_len = pool.range_of(key)[1]
            t_len = pool.range_of(key)[3]
            instances.append((pid, key))
            vnode.append(np.full(v_len, slot, np.int32))
            mslot = material_slot(mesh.material_id)
            tm = np.full(t_len, mslot, np.int32)
            if mesh.geom_subsets and mesh.tri_face is not None:
                # per-face-set material bindings (HdGeomSubset)
                nf = int(mesh.tri_face.max()) + 1 if t_len else 0
                face_mat = np.full(nf, mslot, np.int32)
                for sub_mid, faces in mesh.geom_subsets:
                    face_mat[faces[(faces >= 0) & (faces < nf)]] = \
                        material_slot(sub_mid)
                tm = face_mat[mesh.tri_face]
            tmat.append(tm)
            tds.append(np.zeros(t_len, bool))
            node_m.append(mesh.transform)
            self._mesh_slots[pid] = slot
            v_off += v_len
            slot += 1

        pos = nrm = uv = tan = idx = None
        if instances:
            # device-side expansion: contiguous-range gathers out of the pool
            # (no geometry crosses the host→device tunnel here)
            vgather = np.concatenate([
                np.arange(pool.range_of(k)[0],
                          pool.range_of(k)[0] + pool.range_of(k)[1],
                          dtype=np.int32) for _, k in instances])
            vg = jnp.asarray(vgather)
            pos = pool_dev["positions"][vg]
            nrm = pool_dev["normals"][vg]
            uv = pool_dev["uvs"][vg]
            tan = pool_dev["tangents"][vg]
            pieces, off = [], 0
            for _, k in instances:
                p_v0, p_vl, p_t0, p_tl = pool.range_of(k)
                pieces.append(pool_dev["indices"][p_t0:p_t0 + p_tl]
                              + (off - p_v0))
                off += p_vl
            idx = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]

        if not instances:
            # empty stage: render background-only frames (mesh_id = -1
            # everywhere) through the normal pipeline via one degenerate
            # zero-area triangle — Hydrogent keeps rendering when the last
            # Rprim is removed (HnRenderDelegate::DestroyRprim)
            pos = jnp.zeros((3, 3), jnp.float32)
            nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (3, 1))
            uv = jnp.zeros((3, 2), jnp.float32)
            tan = jnp.tile(jnp.asarray([[1.0, 0, 0, 1]], jnp.float32), (3, 1))
            idx = jnp.asarray([[0, 1, 2]], jnp.int32)
            vnode.append(np.zeros(3, np.int32))
            tmat.append(np.zeros(1, np.int32))
            tds.append(np.zeros(1, bool))
            node_m.append(np.eye(4, dtype=np.float32))
        if not mats:
            mats.append(PBRMaterialBasicAttribs.create())
            mat_tex.append([-1] * 5)
            mat_uvxf.append([(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)] * 5)
            mat_wraps.append([(0, 0)] * 5)
        # texture registry commit: budgeted atlas build (HnTextureRegistry)
        self._atlas = self.texture_registry.commit()
        tex_kwargs = {}
        if self._atlas is not None and any(t >= 0 for row in mat_tex for t in row):
            tex_kwargs = dict(
                tex_ids=jnp.asarray(np.asarray(mat_tex, np.int32)),
                tex_uv_transform=jnp.asarray(np.asarray(mat_uvxf, np.float32)),
                tex_wraps=jnp.asarray(np.asarray(mat_wraps, np.int32)))
        nm = jnp.asarray(np.stack(node_m))
        self._scene = ScenePrimitives(
            positions=pos, normals=nrm, uvs=uv, tangents=tan, indices=idx,
            vertex_node=jnp.asarray(np.concatenate(vnode)),
            tri_material=jnp.asarray(np.concatenate(tmat)),
            tri_double_sided=jnp.asarray(np.concatenate(tds)),
            node_matrices=nm, prev_node_matrices=nm,
            materials=stack_materials(mats), **tex_kwargs)
        self._transform_dirty.clear()
        return self._scene

    # -- execution -------------------------------------------------------------

    def execute(self, width: int, height: int, camera_id: Optional[str] = None):
        """HdEngine::Execute(GetTasks()) analogue: commit + run the frame."""
        from diligentfx_tpu import math3d as m3
        from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                            PBRRendererShaderParameters)
        from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
        from diligentfx_tpu.hydrogent.task_manager import (HnTaskManager,
                                                           TaskManagerCreateInfo)
        from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

        if self._scene is None or getattr(self, "_scene_dirty", True):
            self.commit_resources()
            self._scene_dirty = False
        elif self._transform_dirty:
            # transform-only commit: O(changed prims) node-matrix update, no
            # geometry re-upload (HnGeometryPool dirty-range semantics,
            # include:66); previous matrices keep the motion vectors honest
            import jax.numpy as jnp
            nm = np.asarray(self._scene.node_matrices).copy()
            prev = self._scene.node_matrices
            for pid in self._transform_dirty:
                sl = self._mesh_slots.get(pid)
                if sl is not None and pid in self.meshes:
                    nm[sl] = self.meshes[pid].transform
            self._scene = self._scene._replace(
                node_matrices=jnp.asarray(nm), prev_node_matrices=prev)
            self._transform_dirty.clear()
        if self._scene is None:
            return None
        # async-decoded / budget-deferred textures become resident on later
        # frames WITHOUT a scene rebuild: pump the registry per frame and
        # swap the atlas when its layout version changed (the registry's
        # 'render immediately, refine as uploads land' contract; ADVICE r2)
        if (self._scene.tex_ids is not None
                and self.texture_registry.num_pending > 0):
            sv = self.texture_registry.storage_version
            atlas = self.texture_registry.commit()
            if self.texture_registry.storage_version != sv:
                self._atlas = atlas
        # budget-deferred geometry becomes resident on later frames: rebuild
        # the scene (a device-side re-gather, not a re-upload) once the pool
        # commits more entries (HnGeometryPool PENDING semantics)
        if self.geometry_pool.num_pending > 0:
            sv = self.geometry_pool.storage_version
            self.geometry_pool.commit()
            if self.geometry_pool.storage_version != sv:
                self.commit_resources()

        if self._tm is None:
            renderer = self._renderer or PBRRenderer(
                PBRRendererCreateInfo(brdf_lut_dim=32, num_brdf_samples=16,
                                      irradiance_cube_dim=16,
                                      prefiltered_env_map_dim=32,
                                      num_specular_env_samples=16))
            self._tm = HnTaskManager(renderer,
                                     self._tm_ci or TaskManagerCreateInfo())
            self._renderer = renderer
        # textures committed through the registry ride the task manager's
        # atlas (texture-array "atlas" binding mode)
        self._tm.atlas = (self._atlas
                          if self._scene.tex_ids is not None else None)
        if self._state is None:
            self._state = self._tm.initial_state(width, height)

        cam_prim = (self.cameras.get(camera_id) if camera_id
                    else next(iter(self.cameras.values()), None)) or HnCamera("", self)
        view = m3.look_at(list(cam_prim.eye), list(cam_prim.target))
        proj = m3.perspective(cam_prim.fov_y, width / height,
                              cam_prim.near_z, cam_prim.far_z)
        cam = CameraAttribs.create(view, proj, list(cam_prim.eye),
                                   cam_prim.near_z, cam_prim.far_z,
                                   width, height)
        lights = []
        for l in self.lights.values():
            col = tuple(np.asarray(l.color) * l.intensity)
            if l.type in ("distant", "directional"):
                lights.append(PBRLightAttribs.directional(l.direction, col))
            elif l.type == "point":
                lights.append(PBRLightAttribs.point(l.position, col, range=l.range))
            elif l.type == "spot":
                lights.append(PBRLightAttribs.spot(
                    l.position, l.direction, col, l.cone_angles[0],
                    l.cone_angles[1], range=l.range))
        if not lights:
            lights.append(PBRLightAttribs.directional((0, -1, 0), (3, 3, 3)))
        info = RenderInfo(camera=cam, lights=PBRLightAttribs.concat(lights),
                          renderer_params=PBRRendererShaderParameters.create())
        if self.render_param.geometry_mode != HnGeometryMode.SOLID:
            # HnRenderParam geometry mode (HnTypes.hpp solid/edges/points;
            # HnMeshUtils edge/point geometry): in a visibility buffer the
            # edge/point geometry needs no extra index buffers — edges come
            # from the barycentric distance, points from vertex splats.
            color = render_geometry_mode(
                self._scene, info, width=width, height=height,
                cfg=self._renderer.raster_cfg,
                mode=int(self.render_param.geometry_mode))
            from diligentfx_tpu.hydrogent.task_manager import FrameOutput
            out = FrameOutput(color=color, gbuffer=None, state=self._state)
            self.last_output = out
            self.render_param.frame_number += 1
            self._fold_prev_transforms()
            return out
        out = self._tm.execute(self._scene, info, self._state,
                               width=width, height=height)
        self._state = out.state
        self.last_output = out
        self.render_param.frame_number += 1
        self._fold_prev_transforms()
        return out

    def _fold_prev_transforms(self) -> None:
        """After a frame consumed a transform delta, advance prev → current so
        motion vectors return to zero on the next static frame (ADVICE r2:
        prev matrices otherwise lag forever, rejecting TAA/SSR/SSAO history
        on the moved prims every frame)."""
        sc = self._scene
        if sc is not None and sc.prev_node_matrices is not sc.node_matrices:
            self._scene = sc._replace(prev_node_matrices=sc.node_matrices)

    def read_rprim_id(self, x: int, y: int) -> int:
        """Picking (HnReadRprimIdTask: the GPU→CPU readback boundary becomes
        a device→host transfer of one AOV)."""
        if self.last_output is None:
            return -1
        return int(np.asarray(self.last_output.gbuffer.mesh_id)[y, x])

    def get_memory_stats(self) -> HnRenderDelegateMemoryStats:
        vcap, vused, _, _ = self.geometry_pool._valloc.stats()
        icap, iused, _, _ = self.geometry_pool._talloc.stats()
        return HnRenderDelegateMemoryStats(
            vertex_pool_capacity=vcap * 48, vertex_pool_used=vused * 48,
            index_pool_capacity=icap * 12, index_pool_used=iused * 12,
            atlas_bytes=self.texture_registry.resident_bytes,
            num_meshes=len(self.meshes), num_materials=len(self.materials),
            num_lights=len(self.lights))


def _area_normals(points: np.ndarray, indices: np.ndarray) -> np.ndarray:
    n = np.zeros_like(points)
    t0, t1, t2 = indices[:, 0], indices[:, 1], indices[:, 2]
    fn = np.cross(points[t1] - points[t0], points[t2] - points[t0])
    for k in (t0, t1, t2):
        np.add.at(n, k, fn)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(ln, 1e-12)).astype(np.float32)


def bind_usd():
    """Returns the bound pxr.HdRenderDelegate adapter classes when OpenUSD is
    importable; raises ImportError otherwise.  The adapter itself lives in
    usd_adapter.py and is structurally tested against a fake-pxr shim
    (tests/test_usd_adapter.py) since pxr is not shipped in this image."""
    from diligentfx_tpu.hydrogent.usd_adapter import bind_usd as _bind
    return _bind()


@_functools.partial(_jax.jit, static_argnames=("width", "height", "cfg",
                                               "mode"))
def render_geometry_mode(scene, info, *, width: int, height: int, cfg,
                         mode: int):
    """EDGES / POINTS geometry modes (HnRenderParam geometry mode;
    HnMeshUtils edge + point proxy geometry, HnMesh.cpp geometry subsets).

    TPU design: the reference builds separate edge/point index buffers and
    draws lines/points; a visibility buffer already carries per-pixel
    barycentrics, so EDGES is a screen-space barycentric-distance test on
    the rasterized triangles, and POINTS splats projected vertices with a
    scatter — no extra geometry, no divergent line rasterization."""
    import jax.numpy as jnp

    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.ops import raster as rz
    from diligentfx_tpu.pbr.renderer import transform_vertices

    pad_w, pad_h = rz.pad_viewport(width, height, cfg)
    wp, _, _ = transform_vertices(scene, info.model_transform)
    clip = m3.transform_points(wp, info.camera.view_proj)
    bg = jnp.full((pad_h, pad_w, 3), 0.12, jnp.float32)
    fg = jnp.asarray([0.85, 0.9, 1.0], jnp.float32)
    if mode == int(HnGeometryMode.EDGES):
        vb, _ = rz.rasterize(clip, scene.indices, width=pad_w, height=pad_h,
                             cfg=cfg, double_sided=scene.tri_double_sided)
        l0 = vb.bary[..., 0]
        l1 = vb.bary[..., 1]
        d = jnp.minimum(jnp.minimum(l0, l1), 1.0 - l0 - l1)
        edge = (vb.tri_id >= 0) & (d < 0.06)
        color = jnp.where(edge[..., None], fg,
                          jnp.where((vb.tri_id >= 0)[..., None],
                                    bg * 1.5, bg))
    else:
        # POINTS: project every vertex and splat a dot (scatter-max)
        w = jnp.maximum(clip[:, 3], 1e-6)
        ndc = clip[:, :3] / w[:, None]
        px = ((ndc[:, 0] * 0.5 + 0.5) * pad_w).astype(jnp.int32)
        py = ((0.5 - ndc[:, 1] * 0.5) * pad_h).astype(jnp.int32)
        inside = ((clip[:, 3] > 0) & (px >= 0) & (px < pad_w)
                  & (py >= 0) & (py < pad_h))
        px = jnp.clip(px, 0, pad_w - 1)
        py = jnp.clip(py, 0, pad_h - 1)
        mask = jnp.zeros((pad_h, pad_w), jnp.float32)
        mask = mask.at[py, px].max(inside.astype(jnp.float32))
        color = bg + mask[..., None] * (fg - bg)
    return color[:height, :width]
