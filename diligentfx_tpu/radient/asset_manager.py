"""Async asset manager — the analogue of Radient's asset subsystem
(RadientAssetManagerImpl src:346-643: CreateMesh/CreateMaterial/LoadTexture/
LoadScene async + WaitForAssetLoad + Stop + UpdateGPUResources per frame;
content-hash dedup caches per RadientMeshAssetManager.hpp:146-148).

Host-side loading/decoding runs on a thread pool; `update_gpu_resources()`
commits finished host payloads to device arrays (device_put) under an
optional per-frame byte budget — the analogue of the GPU upload manager pump
+ GeometryLoadBudget (HnRenderDelegate interface:254-274).

Content hashing uses the C++ native module (diligentfx_tpu/native) when
built, else a Python hashlib fallback.
"""
from __future__ import annotations

import hashlib
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from diligentfx_tpu.radient.types import LoadStatus, RadientError, RadientStatus


def _content_hash(*arrays) -> bytes:
    try:
        from diligentfx_tpu.native import binding
        return binding.content_hash(*arrays)
    except Exception:
        h = hashlib.blake2b(digest_size=16)
        for a in arrays:
            a = np.ascontiguousarray(a)
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(a.tobytes())
        return h.digest()


@dataclass
class MeshAsset:
    handle: int
    status: LoadStatus = LoadStatus.NONE
    # host payload
    positions: Optional[np.ndarray] = None
    normals: Optional[np.ndarray] = None
    uvs: Optional[np.ndarray] = None
    tangents: Optional[np.ndarray] = None
    indices: Optional[np.ndarray] = None
    # device payload (committed)
    device: Optional[dict] = None
    error: str = ""


@dataclass
class MaterialAsset:
    handle: int
    status: LoadStatus = LoadStatus.NONE
    attribs: Any = None          # PBRMaterialBasicAttribs
    texture_handles: Dict[str, int] = field(default_factory=dict)
    double_sided: bool = False
    error: str = ""


@dataclass
class TextureAsset:
    handle: int
    status: LoadStatus = LoadStatus.NONE
    image: Optional[np.ndarray] = None
    atlas_id: int = -1
    error: str = ""


@dataclass
class AssetManagerStats:
    """RadientTextureAssetManagerStats / HnRenderDelegateMemoryStats analogue."""
    meshes: int = 0
    materials: int = 0
    textures: int = 0
    dedup_hits: int = 0
    host_bytes: int = 0
    device_bytes: int = 0
    pending_uploads: int = 0


class AssetManager:
    """Thread-pooled async loading with dedup + deferred device commit."""

    def __init__(self, num_threads: int = 2,
                 upload_budget_bytes: int = 64 << 20,
                 resolver_chain=None):
        from diligentfx_tpu.radient.resolver import AssetResolverChain
        # URI → (bytes, canonical location); the canonical location is the
        # dedup identity (RadientFilesystemAssetResolver.cpp contract)
        self.resolver = resolver_chain or AssetResolverChain()
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self._lock = threading.Lock()
        self._next = 1
        self.meshes: Dict[int, MeshAsset] = {}
        self.materials: Dict[int, MaterialAsset] = {}
        self.textures: Dict[int, TextureAsset] = {}
        self._mesh_dedup: Dict[bytes, int] = {}
        self._tex_dedup: Dict[bytes, int] = {}
        self._futures: Dict[int, Future] = {}
        self._upload_queue: List[int] = []
        self.upload_budget_bytes = upload_budget_bytes
        self.stats = AssetManagerStats()
        self._stopped = False
        # committed textures land in a device atlas through the shared
        # texture registry (the RadientTextureAssetManager →
        # GLTF::ResourceManager atlas path); read it back via get_atlas()
        from diligentfx_tpu.hydrogent.texture_registry import HnTextureRegistry
        self._tex_registry = HnTextureRegistry(
            upload_budget_bytes=upload_budget_bytes, max_workers=1)
        self.atlas = None

    # -- creation (async) -----------------------------------------------------

    def create_mesh(self, positions, indices, normals=None, uvs=None,
                    tangents=None) -> int:
        """CreateMesh analogue. Deduplicates identical raw payloads
        ('CreateMeshDeduplicatesIdenticalRawData', RadientSceneTest.cpp:387)."""
        if self._stopped:
            raise RadientError(RadientStatus.FAILED, "asset manager stopped")
        from diligentfx_tpu.radient.validation import validate_mesh_inputs
        err = validate_mesh_inputs(positions, indices, normals, uvs, tangents)
        if err is not None:
            raise RadientError(RadientStatus.INVALID_ARGUMENT, err)
        positions = np.asarray(positions, np.float32)
        indices = np.asarray(indices, np.int32)
        key = _content_hash(positions, indices,
                            *(x for x in (normals, uvs, tangents) if x is not None))
        with self._lock:
            if key in self._mesh_dedup:
                self.stats.dedup_hits += 1
                return self._mesh_dedup[key]
            h = self._next
            self._next += 1
            asset = MeshAsset(handle=h, status=LoadStatus.QUEUED)
            self.meshes[h] = asset
            self._mesh_dedup[key] = h
            self.stats.meshes += 1

        def work():
            asset.status = LoadStatus.LOADING
            from diligentfx_tpu.gltf.primitives import compute_tangents
            v = positions.shape[0]
            n = (np.asarray(normals, np.float32) if normals is not None
                 else _compute_normals(positions, indices))
            u = (np.asarray(uvs, np.float32) if uvs is not None
                 else np.zeros((v, 2), np.float32))
            t = (np.asarray(tangents, np.float32) if tangents is not None
                 else compute_tangents(positions, n, u, indices))
            asset.positions, asset.normals = positions, n
            asset.uvs, asset.tangents, asset.indices = u, t, indices
            asset.status = LoadStatus.LOADED_HOST
            with self._lock:
                self._upload_queue.append(h)
                self.stats.host_bytes += positions.nbytes + indices.nbytes
                self.stats.pending_uploads += 1
            return h

        self._futures[h] = self._pool.submit(work)
        return h

    def create_material(self, attribs, double_sided=False,
                        texture_handles=None) -> int:
        with self._lock:
            h = self._next
            self._next += 1
            self.materials[h] = MaterialAsset(
                handle=h, status=LoadStatus.COMMITTED, attribs=attribs,
                double_sided=double_sided,
                texture_handles=texture_handles or {})
            self.stats.materials += 1
        return h

    def load_texture(self, source, release_callback: Optional[Callable] = None) -> int:
        """LoadTexture analogue: source = path or ndarray (caller-owned
        payloads get release_callback when consumed, mirroring the reference's
        release-callback fixtures, RadientSceneTest.cpp:70-84)."""
        if self._stopped:
            raise RadientError(RadientStatus.FAILED, "asset manager stopped")
        from diligentfx_tpu.radient.validation import validate_texture_load
        err = validate_texture_load(source)
        if err is not None:
            raise RadientError(RadientStatus.INVALID_ARGUMENT, err)
        # dedup key known up front: content hash for payloads, CANONICAL
        # location for URIs (so "a.png" and its absolute path dedup together)
        resolved = None
        if isinstance(source, str):
            # unresolvable sources keep the graceful contract: a handle whose
            # status goes FAILED (IO errors are async state, not exceptions —
            # only malformed ARGUMENTS raise, RadientAssetValidation.cpp)
            resolved = self.resolver.resolve(source)
            key = (("loc:" + resolved.location).encode()
                   if resolved is not None else ("uri:" + source).encode())
        else:
            key = _content_hash(np.asarray(source))
        with self._lock:
            if key in self._tex_dedup:
                self.stats.dedup_hits += 1
                h = self._tex_dedup[key]
                # duplicate payload is never consumed → release immediately
                if release_callback is not None:
                    release_callback()
                return h
            h = self._next
            self._next += 1
            asset = TextureAsset(handle=h, status=LoadStatus.QUEUED)
            self.textures[h] = asset
            self._tex_dedup[key] = h
            self.stats.textures += 1

        def work():
            asset.status = LoadStatus.LOADING
            try:
                if isinstance(source, str):
                    if resolved is None:
                        raise FileNotFoundError(source)
                    from diligentfx_tpu.utils.image import decode_png
                    img = decode_png(resolved.data)
                else:
                    img = np.asarray(source)
                asset.image = img
                asset.status = LoadStatus.LOADED_HOST
                with self._lock:
                    self._upload_queue.append(h)
                    self.stats.host_bytes += img.nbytes
                    self.stats.pending_uploads += 1
            except Exception as ex:  # noqa: BLE001 — surfaced via status
                asset.error = str(ex)
                asset.status = LoadStatus.FAILED
            finally:
                if release_callback is not None:
                    release_callback()
            return h

        self._futures[h] = self._pool.submit(work)
        return h

    # -- queries / sync ---------------------------------------------------------

    def get_status(self, handle: int) -> LoadStatus:
        for store in (self.meshes, self.materials, self.textures):
            if handle in store:
                return store[handle].status
        raise RadientError(RadientStatus.NOT_FOUND, f"asset {handle}")

    def wait_for_asset_load(self, handle: int, timeout: float = 30.0) -> LoadStatus:
        fut = self._futures.get(handle)
        if fut is not None:
            fut.result(timeout=timeout)
        return self.get_status(handle)

    def stop(self) -> None:
        """Drains async work (RadientAssetManagerImpl::Stop, cpp:536)."""
        self._stopped = True
        self._pool.shutdown(wait=True)

    # -- per-frame device commit --------------------------------------------------

    def update_gpu_resources(self, budget_bytes: Optional[int] = None) -> int:
        """Commits finished host payloads to device arrays, bounded by the
        upload budget; returns number of assets committed this call
        (UpdateGPUResources, RadientAssetManagerImpl.cpp:346-643)."""
        import jax.numpy as jnp
        budget = budget_bytes if budget_bytes is not None else self.upload_budget_bytes
        committed = 0
        spent = 0
        with self._lock:
            queue = list(self._upload_queue)
        atlas_dirty = False
        for h in queue:
            asset = self.meshes.get(h)
            if asset is not None:
                if asset.status != LoadStatus.LOADED_HOST:
                    continue
                size = asset.positions.nbytes + asset.indices.nbytes
                if spent + size > budget and committed > 0:
                    break
                asset.device = {
                    "positions": jnp.asarray(asset.positions),
                    "normals": jnp.asarray(asset.normals),
                    "uvs": jnp.asarray(asset.uvs),
                    "tangents": jnp.asarray(asset.tangents),
                    "indices": jnp.asarray(asset.indices),
                }
            else:
                tex = self.textures.get(h)
                if tex is None or tex.status != LoadStatus.LOADED_HOST:
                    continue
                size = tex.image.nbytes
                if spent + size > budget and committed > 0:
                    break
                # texture → atlas slot through the registry
                tex.atlas_id = self._tex_registry.allocate(tex.image)
                asset = tex
                atlas_dirty = True
            asset.status = LoadStatus.COMMITTED
            spent += size
            committed += 1
            with self._lock:
                self._upload_queue.remove(h)
                self.stats.pending_uploads -= 1
                self.stats.device_bytes += size
        if atlas_dirty or (self.atlas is None
                           and self._tex_registry.num_textures):
            self.atlas = self._tex_registry.commit()
        return committed

    def get_atlas(self):
        """The committed device TextureAtlas (None before the first texture
        commit); material texture slots index it by TextureAsset.atlas_id."""
        return self.atlas


def _compute_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    n = np.zeros_like(positions)
    t0, t1, t2 = indices[:, 0], indices[:, 1], indices[:, 2]
    fn = np.cross(positions[t1] - positions[t0], positions[t2] - positions[t0])
    for k in (t0, t1, t2):
        np.add.at(n, k, fn)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(ln, 1e-12)).astype(np.float32)
