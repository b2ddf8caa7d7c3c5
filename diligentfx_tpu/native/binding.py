"""ctypes binding for the native runtime (libdfx_native.so).

Builds on first import if g++ is available; every entry point has a pure
Python/numpy fallback so the package works without a toolchain (the native
path is the host-side performance path, mirroring where the reference is
C++: asset hashing, pool suballocation, triangulation, draw batching).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        from diligentfx_tpu.native.build import build
        # DFX_NATIVE_LIB overrides the library path (the ASAN CI tier loads
        # the sanitizer build through this seam, tests/test_native_asan.py)
        path = os.environ.get("DFX_NATIVE_LIB") or build()
        lib = ctypes.CDLL(path)
    except Exception:
        _lib = False
        return False
    u64 = ctypes.c_uint64
    i64 = ctypes.c_int64
    lib.dfx_content_hash.argtypes = [ctypes.c_void_p, u64, u64,
                                     ctypes.POINTER(u64 * 2)]
    lib.dfx_pool_create.argtypes = [u64]
    lib.dfx_pool_create.restype = i64
    lib.dfx_pool_alloc.argtypes = [i64, u64, u64]
    lib.dfx_pool_alloc.restype = i64
    lib.dfx_pool_free.argtypes = [i64, u64]
    lib.dfx_pool_free.restype = ctypes.c_int
    lib.dfx_pool_stats.argtypes = [i64, ctypes.POINTER(u64 * 4)]
    lib.dfx_triangulate_faces.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_void_p]
    lib.dfx_triangulate_faces.restype = i64
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


# ---------------------------------------------------------------------------


def content_hash(*arrays) -> bytes:
    """128-bit content hash of array payloads (dedup cache keys)."""
    lib = _load()
    if not lib:
        import hashlib
        h = hashlib.blake2b(digest_size=16)
        for a in arrays:
            a = np.ascontiguousarray(a)
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(a.tobytes())
        return h.digest()
    out = (ctypes.c_uint64 * 2)()
    seed = 0
    for a in arrays:
        a = np.ascontiguousarray(a)
        meta = (str(a.dtype) + str(a.shape)).encode()
        mbuf = (ctypes.c_char * len(meta)).from_buffer_copy(meta)
        lib.dfx_content_hash(ctypes.addressof(mbuf), len(meta), seed,
                             ctypes.byref(out))
        seed = out[0]
        lib.dfx_content_hash(a.ctypes.data, a.nbytes, seed, ctypes.byref(out))
        seed = out[0] ^ out[1]
    return bytes(bytearray(out))


class GeometryPool:
    """Suballocating geometry pool (HnGeometryPool / IBufferSuballocator
    analogue): returns byte offsets into one large device buffer."""

    def __init__(self, capacity: int):
        self._lib = _load()
        self.capacity = capacity
        if self._lib:
            self._handle = self._lib.dfx_pool_create(capacity)
        else:
            self._free = [(0, capacity)]
            self._allocs = {}
            self._used = 0
            self._peak = 0

    def alloc(self, size: int, alignment: int = 16) -> int:
        """Returns offset, or -1 when full."""
        if self._lib:
            return int(self._lib.dfx_pool_alloc(self._handle, size, alignment))
        for i, (off, blk) in enumerate(self._free):
            aligned = (off + alignment - 1) // alignment * alignment
            pad = aligned - off
            if blk < pad + size:
                continue
            del self._free[i]
            if pad:
                self._free.insert(i, (off, pad))
            rest = blk - pad - size
            if rest:
                self._free.append((aligned + size, rest))
            self._free.sort()
            self._allocs[aligned] = size
            self._used += size
            self._peak = max(self._peak, self._used)
            return aligned
        return -1

    def free(self, offset: int) -> None:
        if self._lib:
            if self._lib.dfx_pool_free(self._handle, offset) != 0:
                raise KeyError(f"offset {offset} not allocated")
            return
        size = self._allocs.pop(offset)
        self._used -= size
        self._free.append((offset, size))
        self._free.sort()
        merged = []
        for off, sz in self._free:
            if merged and merged[-1][0] + merged[-1][1] == off:
                merged[-1] = (merged[-1][0], merged[-1][1] + sz)
            else:
                merged.append((off, sz))
        self._free = merged

    def stats(self) -> Tuple[int, int, int, int]:
        """(capacity, used, peak, free_fragments)."""
        if self._lib:
            out = (ctypes.c_uint64 * 4)()
            self._lib.dfx_pool_stats(self._handle, ctypes.byref(out))
            return tuple(int(x) for x in out)
        return (self.capacity, self._used, self._peak, len(self._free))


def triangulate_faces(face_counts: np.ndarray,
                      face_indices: np.ndarray) -> np.ndarray:
    """Fan-triangulate polygon faces → (T, 3) int32 (HnMeshUtils analogue)."""
    face_counts = np.ascontiguousarray(face_counts, np.int32)
    face_indices = np.ascontiguousarray(face_indices, np.int32)
    n_tris = int(np.maximum(face_counts - 2, 0).sum())
    out = np.empty((n_tris, 3), np.int32)
    lib = _load()
    if lib and n_tris:
        written = lib.dfx_triangulate_faces(
            face_counts.ctypes.data, len(face_counts),
            face_indices.ctypes.data, out.ctypes.data)
        assert written == n_tris
        return out
    t = 0
    src = 0
    for c in face_counts:
        for k in range(1, c - 1):
            out[t] = (face_indices[src], face_indices[src + k],
                      face_indices[src + k + 1])
            t += 1
        src += c
    return out


