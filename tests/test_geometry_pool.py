"""HnGeometryPool: content dedup, incremental commit, load budget, growth.

Reference semantics: Hydrogent/src/HnGeometryPool.cpp (dedup cache :1083),
Hydrogent/include/HnGeometryPool.hpp:66 (geometry load budget)."""
import numpy as np
import pytest

from diligentfx_tpu.hydrogent.geometry_pool import HnGeometryPool


def tri_mesh(seed=0, nv=12, nt=6):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(nv, 3)).astype(np.float32)
    idx = rng.integers(0, nv, (nt, 3)).astype(np.int32)
    return pts, idx


def test_identical_content_shares_one_entry():
    pool = HnGeometryPool()
    pts, idx = tri_mesh(0)
    k1 = pool.acquire(pts, None, None, idx)
    k2 = pool.acquire(pts.copy(), None, None, idx.copy())
    assert k1 == k2
    st = pool.stats()
    assert st["entries"] == 1 and st["instances"] == 2
    assert st["pooled_vertices"] == pts.shape[0]      # stored ONCE
    pool.release(k1)
    assert pool.stats()["entries"] == 1               # still referenced
    pool.release(k2)
    assert pool.stats()["entries"] == 0


def test_incremental_commit_uploads_only_dirty_mesh():
    pool = HnGeometryPool()
    keys = []
    for s in range(8):
        pts, idx = tri_mesh(s)
        keys.append(pool.acquire(pts, None, None, idx))
    pool.commit()
    first = pool.last_commit_upload_bytes
    assert first > 0 and pool.num_pending == 0
    # edit ONE mesh: release + acquire new content
    pool.release(keys[3])
    pts, idx = tri_mesh(99)
    k_new = pool.acquire(pts, None, None, idx)
    pool.commit()
    one = pts.shape[0] * 48 + idx.shape[0] * 12
    assert pool.last_commit_upload_bytes == one       # O(1 mesh), not O(scene)
    assert pool.is_resident(k_new)


def test_load_budget_defers_entries_pending():
    pts, idx = tri_mesh(1, nv=64, nt=32)
    one = pts.shape[0] * 48 + idx.shape[0] * 12
    pool = HnGeometryPool(load_budget_bytes=one)      # budget = 1 mesh/commit
    ks = []
    for s in range(3):
        pts_s, idx_s = tri_mesh(s, nv=64, nt=32)
        ks.append(pool.acquire(pts_s, None, None, idx_s))
    pool.commit()
    assert pool.is_resident(ks[0]) and not pool.is_resident(ks[2])
    assert pool.num_pending == 2
    pool.commit()
    pool.commit()
    assert pool.num_pending == 0 and all(pool.is_resident(k) for k in ks)


def test_growth_replays_and_content_survives():
    pool = HnGeometryPool(vertex_capacity=16, index_capacity=8)
    pts1, idx1 = tri_mesh(1, nv=12, nt=6)
    k1 = pool.acquire(pts1, None, None, idx1)
    dev = pool.commit()
    v0 = pool.range_of(k1)[0]
    np.testing.assert_allclose(np.asarray(dev["positions"][v0:v0 + 12]), pts1)
    # this acquire overflows the 16-vertex capacity → grow + replay
    pts2, idx2 = tri_mesh(2, nv=20, nt=10)
    k2 = pool.acquire(pts2, None, None, idx2)
    dev = pool.commit()
    for k, pts, idx in ((k1, pts1, idx1), (k2, pts2, idx2)):
        v_off, v_len, t_off, t_len = pool.range_of(k)
        np.testing.assert_allclose(
            np.asarray(dev["positions"][v_off:v_off + v_len]), pts)
        np.testing.assert_array_equal(
            np.asarray(dev["indices"][t_off:t_off + t_len]), idx + v_off)


def test_delegate_dedup_and_o1_edit():
    """End-to-end: two identical meshes share pool storage; editing one mesh
    in an N-mesh scene uploads O(1 mesh)."""
    from diligentfx_tpu.hydrogent.render_delegate import HnRenderDelegate
    d = HnRenderDelegate()
    pts, idx = tri_mesh(0, nv=24, nt=12)
    for i in range(4):
        m = d.create_rprim("mesh", f"/m{i}")
        m.set_triangles(idx)
        m.set_points(pts if i < 2 else tri_mesh(i, nv=24)[0])
    d.commit_resources()
    st = d.geometry_pool.stats()
    assert st["instances"] == 4 and st["entries"] == 3   # /m0,/m1 shared
    assert d._scene.positions.shape[0] == 4 * 24         # expansion intact
    # edit one mesh → only its bytes cross the tunnel on the next commit
    d.meshes["/m3"].set_points(tri_mesh(7, nv=24)[0])
    d.commit_resources()
    assert d.geometry_pool.last_commit_upload_bytes == 24 * 48 + 12 * 12


def test_repeated_growth_does_not_leak_nongrown_allocator():
    """ADVICE r3 (high): _grow re-allocated ranges from the still-live
    non-grown allocator, leaking every old range (usage doubled per grow)
    and eventually returning -1 offsets.  Repeated vertex-capacity growths
    must keep index-pool usage equal to the live index count."""
    pool = HnGeometryPool(vertex_capacity=8, index_capacity=1 << 14)
    keys, meshes = [], []
    for i in range(6):       # each acquire overflows → repeated vertex grows
        pts, idx = tri_mesh(i + 10, nv=16 << i, nt=4)
        keys.append(pool.acquire(pts, None, None, idx))
        meshes.append((pts, idx))
    dev = pool.commit()
    live_t = sum(4 for _ in keys)
    # every entry's index range must be valid and disjoint
    spans = sorted((pool.range_of(k)[2], pool.range_of(k)[3]) for k in keys)
    assert all(off >= 0 for off, _ in spans)
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 <= o2
    # and the pool still round-trips every mesh's content
    for k, (pts, idx) in zip(keys, meshes):
        v_off, v_len, t_off, t_len = pool.range_of(k)
        np.testing.assert_allclose(
            np.asarray(dev["positions"][v_off:v_off + v_len]), pts)
        np.testing.assert_array_equal(
            np.asarray(dev["indices"][t_off:t_off + t_len]), idx + v_off)
    # total index usage inside the ALLOCATOR stays exactly the live count
    # after N grows: the old allocator must have been rebuilt, not leaked
    assert sum(pool.range_of(k)[3] for k in keys) == live_t
    assert pool._talloc.stats()[1] == live_t
