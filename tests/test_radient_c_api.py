"""Radient public C API (native/src/radient_c.cpp via radient/c_api.py) —
COM-style refcounted handles, asset dedup, scene change logs, world-matrix
caching (Radient/interface/*.h + RadientSceneState.hpp:58-115 analogue)."""
import numpy as np
import pytest

from diligentfx_tpu.radient import c_api
from diligentfx_tpu.radient.types import LoadStatus

pytestmark = pytest.mark.skipif(not c_api.available(),
                                reason="native toolchain unavailable")


@pytest.fixture()
def engine():
    e = c_api.NativeEngine()
    yield e
    e.release()


def _tri():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    return pos, idx


def test_mesh_create_dedup_and_lifecycle(engine):
    pos, idx = _tri()
    m1 = engine.create_mesh(pos, idx)
    assert not m1.deduped
    assert m1.load_status == LoadStatus.LOADED_HOST   # host data, no GPU yet
    # identical payload dedups to the same handle with a new reference
    m2 = engine.create_mesh(pos.copy(), idx.copy())
    assert m2.deduped and m2.handle == m1.handle
    assert engine.refcount(m1.handle) == 2
    # per-frame commit tick flips the load state
    assert engine.update_gpu_resources() == 1
    assert m1.load_status == LoadStatus.COMMITTED
    nv, nt, h = m1.info()
    assert (nv, nt) == (3, 1) and h != 0
    rp, _, _, ri = m1.read()
    np.testing.assert_array_equal(rp, pos)
    np.testing.assert_array_equal(ri, idx)
    m2.release()
    assert engine.refcount(m1.handle) == 1
    m1.release()
    assert engine.refcount(m1.handle) == -1           # gone


def test_scene_hierarchy_world_matrices(engine):
    s = engine.create_scene()
    root = s.create_node()
    child = s.create_node(parent=root)
    t_root = np.eye(4, dtype=np.float32)
    t_root[3, 0] = 2.0                                # translate +x (row-vec)
    t_child = np.eye(4, dtype=np.float32)
    t_child[3, 1] = 3.0
    s.set_transform(root, t_root)
    s.set_transform(child, t_child)
    w = s.world_matrices()
    np.testing.assert_allclose(w[root], t_root)
    np.testing.assert_allclose(w[child][3, :3], [2.0, 3.0, 0.0])
    s.release()


def test_scene_change_log_and_renderables(engine):
    s = engine.create_scene()
    pos, idx = _tri()
    mesh = engine.create_mesh(pos, idx)
    mat = engine.create_material([1, 0, 0, 1])
    base = s.revision
    a = s.create_node()
    b = s.create_node()
    s.set_mesh(a, mesh, mat)
    s.set_mesh(b, mesh, mat)
    s.set_visible(b, False)
    changes = s.changes_since(base)
    kinds = [k for k, _ in changes]
    assert len(changes) == 5 and kinds == [0, 0, 3, 3, 4]
    # renderables skip the invisible node
    nodes, meshes, mats = s.renderables()
    assert nodes.tolist() == [a]
    assert meshes.tolist() == [mesh.handle]
    assert mats.tolist() == [mat]
    # hidden parent hides children (effective visibility)
    c = s.create_node(parent=b)
    s.set_mesh(c, mesh, mat)
    nodes, _, _ = s.renderables()
    assert nodes.tolist() == [a]
    # destroying a node removes it
    s.destroy_node(a)
    nodes, _, _ = s.renderables()
    assert nodes.tolist() == []
    # a base revision newer than everything yields an empty delta
    assert s.changes_since(s.revision) == []
    s.release()


def test_change_log_out_of_date(engine):
    s = engine.create_scene()
    n = s.create_node()
    for _ in range(5000):                              # overflow the kept log
        s.set_visible(n, True)
    assert s.changes_since(0) is None                  # OUT_OF_DATE → resync
    assert s.changes_since(s.revision - 10) is not None
    s.release()
