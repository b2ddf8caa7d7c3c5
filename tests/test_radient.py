"""Radient engine/scene/asset tests — mirrors the reference's headless test
tier (Tests/RadientTest: scene state + change logs, drawable cache sync,
asset dedup, load-status machines, headless render seam)."""
import numpy as np
import pytest

from diligentfx_tpu.radient.engine import (RadientEngineCreateInfo,
                                           create_radient_engine)
from diligentfx_tpu.radient.scene_state import ChangeKind, SceneState
from diligentfx_tpu.radient.types import (LoadStatus, RadientBackendType,
                                          RadientError, RadientStatus)


def tri_mesh(offset=0.0):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32) + offset
    idx = np.array([[0, 1, 2]], np.int32)
    return pos, idx


# --- scene state / ECS -------------------------------------------------------


def test_entity_lifecycle_and_revision():
    s = SceneState()
    r0 = s.revision
    e = s.create_entity()
    assert s.is_alive(e)
    assert s.revision > r0
    s.destroy_entity(e)
    assert not s.is_alive(e)
    with pytest.raises(KeyError):
        s.set_visible(e, False)


def test_hierarchy_world_transforms_and_visibility():
    s = SceneState()
    parent = s.create_entity()
    child = s.create_entity()
    s.set_parent(child, parent)
    t = np.eye(4, dtype=np.float32)
    t[3, :3] = [1, 2, 3]
    s.set_transform(parent, t)
    t2 = np.eye(4, dtype=np.float32)
    t2[3, :3] = [10, 0, 0]
    s.set_transform(child, t2)
    np.testing.assert_allclose(s.world_transform(child)[3, :3], [11, 2, 3])
    # hiding the parent hides the child effectively
    s.set_visible(parent, False)
    assert not s.effective_visible(child)
    assert s.visibility[child]  # own flag untouched
    # cycles rejected
    with pytest.raises(ValueError):
        s.set_parent(parent, child)


def test_change_log_delta_and_out_of_date():
    s = SceneState()
    e = s.create_entity()
    base = s.revision
    s.set_visible(e, False)
    s.set_visible(e, True)
    status, changes = s.get_changes(base)
    assert status == RadientStatus.OK
    assert [c[1] for c in changes] == [ChangeKind.VISIBILITY, ChangeKind.VISIBILITY]
    # same revision → empty delta
    status, changes = s.get_changes(s.revision)
    assert status == RadientStatus.OK and changes == []
    # overflow the log window → OUT_OF_DATE for ancient consumers
    for _ in range(5000):
        s.set_visible(e, True)
    status, _ = s.get_changes(base)
    assert status == RadientStatus.OUT_OF_DATE
    # future revision is invalid
    status, _ = s.get_changes(s.revision + 10)
    assert status == RadientStatus.INVALID_ARGUMENT


# --- asset manager -----------------------------------------------------------


def test_mesh_dedup_and_load_status():
    eng = create_radient_engine()
    am = eng.asset_manager
    pos, idx = tri_mesh()
    h1 = am.create_mesh(pos, idx)
    h2 = am.create_mesh(pos.copy(), idx.copy())     # identical payload
    assert h1 == h2                                  # dedup
    assert am.stats.dedup_hits == 1
    h3 = am.create_mesh(*tri_mesh(offset=1.0))
    assert h3 != h1
    st = am.wait_for_asset_load(h1)
    assert st in (LoadStatus.LOADED_HOST, LoadStatus.COMMITTED)
    # device commit through the upload pump
    n = am.update_gpu_resources()
    assert n >= 1
    assert am.get_status(h1) == LoadStatus.COMMITTED
    eng.shutdown()


def test_texture_release_callback_and_failure():
    eng = create_radient_engine()
    am = eng.asset_manager
    released = []
    h = am.load_texture(np.zeros((4, 4, 3), np.uint8),
                        release_callback=lambda: released.append(1))
    am.wait_for_asset_load(h)
    assert released == [1]
    # failing source → FAILED status, not an exception
    h2 = am.load_texture("/nonexistent/file.png")
    am.wait_for_asset_load(h2)
    assert am.get_status(h2) == LoadStatus.FAILED
    eng.shutdown()


def test_stop_drains_and_blocks_new_work():
    eng = create_radient_engine()
    am = eng.asset_manager
    pos, idx = tri_mesh()
    am.create_mesh(pos, idx)
    am.stop()
    with pytest.raises(RadientError):
        am.create_mesh(*tri_mesh(offset=2.0))


def test_remote_backend_requires_endpoint():
    with pytest.raises(RadientError):
        create_radient_engine(RadientEngineCreateInfo(
            backend_type=RadientBackendType.REMOTE))


# --- drawable cache + pipeline -------------------------------------------------


def test_headless_render_full_flow():
    """Engine → scene → assets → renderer with headless short-circuit
    (the RadientRendererTest.RenderHeadlessScene analogue)."""
    eng = create_radient_engine(RadientEngineCreateInfo(headless=True))
    scene, state = eng.create_scene()
    writer = eng.create_scene_writer(state)
    am = eng.asset_manager

    pos, idx = tri_mesh()
    mh = am.create_mesh(pos, idx)
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    mat = am.create_material(PBRMaterialBasicAttribs.create())
    e = writer.create_entity()
    writer.set_mesh(e, mh, mat)

    renderer = eng.create_renderer()
    view = eng.create_view(64, 64)

    # before async load finishes + upload, update reports the recoverable states
    am.wait_for_asset_load(mh)
    st = renderer.update(state)   # pumps uploads, then syncs
    assert st == RadientStatus.OK
    assert renderer.render(state, view) == RadientStatus.OK
    eng.shutdown()


def test_drawable_cache_incremental_transform_sync():
    eng = create_radient_engine(RadientEngineCreateInfo(headless=True))
    _, state = eng.create_scene()
    writer = eng.create_scene_writer(state)
    am = eng.asset_manager
    pos, idx = tri_mesh()
    mh = am.create_mesh(pos, idx)
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    mat = am.create_material(PBRMaterialBasicAttribs.create())
    e = writer.create_entity()
    writer.set_mesh(e, mh, mat)
    am.wait_for_asset_load(mh)
    am.update_gpu_resources()

    renderer = eng.create_renderer()
    cache = renderer._cache_for(state)
    assert cache.sync_scene() == RadientStatus.OK
    rebuilds0 = cache.full_rebuilds
    # transform-only change → incremental path, no rebuild
    t = np.eye(4, dtype=np.float32)
    t[3, 0] = 5.0
    writer.set_transform(e, t)
    assert cache.sync_scene() == RadientStatus.OK
    assert cache.full_rebuilds == rebuilds0
    assert cache.incremental_syncs >= 1
    np.testing.assert_allclose(
        np.asarray(cache.scene_primitives.node_matrices[0])[3, 0], 5.0)
    # structural change → full rebuild
    e2 = writer.create_entity()
    writer.set_mesh(e2, mh, mat)
    assert cache.sync_scene() == RadientStatus.OK
    assert cache.full_rebuilds == rebuilds0 + 1
    eng.shutdown()


def test_pending_and_no_gpu_data_states():
    eng = create_radient_engine(RadientEngineCreateInfo(headless=True))
    _, state = eng.create_scene()
    writer = eng.create_scene_writer(state)
    am = eng.asset_manager
    pos, idx = tri_mesh()
    mh = am.create_mesh(pos, idx)
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    mat = am.create_material(PBRMaterialBasicAttribs.create())
    e = writer.create_entity()
    writer.set_mesh(e, mh, mat)

    renderer = eng.create_renderer()
    cache = renderer._cache_for(state)
    am.wait_for_asset_load(mh)
    # host-loaded but not committed → NO_GPU_DATA
    if am.get_status(mh) == LoadStatus.LOADED_HOST:
        assert cache.sync_scene() == RadientStatus.NO_GPU_DATA
    am.update_gpu_resources()
    assert cache.sync_scene() == RadientStatus.OK
    eng.shutdown()


def test_blocked_worker_async_determinism():
    """BlockWorkerThread-style fixture (RadientGPUTestHelpers.cpp:130-143):
    stall the worker pool at a controlled point and assert the load-status
    state machine holds (QUEUED/LOADING, never LOADED) until release, then
    completes deterministically."""
    import threading
    import numpy as np
    from diligentfx_tpu.radient.asset_manager import AssetManager, LoadStatus

    am = AssetManager(num_threads=1)
    gate = threading.Event()
    entered = threading.Event()

    def blocker():
        entered.set()
        assert gate.wait(timeout=30.0)

    am._pool.submit(blocker)          # occupies the single worker
    assert entered.wait(timeout=10.0)

    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    h = am.create_mesh(tri, idx)
    # worker blocked → the mesh cannot progress past QUEUED
    assert am.meshes[h].status in (LoadStatus.QUEUED,)
    assert am.stats.pending_uploads == 0
    # dedup still hits while the original is in flight
    h2 = am.create_mesh(tri.copy(), idx.copy())
    assert h2 == h and am.stats.dedup_hits == 1

    gate.set()                        # release the worker
    st = am.wait_for_asset_load(h, timeout=30.0)
    assert st in (LoadStatus.LOADED_HOST, LoadStatus.COMMITTED)
    n = am.update_gpu_resources()
    assert n >= 1
    assert am.meshes[h].status == LoadStatus.COMMITTED
    am.stop()


def test_texture_release_callback_spy():
    """Caller-owned texture payloads: the release callback fires exactly once
    after the payload is consumed (RadientSceneTest.cpp:70-84 fixtures)."""
    import numpy as np
    from diligentfx_tpu.radient.asset_manager import AssetManager, LoadStatus

    am = AssetManager(num_threads=1)
    calls = []
    img = np.random.rand(8, 8, 4).astype(np.float32)
    h = am.load_texture(img, release_callback=lambda: calls.append(1))
    am.wait_for_asset_load(h, timeout=30.0)
    am.update_gpu_resources()
    assert am.textures[h].status == LoadStatus.COMMITTED
    assert sum(calls) == 1, calls
    # dedup: same payload does NOT call back twice (consumed once)
    h2 = am.load_texture(img.copy(), release_callback=lambda: calls.append(10))
    assert h2 == h
    am.update_gpu_resources()
    assert sum(calls) == 1 or sum(calls) == 11   # impl may release dup source
    am.stop()


def test_change_log_window_and_invalidation_matrix():
    """Change-log delta semantics matrix (RadientSceneStateTest.cpp class):
    OK-empty at head, OK-deltas within the window, OUT_OF_DATE past the
    retained window, INVALID_ARGUMENT for future bases, hierarchy dirt
    propagation, destroy recorded."""
    import numpy as np
    from diligentfx_tpu.radient import scene_state as ss
    from diligentfx_tpu.radient.types import RadientStatus

    st = ss.SceneState()
    base0 = st.revision
    parent = st.create_entity()
    child = st.create_entity()
    st.set_parent(child, parent)
    t = np.eye(4, dtype=np.float32); t[3, 0] = 2.0
    st.set_transform(parent, t)

    # deltas since base0 include every mutation, strictly ordered
    status, changes = st.get_changes(base0)
    assert status == RadientStatus.OK
    revs = [c[0] for c in changes]
    assert revs == sorted(revs) and len(changes) >= 4
    # head → empty OK
    status, changes = st.get_changes(st.revision)
    assert status == RadientStatus.OK and changes == []
    # future base → invalid
    status, _ = st.get_changes(st.revision + 5)
    assert status == RadientStatus.INVALID_ARGUMENT

    # parent transform dirties the child's cached world matrix
    w = st.world_transform(child)
    np.testing.assert_allclose(w[3, 0], 2.0, atol=1e-6)
    t2 = np.eye(4, dtype=np.float32); t2[3, 0] = 5.0
    st.set_transform(parent, t2)
    np.testing.assert_allclose(st.world_transform(child)[3, 0], 5.0, atol=1e-6)

    # visibility is effective down the hierarchy
    st.set_visible(parent, False)
    assert not st.effective_visible(child)
    st.set_visible(parent, True)
    assert st.effective_visible(child)

    # destroy is recorded and the entity dies
    base = st.revision
    st.destroy_entity(child)
    status, changes = st.get_changes(base)
    assert status == RadientStatus.OK
    assert any(c[1] == ss.ChangeKind.DESTROYED for c in changes)
    assert not st.is_alive(child)

    # window overflow → OUT_OF_DATE (consumer must full resync)
    base = st.revision
    e = st.create_entity()
    for i in range(ss._MAX_LOG + 8):
        ti = np.eye(4, dtype=np.float32); ti[3, 1] = float(i)
        st.set_transform(e, ti)
    status, _ = st.get_changes(base)
    assert status == RadientStatus.OUT_OF_DATE
