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
