"""Hydra render delegate (Hydrogent analogue) tests."""
import numpy as np
import pytest

from diligentfx_tpu.hydrogent.render_delegate import (
    HnMaterialNetwork, HnRenderDelegate, HnRenderDelegateCreateInfo)


def make_delegate():
    from diligentfx_tpu.config import RasterizerConfig, PBRRendererCreateInfo
    from diligentfx_tpu.hydrogent.task_manager import TaskManagerCreateInfo
    from diligentfx_tpu.pbr.renderer import PBRRenderer
    renderer = PBRRenderer(
        PBRRendererCreateInfo(brdf_lut_dim=16, num_brdf_samples=8,
                              irradiance_cube_dim=16,
                              prefiltered_env_map_dim=16,
                              num_specular_env_samples=8),
        raster_cfg=RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                                    max_tiles_per_tri=8, big_tri_capacity=16,
                                    chunk=8))
    return HnRenderDelegate(
        renderer=renderer,
        task_manager_ci=TaskManagerCreateInfo(
            enable_ssao=False, enable_ssr=False, enable_taa=False,
            enable_bloom=False))


def test_material_network_tags():
    assert HnMaterialNetwork({"surface": {"opacity": 0.5}}).tag == "translucent"
    assert HnMaterialNetwork({"surface": {"opacity": 0.5,
                                          "opacityThreshold": 0.4}}).tag == "masked"
    assert HnMaterialNetwork({"surface": {}}).tag == "default"


def test_polygon_topology_triangulated():
    d = make_delegate()
    mesh = d.create_rprim("mesh", "/World/quadmesh")
    mesh.set_points([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    mesh.set_topology([4], [0, 1, 2, 3])   # one quad → two tris
    assert mesh.indices.shape == (2, 3)


def test_full_prim_flow_render_and_pick():
    d = make_delegate()
    mat = d.create_sprim("material", "/World/mat")
    mat.set_network({"surface": {"diffuseColor": (0.9, 0.1, 0.1),
                                 "roughness": 0.4}})
    mesh = d.create_rprim("mesh", "/World/tri")
    mesh.set_points([[-2, -1, 0], [2, -1, 0], [0, 2, 0]])
    mesh.set_triangles([[0, 1, 2]])
    mesh.set_material("/World/mat")
    cam = d.create_sprim("camera", "/World/cam")
    cam.set_params(eye=(0, 0, 5), target=(0, 0, 0))
    light = d.create_sprim("light", "/World/sun")
    light.set_params(type="distant", direction=(0, 0, -1), intensity=3.0)
    buf = d.create_bprim("renderBuffer", "/World/aov", aov="mesh_id")

    out = d.execute(128, 128)
    assert out is not None
    a = np.asarray(out.color)
    assert np.isfinite(a).all()
    # picking at center hits the triangle (prim 0)
    assert d.read_rprim_id(64, 64) == 0
    assert d.read_rprim_id(2, 2) == -1
    # AOV bprim reads through
    mesh_id = np.asarray(buf.read())
    assert mesh_id[64, 64] == 0
    # memory stats populated
    stats = d.get_memory_stats()
    assert stats.num_meshes == 1 and stats.num_materials == 1
    assert stats.vertex_pool_used > 0


def test_visibility_and_destroy():
    d = make_delegate()
    mesh = d.create_rprim("mesh", "/World/tri")
    mesh.set_points([[-2, -1, 0], [2, -1, 0], [0, 2, 0]])
    mesh.set_triangles([[0, 1, 2]])
    cam = d.create_sprim("camera", "/World/cam")
    cam.set_params(eye=(0, 0, 5), target=(0, 0, 0))
    out = d.execute(128, 128)
    assert d.read_rprim_id(64, 64) == 0
    mesh.set_visibility(False)
    d._scene_dirty = True
    # hiding the last Rprim keeps rendering background-only frames
    # (HnRenderDelegate::DestroyRprim keeps the frame loop alive)
    out = d.execute(128, 128)
    assert out is not None
    assert d.read_rprim_id(64, 64) == -1
    d.destroy_prim("/World/tri")
    assert d.get_memory_stats().num_meshes == 0
    out = d.execute(128, 128)
    assert out is not None and np.isfinite(np.asarray(out.color)).all()


def test_geometry_modes_render():
    """HnRenderParam geometry modes: EDGES (barycentric wireframe) and
    POINTS (vertex splats) produce distinct, finite images."""
    from diligentfx_tpu.hydrogent.render_delegate import HnGeometryMode
    d = make_delegate()
    mesh = d.create_rprim("mesh", "/World/tri")
    mesh.set_points([[-2, -1, 0], [2, -1, 0], [0, 2, 0]])
    mesh.set_triangles([[0, 1, 2]])
    cam = d.create_sprim("camera", "/World/cam")
    cam.set_params(eye=(0, 0, 5), target=(0, 0, 0))
    d.execute(128, 128)   # builds the renderer/scene
    d.render_param.geometry_mode = HnGeometryMode.EDGES
    out_e = d.execute(128, 128)
    d.render_param.geometry_mode = HnGeometryMode.POINTS
    out_p = d.execute(128, 128)
    d.render_param.geometry_mode = HnGeometryMode.SOLID
    ce, cp = np.asarray(out_e.color), np.asarray(out_p.color)
    assert np.isfinite(ce).all() and np.isfinite(cp).all()
    assert ce.std() > 1e-3       # wireframe structure present
    assert cp.std() > 1e-3       # point splats present
    assert not np.allclose(ce, cp)


def test_destroy_prim_triggers_scene_rebuild():
    """Regression (ADVICE r1): destroy_prim didn't set _scene_dirty, so the
    destroyed mesh kept rendering until an unrelated change."""
    d = make_delegate()
    m1 = d.create_rprim("mesh", "/World/left")
    m1.set_points([[-3, -1, 0], [-0.5, -1, 0], [-1.75, 2, 0]])
    m1.set_triangles([[0, 1, 2]])
    m2 = d.create_rprim("mesh", "/World/right")
    m2.set_points([[0.5, -1, 0], [3, -1, 0], [1.75, 2, 0]])
    m2.set_triangles([[0, 1, 2]])
    cam = d.create_sprim("camera", "/World/cam")
    cam.set_params(eye=(0, 0, 6), target=(0, 0, 0))
    d.execute(128, 128)
    ids_before = np.asarray(d.last_output.gbuffer.mesh_id)
    assert (ids_before == 1).any(), "right mesh not rendered"
    d.destroy_prim("/World/right")          # no manual _scene_dirty
    d.execute(128, 128)
    ids_after = np.asarray(d.last_output.gbuffer.mesh_id)
    assert not (ids_after == 1).any(), "destroyed mesh still renders"


def test_texture_registry_async_dedup_and_budget():
    """HnTextureRegistry analogue: async loads, content-hash dedup, budgeted
    commit with placeholder-then-resident refinement
    (HnTextureRegistry.hpp:141-176)."""
    import numpy as np
    from diligentfx_tpu.hydrogent.texture_registry import HnTextureRegistry
    reg = HnTextureRegistry(atlas_dim=64, upload_budget_bytes=1 << 30)
    img = (np.random.rand(16, 16, 3) * 255).astype(np.uint8)
    a = reg.allocate(img)
    b = reg.allocate(img.copy())            # identical content → same id
    assert a == b
    c = reg.allocate(lambda: np.ones((8, 8, 3), np.float32) * 0.5)
    assert c != a
    reg.wait_idle()
    atlas = reg.commit()
    assert atlas is not None
    assert reg.num_textures == 2 and reg.num_pending == 0
    v1 = reg.storage_version
    # no-change commit: no rebuild
    reg.commit()
    assert reg.storage_version == v1

    # budget: a big texture stays pending (placeholder), lands next commit
    reg2 = HnTextureRegistry(atlas_dim=64, upload_budget_bytes=100)
    reg2.allocate(np.random.rand(32, 32, 3).astype(np.float32))
    reg2.wait_idle()
    reg2.commit()
    assert reg2.num_pending == 1            # over budget → placeholder
    reg2.commit(upload_budget_bytes=1 << 20)
    assert reg2.num_pending == 0
    reg.stop(); reg2.stop()


def test_textured_material_network_renders():
    """Material-network texture payloads flow through the registry into the
    atlas and modulate shading (the delegate texture path the reference
    routes through HnMaterial + HnTextureRegistry)."""
    d = make_delegate()
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = [1.0, 0.0, 0.0]            # left half red
    tex[:, 4:] = [0.0, 0.0, 1.0]            # right half blue
    mat = d.create_sprim("material", "/World/mat")
    mat.set_network({"surface": {"diffuseColor": (1.0, 1.0, 1.0)},
                     "textures": {"diffuseColor": tex}})
    mesh = d.create_rprim("mesh", "/World/quad")
    mesh.set_points([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]])
    mesh.set_triangles([[0, 1, 2], [0, 2, 3]])
    mesh.set_primvar("st", [[0, 1], [1, 1], [1, 0], [0, 0]])
    mesh.set_material("/World/mat")
    cam = d.create_sprim("camera", "/World/cam")
    cam.set_params(eye=(0, 0, 5), target=(0, 0, 0))
    out = d.execute(128, 128)
    img = np.asarray(out.color)
    assert np.isfinite(img).all()
    left = img[64, 32]
    right = img[64, 96]
    assert left[0] > left[2] + 0.05, (left, right)    # red side
    assert right[2] > right[0] + 0.05, (left, right)  # blue side


def test_transform_only_commit_is_incremental():
    """A transform bump must NOT rebuild the scene (commit stays O(changed):
    the HnGeometryPool dirty-range semantics) and must move the mesh."""
    d = make_delegate()
    m = d.create_rprim("mesh", "/World/tri")
    m.set_points([[-1, -1, 0], [1, -1, 0], [0, 1, 0]])
    m.set_triangles([[0, 1, 2]])
    cam = d.create_sprim("camera", "/World/cam")
    cam.set_params(eye=(0, 0, 5), target=(0, 0, 0))
    d.execute(128, 128)
    scene_before = d._scene
    ids_before = np.asarray(d.last_output.gbuffer.mesh_id)
    t = np.eye(4, dtype=np.float32)
    t[3, 0] = 1.5                            # move right
    m.set_transform(t)
    assert not getattr(d, "_scene_dirty", False)
    d.execute(128, 128)
    # same geometry arrays (no re-concat), new node matrices
    assert d._scene.positions is scene_before.positions
    ids_after = np.asarray(d.last_output.gbuffer.mesh_id)
    xs_b = np.where(ids_before == 0)[1]
    xs_a = np.where(ids_after == 0)[1]
    assert xs_a.mean() > xs_b.mean() + 5     # visibly moved right


def test_geometry_subsets_bind_per_face_materials():
    """HdGeomSubset face sets relabel per-triangle materials (HnMesh.cpp
    geometry subsets); unassigned faces keep the mesh material, later
    subsets win on overlap."""
    d = make_delegate()
    for name, color in (("/m/a", (1, 0, 0)), ("/m/b", (0, 1, 0)),
                        ("/m/c", (0, 0, 1))):
        d.create_sprim("material", name).set_network(
            {"surface": {"diffuseColor": color}})
    mesh = d.create_rprim("mesh", "/World/subsets")
    mesh.set_points([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [2, 0, 0], [3, 0, 0], [3, 1, 0]])
    # 2 quads + 1 triangle = faces 0,1,2 → tris (0,1), (2,3), (4)
    mesh.set_topology([4, 4, 3], [0, 1, 2, 3, 3, 2, 4, 5, 4, 5, 6])
    assert mesh.indices.shape == (5, 3)
    np.testing.assert_array_equal(mesh.tri_face, [0, 0, 1, 1, 2])
    mesh.set_material("/m/a")
    mesh.set_geom_subsets([("/m/b", [1]), ("/m/c", [2]), ("/m/b", [2])])
    scene = d.commit_resources()
    tm = np.asarray(scene.tri_material)
    slots = {m: i for i, m in enumerate(["a", "b", "c"])}
    # face 0 → mesh material a; face 1 → b; face 2 → b (later subset wins)
    a, b = tm[0], tm[2]
    assert tm[0] == tm[1] and tm[2] == tm[3] == tm[4]
    assert a != b


def test_parallel_prim_sync_deterministic_and_threaded(monkeypatch):
    """allow_parallel_sync fans the per-mesh host prep (hash/normals/
    tangents) across a thread pool (HnRenderDelegate.hpp:405); the pool
    registration stays serial in prim order, so the committed scene is
    BIT-identical to the serial path, and the flag genuinely changes
    execution (prep observed on >1 thread)."""
    import threading
    import time
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent.geometry_pool import HnGeometryPool
    from diligentfx_tpu.hydrogent.task_manager import TaskManagerCreateInfo
    from diligentfx_tpu.pbr.renderer import PBRRenderer

    def build(parallel):
        d = HnRenderDelegate(
            ci=HnRenderDelegateCreateInfo(allow_parallel_sync=parallel))
        rng = np.random.default_rng(7)
        for i in range(10):
            m = d.create_rprim("mesh", f"/m{i}")
            n = 12 + (i % 3) * 4
            pts = rng.random((n, 3), np.float32).astype(np.float32)
            idx = np.stack([np.zeros(n - 2), np.arange(1, n - 1),
                            np.arange(2, n)], -1).astype(np.int32)
            if i == 9:        # duplicate of mesh 8: exercises dedup ordering
                prev = d.meshes["/m8"]
                m.set_triangles(prev.indices)
                m.set_points(prev.points)
            else:
                m.set_triangles(idx)
                m.set_points(pts)
        d.commit_resources()
        return d

    # determinism: identical committed scenes + pool layout either way
    d_ser = build(False)
    d_par = build(True)
    s1, s2 = d_ser._scene, d_par._scene
    np.testing.assert_array_equal(np.asarray(s1.positions),
                                  np.asarray(s2.positions))
    np.testing.assert_array_equal(np.asarray(s1.indices),
                                  np.asarray(s2.indices))
    np.testing.assert_array_equal(np.asarray(s1.vertex_node),
                                  np.asarray(s2.vertex_node))
    assert ({k: e.v_off for k, e in d_ser.geometry_pool._entries.items()}
            == {k: e.v_off for k, e in d_par.geometry_pool._entries.items()})
    assert d_ser.geometry_pool.stats()["entries"] == 9   # /m9 deduped

    # flag behavior: the parallel path runs prep on more than one thread
    seen = set()
    orig = HnGeometryPool.prepare_content

    def spy(points, normals, uvs, indices):
        seen.add(threading.get_ident())
        time.sleep(0.02)           # hold the slot so both workers engage
        return orig(points, normals, uvs, indices)

    monkeypatch.setattr(HnGeometryPool, "prepare_content", staticmethod(spy))
    build(True)
    assert len(seen) > 1, "parallel sync never left the calling thread"
