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
    out = d.execute(128, 128)
    assert out is None or d._scene is None
    d.destroy_prim("/World/tri")
    assert d.get_memory_stats().num_meshes == 0


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
