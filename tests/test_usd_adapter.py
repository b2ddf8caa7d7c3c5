"""Structural test of the pxr HdRenderDelegate adapter against a fake-pxr
shim: drives the full Hydra protocol flow (create prims → Sync →
CommitResources → task Execute → AOV read → destroy) without OpenUSD
(reference: Hydrogent/interface/HnRenderDelegate.hpp:156-405,
HnTaskManager.hpp:53-158)."""
import types

import numpy as np
import pytest

from diligentfx_tpu.hydrogent.usd_adapter import (
    build_adapter, material_network_from_hd)


# ---------------------------------------------------------------------------
# fake pxr shim: the minimal Hd protocol surface the adapter binds against
# ---------------------------------------------------------------------------


class _Base:
    def __init__(self, *a, **k):
        pass


class _ChangeTracker:
    DirtyTopology = 1 << 0
    DirtyPoints = 1 << 1
    DirtyPrimvar = 1 << 2
    DirtyTransform = 1 << 3
    DirtyMaterialId = 1 << 4
    DirtyVisibility = 1 << 5
    AllDirty = (1 << 6) - 1


def make_fake_pxr():
    Hd = types.SimpleNamespace(
        RenderDelegate=_Base, Mesh=_Base, Sprim=_Base, Bprim=_Base,
        Task=_Base, ChangeTracker=_ChangeTracker)
    return types.SimpleNamespace(Hd=Hd)


class FakeMeshTopology:
    def __init__(self, counts, indices, subsets=()):
        self._c, self._i = counts, indices
        self._subsets = subsets

    def GetFaceVertexCounts(self):
        return self._c

    def GetFaceVertexIndices(self):
        return self._i

    def GetGeomSubsets(self):
        return self._subsets


class FakeSceneDelegate:
    """pxr.HdSceneDelegate stand-in: serves authored prim data by id."""

    def __init__(self):
        self.data = {}

    def GetMeshTopology(self, pid):
        return self.data[pid]["topology"]

    def Get(self, pid, name):
        return self.data.get(pid, {}).get(name)

    def GetTransform(self, pid):
        return self.data.get(pid, {}).get("transform", np.eye(4, dtype=np.float32))

    def GetMaterialId(self, pid):
        return self.data.get(pid, {}).get("materialId", "")

    def GetVisible(self, pid):
        return self.data.get(pid, {}).get("visible", True)

    def GetMaterialResource(self, pid):
        return self.data.get(pid, {}).get("material", {})

    def GetLightParamValue(self, pid, token):
        return self.data.get(pid, {}).get(token)

    def GetCameraParamValue(self, pid, token):
        return self.data.get(pid, {}).get(token)


def _small_renderer():
    from diligentfx_tpu.config import RasterizerConfig, PBRRendererCreateInfo
    from diligentfx_tpu.pbr.renderer import PBRRenderer
    return PBRRenderer(
        PBRRendererCreateInfo(brdf_lut_dim=16, num_brdf_samples=8,
                              irradiance_cube_dim=16,
                              prefiltered_env_map_dim=16,
                              num_specular_env_samples=8),
        raster_cfg=RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                                    max_tiles_per_tri=8, big_tri_capacity=16,
                                    chunk=8))


def make_delegate():
    from diligentfx_tpu.hydrogent.task_manager import TaskManagerCreateInfo
    classes = build_adapter(make_fake_pxr())
    rd = classes["RenderDelegate"](
        renderer=_small_renderer(),
        task_manager_ci=TaskManagerCreateInfo(
            enable_ssao=False, enable_ssr=False, enable_taa=False,
            enable_bloom=False))
    return classes, rd


def test_supported_prim_types():
    _, rd = make_delegate()
    assert "mesh" in rd.GetSupportedRprimTypes()
    assert {"material", "camera", "distantLight"} <= set(
        rd.GetSupportedSprimTypes())
    assert rd.GetSupportedBprimTypes() == ["renderBuffer"]
    assert rd.CreateRprim("volume", "/x") is None
    assert rd.CreateSprim("unknownType", "/x") is None


def test_full_hydra_flow_renders_and_picks():
    classes, rd = make_delegate()
    sd = FakeSceneDelegate()
    bits = _ChangeTracker.AllDirty

    # author a quad + material + light + camera in the scene delegate
    sd.data["/World/quad"] = {
        "topology": FakeMeshTopology([4], [0, 1, 2, 3]),
        "points": [[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
        "st": [[0, 0], [1, 0], [1, 1], [0, 1]],
        "materialId": "/World/mat",
    }
    sd.data["/World/mat"] = {"material": {
        "surface": {"diffuseColor": (0.9, 0.2, 0.1), "roughness": 0.4}}}
    cam_xf = np.eye(4, dtype=np.float32)
    cam_xf[3, :3] = (0.0, 0.0, 4.0)   # +Z back, looking down -Z
    sd.data["/World/cam"] = {"transform": cam_xf,
                             "clippingRange": (0.1, 50.0), "fov": 60.0}
    # identity transform → light looks down -Z, straight at the quad
    sd.data["/World/sun"] = {"color": (1.0, 1.0, 1.0), "intensity": 3.0,
                             "transform": np.eye(4, dtype=np.float32)}

    mesh = rd.CreateRprim("mesh", "/World/quad")
    mat = rd.CreateSprim("material", "/World/mat")
    cam = rd.CreateSprim("camera", "/World/cam")
    sun = rd.CreateSprim("distantLight", "/World/sun")
    buf = rd.CreateBprim("renderBuffer", "/World/aov")
    sd.data["/World/aov"] = {"aov": "mesh_id"}

    for prim in (mesh, mat, cam, sun, buf):
        prim.Sync(sd, rd.GetRenderParam(), bits)
    rd.CommitResources(None)

    task = classes["RenderTask"](rd.inner, width=96, height=96,
                                 camera_id="/World/cam")
    out = task.Execute()
    assert out is not None
    img = np.asarray(out.color)
    assert img.shape == (96, 96, 3)
    # the red quad fills the view center
    center = img[40:56, 40:56]
    assert center[..., 0].mean() > center[..., 2].mean()
    # picking through the Bprim AOV view
    ids = np.asarray(buf.Read())
    assert ids[48, 48] >= 0

    # destroy → prim disappears from the next frame
    rd.DestroyRprim(mesh)
    out2 = task.Execute()
    ids2 = np.asarray(rd.inner.last_output.gbuffer.mesh_id)
    assert (ids2 >= 0).sum() == 0


def test_dirty_bits_gate_sync_work():
    classes, rd = make_delegate()
    sd = FakeSceneDelegate()
    sd.data["/m"] = {
        "topology": FakeMeshTopology([3], [0, 1, 2]),
        "points": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
    }
    mesh = rd.CreateRprim("mesh", "/m")
    mesh.Sync(sd, None, _ChangeTracker.AllDirty)
    inner_mesh = rd.inner.meshes["/m"]
    p0 = inner_mesh.points.copy()

    # transform-only dirty must not touch points/topology
    sd.data["/m"]["points"] = [[9, 9, 9], [9, 9, 9], [9, 9, 9]]
    xf = np.eye(4, dtype=np.float32)
    xf[3, 0] = 2.0
    sd.data["/m"]["transform"] = xf
    mesh.Sync(sd, None, _ChangeTracker.DirtyTransform)
    assert np.allclose(inner_mesh.points, p0)
    assert inner_mesh.transform[3, 0] == 2.0


def test_light_transform_to_direction():
    classes, rd = make_delegate()
    sd = FakeSceneDelegate()
    xf = np.eye(4, dtype=np.float32)   # -Z forward → direction (0,0,-1)
    sd.data["/sun"] = {"transform": xf, "intensity": 2.0}
    sun = rd.CreateSprim("distantLight", "/sun")
    sun.Sync(sd, None, None)
    light = rd.inner.lights["/sun"]
    assert np.allclose(light.direction, (0, 0, -1))
    assert light.intensity == 2.0


def test_material_network_map_conversion():
    """HdMaterialNetworkMap-shaped object → plain node-graph dict."""
    tex = np.ones((4, 4, 4), np.float32)

    node = lambda path, ident, params: types.SimpleNamespace(  # noqa: E731
        path=path, identifier=ident, parameters=params)
    rel = lambda src, so, dst, di: types.SimpleNamespace(  # noqa: E731
        inputId=src, inputName=so, outputId=dst, outputName=di)
    net = types.SimpleNamespace(
        nodes=[node("/m/surf", "UsdPreviewSurface", {"roughness": 0.3}),
               node("/m/tex", "UsdUVTexture",
                    {"file": tex, "wrapS": "clamp", "wrapT": "repeat"}),
               node("/m/st", "UsdPrimvarReader_float2", {"varname": "st"})],
        relationships=[rel("/m/tex", "rgb", "/m/surf", "diffuseColor"),
                       rel("/m/st", "result", "/m/tex", "st")])
    nm = types.SimpleNamespace(map={"surface": net})

    d = material_network_from_hd(nm)
    assert d["terminal"] == "/m/surf"
    assert d["nodes"]["/m/tex"]["type"] == "UsdUVTexture"
    assert ("/m/surf", "diffuseColor", "/m/tex", "rgb") in d["connections"]

    from diligentfx_tpu.hydrogent.material_network import HnMaterialNetwork
    parsed = HnMaterialNetwork(d)
    assert parsed.roughness == 0.3
    desc = parsed.texture_for_slot(0)
    assert desc is not None
    from diligentfx_tpu.ops.sampling import WRAP_CLAMP, WRAP_REPEAT
    assert desc.wrap_u == WRAP_CLAMP and desc.wrap_v == WRAP_REPEAT


def test_fallback_prims_and_parallel_sync_flag():
    classes, rd = make_delegate()
    fb = rd.CreateFallbackSprim("material")
    assert fb is not None
    assert rd.IsParallelSyncEnabled("mesh") in (True, False)
