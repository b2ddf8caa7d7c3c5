"""Kitchen-scene-shaped Hydra corpus through the pxr adapter shim
(VERDICT r4 #2): the USD path cannot run against real OpenUSD in this image
(no pxr, zero egress), so this corpus reproduces the STRUCTURES the
Kitchen_set exercises — quad/n-gon-dominant mesh topologies, geom subsets
with per-subset materials, UsdPreviewSurface networks with UsdUVTexture +
UsdPrimvarReader_float2 + UsdTransform2d chains, per-mesh transforms,
distant + sphere lights — and drives the FULL HdRenderIndex protocol:
populate → Sync(dirtyBits) → CommitResources → render → pick → targeted
invalidation → re-render.

Reference: Hydrogent/interface/HnRenderDelegate.hpp:156-405 (prim factory
surface), HnMesh.cpp topology/primvar sync, HnMaterial.cpp network parse.
"""
import types

import numpy as np

from tests.test_usd_adapter import (FakeMeshTopology, FakeSceneDelegate,
                                    _ChangeTracker, make_delegate)


# ---------------------------------------------------------------------------
# deterministic Kitchen-shaped corpus
# ---------------------------------------------------------------------------

def _grid_mesh(nx, ny, quad=True, ngon_every=0, z=0.0, scale=1.0):
    """Quad-grid topology like Kitchen props; optionally convert every k-th
    quad row-pair into pentagons (n-gon fan-triangulation coverage)."""
    xs = np.linspace(-0.5, 0.5, nx + 1) * scale
    ys = np.linspace(-0.5, 0.5, ny + 1) * scale
    pts = [[x, y, z + 0.02 * np.sin(3 * x + 2 * y)] for y in ys for x in xs]
    st = [[(x / scale + 0.5), (y / scale + 0.5)] for y in ys for x in xs]
    counts, indices = [], []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            b, c, d = a + 1, a + nx + 2, a + nx + 1
            if ngon_every and (j * nx + i) % ngon_every == 0 and i + 1 < nx:
                # pentagon spanning two quads
                counts.append(5)
                indices += [a, b, b + 1, c + 1, d]
            elif quad:
                counts.append(4)
                indices += [a, b, c, d]
            else:
                counts += [3, 3]
                indices += [a, b, c, a, c, d]
    return (np.asarray(pts, np.float32), np.asarray(st, np.float32),
            counts, indices)


def _preview_surface_network(mat_path, diffuse, rough, metallic,
                             textured=False, normal_map=False,
                             transform2d=False):
    """UsdPreviewSurface network in HdMaterialNetworkMap shape."""
    node = lambda p, ident, params: types.SimpleNamespace(  # noqa: E731
        path=p, identifier=ident, parameters=params)
    rel = lambda s, so, d, di: types.SimpleNamespace(  # noqa: E731
        inputId=s, inputName=so, outputId=d, outputName=di)
    surf = node(f"{mat_path}/surf", "UsdPreviewSurface",
                {"diffuseColor": diffuse, "roughness": rough,
                 "metallic": metallic})
    nodes, rels = [surf], []
    if textured:
        rng = np.random.default_rng(hash(mat_path) % (1 << 31))
        img = rng.random((8, 8, 4)).astype(np.float32)
        nodes.append(node(f"{mat_path}/tex", "UsdUVTexture",
                          {"file": img, "wrapS": "repeat",
                           "wrapT": "repeat"}))
        nodes.append(node(f"{mat_path}/st", "UsdPrimvarReader_float2",
                          {"varname": "st"}))
        rels.append(rel(f"{mat_path}/tex", "rgb",
                        f"{mat_path}/surf", "diffuseColor"))
        if transform2d:
            nodes.append(node(f"{mat_path}/xf", "UsdTransform2d",
                              {"scale": (2.0, 2.0), "rotation": 0.0,
                               "translation": (0.25, 0.0)}))
            rels.append(rel(f"{mat_path}/st", "result",
                            f"{mat_path}/xf", "in"))
            rels.append(rel(f"{mat_path}/xf", "result",
                            f"{mat_path}/tex", "st"))
        else:
            rels.append(rel(f"{mat_path}/st", "result",
                            f"{mat_path}/tex", "st"))
    if normal_map:
        rng = np.random.default_rng(1)
        nimg = np.full((8, 8, 4), 0.5, np.float32)
        nimg[..., 2] = 1.0
        nodes.append(node(f"{mat_path}/ntex", "UsdUVTexture",
                          {"file": nimg, "wrapS": "repeat",
                           "wrapT": "repeat"}))
        rels.append(rel(f"{mat_path}/ntex", "rgb",
                        f"{mat_path}/surf", "normal"))
    net = types.SimpleNamespace(nodes=nodes, relationships=rels)
    return types.SimpleNamespace(map={"surface": net})


def build_kitchen_corpus(sd: FakeSceneDelegate, n_props=24):
    """Populate the scene delegate with a Kitchen-shaped inventory:
    returns (mesh_ids, material_ids, light_ids, camera_id)."""
    rng = np.random.default_rng(11)
    mats = []
    for k in range(12):
        mid = f"/Kitchen/Looks/mat{k}"
        sd.data[mid] = {"material": _preview_surface_network(
            mid, diffuse=tuple(rng.uniform(0.2, 0.9, 3).tolist()),
            rough=float(rng.uniform(0.2, 0.9)),
            metallic=float(k % 3 == 0),
            textured=k < 8, normal_map=k in (2, 5),
            transform2d=k in (1, 4))}
        mats.append(mid)

    meshes = []
    for k in range(n_props):
        pid = f"/Kitchen/Geom/prop{k:03d}"
        kind = k % 4
        pts, st, counts, idx = _grid_mesh(
            3 + k % 5, 2 + k % 4,
            quad=(kind != 1),
            ngon_every=(7 if kind == 2 else 0),
            scale=0.5 + 0.1 * (k % 6))
        subsets = ()
        if kind == 3 and len(counts) >= 4:
            # two geom subsets with distinct materials (Kitchen cabinets)
            half = len(counts) // 2
            subsets = (
                types.SimpleNamespace(id=f"{pid}/ss0",
                                      materialId=mats[(k + 1) % len(mats)],
                                      indices=list(range(half))),
                types.SimpleNamespace(id=f"{pid}/ss1",
                                      materialId=mats[(k + 2) % len(mats)],
                                      indices=list(range(half, len(counts)))),
            )
        xf = np.eye(4, dtype=np.float32)
        xf[3, :3] = [(k % 6) - 2.5, ((k // 6) % 4) - 1.5, -(k % 3) * 0.4]
        sd.data[pid] = {
            "topology": FakeMeshTopology(counts, idx, subsets),
            "points": pts, "st": st,
            "transform": xf,
            "materialId": mats[k % len(mats)],
        }
        meshes.append(pid)

    cam_xf = np.eye(4, dtype=np.float32)
    cam_xf[3, :3] = (0.0, 0.0, 6.0)
    sd.data["/Kitchen/cam"] = {"transform": cam_xf,
                               "clippingRange": (0.1, 80.0), "fov": 55.0}
    sd.data["/Kitchen/sun"] = {"color": (1.0, 0.98, 0.9), "intensity": 3.0,
                               "transform": np.eye(4, dtype=np.float32)}
    lxf = np.eye(4, dtype=np.float32)
    lxf[3, :3] = (1.0, 2.0, 2.0)
    sd.data["/Kitchen/bulb"] = {"color": (1.0, 0.8, 0.6), "intensity": 8.0,
                                "radius": 0.1, "transform": lxf}
    return meshes, mats, ["/Kitchen/sun", "/Kitchen/bulb"], "/Kitchen/cam"


# ---------------------------------------------------------------------------
# the protocol drive
# ---------------------------------------------------------------------------

def _populate(classes, rd, sd, meshes, mats, lights, cam_id):
    bits = _ChangeTracker.AllDirty
    prims = []
    for m in meshes:
        prims.append(rd.CreateRprim("mesh", m))
    for m in mats:
        prims.append(rd.CreateSprim("material", m))
    prims.append(rd.CreateSprim("camera", cam_id))
    prims.append(rd.CreateSprim("distantLight", lights[0]))
    prims.append(rd.CreateSprim("sphereLight", lights[1]))
    for p in prims:
        p.Sync(sd, rd.GetRenderParam(), bits)
    rd.CommitResources(None)
    return prims


def test_kitchen_corpus_full_flow():
    classes, rd = make_delegate()
    sd = FakeSceneDelegate()
    meshes, mats, lights, cam_id = build_kitchen_corpus(sd)
    prims = _populate(classes, rd, sd, meshes, mats, lights, cam_id)

    task = classes["RenderTask"](rd.inner, width=128, height=128,
                                 camera_id=cam_id)
    out = task.Execute()
    img = np.asarray(out.color)
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.01, "corpus scene must render actual content"
    ids = np.asarray(rd.inner.last_output.gbuffer.mesh_id)
    hit_ids = set(int(i) for i in np.unique(ids) if i >= 0)
    # a healthy fraction of the 24 props is visible from the corpus camera
    assert len(hit_ids) >= 8, hit_ids


def test_kitchen_corpus_incremental_invalidation():
    """The dirty-bits protocol on a populated index: a transform-only edit
    re-renders with motion, an untouched scene re-syncs to the identical
    image, and a material edit propagates to the pixels using it."""
    classes, rd = make_delegate()
    sd = FakeSceneDelegate()
    meshes, mats, lights, cam_id = build_kitchen_corpus(sd)
    prims = _populate(classes, rd, sd, meshes, mats, lights, cam_id)
    task = classes["RenderTask"](rd.inner, width=128, height=128,
                                 camera_id=cam_id)
    img0 = np.asarray(task.Execute().color)

    # clean re-sync: nothing dirty → identical image
    for p in prims:
        p.Sync(sd, rd.GetRenderParam(), 0)
    rd.CommitResources(None)
    img1 = np.asarray(task.Execute().color)
    np.testing.assert_array_equal(img0, img1)

    # transform-only edit on one prop
    pid = meshes[0]
    xf = np.array(sd.data[pid]["transform"])
    xf[3, 0] += 10.0    # move it off-screen
    sd.data[pid]["transform"] = xf
    mesh0 = prims[0]
    mesh0.Sync(sd, rd.GetRenderParam(), _ChangeTracker.DirtyTransform)
    rd.CommitResources(None)
    img2 = np.asarray(task.Execute().color)
    assert np.abs(img2 - img0).max() > 1e-3, "moved prop must change pixels"

    # material edit: find the material prim and resync with DirtyMaterialId
    m0 = mats[8]        # an untextured one: constant diffuse
    sd.data[m0] = {"material": _preview_surface_network(
        m0, diffuse=(0.95, 0.02, 0.02), rough=0.9, metallic=0.0)}
    mat_prim = prims[len(meshes) + 8]
    mat_prim.Sync(sd, rd.GetRenderParam(), _ChangeTracker.AllDirty)
    rd.CommitResources(None)
    img3 = np.asarray(task.Execute().color)
    assert np.abs(img3 - img2).max() > 1e-3, "material edit must propagate"


def test_kitchen_corpus_subset_materials():
    """Geom subsets bind different materials per face range (HnMeshUtils
    geom-subset splitting)."""
    classes, rd = make_delegate()
    sd = FakeSceneDelegate()
    meshes, mats, lights, cam_id = build_kitchen_corpus(sd)
    _populate(classes, rd, sd, meshes, mats, lights, cam_id)
    # props with kind==3 authored two subsets
    subset_props = [m for i, m in enumerate(meshes) if i % 4 == 3]
    assert subset_props
    inner = rd.inner.meshes[subset_props[0]]
    assert len(inner.geom_subsets) == 2
    assert len({mid for mid, _ in inner.geom_subsets}) == 2, (
        "subset faces must carry distinct materials")
    # and the subsets survive into the committed scene: the mesh's triangles
    # must span >= 2 material slots
    scene = rd.inner._scene
    mesh_ids = sorted(rd.inner.meshes)
    node = mesh_ids.index(subset_props[0])
    tri_node = np.asarray(scene.vertex_node)[np.asarray(scene.indices)[:, 0]]
    tri_mat = np.asarray(scene.tri_material)[tri_node == node]
    assert len(set(tri_mat.tolist())) >= 2, set(tri_mat.tolist())
