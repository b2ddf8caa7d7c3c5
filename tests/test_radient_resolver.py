"""Asset resolver chain + create/load validation (the analogues of
Radient/src/Assets/RadientFilesystemAssetResolver.cpp and
RadientAssetValidation.cpp)."""
import os

import numpy as np
import pytest

from diligentfx_tpu.radient.asset_manager import AssetManager
from diligentfx_tpu.radient.resolver import (AssetResolverChain,
                                             FilesystemAssetResolver,
                                             MemoryAssetResolver)
from diligentfx_tpu.radient.types import (LoadStatus, RadientError,
                                          RadientStatus)
from diligentfx_tpu.radient.validation import (validate_mesh_inputs,
                                               validate_scene_load,
                                               validate_texture_load)
from diligentfx_tpu.utils.image import write_png

QUAD_P = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
QUAD_I = np.array([[0, 1, 2], [0, 2, 3]], np.int32)


# ---------------------------------------------------------------------------
# resolver chain
# ---------------------------------------------------------------------------


def test_filesystem_resolver_roots_and_canonical_location(tmp_path):
    sub = tmp_path / "textures"
    sub.mkdir()
    (sub / "a.bin").write_bytes(b"hello")
    r = FilesystemAssetResolver(roots=[str(tmp_path), str(sub)])
    # relative against the second root
    found = r.resolve("a.bin")
    assert found is not None and found.data == b"hello"
    assert found.location == str(sub / "a.bin")      # canonical = abs path
    # same file via relative subdir path and file:// both canonicalize equal
    assert r.resolve("textures/a.bin").location == found.location
    assert r.resolve("file://" + str(sub / "a.bin")).location == found.location
    assert r.resolve("missing.bin") is None


def test_chain_ordering_and_push_front(tmp_path):
    (tmp_path / "x.bin").write_bytes(b"fs")
    chain = AssetResolverChain([FilesystemAssetResolver([str(tmp_path)])])
    assert chain.resolve("x.bin").data == b"fs"
    # a front-pushed memory resolver wins for its scheme only
    chain.push_front(MemoryAssetResolver({"x.bin": b"mem"}))
    assert chain.resolve("x.bin").data == b"fs"          # not a mem:// uri
    assert chain.resolve("mem://x.bin").data == b"mem"
    assert chain.resolve("mem://nope") is None


# ---------------------------------------------------------------------------
# validation (RadientAssetValidation.cpp semantics: precise error up front)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kw,frag", [
    (dict(positions=np.zeros((0, 3), np.float32), indices=QUAD_I), "empty"),
    (dict(positions=np.zeros((4, 2), np.float32), indices=QUAD_I), "(V, 3)"),
    (dict(positions=QUAD_P, indices=np.array([], np.int32)), "empty"),
    (dict(positions=QUAD_P, indices=np.array([0, 1], np.int32)), "multiple"),
    (dict(positions=QUAD_P, indices=QUAD_I.astype(np.float32)), "integer"),
    (dict(positions=QUAD_P, indices=QUAD_I + 3), "exceeds"),
    (dict(positions=QUAD_P, indices=QUAD_I,
          normals=np.zeros((3, 3), np.float32)), "normals"),
    (dict(positions=QUAD_P, indices=QUAD_I,
          uvs=np.zeros((4, 3), np.float32)), "uvs"),
    (dict(positions=QUAD_P, indices=QUAD_I,
          joints=np.zeros((4, 4), np.int32)), "both"),
])
def test_validate_mesh_inputs_errors(kw, frag):
    err = validate_mesh_inputs(**kw)
    assert err is not None and frag in err


def test_validate_mesh_inputs_ok():
    assert validate_mesh_inputs(QUAD_P, QUAD_I,
                                normals=np.zeros((4, 3), np.float32),
                                uvs=np.zeros((4, 2), np.float32),
                                joints=np.zeros((4, 4), np.int32),
                                weights=np.zeros((4, 4), np.float32)) is None


def test_validate_texture_and_scene_load():
    assert validate_texture_load(None) is not None
    assert validate_texture_load("") is not None
    assert validate_texture_load("a.png") is None
    assert validate_texture_load(np.zeros((4, 4, 5))) is not None
    assert validate_texture_load(np.zeros((0, 4, 3))) is not None
    assert validate_texture_load(np.zeros((4, 4, 3))) is None
    assert validate_scene_load("") is not None
    assert validate_scene_load("s.gltf", fmt="fbx") is not None
    assert validate_scene_load("s.gltf") is None


# ---------------------------------------------------------------------------
# asset-manager integration
# ---------------------------------------------------------------------------


def test_create_mesh_rejects_invalid_arguments():
    am = AssetManager(num_threads=1)
    try:
        with pytest.raises(RadientError) as ei:
            am.create_mesh(QUAD_P, QUAD_I + 9)
        assert ei.value.status == RadientStatus.INVALID_ARGUMENT
        with pytest.raises(RadientError):
            am.create_mesh(np.zeros((0, 3), np.float32), QUAD_I)
    finally:
        am.stop()


def test_load_texture_uri_resolves_and_dedups_by_canonical_location(tmp_path):
    png = tmp_path / "t.png"
    write_png(str(png), np.zeros((4, 4, 3), np.float32))
    am = AssetManager(num_threads=1, resolver_chain=AssetResolverChain(
        [FilesystemAssetResolver([str(tmp_path)])]))
    try:
        h1 = am.load_texture("t.png")
        h2 = am.load_texture(str(png))          # absolute spelling, same file
        assert h1 == h2                          # canonical-location dedup
        assert am.stats.dedup_hits == 1
        assert am.wait_for_asset_load(h1) in (LoadStatus.LOADED_HOST,
                                              LoadStatus.COMMITTED)
        # unresolvable URI: graceful async FAILED, not an exception
        hm = am.load_texture("missing.png")
        am.wait_for_asset_load(hm)
        assert am.get_status(hm) == LoadStatus.FAILED
        with pytest.raises(RadientError) as ei:
            am.load_texture("")
        assert ei.value.status == RadientStatus.INVALID_ARGUMENT
    finally:
        am.stop()


def test_import_gltf_through_memory_resolver(tmp_path):
    """A mem:// glTF document imports through the resolver chain — the
    reference's in-memory test-document path (RadientSceneTest fixtures)."""
    import json
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_gltf import make_quad_gltf
    from diligentfx_tpu.radient.engine import (RadientEngineCreateInfo,
                                               create_radient_engine)
    path = make_quad_gltf(str(tmp_path), with_texture=False)
    doc = open(path, "rb").read()

    eng = create_radient_engine(RadientEngineCreateInfo())
    try:
        eng.asset_manager.resolver.push_front(
            MemoryAssetResolver({"quad.gltf": doc}))
        scene, state = eng.create_scene()
        imp = eng.create_scene_importer(state)
        assert imp.import_gltf("mem://quad.gltf") == RadientStatus.OK
        assert scene.entity_count() >= 1
        assert imp.import_gltf("mem://absent.gltf") == RadientStatus.NOT_FOUND
        assert imp.import_gltf("") == RadientStatus.INVALID_ARGUMENT
    finally:
        eng.shutdown()
