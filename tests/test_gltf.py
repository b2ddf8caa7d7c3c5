"""glTF loader + textured rendering tests.

Fixture style mirrors the reference's headless tests, which write in-memory
glTF documents to a temp directory (Tests/RadientTest/RadientSceneTest.cpp:48-68).
"""
import base64
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.gltf.loader import load_gltf, parse_gltf
from diligentfx_tpu.gltf.model import build_render_scene
from diligentfx_tpu.utils.image import write_png


def _b64(arr: np.ndarray) -> str:
    return base64.b64encode(arr.tobytes()).decode()


def make_quad_gltf(tmpdir, with_texture=True, alpha_mode="OPAQUE",
                   double_sided=True):
    """Unit XY quad at z=0 with uv, one material, optional checker texture."""
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    uv = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0.5, 0.0, 0.0],
                   "name": "quad"}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "buffers": [{"byteLength": len(buf),
                     "uri": "data:application/octet-stream;base64," + _b64(
                         np.frombuffer(buf, np.uint8))}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "materials": [{
            "name": "mat",
            "pbrMetallicRoughness": {
                "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.9},
            "alphaMode": alpha_mode,
            "doubleSided": double_sided,
            "extensions": {"KHR_materials_clearcoat": {"clearcoatFactor": 0.25}},
        }],
    }
    if with_texture:
        # red/green checkerboard PNG
        tex = np.zeros((8, 8, 3), np.float32)
        tex[::2, ::2] = [1, 0, 0]
        tex[1::2, 1::2] = [1, 0, 0]
        tex[::2, 1::2] = [0, 1, 0]
        tex[1::2, ::2] = [0, 1, 0]
        png_path = os.path.join(tmpdir, "checker.png")
        write_png(png_path, tex)
        doc["images"] = [{"uri": "checker.png"}]
        doc["samplers"] = [{"wrapS": 10497, "wrapT": 10497}]
        doc["textures"] = [{"source": 0, "sampler": 0}]
        doc["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {
            "index": 0}
    path = os.path.join(tmpdir, "quad.gltf")
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def test_load_quad(tmp_path):
    path = make_quad_gltf(str(tmp_path))
    model = load_gltf(path)
    assert len(model.meshes) == 1
    prim = model.meshes[0][0]
    assert prim.positions.shape == (4, 3)
    assert prim.indices.shape == (2, 3)
    assert prim.uv0 is not None
    mat = model.materials[0]
    assert mat.double_sided
    assert mat.clearcoat_factor == pytest.approx(0.25)
    assert model.images[0] is not None
    node = model.nodes[0]
    np.testing.assert_allclose(node.world[3, :3], [0.5, 0, 0], atol=1e-6)


def test_glb_roundtrip(tmp_path):
    """Write the same doc as GLB and load it."""
    import struct
    path = make_quad_gltf(str(tmp_path), with_texture=False)
    with open(path) as f:
        doc = json.load(f)
    # inline the buffer into a BIN chunk
    uri = doc["buffers"][0].pop("uri")
    blob = base64.b64decode(uri.split(",", 1)[1])
    pad = (4 - len(blob) % 4) % 4
    blob += b"\x00" * pad
    doc["buffers"][0]["byteLength"] = len(blob)
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    glb_path = os.path.join(str(tmp_path), "quad.glb")
    total = 12 + 8 + len(js) + 8 + len(blob)
    with open(glb_path, "wb") as f:
        f.write(b"glTF" + struct.pack("<II", 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(blob), 0x004E4942) + blob)
    model = load_gltf(glb_path)
    assert model.meshes[0][0].positions.shape == (4, 3)


def test_build_render_scene_and_textured_render(tmp_path):
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.pbr.deferred import render_gbuffer
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    path = make_quad_gltf(str(tmp_path))
    model = load_gltf(path)
    rs = build_render_scene(model, atlas_size=64)
    assert rs.scene.num_triangles == 2
    assert int(rs.scene.tex_ids[0, 0]) >= 0      # base color bound
    assert int(rs.scene.tex_ids[0, 1]) == -1     # no normal map

    W = H = 128
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=128,
                           max_tiles_per_tri=8, big_tri_capacity=16, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=cfg)
    eye = [0.5, 0.0, 3.0]
    view = m3.look_at(eye, [0.5, 0.0, 0.0])
    proj = m3.perspective(1.0, 1.0, 0.1, 10.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 10.0, W, H)
    lights = PBRLightAttribs.directional([0, 0, -1], [3, 3, 3])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    gb = render_gbuffer(rs.scene, info, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=cfg,
                        atlas=rs.atlas, use_textures=True)
    bc = np.asarray(gb.base_color)
    hit = np.asarray(gb.hit)
    assert hit.sum() > 1000
    # Checkerboard: both red-ish and green-ish texels appear on the quad
    reds = (bc[..., 0] > 0.3) & (bc[..., 1] < 0.2) & hit
    greens = (bc[..., 1] > 0.3) & (bc[..., 0] < 0.2) & hit
    assert reds.sum() > 50, reds.sum()
    assert greens.sum() > 50, greens.sum()


def test_light_extraction():
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "rotation": [0, 0, 0, 1]},
        ],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "directional", "color": [1, 0.9, 0.8], "intensity": 2.0}]}},
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "buffers": [{"byteLength": 36,
                     "uri": "data:application/octet-stream;base64," + base64.b64encode(
                         np.zeros(9, np.float32).tobytes()).decode()}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": 36}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3,
                       "type": "VEC3"}],
    }
    model = parse_gltf(doc)
    assert len(model.lights) == 1
    rs = build_render_scene(model)
    assert rs.lights is not None and rs.lights.count == 1
    np.testing.assert_allclose(np.asarray(rs.lights.intensity[0]),
                               [2.0, 1.8, 1.6], atol=1e-5)


def test_cubicspline_hermite_sampling():
    """Regression (ADVICE r1): CUBICSPLINE read tangent rows as values."""
    from diligentfx_tpu.gltf.animation import AnimationChannel, _sample
    # 2 keyframes, C=3; values (N, 3, C) = (in-tangent, value, out-tangent)
    times = np.array([0.0, 1.0], np.float32)
    v0 = np.array([0.0, 0.0, 0.0], np.float32)
    v1 = np.array([1.0, 2.0, 3.0], np.float32)
    zeros = np.zeros(3, np.float32)
    values = np.stack([np.stack([zeros, v0, zeros]),
                       np.stack([zeros, v1, zeros])])
    ch = AnimationChannel(node=0, path="translation", times=times,
                          values=values, interpolation="CUBICSPLINE")
    np.testing.assert_allclose(_sample(ch, 0.0), v0)
    np.testing.assert_allclose(_sample(ch, 1.0), v1)
    # zero tangents -> smoothstep between values: h(0.5) = 0.5
    np.testing.assert_allclose(_sample(ch, 0.5), 0.5 * v1, atol=1e-6)
    # midpoint slope with zero tangents is 1.5*(v1-v0)/dt: check via small h
    d = (_sample(ch, 0.5 + 1e-3) - _sample(ch, 0.5 - 1e-3)) / 2e-3
    np.testing.assert_allclose(d, 1.5 * v1, rtol=1e-3)
    # non-zero out-tangent changes the start slope
    values2 = values.copy()
    values2[0, 2] = np.array([4.0, 0.0, 0.0], np.float32)
    ch2 = AnimationChannel(node=0, path="translation", times=times,
                           values=values2, interpolation="CUBICSPLINE")
    d0 = (_sample(ch2, 1e-4) - _sample(ch2, 0.0)) / 1e-4
    np.testing.assert_allclose(d0, [4.0, 0.0, 0.0], atol=2e-2)


def test_transform_mesh_rotates_normals_forward():
    """Regression (ADVICE r1): normals were rotated by the INVERSE."""
    from diligentfx_tpu.gltf.primitives import MeshData, transform_mesh
    from diligentfx_tpu import math3d as m3
    m = MeshData(np.array([[0, 0, 0]], np.float32),
                 np.array([[0, 1, 0]], np.float32),
                 np.zeros((1, 2), np.float32), np.array([0], np.uint32),
                 np.array([[1, 0, 0, 1]], np.float32))
    R = np.asarray(m3.rotation_x(0.7))
    t = transform_mesh(m, R)
    expect = np.array([0, 1, 0], np.float32) @ np.asarray(R)[:3, :3]
    np.testing.assert_allclose(t.normals[0], expect, atol=1e-5)
    # non-uniform scale: normal via inverse-transpose, not the matrix itself
    S = np.diag([2.0, 1.0, 1.0, 1.0]).astype(np.float32)
    mx = MeshData(np.array([[0, 0, 0]], np.float32),
                  np.array([[0.70710678, 0.70710678, 0.0]], np.float32),
                  np.zeros((1, 2), np.float32), np.array([0], np.uint32),
                  np.array([[1, 0, 0, 1]], np.float32))
    ts = transform_mesh(mx, S)
    it = np.linalg.inv(S[:3, :3]).T
    e = mx.normals[0] @ it
    e = e / np.linalg.norm(e)
    np.testing.assert_allclose(ts.normals[0], e, atol=1e-5)
