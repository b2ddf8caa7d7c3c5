"""Skinning + animation: joint blending, animated node hierarchy, motion."""
import base64
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.gltf.animation import AnimationPlayer, compute_skin_matrices
from diligentfx_tpu.gltf.loader import parse_gltf
from diligentfx_tpu.gltf.model import build_render_scene, update_animation
from diligentfx_tpu.pbr.renderer import transform_vertices


def _b64(b: bytes) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(b).decode()


def make_skinned_gltf():
    """Two-bone vertical strip: bottom vertices bound to joint0, top to joint1;
    an animation rotates joint1."""
    pos = np.array([[-0.5, 0, 0], [0.5, 0, 0],
                    [-0.5, 1, 0], [0.5, 1, 0],
                    [-0.5, 2, 0], [0.5, 2, 0]], np.float32)
    joints = np.array([[0, 0, 0, 0]] * 2 + [[0, 1, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2,
                      np.uint16)
    weights = np.array([[1, 0, 0, 0]] * 2 + [[0.5, 0.5, 0, 0]] * 2
                       + [[1, 0, 0, 0]] * 2, np.float32)
    idx = np.array([0, 1, 2, 1, 3, 2, 2, 3, 4, 3, 5, 4], np.uint16)
    ibm = np.stack([np.eye(4, dtype=np.float32),
                    np.eye(4, dtype=np.float32)])
    # joint1 node local translation (0,1,0); ibm compensates
    ibm[1][3, 1] = -1.0  # column-major glTF: memory row 3 = translation row

    # glTF stores matrices column-major for column vectors; that memory
    # layout reads back as exactly our row-vector matrix — store as-is.
    buf = (pos.tobytes() + joints.tobytes() + weights.tobytes() + idx.tobytes()
           + ibm.tobytes())
    # animation: joint1 rotates around Z over 2 seconds
    times = np.array([0.0, 1.0, 2.0], np.float32)
    s = np.sin(np.pi / 4)
    rots = np.array([[0, 0, 0, 1], [0, 0, s, np.cos(np.pi / 4)], [0, 0, 1, 0]],
                    np.float32)
    anim_buf = times.tobytes() + rots.tobytes()

    doc = {
        "asset": {"version": "2.0"}, "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"name": "joint0", "children": [2]},
            {"name": "joint1", "translation": [0, 1, 0]},
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3}]}],
        "buffers": [
            {"byteLength": len(buf), "uri": _b64(buf)},
            {"byteLength": len(anim_buf), "uri": _b64(anim_buf)},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 72},
            {"buffer": 0, "byteOffset": 72, "byteLength": 48},
            {"buffer": 0, "byteOffset": 120, "byteLength": 96},
            {"buffer": 0, "byteOffset": 216, "byteLength": 24},
            {"buffer": 0, "byteOffset": 240, "byteLength": 128},
            {"buffer": 1, "byteOffset": 0, "byteLength": 12},
            {"buffer": 1, "byteOffset": 12, "byteLength": 48},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 6, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6, "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 6, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 12, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 5, "componentType": 5126, "count": 3, "type": "SCALAR"},
            {"bufferView": 6, "componentType": 5126, "count": 3, "type": "VEC4"},
        ],
        "animations": [{
            "samplers": [{"input": 5, "output": 6, "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0, "target": {"node": 2, "path": "rotation"}}],
        }],
    }
    return parse_gltf(doc)


def test_skinned_model_loads_and_binds():
    model = make_skinned_gltf()
    assert len(model.skins) == 1
    assert len(model.animations) == 1
    rs = build_render_scene(model)
    assert rs.scene.joints is not None
    assert rs.scene.joint_matrices.shape == (2, 4, 4)


def test_animation_player_rotates_joint():
    model = make_skinned_gltf()
    player = AnimationPlayer(model, model.animations)
    w0 = player.evaluate(0.0)
    w1 = player.evaluate(1.0)   # 90° about Z at node 2
    # node2 world at t=0: translation (0,1,0); at t=1 rotated 90° about Z
    np.testing.assert_allclose(w0[2][3, :3], [0, 1, 0], atol=1e-5)
    # a point (1,0,0) local to joint1 maps to about (0,1,0)+(0,1,0)... check
    p = np.array([1.0, 0.0, 0.0, 1.0], np.float32)
    p1 = p @ w1[2]
    np.testing.assert_allclose(p1[:3], [0, 2, 0], atol=1e-4)


def test_skinned_vertices_follow_animation():
    model = make_skinned_gltf()
    rs = build_render_scene(model)
    player = AnimationPlayer(model, model.animations)
    rs0 = update_animation(rs, model, player, 0.0)
    wp0, _, _ = transform_vertices(rs0.scene)
    # at t=0 the strip is unchanged
    np.testing.assert_allclose(np.asarray(wp0), model.meshes[0][0].positions,
                               atol=1e-4)
    rs1 = update_animation(rs, model, player, 1.0, prev_t=0.0)
    wp1, _, _ = transform_vertices(rs1.scene)
    top = np.asarray(wp1)[4]   # top vertex fully bound to joint1
    # joint1 rotated +90° about Z ((x,y)→(−y,x) around the joint at (0,1,0)):
    # vertex (−0.5,2,0) → (−1, 0.5, 0)
    np.testing.assert_allclose(top, [-1.0, 0.5, 0.0], atol=1e-3)
    # previous-frame positions differ (motion vectors source)
    wp_prev, _, _ = transform_vertices(rs1.scene, previous=True)
    assert float(jnp.abs(wp1 - wp_prev).max()) > 0.3
