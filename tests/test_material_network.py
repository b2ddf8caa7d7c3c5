"""HnMaterialNetwork node-graph parse + UV/wrap plumbing tests
(reference: Hydrogent/interface/HnMaterialNetwork.hpp:46-192,
PBR_Structures.fxh:245-255 texture attribs)."""
import math

import numpy as np
import pytest

from diligentfx_tpu.hydrogent.material_network import (
    HnMaterialNetwork, ParamType, Transform2d, normalized_payload)
from diligentfx_tpu.ops.sampling import WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT


def _checker(n=32, tiles=4):
    y, x = np.mgrid[0:n, 0:n]
    c = (((x * tiles // n) + (y * tiles // n)) % 2).astype(np.float32)
    return np.stack([c, c, c, np.ones_like(c)], axis=-1)


def graph_net(wrapS="repeat", wrapT="clamp", scale=(2.0, 2.0),
              rotation=0.0, translation=(0.1, 0.0), tex=None,
              surf_params=None, extra_conn=()):
    tex = _checker() if tex is None else tex
    return {
        "nodes": {
            "/m/surf": {"type": "UsdPreviewSurface",
                        "params": dict(surf_params or {})},
            "/m/tex": {"type": "UsdUVTexture",
                       "params": {"file": tex, "wrapS": wrapS,
                                  "wrapT": wrapT}},
            "/m/xf": {"type": "UsdTransform2d",
                      "params": {"scale": scale, "rotation": rotation,
                                 "translation": translation}},
            "/m/st": {"type": "UsdPrimvarReader_float2",
                      "params": {"varname": "st"}},
        },
        "connections": [("/m/surf", "diffuseColor", "/m/tex", "rgb"),
                        ("/m/tex", "st", "/m/xf", "result"),
                        ("/m/xf", "in", "/m/st", "result"),
                        *extra_conn],
        "terminal": "/m/surf",
    }


def test_graph_parse_texture_descriptor():
    net = HnMaterialNetwork(graph_net(rotation=30.0))
    desc = net.texture_for_slot(0)
    assert desc is not None
    assert desc.wrap_u == WRAP_REPEAT and desc.wrap_v == WRAP_CLAMP
    assert desc.primvar == "st"
    # uv transform = rotate(scale * uv, 30°) + translation, row-vector form
    th = math.radians(30.0)
    m = desc.uv_transform
    assert m[0] == pytest.approx(2.0 * math.cos(th))
    assert m[1] == pytest.approx(2.0 * math.sin(th))
    assert m[4] == pytest.approx(0.1)
    # the parse also records a TEXTURE parameter
    tex_params = [p for p in net.parameters if p.type == ParamType.TEXTURE]
    assert any(p.name == "diffuseColor" for p in tex_params)


def test_graph_surface_values_and_fallbacks():
    net = HnMaterialNetwork(graph_net(
        surf_params={"roughness": 0.25, "metallic": 0.75,
                     "opacityThreshold": 0.5}))
    assert net.roughness == 0.25
    assert net.metallic == 0.75
    assert net.tag == "masked"


def test_opacity_texture_makes_translucent():
    g = graph_net(extra_conn=[("/m/surf", "opacity", "/m/tex", "a")])
    net = HnMaterialNetwork(g)
    assert net.tag == "translucent"


def test_wrap_token_mirror_and_black():
    net = HnMaterialNetwork(graph_net(wrapS="mirror", wrapT="black"))
    d = net.texture_for_slot(0)
    assert d.wrap_u == WRAP_MIRROR
    assert d.wrap_v == WRAP_CLAMP   # 'black' falls back to clamp in an atlas


def test_transform2d_compose_matches_sequential():
    a = Transform2d((2.0, 0.5), 30.0, (0.1, -0.2))
    b = Transform2d((1.5, 1.0), -45.0, (0.3, 0.4))
    from diligentfx_tpu.hydrogent.material_network import _compose
    c = _compose(a, b)

    def apply(t, uv):
        th = math.radians(t.rotation)
        su, sv = t.scale
        x, y = uv[0] * su, uv[1] * sv
        return (x * math.cos(th) - y * math.sin(th) + t.translation[0],
                x * math.sin(th) + y * math.cos(th) + t.translation[1])

    m = c.as_scale_rot_bias()
    for uv in [(0.0, 0.0), (1.0, 0.0), (0.3, 0.7)]:
        want = apply(a, apply(b, uv))
        got = (uv[0] * m[0] + uv[1] * m[2] + m[4],
               uv[0] * m[1] + uv[1] * m[3] + m[5])
        assert got[0] == pytest.approx(want[0], abs=1e-5)
        assert got[1] == pytest.approx(want[1], abs=1e-5)


def test_transform2d_matrix_matches_apply_uv_transform():
    """The 6-float form consumed by ops/texture.apply_uv_transform must equal
    the reference rotate(scale*uv)+t semantics."""
    import jax.numpy as jnp
    from diligentfx_tpu.ops.texture import apply_uv_transform
    t = Transform2d((2.0, 0.5), 37.0, (0.15, -0.25))
    m = np.asarray(t.as_scale_rot_bias(), np.float32)
    uv = np.array([[0.3, 0.7], [1.0, 0.0], [0.0, 1.0]], np.float32)
    got = np.asarray(apply_uv_transform(
        jnp.asarray(uv), jnp.asarray(m[:4]), jnp.asarray(m[4:])))
    th = math.radians(37.0)
    for i, (u, v) in enumerate(uv):
        x, y = u * 2.0, v * 0.5
        want = (x * math.cos(th) - y * math.sin(th) + 0.15,
                x * math.sin(th) + y * math.cos(th) - 0.25)
        assert got[i, 0] == pytest.approx(want[0], abs=1e-5)
        assert got[i, 1] == pytest.approx(want[1], abs=1e-5)


def test_normalized_payload_swizzle_roughness_in_r():
    """Roughness authored in the R channel must land in G on device."""
    img = np.zeros((4, 4, 4), np.float32)
    img[..., 0] = 0.7     # roughness in R
    g = {
        "nodes": {
            "/m/surf": {"type": "UsdPreviewSurface", "params": {}},
            "/m/tex": {"type": "UsdUVTexture", "params": {"file": img}},
        },
        "connections": [("/m/surf", "roughness", "/m/tex", "r")],
        "terminal": "/m/surf",
    }
    net = HnMaterialNetwork(g)
    d = net.texture_for_slot(2)
    out = np.asarray(normalized_payload(d, 2))
    assert out[..., 1] == pytest.approx(0.7)    # G = roughness


def test_primvar_redirect_param():
    g = {
        "nodes": {
            "/m/surf": {"type": "UsdPreviewSurface", "params": {}},
            "/m/pv": {"type": "UsdPrimvarReader_float3",
                      "params": {"varname": "displayColor",
                                 "fallback": (1, 0, 0)}},
        },
        "connections": [("/m/surf", "diffuseColor", "/m/pv", "result")],
        "terminal": "/m/surf",
    }
    net = HnMaterialNetwork(g)
    p = [q for q in net.parameters if q.type == ParamType.PRIMVAR_REDIRECT]
    assert p and p[0].sampler_coords == ("displayColor",)


def test_legacy_flat_form_still_parses():
    net = HnMaterialNetwork({"surface": {"diffuseColor": (1, 0, 0),
                                         "opacity": 0.5},
                             "textures": {"diffuseColor": _checker()}})
    assert net.tag == "translucent"
    assert net.texture_for_slot(0) is not None
    assert net.diffuse_color == (1, 0, 0)


# ---------------------------------------------------------------------------
# End-to-end: UV transform + wraps reach the sampled pixels
# ---------------------------------------------------------------------------


def _render_basecolor(network):
    from diligentfx_tpu.config import RasterizerConfig, PBRRendererCreateInfo
    from diligentfx_tpu.hydrogent.render_delegate import (
        HnRenderDelegate)
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
    d = HnRenderDelegate(renderer=renderer,
                         task_manager_ci=TaskManagerCreateInfo(
                             enable_ssao=False, enable_ssr=False,
                             enable_taa=False, enable_bloom=False))
    mat = d.create_sprim("material", "/m")
    mat.set_network(network)
    mesh = d.create_rprim("mesh", "/quad")
    mesh.set_points([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]])
    mesh.set_primvar("st", np.zeros((4, 2)))  # replaced below
    mesh.uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh.set_topology([4], [0, 1, 2, 3])
    mesh.set_material("/m")
    cam = d.create_sprim("camera", "/cam")
    cam.set_params(eye=(0, 0, 3.2), target=(0, 0, 0))
    light = d.create_sprim("light", "/sun")
    light.set_params(type="distant", direction=(0, 0, -1), intensity=3.0)
    out = d.execute(128, 128)
    return np.asarray(out.gbuffer.base_color)


@pytest.mark.slow
def test_uv_transform_tiles_texture():
    """scale(2,2) repeat → twice the checker frequency vs identity."""
    tex = _checker(32, 2)

    def freq(img):
        row = img[64, :, 0]
        return int(np.sum(np.abs(np.diff((row > row.mean()).astype(int)))))

    ident = _render_basecolor(graph_net(scale=(1, 1), translation=(0, 0),
                                        wrapT="repeat", tex=tex))
    tiled = _render_basecolor(graph_net(scale=(2, 2), translation=(0, 0),
                                        wrapT="repeat", tex=tex))
    assert freq(tiled) >= 2 * freq(ident) - 2
    assert freq(tiled) > freq(ident)


@pytest.mark.slow
def test_wrap_clamp_vs_repeat_outside_unit():
    """uv shifted outside [0,1]: repeat re-tiles (varying), clamp saturates
    to the edge texel (constant along u)."""
    tex = _checker(32, 4)
    rep = _render_basecolor(graph_net(scale=(1, 1), translation=(1.25, 0),
                                      wrapS="repeat", wrapT="repeat", tex=tex))
    clp = _render_basecolor(graph_net(scale=(1, 1), translation=(1.25, 0),
                                      wrapS="clamp", wrapT="repeat", tex=tex))
    mid_rep = rep[40:88, 40:88, 0]
    mid_clp = clp[40:88, 40:88, 0]
    # repeated checker varies along u; clamped is constant along u
    assert mid_rep.std(axis=1).mean() > 0.05
    assert mid_clp.std(axis=1).mean() < 0.02
