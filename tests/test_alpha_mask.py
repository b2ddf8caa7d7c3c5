"""ALPHA_MODE_MASK: K-layer alpha-test resolve into the visibility buffer
(the reference's alpha-cutoff PSO variants — RenderPBR.psh discard on
BaseColor.a < AlphaMaskCutoff)."""
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
from diligentfx_tpu.gltf.primitives import plane, transform_mesh
from diligentfx_tpu.pbr.deferred import render_gbuffer
from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

W = H = 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                       max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)


@pytest.fixture(scope="module")
def renderer():
    return PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=CFG)


def _two_quads(front_alpha, front_mode):
    """Back quad (green, opaque) at z=-3; front quad (red) at z=-2,
    both facing the camera at the origin looking down -Z."""
    # rotate the XZ plane to face +Z (normal +Y -> +Z, row-vector p @ M)
    rx = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
                  np.float32)
    quad = transform_mesh(plane(2.0), rx)
    back = np.eye(4, dtype=np.float32)
    back[3, 2] = -3.0
    front = np.eye(4, dtype=np.float32)
    front[3, 2] = -2.0
    m_back = PBRMaterialBasicAttribs.create(
        base_color_factor=(0.0, 1.0, 0.0, 1.0), roughness_factor=1.0)
    m_front = PBRMaterialBasicAttribs.create(
        base_color_factor=(1.0, 0.0, 0.0, front_alpha), roughness_factor=1.0,
        alpha_mode=front_mode, alpha_mask_cutoff=0.5)
    return build_scene([(quad, back, m_back), (quad, front, m_front)])


def _render(renderer, scene):
    view = m3.look_at([0.0, 0.0, 0.0], [0, 0, -1])
    proj = m3.perspective(0.9, 1.0, 0.1, 20.0)
    cam = CameraAttribs.create(view, proj, [0.0, 0.0, 0.0], 0.1, 20.0, W, H)
    info = RenderInfo(camera=cam,
                      lights=PBRLightAttribs.directional([0, 0, -1], [3, 3, 3]),
                      renderer_params=PBRRendererShaderParameters.create())
    gb = render_gbuffer(scene, info, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=CFG)
    color = np.asarray(gb.direct + gb.ambient_diffuse)
    return gb, color


def test_mask_scene_reorders_tail():
    scene = _two_quads(0.0, front_mode=1)
    assert scene.mask_indices is not None
    nm = scene.mask_indices.shape[0]
    assert nm == 2
    np.testing.assert_array_equal(np.asarray(scene.indices[-nm:]),
                                  np.asarray(scene.mask_indices))
    # masked tris' material must be the masked one
    assert int(np.asarray(scene.tri_material)[-1]) == 1


def test_mask_alpha_below_cutoff_discards(renderer):
    scene = _two_quads(0.0, front_mode=1)
    gb, color = _render(renderer, scene)
    cy, cx = H // 2, W // 2
    # the fully transparent masked quad is cut out -> back (green) visible
    assert color[cy, cx, 1] > color[cy, cx, 0]
    # depth at center is the BACK quad's, not the masked one's
    assert np.asarray(gb.mesh_id)[cy, cx] >= 0


def test_mask_alpha_above_cutoff_keeps(renderer):
    scene = _two_quads(1.0, front_mode=1)
    gb, color = _render(renderer, scene)
    cy, cx = H // 2, W // 2
    # opaque-alpha masked quad survives the cutoff -> red in front
    assert color[cy, cx, 0] > color[cy, cx, 1]


def test_opaque_mode_ignores_alpha(renderer):
    # alpha 0 but OPAQUE mode: no mask list, front quad still covers
    scene = _two_quads(0.0, front_mode=0)
    assert scene.mask_indices is None
    _, color = _render(renderer, scene)
    cy, cx = H // 2, W // 2
    assert color[cy, cx, 0] > color[cy, cx, 1]
