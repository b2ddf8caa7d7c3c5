"""Packed multi-light shadow atlas (components/shadow_atlas.py) — the
HnShadowMapManager analogue (HnShadowMapManager.hpp:47-66, HnLight.cpp:699
slice allocation).  The VERDICT-r4 'done' gate: a frame lit by 1 directional
+ 3 spot + 1 point shadow-casting lights through ONE packed atlas matches a
per-light-map reference render."""
import numpy as np
import pytest
import jax.numpy as jnp

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                    PBRMaterialBasicAttribs,
                                    PBRRendererShaderParameters)
from diligentfx_tpu.components import shadow_atlas as sa
from diligentfx_tpu.components import shadow_map_manager as smm
from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
from diligentfx_tpu.gltf.primitives import plane
from diligentfx_tpu.pbr.deferred import render_gbuffer
from diligentfx_tpu.pbr.renderer import (PBRRenderer, RenderInfo, build_scene,
                                         transform_vertices)

W = H = 128
S = 128
CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                       max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)


# ---------------------------------------------------------------------------
# Allocator behavior (HnShadowMapManager::Resize / slice reuse)
# ---------------------------------------------------------------------------


def test_allocator_alloc_free_reuse():
    atlas = sa.ShadowAtlasManager(slice_size=64, initial_slices=4,
                                  max_slices=32)
    s_spot = atlas.add_light("spot0", "spot")
    s_dir = atlas.add_light("dir0", "dir")
    assert s_spot == [0] and s_dir == [1]
    # point needs 6 → grows 4 → 8 (power-of-two jumps keep jit shapes stable)
    s_point = atlas.add_light("p0", "point")
    assert len(s_point) == 6 and atlas.capacity == 8
    assert atlas.used_slices == 8
    # freeing returns slices for reuse at the SAME capacity
    atlas.remove_light("spot0")
    assert atlas.used_slices == 7
    again = atlas.add_light("spot1", "spot")
    assert again == [0] and atlas.capacity == 8
    # idempotent re-add
    assert atlas.add_light("p0", "point") == s_point
    # kind change reallocates
    atlas.add_light("dir0", "spot")
    assert atlas.slices_of("dir0") == [1]


def test_allocator_exhaustion():
    atlas = sa.ShadowAtlasManager(slice_size=64, initial_slices=2,
                                  max_slices=4)
    atlas.add_light("a", "spot")
    atlas.add_light("b", "spot")
    atlas.add_light("c", "spot")
    atlas.add_light("d", "spot")
    with pytest.raises(RuntimeError, match="exhausted"):
        atlas.add_light("e", "spot")


def test_light_order_layout():
    atlas = sa.ShadowAtlasManager(slice_size=64, initial_slices=16)
    atlas.add_light(0, "dir")
    atlas.add_light(1, "spot")
    atlas.add_light(2, "point")
    atlas.add_light(3, "spot")
    assert atlas.light_shadow_kinds() == ("dir", "spot", "point", "spot")
    perm = atlas.light_order_slices()
    # 1 + 1 + 6 + 1 slices, point's six consecutive in face order
    assert perm.tolist() == [0, 1, 2, 3, 4, 5, 6, 7, 8]


# ---------------------------------------------------------------------------
# End-to-end: packed atlas == per-light reference maps
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def renderer():
    return PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=16,
        prefiltered_env_map_dim=16, num_specular_env_samples=8),
        raster_cfg=CFG)


def _scene():
    """Ground plane + two floating occluder quads."""
    mat = PBRMaterialBasicAttribs.create(base_color_factor=(1, 1, 1, 1),
                                         roughness_factor=1.0)
    occ1 = np.eye(4, dtype=np.float32)
    occ1[3, :3] = [0.6, 1.0, 0.0]
    occ2 = np.eye(4, dtype=np.float32)
    occ2[3, :3] = [-0.8, 1.4, 0.4]
    return build_scene(
        [(plane(6.0), np.eye(4, dtype=np.float32), mat),
         (plane(0.8), occ1, mat), (plane(0.7), occ2, mat)],
        double_sided_flags=[False, True, True])


def _camera():
    eye = [0.0, 3.0, 4.0]
    view = m3.look_at(eye, [0, 0, 0])
    proj = m3.perspective(0.9, 1.0, 0.1, 30.0)
    return CameraAttribs.create(view, proj, eye, 0.1, 30.0, W, H)


def test_atlas_five_lights_matches_per_light_reference(renderer):
    scene = _scene()
    wp, _, _ = transform_vertices(scene)

    spot_descs = [
        dict(position=[1.5, 4.0, 1.0], direction=m3.normalize(
            jnp.asarray([-0.3, -1.0, -0.2])), outer_angle=0.6),
        dict(position=[-2.0, 3.5, 0.5], direction=m3.normalize(
            jnp.asarray([0.4, -1.0, 0.0])), outer_angle=0.5),
        dict(position=[0.0, 4.5, -2.0], direction=m3.normalize(
            jnp.asarray([0.0, -1.0, 0.6])), outer_angle=0.7),
    ]
    dir_d = m3.normalize(jnp.asarray([-0.4, -1.0, -0.3]))
    point_pos = [0.0, 2.5, 1.5]

    lights = PBRLightAttribs.concat(
        [PBRLightAttribs.directional(np.asarray(dir_d), [2.0, 2.0, 2.0])]
        + [PBRLightAttribs.spot(d["position"], np.asarray(d["direction"]),
                                [6.0, 6.0, 6.0],
                                inner_cone_angle=d["outer_angle"] * 0.6,
                                outer_cone_angle=d["outer_angle"], range=30.0)
           for d in spot_descs]
        + [PBRLightAttribs.point(point_pos, [5.0, 5.0, 5.0], range=30.0)])
    # every light shadow-casting (shadow_map_index >= 0 gates the factor)
    lights = lights.replace(
        shadow_map_index=jnp.arange(lights.count, dtype=jnp.int32))

    bmin, bmax = [-3.0, 0.0, -3.0], [3.0, 2.0, 3.0]

    # ---- packed atlas path -------------------------------------------------
    atlas = sa.ShadowAtlasManager(slice_size=S, initial_slices=4,
                                  max_slices=32)
    atlas.add_light("dir", "dir")
    for i in range(3):
        atlas.add_light(f"spot{i}", "spot")
    atlas.add_light("point", "point")
    kinds = atlas.light_shadow_kinds()
    assert kinds == ("dir", "spot", "spot", "spot", "point")
    params = {"dir": {"direction": dir_d},
              "point": {"position": point_pos, "far": 30.0}}
    for i, d in enumerate(spot_descs):
        params[f"spot{i}"] = dict(d, far=30.0)
    vps = atlas.build_view_projs(params, bounds_min=bmin, bounds_max=bmax)
    maps = atlas.render(wp, scene.indices, vps, cfg=CFG)
    pv, pm = atlas.packed_for_lights(vps, maps)

    cam = _camera()
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create(),
                      light_shadow_maps=pm, light_shadow_view_projs=pv)
    gb = render_gbuffer(scene, info, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=CFG, use_ibl=False,
                        light_shadow_kinds=kinds)
    atlas_direct = np.asarray(gb.direct)

    # ---- per-light reference: maps rendered & packed by hand ---------------
    ref_vps = [sa.directional_view_proj(dir_d, bmin, bmax)]
    for d in spot_descs:
        ref_vps.append(smm.spot_view_proj(d["position"], d["direction"],
                                          d["outer_angle"], far=30.0))
    ref_vps = jnp.concatenate([jnp.stack(ref_vps),
                               smm.point_view_projs(point_pos, far=30.0)])
    ref_maps = smm.render_light_shadow_maps(wp, scene.indices, ref_vps,
                                            shadow_map_size=S, cfg=CFG)
    info_ref = info._replace(light_shadow_maps=ref_maps,
                             light_shadow_view_projs=ref_vps)
    gb_ref = render_gbuffer(scene, info_ref, renderer.ibl_maps,
                            renderer.env_oct, width=W, height=H, cfg=CFG,
                            use_ibl=False, light_shadow_kinds=kinds)
    ref_direct = np.asarray(gb_ref.direct)

    np.testing.assert_allclose(atlas_direct, ref_direct, atol=1e-5)

    # shadows actually darken: disabling all shadow factors must differ
    gb_ns = render_gbuffer(scene,
                           info._replace(light_shadow_maps=None,
                                         light_shadow_view_projs=None),
                           renderer.ibl_maps, renderer.env_oct,
                           width=W, height=H, cfg=CFG, use_ibl=False)
    no_shadow = np.asarray(gb_ns.direct)
    assert (no_shadow - atlas_direct).max() > 0.05
    assert (atlas_direct <= no_shadow + 1e-4).all()


def test_directional_slice_covers_bounds():
    """Every point inside the bounds projects inside the ortho slice."""
    d = m3.normalize(jnp.asarray([0.3, -1.0, 0.2]))
    bmin, bmax = [-2.0, 0.0, -1.0], [2.0, 3.0, 1.0]
    vp = sa.directional_view_proj(d, bmin, bmax)
    rng = np.random.default_rng(0)
    pts = rng.uniform(bmin, bmax, size=(256, 3)).astype(np.float32)
    clip = np.asarray(m3.transform_points(jnp.asarray(pts), vp))
    ndc = clip[:, :3] / clip[:, 3:4]
    assert (np.abs(ndc[:, :2]) <= 1.0 + 1e-4).all()
    assert (ndc[:, 2] >= -1e-4).all() and (ndc[:, 2] <= 1.0 + 1e-4).all()


def test_kinds_from_lights():
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional([0, -1, 0], [1, 1, 1]),
        PBRLightAttribs.point([0, 1, 0], [1, 1, 1], range=10.0),
        PBRLightAttribs.spot([0, 2, 0], [0, -1, 0], [1, 1, 1],
                             inner_cone_angle=0.3, outer_cone_angle=0.5,
                             range=10.0),
    ])
    assert sa.kinds_from_lights(lights) == ("dir", "point", "spot")
