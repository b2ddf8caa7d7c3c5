#!/usr/bin/env python
"""Renders a grid of PNGs showcasing round-1 features: alpha-masked cutouts,
spot/point light shadows, geometry modes, OIT transparency, and debug AOVs.

Usage: python examples/feature_showcase.py [--size 256] [--out /tmp/showcase]
Runs on CPU or TPU (pass JAX_PLATFORMS=cpu to force CPU).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=str, default="/tmp/showcase")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    W = H = args.size

    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRMaterialBasicAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.components import shadow_map_manager as smm
    from diligentfx_tpu.config import (DebugViewType, PBRRendererCreateInfo,
                                       RasterizerConfig)
    from diligentfx_tpu.gltf.primitives import plane, transform_mesh, uv_sphere
    from diligentfx_tpu.pbr.renderer import (PBRRenderer, RenderInfo,
                                             build_scene, transform_vertices)
    from diligentfx_tpu.utils.image import write_png

    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                           max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=32, num_brdf_samples=32, irradiance_cube_dim=32,
        prefiltered_env_map_dim=64, num_specular_env_samples=64),
        raster_cfg=cfg)

    def save(name, img):
        path = os.path.join(args.out, name + ".png")
        write_png(path, np.clip(np.asarray(img), 0.0, 1.0))
        print("wrote", path)

    # ---- scene: sphere + ground + masked front quad -------------------------
    rx = np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
                  np.float32)
    quad = transform_mesh(plane(1.6), rx)
    ground = np.eye(4, dtype=np.float32)
    ground[3, 1] = -0.8
    s_node = np.eye(4, dtype=np.float32)
    q_node = np.eye(4, dtype=np.float32)
    q_node[3, 2] = 1.2
    scene = build_scene([
        (uv_sphere(0.8, stacks=24, slices=36), s_node,
         PBRMaterialBasicAttribs.create(base_color_factor=(0.8, 0.25, 0.2, 1),
                                        metallic_factor=0.8,
                                        roughness_factor=0.25)),
        (plane(8.0), ground,
         PBRMaterialBasicAttribs.create(base_color_factor=(0.5, 0.5, 0.55, 1),
                                        roughness_factor=0.3)),
        (quad, q_node,
         PBRMaterialBasicAttribs.create(base_color_factor=(0.2, 0.6, 0.9, 0.3),
                                        alpha_mode=1, alpha_mask_cutoff=0.5,
                                        roughness_factor=0.8)),
    ], double_sided_flags=[False, False, True])
    eye = [0.0, 1.2, 4.0]
    cam = CameraAttribs.create(m3.look_at(eye, [0, 0, 0]),
                               m3.perspective(0.85, 1.0, 0.1, 50.0),
                               eye, 0.1, 50.0, W, H)
    lights = PBRLightAttribs.directional([-0.4, -0.8, -0.5], [3.5, 3.4, 3.2])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())

    # alpha-masked quad (alpha 0.3 < cutoff 0.5 -> cut out entirely)
    save("alpha_mask", renderer.render(scene, info, width=W, height=H))

    # spot-light shadow
    lpos, ldir = [1.5, 3.5, 1.5], [-0.35, -0.85, -0.35]
    spot = PBRLightAttribs.spot(lpos, ldir, [40, 38, 35], 0.3, 0.7,
                                range=30.0, shadow_map_index=0)
    vp = smm.spot_view_proj(lpos, ldir, 0.7, near=0.1, far=30.0)[None]
    wp, _, _ = transform_vertices(scene)
    maps = smm.render_light_shadow_maps(wp, scene.indices, vp,
                                        shadow_map_size=512, cfg=cfg)
    info_s = info._replace(lights=spot, light_shadow_maps=maps,
                           light_shadow_view_projs=vp)
    from diligentfx_tpu.pbr.deferred import render_gbuffer
    gb = render_gbuffer(scene, info_s, renderer.ibl_maps, renderer.env_oct,
                        width=W, height=H, cfg=cfg,
                        light_shadow_kinds=("spot",))
    save("spot_shadow", m3.linear_to_srgb(
        np.asarray(gb.direct + 0.25 * gb.ambient_diffuse)))

    # geometry modes
    from diligentfx_tpu.hydrogent.render_delegate import render_geometry_mode
    save("edges", render_geometry_mode(scene, info, width=W, height=H,
                                       cfg=cfg, mode=1))
    save("points", render_geometry_mode(scene, info, width=W, height=H,
                                        cfg=cfg, mode=2))

    # debug AOV
    save("normals_aov", renderer.render(
        scene, info, width=W, height=H,
        debug_view=DebugViewType.SHADING_NORMAL))

    # ---- the wired HnTaskManager tasks: selection outline + desaturation,
    # coordinate grid, bound box, motion-vector overlay, depth bounds -------
    import jax.numpy as jnp
    from diligentfx_tpu.hydrogent.task_manager import (BoundBoxParams,
                                                       FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=False, enable_ssr=False, enable_taa=False,
        enable_bloom=False, enable_selection=True, enable_grid=True,
        enable_bound_box=True, enable_vector_field=True,
        enable_depth_bounds=True))
    settings = FrameSettings(
        selected_ids=jnp.array([0, -1, -1, -1], jnp.int32),   # the sphere
        bound_box=BoundBoxParams(box_min=jnp.array([-0.8, -0.8, -0.8]),
                                 box_max=jnp.array([0.8, 0.8, 0.8])))
    out = tm.execute(scene, info, tm.initial_state(W, H), width=W, height=H,
                     settings=settings)
    save("selection_grid_bbox_tasks", out.color)
    dr = out.depth_range
    print(f"depth bounds: near_z={float(dr.scene_near_z):.2f} "
          f"far_z={float(dr.scene_far_z):.2f}")


if __name__ == "__main__":
    main()
