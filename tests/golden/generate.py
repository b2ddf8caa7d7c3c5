#!/usr/bin/env python
"""Regenerate golden images (run on CPU: deterministic across this stack).
Usage: python tests/golden/generate.py"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np


def render_mr_spheres_golden():
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRMaterialBasicAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.gltf.primitives import uv_sphere
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo, build_scene

    W = H = 128
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                           max_tiles_per_tri=16, big_tri_capacity=16, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=32, num_brdf_samples=32, irradiance_cube_dim=32,
        prefiltered_env_map_dim=32, num_specular_env_samples=32),
        raster_cfg=cfg)
    meshes = []
    sphere = uv_sphere(0.45, stacks=16, slices=24)
    for i in range(3):          # metallic 0, 0.5, 1 across a row
        node = np.eye(4, dtype=np.float32)
        node[3, 0] = (i - 1) * 1.1
        meshes.append((sphere, node, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.7, 0.2, 0.2, 1.0),
            metallic_factor=i * 0.5, roughness_factor=0.3)))
    scene = build_scene(meshes)
    eye = [0.0, 0.6, 3.2]
    cam = CameraAttribs.create(m3.look_at(eye, [0, 0, 0]),
                               m3.perspective(0.8, 1.0, 0.1, 20.0),
                               eye, 0.1, 20.0, W, H)
    info = RenderInfo(camera=cam,
                      lights=PBRLightAttribs.directional([-0.4, -0.6, -0.8],
                                                         [3.0, 3.0, 3.0]),
                      renderer_params=PBRRendererShaderParameters.create())
    return np.asarray(renderer.render(scene, info, width=W, height=H))


def _small_cam(eye, target, w, h, fov=0.8, near=0.1, far=100.0):
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import CameraAttribs
    return CameraAttribs.create(m3.look_at(eye, target),
                                m3.perspective(fov, w / h, near, far),
                                eye, near, far, w, h)


def _small_cfg():
    from diligentfx_tpu.config import RasterizerConfig
    return RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=512,
                            max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)


def render_csm_golden():
    """cfg2 stand-in: sphere + ground with 2-cascade EVSM2 shadows (256x128)."""
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRMaterialBasicAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.components.shadow_map_manager import (
        convert_to_filterable, distribute_cascades, gaussian_blur_separable,
        render_cascade_shadow_maps)
    from diligentfx_tpu.config import PBRRendererCreateInfo, ShadowMode
    from diligentfx_tpu.gltf.primitives import plane, uv_sphere
    from diligentfx_tpu.pbr.renderer import (PBRRenderer, RenderInfo,
                                             build_scene, transform_vertices)
    w, h = 256, 128
    gn = np.eye(4, dtype=np.float32); gn[3, 1] = -1.0
    scene = build_scene([
        (uv_sphere(0.9, 24, 32), np.eye(4, dtype=np.float32),
         PBRMaterialBasicAttribs.create(base_color_factor=(0.7, 0.55, 0.35, 1),
                                        metallic_factor=0.6,
                                        roughness_factor=0.35)),
        (plane(20.0), gn, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.45, 0.45, 0.5, 1.0), roughness_factor=0.7)),
    ])
    cfg = _small_cfg()
    renderer = PBRRenderer(PBRRendererCreateInfo(
        enable_shadows=True, brdf_lut_dim=32, num_brdf_samples=16,
        irradiance_cube_dim=16, prefiltered_env_map_dim=32,
        num_specular_env_samples=16), raster_cfg=cfg)
    cam = _small_cam([0.0, 1.2, 4.0], [0, 0, 0], w, h)
    sun = [-0.5, -1.0, -0.4]
    lights = PBRLightAttribs.directional(sun, [4, 4, 4], shadow_map_index=0)
    att = distribute_cascades(cam.view, m3.inverse(cam.view),
                              float(cam.proj[0, 0]), float(cam.proj[1, 1]),
                              0.1, 100.0, sun, num_cascades=2,
                              shadow_map_size=256)
    wp, _, _ = transform_vertices(scene)
    smaps = render_cascade_shadow_maps(wp, scene.indices, att,
                                       shadow_map_size=256, cfg=cfg)
    moments = gaussian_blur_separable(
        convert_to_filterable(smaps, ShadowMode.EVSM2))
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create(),
                      shadow_attribs=att, shadow_maps=smaps,
                      shadow_moments=moments)
    return np.asarray(renderer.render(scene, info, width=w, height=h,
                                      shadow_mode=ShadowMode.EVSM2))


def _mini_sponza():
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    from diligentfx_tpu.gltf.primitives import cube, plane, uv_sphere
    from diligentfx_tpu.pbr.renderer import build_scene
    rng = np.random.default_rng(0)
    entries = []
    col = uv_sphere(0.5, 10, 14)
    box = cube(1.0)
    for i in range(6):
        x = (i % 3) * 2.5 - 2.5
        z = -3.0 if i < 3 else 3.0
        node = np.eye(4, dtype=np.float32); node[3, :3] = [x, 1.8, z]
        entries.append((col, node, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.75, 0.7, 0.6, 1.0), roughness_factor=0.55)))
        shaft = np.diag([0.5, 3.6, 0.5, 1.0]).astype(np.float32)
        shaft[3, :3] = [x, 0.9, z]
        entries.append((box, shaft, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.7, 0.65, 0.55, 1.0), roughness_factor=0.6)))
    entries.append((plane(30.0, segments=4), np.eye(4, dtype=np.float32),
                    PBRMaterialBasicAttribs.create(
                        base_color_factor=(0.5, 0.45, 0.4, 1.0),
                        roughness_factor=0.25)))
    for i in range(6):
        node = np.eye(4, dtype=np.float32)
        node[3, :3] = [rng.uniform(-5, 5), 0.4, rng.uniform(-2, 2)]
        entries.append((uv_sphere(0.35, 8, 10), node,
                        PBRMaterialBasicAttribs.create(
                            base_color_factor=tuple(rng.uniform(0.2, 0.9, 3)) + (1.0,),
                            metallic_factor=float(rng.uniform(0, 1)),
                            roughness_factor=float(rng.uniform(0.1, 0.9)))))
    return build_scene(entries)


def _chain_golden(full_chain):
    """cfg3 (deferred+SSAO+SSR) / cfg4 (+TAA+bloom+DoF) stand-ins, 256x128.
    Renders TWO frames so temporal accumulation/history paths are in the
    golden (second frame is the image under test)."""
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    w, h = 256, 128
    scene = _mini_sponza()
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=32, num_brdf_samples=16, irradiance_cube_dim=16,
        prefiltered_env_map_dim=32, num_specular_env_samples=16),
        raster_cfg=_small_cfg())
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=4,
        enable_ssr=True, ssr_half_resolution=True,
        enable_taa=full_chain, enable_bloom=full_chain,
        enable_dof=full_chain))
    cam = _small_cam([0.0, 2.0, 9.0], [0, 1, 0], w, h)
    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.2], [4, 4, 4])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=16))
    state = tm.initial_state(w, h)
    out = tm.execute(scene, info, state, width=w, height=h, settings=settings)
    out = tm.execute(scene, info, out.state, width=w, height=h,
                     settings=settings)
    return np.asarray(out.color)


def render_deferred_golden():
    return _chain_golden(False)


def render_full_chain_golden():
    return _chain_golden(True)


def render_bench_config_golden():
    """The EXACT bench.py headline feature set (Pallas SSAO taps, Pallas SSR
    march + packed radiance tap, Pallas TAA history warp, fast env taps,
    div2 SSR) with every Pallas kernel in interpret mode — closes the gap
    where goldens gated only the XLA defaults while the bench ran the
    Pallas variants (round-4 VERDICT weak #8)."""
    import functools
    import jax.experimental.pallas as pl
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags
    w, h = 256, 128
    scene = _mini_sponza()
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=32, num_brdf_samples=16, irradiance_cube_dim=16,
        prefiltered_env_map_dim=32, num_specular_env_samples=16),
        raster_cfg=_small_cfg())
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=4,
        ssao_use_pallas=True, ssr_use_pallas=True, fast_env_taps=True,
        enable_ssr=True, ssr_half_resolution=True, ssr_resolution_divisor=2,
        enable_taa=True, enable_bloom=True,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | TAAFeatureFlags.PALLAS_WARP)))
    cam = _small_cam([0.0, 2.0, 9.0], [0, 1, 0], w, h)
    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.2], [4, 4, 4])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=16))
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        state = tm.initial_state(w, h)
        out = tm.execute(scene, info, state, width=w, height=h,
                         settings=settings)
        out = tm.execute(scene, info, out.state, width=w, height=h,
                         settings=settings)
    finally:
        pl.pallas_call = orig
    return np.asarray(out.color)


GOLDENS = {
    "mr_spheres_128.png": render_mr_spheres_golden,
    "bench_cfg_256.png": render_bench_config_golden,
    "csm_256.png": render_csm_golden,
    "deferred_256.png": render_deferred_golden,
    "full_chain_256.png": render_full_chain_golden,
}

if __name__ == "__main__":
    from diligentfx_tpu.utils.image import write_png
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    for name, fn in GOLDENS.items():
        if args.only and args.only not in name:
            continue
        img = fn()
        out = os.path.join(os.path.dirname(__file__), name)
        write_png(out, img)
        print("wrote", out, img.shape, "mean", float(img.mean()))
