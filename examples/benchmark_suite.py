#!/usr/bin/env python
"""Benchmark suite for the BASELINE.json configs.

Prints one JSON line per config.  Procedural stand-ins replace the glTF
sample assets (MetalRoughSpheres / DamagedHelmet / Sponza / Kitchen are not
shippable in this image — zero egress); triangle counts are chosen to match
or exceed the originals.

Usage: python examples/benchmark_suite.py [--configs 1,2,3,4] [--frames N]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def _timeit(step, n):
    import jax
    out = step(0)
    jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(n):
        out = step(i)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1000.0


def make_camera(eye, target, w, h, fov=0.8, near=0.1, far=100.0):
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import CameraAttribs
    view = m3.look_at(eye, target)
    proj = m3.perspective(fov, w / h, near, far)
    return CameraAttribs.create(view, proj, eye, near, far, w, h)


def sponza_like_scene(n_columns=24, wall_segments=24):
    """Procedural atrium: columns + walls + floor, ~230k triangles."""
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    from diligentfx_tpu.gltf.primitives import cube, plane, uv_sphere
    from diligentfx_tpu.pbr.renderer import build_scene
    rng = np.random.default_rng(0)
    entries = []
    col = uv_sphere(0.5, 40, 56)   # high-poly column capitals
    box = cube(1.0)
    for i in range(n_columns):
        x = (i % (n_columns // 2)) * 2.5 - (n_columns // 4) * 2.5
        z = -4.0 if i < n_columns // 2 else 4.0
        node = np.eye(4, dtype=np.float32)
        node[3, :3] = [x, 1.8, z]
        entries.append((col, node, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.75, 0.7, 0.6, 1.0), roughness_factor=0.55)))
        shaft = np.diag([0.5, 3.6, 0.5, 1.0]).astype(np.float32)
        shaft[3, :3] = [x, 0.9, z]
        entries.append((box, shaft, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.7, 0.65, 0.55, 1.0), roughness_factor=0.6)))
    floor = plane(60.0, segments=wall_segments)
    entries.append((floor, np.eye(4, dtype=np.float32),
                    PBRMaterialBasicAttribs.create(
                        base_color_factor=(0.5, 0.45, 0.4, 1.0),
                        roughness_factor=0.25)))
    for i in range(40):   # clutter spheres
        node = np.eye(4, dtype=np.float32)
        node[3, :3] = [rng.uniform(-12, 12), 0.4, rng.uniform(-3, 3)]
        entries.append((uv_sphere(0.35, 24, 32), node,
                        PBRMaterialBasicAttribs.create(
                            base_color_factor=tuple(rng.uniform(0.2, 0.9, 3)) + (1.0,),
                            metallic_factor=float(rng.uniform(0, 1)),
                            roughness_factor=float(rng.uniform(0.1, 0.9)))))
    return build_scene(entries)


def config_2_shadows(frames):
    """DamagedHelmet-class mesh @1080p with CSM (PCF + EVSM)."""
    import jax
    import jax.numpy as jnp
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRMaterialBasicAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.components.shadow_map_manager import (
        convert_to_filterable, distribute_cascades, gaussian_blur_separable,
        render_cascade_shadow_maps)
    from diligentfx_tpu.config import (PBRRendererCreateInfo, RasterizerConfig,
                                       ShadowMode)
    from diligentfx_tpu.gltf.primitives import plane, uv_sphere
    from diligentfx_tpu.pbr.renderer import (PBRRenderer, RenderInfo,
                                             build_scene, transform_vertices)

    w, h = 1920, 1080
    helmet = uv_sphere(1.2, 96, 144)     # ~27k tris ≈ DamagedHelmet class
    ground = plane(40.0)
    gn = np.eye(4, dtype=np.float32)
    gn[3, 1] = -1.3
    scene = build_scene([
        (helmet, np.eye(4, dtype=np.float32), PBRMaterialBasicAttribs.create(
            base_color_factor=(0.7, 0.55, 0.35, 1.0), metallic_factor=0.8,
            roughness_factor=0.35)),
        (ground, gn, PBRMaterialBasicAttribs.create(
            base_color_factor=(0.45, 0.45, 0.5, 1.0), roughness_factor=0.7)),
    ])
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=16, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(enable_shadows=True),
                           raster_cfg=cfg)
    eye = [0.0, 1.2, 4.5]
    cam = make_camera(eye, [0, 0, 0], w, h)
    sun = [-0.5, -1.0, -0.4]
    lights = PBRLightAttribs.directional(sun, [4, 4, 4], shadow_map_index=0)
    att = distribute_cascades(cam.view, m3.inverse(cam.view),
                              float(cam.proj[0, 0]), float(cam.proj[1, 1]),
                              0.1, 100.0, sun, num_cascades=4,
                              shadow_map_size=2048)
    wp, _, _ = transform_vertices(scene)

    def step(i):
        smaps = render_cascade_shadow_maps(wp, scene.indices, att,
                                           shadow_map_size=2048, cfg=cfg)
        moments = gaussian_blur_separable(
            convert_to_filterable(smaps, ShadowMode.EVSM2))
        info = RenderInfo(camera=cam, lights=lights,
                          renderer_params=PBRRendererShaderParameters.create(),
                          shadow_attribs=att, shadow_maps=smaps,
                          shadow_moments=moments)
        return renderer.render(scene, info, width=w, height=h,
                               shadow_mode=ShadowMode.EVSM2)

    ms = _timeit(step, frames)
    return {"metric": "cfg2_1080p_csm_evsm_frame_ms", "value": round(ms, 2),
            "unit": "ms", "vs_baseline": round(16.0 / ms, 4)}


def config_3_sponza(frames):
    """Sponza-class deferred + SSAO + SSR @1080p."""
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings

    w, h = 1920, 1080
    scene = sponza_like_scene()
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1536,
                           max_tiles_per_tri=16, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True, ssao_use_pallas=True,
        ssao_num_slices=2, ssao_num_steps=4,
        enable_ssr=True, ssr_half_resolution=True,
        enable_taa=False, enable_bloom=False))
    cam = make_camera([0.0, 2.0, 10.0], [0, 1, 0], w, h)
    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.2], [4, 4, 4])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))
    state = tm.initial_state(w, h)

    holder = {"state": state}

    def step(i):
        out = tm.execute(scene, info, holder["state"], width=w, height=h,
                         settings=settings)
        holder["state"] = out.state
        return out.color

    ms = _timeit(step, frames)
    return {"metric": "cfg3_1080p_sponza_deferred_ssao_ssr_frame_ms",
            "value": round(ms, 2), "unit": "ms",
            "vs_baseline": round(16.0 / ms, 4)}


def config_4_animated(frames):
    """Full post chain @1080p, animated camera (TAA+bloom+DoF)."""
    import jax.numpy as jnp
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags

    w, h = 1920, 1080
    scene = sponza_like_scene(n_columns=12)
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1536,
                           max_tiles_per_tri=16, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True, ssao_use_pallas=True,
        ssao_num_slices=2, ssao_num_steps=4,
        enable_ssr=True, ssr_half_resolution=True,
        enable_taa=True, enable_bloom=True, enable_dof=True,
        dof_use_pallas=True, fast_env_taps=True,
        # BASELINE.json config 4 includes epipolar light scattering +
        # auto-exposure — they must be part of the measured frame
        enable_light_scattering=True, enable_auto_exposure=True,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | TAAFeatureFlags.PALLAS_WARP)))
    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.2], [4, 4, 4])
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))
    state = tm.initial_state(w, h)
    holder = {"state": state}

    def step(i):
        a = i * 0.02
        eye = [10.0 * np.sin(a), 2.0, 10.0 * np.cos(a)]
        cam = make_camera(eye, [0, 1, 0], w, h)
        info = RenderInfo(camera=cam, lights=lights,
                          renderer_params=PBRRendererShaderParameters.create())
        out = tm.execute(scene, info, holder["state"], width=w, height=h,
                         settings=settings)
        holder["state"] = out.state
        return out.color

    ms = _timeit(step, frames)
    return {"metric": "cfg4_1080p_animated_full_chain_frame_ms",
            "value": round(ms, 2), "unit": "ms",
            "vs_baseline": round(16.0 / ms, 4)}


def config_5_4k(frames):
    """Kitchen-class scene, full pipeline @4K."""
    from diligentfx_tpu.attribs import (PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.hydrogent.task_manager import (FrameSettings,
                                                       HnTaskManager,
                                                       TaskManagerCreateInfo)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from diligentfx_tpu.postfx.ssr import SSRSettings
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags

    w, h = 3840, 2160
    scene = sponza_like_scene()
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=16, big_tri_capacity=64, chunk=8)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True, ssao_use_pallas=True,
        ssao_num_slices=2, ssao_num_steps=4,
        enable_ssr=True, ssr_half_resolution=True,
        enable_taa=True, enable_bloom=True,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | TAAFeatureFlags.PALLAS_WARP)))
    cam = make_camera([0.0, 2.0, 10.0], [0, 1, 0], w, h)
    lights = PBRLightAttribs.directional([-0.4, -1.0, -0.2], [4, 4, 4])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))
    state = tm.initial_state(w, h)
    holder = {"state": state}

    def step(i):
        # split execution: the monolithic 4K program overwhelms the remote
        # compiler (HTTP 500); phase programs + banded g-buffer shading
        out = tm.execute_split(scene, info, holder["state"], width=w,
                               height=h, settings=settings,
                               gbuffer_bands=4)
        holder["state"] = out.state
        return out.color

    ms = _timeit(step, frames)
    return {"metric": "cfg5_4k_full_chain_frame_ms", "value": round(ms, 2),
            "unit": "ms", "vs_baseline": round(16.0 / ms, 4)}


CONFIGS = {2: config_2_shadows, 3: config_3_sponza, 4: config_4_animated,
           5: config_5_4k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="2,3,4")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    for c in [int(x) for x in args.configs.split(",")]:
        try:
            print(json.dumps(CONFIGS[c](args.frames)), flush=True)
        except Exception as e:  # noqa: BLE001 — report per-config
            print(json.dumps({"metric": f"cfg{c}", "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
