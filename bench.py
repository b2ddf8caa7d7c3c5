#!/usr/bin/env python
"""Benchmark: full PBR frame at 1080p on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): full PBR+postfx 1080p frame < 16 ms on v5e-1.
vs_baseline = 16.0 / measured_ms  (>1 means faster than target).

--smoke runs a tiny CPU config for CI-style verification.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def build_bench_scene(rows, cols, sphere_res, textured=False):
    from diligentfx_tpu.attribs import PBRMaterialBasicAttribs
    from diligentfx_tpu.gltf.primitives import uv_sphere, plane
    from diligentfx_tpu.pbr.renderer import build_scene

    mesh = uv_sphere(0.42, stacks=sphere_res, slices=sphere_res + 8)
    ground = plane(40.0, segments=8)
    entries = []
    for r in range(rows):
        for c in range(cols):
            node = np.eye(4, dtype=np.float32)
            node[3, :3] = [c - (cols - 1) / 2, (rows - 1) / 2 - r, 0.0]
            mat = PBRMaterialBasicAttribs.create(
                base_color_factor=(0.8, 0.3, 0.25, 1.0),
                metallic_factor=r / max(rows - 1, 1),
                roughness_factor=max(c / max(cols - 1, 1), 0.03))
            entries.append((mesh, node, mat))
    gnode = np.eye(4, dtype=np.float32)
    gnode[3, :3] = [0.0, -rows / 2 - 0.5, 0.0]
    entries.append((ground, gnode, PBRMaterialBasicAttribs.create(
        base_color_factor=(0.5, 0.5, 0.55, 1.0), metallic_factor=0.0,
        roughness_factor=0.6)))
    scene = build_scene(entries)
    if not textured:
        return scene
    return _bench_atlas(scene, len(entries))


def _bench_atlas(scene, n_mats, tex_size=256):
    """Procedural 256^2 material textures (base color, normal, phys-desc) so
    the textured-CSM metric pays real atlas-sampling cost per pixel."""
    from diligentfx_tpu.gltf.model import (NUM_SLOTS, SLOT_BASE_COLOR,
                                           SLOT_NORMAL, SLOT_PHYS_DESC)
    from diligentfx_tpu.ops.texture import AtlasBuilder
    import jax.numpy as jnp
    rng = np.random.default_rng(42)
    b = AtlasBuilder(size=tex_size)
    yy, xx = np.mgrid[0:tex_size, 0:tex_size].astype(np.float32) / tex_size
    checker = ((np.floor(yy * 8) + np.floor(xx * 8)) % 2)[..., None]
    base = (0.35 + 0.5 * checker * np.ones((1, 1, 3), np.float32)
            + 0.08 * rng.random((tex_size, tex_size, 3), dtype=np.float32))
    bc_id = b.add(np.clip(base, 0.0, 1.0).astype(np.float32))
    # bumpy tangent-space normal map
    h_field = np.sin(yy * 40.0) * np.cos(xx * 40.0) * 0.5
    nx, ny = np.gradient(h_field)
    nrm = np.stack([-nx * 4, -ny * 4, np.ones_like(nx)], axis=-1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    n_id = b.add((nrm * 0.5 + 0.5).astype(np.float32))
    pd = np.stack([np.zeros_like(yy), 0.4 + 0.5 * checker[..., 0],
                   0.2 + 0.3 * (1 - checker[..., 0])], axis=-1)
    pd_id = b.add(pd.astype(np.float32))
    atlas = b.build(num_mips=6)
    m = scene.materials.base_color_factor.shape[0]
    tex_ids = np.full((m, NUM_SLOTS), -1, np.int32)
    tex_ids[:, SLOT_BASE_COLOR] = bc_id
    tex_ids[:, SLOT_NORMAL] = n_id
    tex_ids[:, SLOT_PHYS_DESC] = pd_id
    xform = np.tile(np.array([4, 0, 0, 4, 0, 0], np.float32),
                    (m, NUM_SLOTS, 1))   # 4x tiling
    wraps = np.ones((m, NUM_SLOTS, 2), np.int32)   # REPEAT
    scene = scene._replace(tex_ids=jnp.asarray(tex_ids),
                           tex_uv_transform=jnp.asarray(xform),
                           tex_wraps=jnp.asarray(wraps))
    return scene, atlas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny CPU run")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out-png", type=str, default="")
    ap.add_argument("--csm", action="store_true",
                    help="second tracked metric: textured materials + "
                         "4-cascade EVSM2 shadows re-rendered per frame "
                         "(1080p_textured_csm_frame_ms)")
    args = ap.parse_args()

    if args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import (PBRRendererCreateInfo,
                                       RasterizerConfig, ShadowMode)
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    atlas = None
    if args.smoke:
        w, h = 256, 128
        scene = build_bench_scene(2, 2, 12)
        ci = PBRRendererCreateInfo(brdf_lut_dim=32, num_brdf_samples=16,
                                   irradiance_cube_dim=16,
                                   prefiltered_env_map_dim=32,
                                   num_specular_env_samples=16)
        cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=1024, chunk=32)
        frames = 3
    else:
        w, h = 1920, 1080
        if args.csm:
            scene, atlas = build_bench_scene(5, 9, 32, textured=True)
            ci = PBRRendererCreateInfo(enable_shadows=True)
        else:
            scene = build_bench_scene(5, 9, 32)
            ci = PBRRendererCreateInfo()
        # tile_h=32 measured fastest for the Pallas kernel (PERF_NOTES.md)
        # max_tiles_per_tri=8: the binning sort scales with T x K pairs
        # (16 -> 8 measured -20 ms at 1080p; raster stats show zero bin/big
        # overflow for this scene — see PERF_NOTES.md)
        # sub_bins=4 + big_tile_capacity: segment candidates per (8, 128)
        # sub-bin and bin big triangles by exact per-tile bbox overlap —
        # measured z-loop work 357 -> 103 Mpx at 1080p (PERF_NOTES.md r4)
        cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                               max_tiles_per_tri=8, big_tri_capacity=64,
                               chunk=8, pair_compaction_cap=1 << 17,
                               sub_bins=4, big_tile_capacity=16)
        frames = args.frames

    from diligentfx_tpu.hydrogent.task_manager import (HnTaskManager,
                                                       TaskManagerCreateInfo)

    renderer = PBRRenderer(ci, raster_cfg=cfg)
    from diligentfx_tpu.postfx.taa import TAAFeatureFlags
    tm = HnTaskManager(renderer, TaskManagerCreateInfo(
        enable_ssao=True, ssao_half_resolution=True,
        ssao_num_slices=2, ssao_num_steps=4,
        ssao_use_pallas=not args.smoke,
        ssr_use_pallas=not args.smoke,
        fast_env_taps=not args.smoke,
        enable_ssr=True, ssr_half_resolution=True,
        ssr_resolution_divisor=2,
        enable_taa=True, enable_bloom=True, enable_dof=False,
        enable_shadows=args.csm, shadow_mode=ShadowMode.EVSM2 if args.csm else ShadowMode.PCF,
        taa_feature_flags=(TAAFeatureFlags.YCOCG_COLOR_SPACE
                           | TAAFeatureFlags.GAUSSIAN_WEIGHTING
                           | (0 if args.smoke else TAAFeatureFlags.PALLAS_WARP))),
        atlas=atlas)

    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)
    sun = [-0.5, -0.7, -0.5]
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional(sun, [3.0, 3.0, 3.0],
                                    shadow_map_index=0 if args.csm else -1),
        PBRLightAttribs.point([2.0, 2.0, 2.0], [8.0, 7.0, 6.0], range=30.0),
    ])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())

    from diligentfx_tpu.hydrogent.task_manager import FrameSettings
    from diligentfx_tpu.postfx.ssr import SSRSettings
    settings = FrameSettings(ssr=SSRSettings(max_traversal_intersections=24))

    shadow_att = None
    if args.csm:
        from diligentfx_tpu.components.shadow_map_manager import (
            distribute_cascades)
        shadow_att = distribute_cascades(
            cam.view, m3.inverse(cam.view), float(cam.proj[0, 0]),
            float(cam.proj[1, 1]), 0.1, 100.0, sun, num_cascades=4,
            shadow_map_size=2048)

    def frame_info():
        """Per-frame inputs; --csm re-renders the 4-cascade EVSM2 shadow
        maps every frame (the reference Hydrogent frame always renders
        shadows — SURVEY §3.2 / VERDICT r4 #4)."""
        if not args.csm:
            return info
        from diligentfx_tpu.components.shadow_map_manager import (
            convert_to_filterable, gaussian_blur_separable,
            render_cascade_shadow_maps)
        from diligentfx_tpu.pbr.renderer import transform_vertices
        wp, _, _ = transform_vertices(scene)
        smaps = render_cascade_shadow_maps(wp, scene.indices, shadow_att,
                                           shadow_map_size=2048, cfg=cfg)
        moments = gaussian_blur_separable(
            convert_to_filterable(smaps, ShadowMode.EVSM2))
        return info._replace(shadow_attribs=shadow_att, shadow_maps=smaps,
                             shadow_moments=moments)

    state = tm.initial_state(w, h)
    out = tm.execute(scene, frame_info(), state, width=w, height=h,
                     settings=settings)
    state = out.state
    jax.block_until_ready(out.color)
    assert bool(jnp.isfinite(out.color).all()), "non-finite output"

    times = []
    for _ in range(frames):
        t0 = time.perf_counter()
        out = tm.execute(scene, frame_info(), state, width=w, height=h,
                         settings=settings)
        state = out.state
        jax.block_until_ready(out.color)
        times.append((time.perf_counter() - t0) * 1000.0)
    # force full completion through a host transfer before trusting the clock
    np.asarray(out.color)
    ms = float(np.median(times))

    if args.out_png:
        from diligentfx_tpu.utils.image import write_png
        write_png(args.out_png, np.asarray(out.color))

    metric = ("smoke_256x128_frame_ms" if args.smoke else
              "1080p_textured_csm_frame_ms" if args.csm else
              "1080p_full_chain_pbr_ssr_ssao_taa_bloom_frame_ms")
    print(json.dumps({
        "metric": metric,
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / ms, 3),
    }))


if __name__ == "__main__":
    main()
