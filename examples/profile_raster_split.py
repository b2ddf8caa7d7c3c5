#!/usr/bin/env python
"""Attribute the G-buffer stage cost: XLA prep (setup+binning+gathers) vs the
Pallas kernel vs the XLA shading block, each as a CHAINED in-frame program
(PERF_NOTES.md measurement discipline: chained data dependency so axon can't
pipeline iterations; deltas between stop-points attribute the stages).

Usage: python examples/profile_raster_split.py [--frames 10] [--only a,b]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--sub", action="store_true", help="sub-binned cfg")
    args = ap.parse_args()

    import functools
    import jax
    import jax.numpy as jnp
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.ops import raster as rz
    from diligentfx_tpu.ops.raster_pallas import raster_tiles_fused_pallas
    from diligentfx_tpu.pbr import deferred
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo

    w, h = 1920, 1080
    pad_w, pad_h = 1920, 1088
    scene = build_bench_scene(5, 9, 32)
    renderer = PBRRenderer(PBRRendererCreateInfo())
    kw = dict(tile_h=32, tile_w=128, bin_capacity=1024, max_tiles_per_tri=8,
              big_tri_capacity=64, chunk=8, pair_compaction_cap=1 << 17)
    if args.sub:
        kw.update(sub_bins=4, big_tile_capacity=16)
    cfg = RasterizerConfig(**kw)

    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0]),
        PBRLightAttribs.point([2.0, 2.0, 2.0], [8.0, 7.0, 6.0], range=30.0),
    ])
    info0 = RenderInfo(camera=cam, lights=lights,
                       renderer_params=PBRRendererShaderParameters.create())

    dev = jax.devices()[0]
    scene = jax.device_put(scene, dev)
    info0 = jax.device_put(info0, dev)
    ibl = jax.device_put(renderer.ibl_maps, dev)
    env = jax.device_put(renderer.env_oct, dev)
    jax.block_until_ready((scene, info0, ibl, env))

    n_op = scene.indices.shape[0]

    @functools.partial(jax.jit, static_argnames=())
    def prep_only(info):
        """vertex inputs + setup + binning + the candidate gathers the kernel
        consumes (g_setup / g_planes materialized the same way)."""
        clip, winv, packed, n_ch = deferred._vertex_inputs(scene, info, False)
        tri_node = scene.vertex_node[scene.indices[:, 0]]
        consts = jnp.stack([scene.tri_material.astype(jnp.float32),
                            tri_node.astype(jnp.float32)], axis=-1)
        setup, valid, bbox, orig, planes, _covf = rz._triangle_setup(
            clip, scene.indices, pad_w, pad_h, scene.tri_double_sided, True,
            1e-3, attrs=packed, winv_vert=winv, tri_consts=consts)
        planes = jnp.concatenate([planes, orig[:, None].astype(jnp.float32)],
                                 axis=-1)
        if cfg.sub_bins > 1 or cfg.big_tile_capacity > 0:
            compact, counts, *_ = rz._bin_triangles_sub(
                valid, bbox, pad_w, pad_h, cfg)
        else:
            _, compact, counts, *_ = rz._bin_triangles(
                valid, bbox, pad_w, pad_h, cfg)
        safe = jnp.maximum(compact, 0)
        g_setup = jnp.pad(setup, ((0, 0), (0, 16 - setup.shape[1])))[safe]
        p = planes.shape[1]
        p_pad = -(-p // 8) * 8
        cap = compact.shape[1]
        cap_pad = -(-cap // 128) * 128
        planes_p = jnp.pad(planes, ((0, 0), (0, p_pad - p)))
        cand_p = jnp.pad(safe, ((0, 0), (0, cap_pad - cap)))
        g_planes = planes_p[cand_p]
        return g_setup, g_planes, counts

    @jax.jit
    def kernel_stage(info):
        vb, out, clip, winv = deferred._fused_raster(
            scene, info, n_op, pad_w=pad_w, pad_h=pad_h, cfg=cfg,
            use_textures=False)
        return vb.depth, vb.tri_id, out

    @jax.jit
    def setup_only(info):
        clip, winv, packed, n_ch = deferred._vertex_inputs(scene, info, False)
        tri_node = scene.vertex_node[scene.indices[:, 0]]
        consts = jnp.stack([scene.tri_material.astype(jnp.float32),
                            tri_node.astype(jnp.float32)], axis=-1)
        setup, valid, bbox, orig, planes, _covf = rz._triangle_setup(
            clip, scene.indices, pad_w, pad_h, scene.tri_double_sided, True,
            1e-3, attrs=packed, winv_vert=winv, tri_consts=consts)
        return setup, planes, bbox

    @jax.jit
    def bin_only(info):
        clip, winv, packed, n_ch = deferred._vertex_inputs(scene, info, False)
        tri_node = scene.vertex_node[scene.indices[:, 0]]
        consts = jnp.stack([scene.tri_material.astype(jnp.float32),
                            tri_node.astype(jnp.float32)], axis=-1)
        setup, valid, bbox, orig, planes, _covf = rz._triangle_setup(
            clip, scene.indices, pad_w, pad_h, scene.tri_double_sided, True,
            1e-3, attrs=packed, winv_vert=winv, tri_consts=consts)
        if cfg.sub_bins > 1 or cfg.big_tile_capacity > 0:
            compact, counts, *_ = rz._bin_triangles_sub(
                valid, bbox, pad_w, pad_h, cfg)
        else:
            _, compact, counts, *_ = rz._bin_triangles(
                valid, bbox, pad_w, pad_h, cfg)
        return setup, planes, compact, counts

    def full(info):
        return deferred.render_gbuffer(
            scene, info, ibl, env, width=w, height=h, cfg=cfg,
            use_ibl=True, use_lights=True, fast_env=True)

    def bench(name, fn, probe):
        def chain(info, out):
            eps = probe(out) * 0.0
            mt = jnp.eye(4, dtype=jnp.float32) + eps
            return info0._replace(model_transform=mt)

        out = fn(info0)
        jax.block_until_ready(out)
        info = chain(info0, out)
        out = fn(info)
        jax.block_until_ready(out)
        info = chain(info0, out)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = fn(info)
            info = chain(info0, out)
            jax.block_until_ready((info,))
            times.append((time.perf_counter() - t0) * 1000.0)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name:18s} {float(np.median(times)):9.1f} ms", flush=True)

    variants = [
        ("setup_only", setup_only, lambda o: o[0][0, 0]),
        ("bin_only", bin_only, lambda o: o[0][0, 0]),
        ("prep_only", prep_only, lambda o: o[0][0, 0, 0]),
        ("through_kernel", kernel_stage, lambda o: o[0][0, 0]),
        ("full_gbuffer", full, lambda o: o.depth[0, 0]),
    ]
    if args.only:
        names = set(args.only.split(","))
        variants = [v for v in variants if v[0] in names]
    for name, fn, probe in variants:
        bench(name, fn, probe)


if __name__ == "__main__":
    main()
