#!/usr/bin/env python
"""Chained-loop microbenches of the raster pipeline stages at the bench
config: (a) full rasterize_fused, (b) binning only, (c) kernel+prep only
(pre-binned candidates), (d) triangle setup only.

Chaining rule (PERF_NOTES.md): inputs live on device from a jitted producer
and each iteration consumes the previous one's output, so the measured loop
is steady-state compute, not tunnel transfers.
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
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--stage", type=str, default="all",
                    help="comma list: fused,bin,kernel,setup")
    ap.add_argument("--cap", type=int, default=1024)
    args = ap.parse_args()
    stages = set(args.stage.split(","))

    import jax
    import jax.numpy as jnp
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.config import RasterizerConfig
    from diligentfx_tpu.ops import raster as rz
    from diligentfx_tpu.ops.raster import (_bin_triangles_sub,
                                           _triangle_setup)
    from diligentfx_tpu.ops.raster_pallas import raster_tiles_fused_pallas
    from diligentfx_tpu.pbr.renderer import transform_vertices, RenderInfo
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)

    w, h = 1920, 1080
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=args.cap,
                           max_tiles_per_tri=8, big_tri_capacity=64,
                           chunk=8, pair_compaction_cap=1 << 17,
                           sub_bins=4, big_tile_capacity=16)
    pad_w, pad_h = rz.pad_viewport(w, h, cfg)
    scene = build_bench_scene(5, 9, 32)
    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)
    info = RenderInfo(camera=cam, lights=PBRLightAttribs.directional(
        [-0.5, -0.7, -0.5], [3, 3, 3]),
        renderer_params=PBRRendererShaderParameters.create())

    @jax.jit
    def make_verts(eps):
        wp, wn, _ = transform_vertices(scene, None)
        clip = m3.transform_points(wp, info.camera.view_proj)
        clip = clip + eps                      # chain hook
        winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
        prev = jnp.stack([clip[:, 0], clip[:, 1], clip[:, 3]], -1)
        packed = jnp.concatenate([wp, wn, prev], axis=-1)
        return clip, winv, packed

    clip, winv, packed = make_verts(jnp.float32(0.0))
    jax.block_until_ready(clip)
    n_op = scene.indices.shape[0]
    consts = jnp.stack([scene.tri_material[:n_op].astype(jnp.float32),
                        scene.vertex_node[scene.indices[:n_op, 0]]
                        .astype(jnp.float32)], axis=-1)
    from diligentfx_tpu.pbr.deferred import _material_table
    mat_tableT = _material_table(scene.materials).T

    def chained(fn, seed):
        """fn: eps -> pytree; wraps it so the chain scalar is produced
        INSIDE one jit program per iteration (NO eager ops between calls —
        each eager op is a remote dispatch on axon)."""
        @jax.jit
        def step(eps):
            out = fn(eps)
            leaves = jax.tree.leaves(out)
            # FULL sums: a [:1] slice would let XLA dead-code-eliminate the
            # per-triangle work behind elementwise stages
            nxt = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return nxt * 1e-12
        cur = step(seed)
        jax.block_until_ready(cur)
        np.asarray(cur)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            cur = step(cur)
        np.asarray(cur)
        return (time.perf_counter() - t0) / args.iters * 1000.0

    if "fused" in stages:
        @jax.jit
        def run_fused(eps):
            c = clip.at[0, 0].add(eps)
            vb, out, _ = rz.rasterize_fused(
                c, scene.indices[:n_op], packed, winv, consts, mat_tableT,
                width=pad_w, height=pad_h, cfg=cfg, n_ch=9,
                double_sided=scene.tri_double_sided[:n_op])
            return out
        print(f"rasterize_fused total: {chained(run_fused, jnp.float32(0)):.2f} ms",
              flush=True)

    if "setup" in stages or "bin" in stages or "kernel" in stages:
        @jax.jit
        def run_setup(eps):
            c = clip.at[0, 0].add(eps)
            setup, valid, bbox, orig, planes, _covf = _triangle_setup(
                c, scene.indices[:n_op], pad_w, pad_h,
                scene.tri_double_sided[:n_op], True, 1e-3,
                attrs=packed, winv_vert=winv, tri_consts=consts)
            planes = jnp.concatenate(
                [planes, orig[:, None].astype(jnp.float32)], axis=-1)
            return setup, valid, bbox, planes
        setup, valid, bbox, planes = run_setup(jnp.float32(0))
        jax.block_until_ready(setup)
        if "setup" in stages:
            print(f"setup only: {chained(run_setup, jnp.float32(0)):.2f} ms",
                  flush=True)

    if "bin" in stages:
        @jax.jit
        def run_bin(eps):
            bb = bbox.at[0, 0].add(eps)
            cand, counts, *_ = _bin_triangles_sub(valid, bb, pad_w, pad_h, cfg)
            return cand, counts
        print(f"binning only: {chained(run_bin, jnp.float32(0)):.2f} ms",
              flush=True)

    if "kernel" in stages:
        cand, counts, *_ = jax.jit(
            lambda: _bin_triangles_sub(valid, bbox, pad_w, pad_h, cfg))()
        jax.block_until_ready(cand)
        sub = cfg.sub_bins
        cap_sub = cfg.bin_capacity // sub
        big_cap = cand.shape[1] - sub * cap_sub

        @jax.jit
        def run_kernel(eps):
            s = setup.at[0, 0].add(eps)
            z, tid, out = raster_tiles_fused_pallas(
                s, planes, cand, counts, mat_tableT,
                th=cfg.tile_h, tw=cfg.tile_w, tiles_x=pad_w // cfg.tile_w,
                n_ch=9, n_const=3, chunk=cfg.chunk,
                transpose_in_kernel=True,
                sub=sub, cap_sub=cap_sub, big_cap=big_cap)
            return z, out
        print(f"kernel+prep: {chained(run_kernel, jnp.float32(0)):.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
