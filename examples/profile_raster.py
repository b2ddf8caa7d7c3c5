#!/usr/bin/env python
"""Raster-stage attribution at 1080p (device-resident inputs): vertex
transform + setup, binning sort, setup/planes gathers, and the fused kernel
are timed as separately-jitted pieces, plus the whole stage for reference.

Usage: python examples/profile_raster.py [--frames 12]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import RasterizerConfig
    from diligentfx_tpu.ops import raster as rz
    from diligentfx_tpu.ops import raster_pallas as rp
    from diligentfx_tpu.pbr import deferred
    from diligentfx_tpu.pbr.renderer import RenderInfo

    w, h = 1920, 1088
    scene = build_bench_scene(5, 9, 32)
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024,
                           max_tiles_per_tri=8, big_tri_capacity=64, chunk=8,
                           pair_compaction_cap=1 << 17)
    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / 1080, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, 1080)
    lights = PBRLightAttribs.concat([
        PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0])])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    dev = jax.devices()[0]
    scene = jax.device_put(scene, dev)
    info = jax.device_put(info, dev)
    jax.block_until_ready((scene, info))
    n_op = scene.indices.shape[0]

    # ---- piece 1: vertex inputs + triangle setup ---------------------------
    @jax.jit
    def piece_setup(scene, info):
        clip, winv, packed, n_ch = deferred._vertex_inputs(scene, info, False)
        tri_node = scene.vertex_node[scene.indices[:, 0]]
        consts = jnp.stack([scene.tri_material.astype(jnp.float32),
                            tri_node.astype(jnp.float32)], axis=-1)
        setup, valid, bbox, orig, planes, _covf = rz._triangle_setup(
            clip, scene.indices, w, h, scene.tri_double_sided, True, 1e-3,
            attrs=packed, winv_vert=winv, tri_consts=consts)
        planes = jnp.concatenate(
            [planes, orig[:, None].astype(jnp.float32)], axis=-1)
        return setup, planes, valid, bbox

    setup, planes, valid, bbox = piece_setup(scene, info)
    jax.block_until_ready(setup)

    # ---- piece 2: binning --------------------------------------------------
    @jax.jit
    def piece_bin(valid, bbox):
        return rz._bin_triangles(valid, bbox, w, h, cfg)

    binned = piece_bin(valid, bbox)
    jax.block_until_ready(binned)
    _, compact, counts_total, *_ = binned

    # ---- piece 3: the fused kernel (incl. its setup/planes gathers) --------
    n_ch = 9
    mat_tableT = deferred._material_table(scene.materials).T

    @jax.jit
    def piece_kernel(setup, planes, compact, counts_total, mat_tableT):
        return rp.raster_tiles_fused_pallas(
            setup, planes, compact, counts_total, mat_tableT,
            th=cfg.tile_h, tw=cfg.tile_w, tiles_x=w // cfg.tile_w,
            n_ch=n_ch, n_const=3, deriv_channels=(),
            chunk=cfg.chunk, transpose_in_kernel=True)

    out = piece_kernel(setup, planes, compact, counts_total, mat_tableT)
    jax.block_until_ready(out)

    # ---- whole stage -------------------------------------------------------
    def whole():
        return deferred._raster_stage(scene, info, None, pad_w=w, pad_h=h,
                                      cfg=cfg, use_textures=False)

    variants = [
        ("setup", lambda: piece_setup(scene, info)),
        ("binning", lambda: piece_bin(valid, bbox)),
        ("kernel+gathers", lambda: piece_kernel(setup, planes, compact,
                                                counts_total, mat_tableT)),
        ("whole_stage", whole),
    ]
    counts_np = np.asarray(counts_total)
    print(f"pairs: sum={counts_np.sum()} max={counts_np.max()} "
          f"mean={counts_np.mean():.0f} tiles={counts_np.size}", flush=True)
    for name, fn in variants:
        out = fn()
        jax.block_until_ready(out)
        times = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) * 1000.0)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name:16s} {float(np.median(times)):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
