#!/usr/bin/env python
"""Per-stage timing of the forward frame at 1080p on the current backend."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:40s} {np.median(ts):9.2f} ms")
    return out


def main():
    from bench import build_bench_scene
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import PBRRendererCreateInfo, RasterizerConfig
    from diligentfx_tpu.ops import raster as rz
    from diligentfx_tpu.ops.sampling import sample_env_oct
    from diligentfx_tpu.pbr import shading as sh
    from diligentfx_tpu.pbr.renderer import (PBRRenderer, RenderInfo,
                                             transform_vertices, _camera_rays)

    w, h = 1920, 1080
    scene = build_bench_scene(5, 9, 32)
    print(f"scene: {scene.num_vertices} verts, {scene.num_triangles} tris")
    cfg = RasterizerConfig(tile_h=32, tile_w=128, bin_capacity=1024, chunk=32)
    renderer = PBRRenderer(PBRRendererCreateInfo(), raster_cfg=cfg)
    eye = [0.0, 1.0, 7.5]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, eye, 0.1, 100.0, w, h)
    lights = PBRLightAttribs.directional([-0.5, -0.7, -0.5], [3.0, 3.0, 3.0])
    info = RenderInfo(camera=cam, lights=lights,
                      renderer_params=PBRRendererShaderParameters.create())
    pad_w, pad_h = rz.pad_viewport(w, h, cfg)

    @jax.jit
    def vertex_stage(scene, info):
        world_pos, world_nrm, _ = transform_vertices(scene, None)
        clip = m3.transform_points(world_pos, info.camera.view_proj)
        return world_pos, world_nrm, clip

    world_pos, world_nrm, clip = timeit(vertex_stage, scene, info, name="vertex stage")

    raster = functools.partial(rz.rasterize, width=pad_w, height=pad_h, cfg=cfg)
    vb, stats = timeit(lambda c, i, d: raster(c, i, double_sided=d),
                       clip, scene.indices, scene.tri_double_sided,
                       name="rasterize (bin+raster)")
    print(f"  max_bin_count={int(stats.max_bin_count)} overflow={int(stats.bin_overflow)} big_of={int(stats.big_overflow)}")

    # binning only
    from diligentfx_tpu.ops.raster import _bin_triangles, _triangle_setup
    @jax.jit
    def binning(c, idx, ds):
        setup, valid, bbox, orig, _covf = _triangle_setup(c, idx, pad_w, pad_h, ds, True, 1e-3)
        return _bin_triangles(valid, bbox, pad_w, pad_h, cfg)
    timeit(binning, clip, scene.indices, scene.tri_double_sided, name="  setup+binning only")

    @jax.jit
    def interp(vb, scene, clip, world_pos, world_nrm):
        winv = jnp.where(jnp.abs(clip[:, 3]) > 1e-12, 1.0 / clip[:, 3], 0.0)
        pbary = rz.perspective_bary(vb, scene.indices, winv)
        pos_px = rz.interpolate(vb, scene.indices, world_pos, pbary)
        nrm_px = m3.normalize(rz.interpolate(vb, scene.indices, world_nrm, pbary))
        return pos_px, nrm_px

    pos_px, nrm_px = timeit(interp, vb, scene, clip, world_pos, world_nrm,
                            name="interpolate attrs")

    @jax.jit
    def shade(vb, scene, pos_px, nrm_px, info):
        tid = jnp.maximum(vb.tri_id, 0)
        mat_id = scene.tri_material[tid]
        mats = scene.materials
        base_color = mats.base_color_factor[mat_id][..., :3]
        metallic = mats.metallic_factor[mat_id][..., None]
        roughness = mats.roughness_factor[mat_id][..., None]
        view_v = m3.normalize(info.camera.position - pos_px)
        srf = sh.get_surface_reflectance_mr(base_color, metallic, roughness)
        ndotv = jnp.clip(m3.dot(nrm_px, view_v), 0.0, 1.0)
        shading = sh.SurfaceShadingInfo(
            pos=pos_px, view=view_v, occlusion=jnp.ones_like(metallic),
            emissive=jnp.zeros_like(base_color),
            base=sh.BaseLayerShadingInfo(srf=srf, metallic=metallic,
                                         normal=nrm_px, ndotv=ndotv),
            ibl_scale=jnp.ones(3))
        lighting = sh.default_lighting(pos_px)
        lighting = sh.apply_punctual_lights(shading, info.lights, lighting)
        return shading, lighting

    shading, lighting = timeit(shade, vb, scene, pos_px, nrm_px, info,
                               name="material gather + punctual")

    @jax.jit
    def ibl_pass(shading, lighting):
        return sh.apply_ibl(shading, renderer.ibl_maps, lighting)

    lighting2 = timeit(ibl_pass, shading, lighting, name="IBL apply")

    @jax.jit
    def bg_resolve(shading, lighting, vb, info):
        color = sh.resolve_lighting(shading, lighting)
        ray = _camera_rays(info.camera, pad_w, pad_h)
        bg = sample_env_oct([renderer.env_oct], ray, jnp.zeros(ray.shape[:-1]))
        color = jnp.where((vb.tri_id >= 0)[..., None], color, bg)
        from diligentfx_tpu.postfx.tonemap import tone_map, ToneMappingAttribs
        from diligentfx_tpu.config import ToneMappingMode
        color = tone_map(color, ToneMappingMode.UNCHARTED2, ToneMappingAttribs())
        return m3.linear_to_srgb(color)

    timeit(bg_resolve, shading, lighting2, vb, info, name="resolve+bg+tonemap+srgb")


if __name__ == "__main__":
    main()
