"""Texture atlas: packing, sampling, wrap modes, mip selection."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.ops.texture import (AtlasBuilder, apply_uv_transform,
                                        sample_atlas, white_atlas)


def test_atlas_packing_multiple_textures():
    b = AtlasBuilder(size=64)
    t0 = b.add(np.full((16, 16, 3), 0.25, np.float32))
    t1 = b.add(np.full((32, 16, 3), 0.5, np.float32))
    t2 = b.add((np.ones((8, 8)) * 255).astype(np.uint8))   # grayscale uint8
    atlas = b.build(num_mips=3)
    assert atlas.num_layers >= 1
    assert len(atlas.mips) == 3
    # sample each texture's center → its own color
    for tid, expect in [(t0, 0.25), (t1, 0.5), (t2, 1.0)]:
        v = sample_atlas(atlas, jnp.array([[tid]]), jnp.array([[[0.5, 0.5]]]),
                         jnp.array([[0.0]]))
        assert float(v[0, 0, 0]) == pytest.approx(expect, abs=0.02), tid


def test_atlas_overflow_to_new_layer():
    b = AtlasBuilder(size=32)
    ids = [b.add(np.full((24, 24, 3), i / 4, np.float32)) for i in range(4)]
    atlas = b.build(num_mips=1)
    assert atlas.num_layers >= 3
    for i, tid in enumerate(ids):
        v = sample_atlas(atlas, jnp.array([tid]), jnp.array([[0.5, 0.5]]),
                         jnp.array([0.0]))
        assert float(v[0, 0]) == pytest.approx(i / 4, abs=0.02)


def test_wrap_modes():
    b = AtlasBuilder(size=16)
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = 1.0   # left half white
    tid = b.add(img)
    atlas = b.build(num_mips=1)
    t = jnp.array([tid])
    # repeat: u=1.25 ≡ 0.25 → white
    v_rep = sample_atlas(atlas, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                         wrap_u=jnp.array([0]), wrap_v=jnp.array([0]))
    assert float(v_rep[0, 0]) > 0.9
    # clamp: u=1.25 → right edge → black
    v_clamp = sample_atlas(atlas, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                           wrap_u=jnp.array([2]), wrap_v=jnp.array([2]))
    assert float(v_clamp[0, 0]) < 0.1
    # mirror: u=1.25 → mirrored 0.75 → black side
    v_mir = sample_atlas(atlas, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                         wrap_u=jnp.array([1]), wrap_v=jnp.array([1]))
    assert float(v_mir[0, 0]) < 0.1


def test_mip_lod_blends_detail():
    b = AtlasBuilder(size=32)
    checker = np.indices((16, 16)).sum(0) % 2
    tid = b.add(np.repeat(checker[..., None], 3, -1).astype(np.float32))
    atlas = b.build(num_mips=4)
    t = jnp.array([tid])
    uv = jnp.array([[0.5, 0.5]])
    sharp = sample_atlas(atlas, t, uv, jnp.array([0.0]))
    blurred = sample_atlas(atlas, t, uv, jnp.array([2.5]))
    # high mip of a checkerboard approaches 0.5 gray
    assert abs(float(blurred[0, 0]) - 0.5) < abs(float(sharp[0, 0]) - 0.5) + 0.05
    assert abs(float(blurred[0, 0]) - 0.5) < 0.2


def test_uv_transform():
    uv = jnp.array([[0.25, 0.5]])
    # scale x2, offset (0.1, -0.2)
    sr = jnp.array([[2.0, 0.0, 0.0, 2.0]])
    bias = jnp.array([[0.1, -0.2]])
    out = apply_uv_transform(uv, sr, bias)
    np.testing.assert_allclose(np.asarray(out), [[0.6, 0.8]], atol=1e-6)


def test_white_atlas_default():
    atlas = white_atlas()
    v = sample_atlas(atlas, jnp.array([0]), jnp.array([[0.3, 0.7]]),
                     jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(v[0]), [1, 1, 1, 1], atol=1e-6)


# ---- SHADER_TEXTURE_ARRAY_MODE_DYNAMIC analogue: the texture heap ----------
# (PBR_Renderer.hpp:100-119; selectable via build_render_scene
#  texture_binding_mode="array")

def _heap_and_atlas(imgs, num_mips=3, atlas_size=64):
    from diligentfx_tpu.ops.texture import TextureHeapBuilder
    hb = TextureHeapBuilder()
    ab = AtlasBuilder(size=atlas_size)
    ids = []
    for img in imgs:
        i1 = hb.add(img)
        i2 = ab.add(img)
        assert i1 == i2
        ids.append(i1)
    return hb.build(num_mips=num_mips), ab.build(num_mips=num_mips), ids


def test_heap_matches_atlas_where_sizes_agree():
    """Mixed textures, same content in both binding modes: INTERIOR bilinear
    samples at lod 0 and a coarse lod agree (at sub-rect edges the atlas
    bleeds into neighboring packed texels / its layer padding — a known
    atlas-mode artifact the heap does not have, so edges are excluded)."""
    from diligentfx_tpu.ops.texture import sample_heap
    rng = np.random.default_rng(3)
    imgs = [rng.random((16, 16, 3), dtype=np.float32),
            rng.random((32, 16, 3), dtype=np.float32),
            rng.random((8, 8, 3), dtype=np.float32)]
    heap, atlas, ids = _heap_and_atlas(imgs)
    # interior: coarsest touched mip of the smallest texture is 4x4 (8x8 at
    # lod 2); taps stay inside for uv in [1.5/4, 1 - 1.5/4]
    uv = jnp.asarray(rng.random((5, 7, 2), dtype=np.float32) * 0.24 + 0.38)
    for tid in ids:
        t = jnp.full(uv.shape[:-1], tid, jnp.int32)
        for lod in (0.0, 1.3):
            a = sample_atlas(atlas, t, uv, jnp.full(uv.shape[:-1], lod))
            h = sample_heap(heap, t, uv, jnp.full(uv.shape[:-1], lod))
            np.testing.assert_allclose(np.asarray(h), np.asarray(a),
                                       atol=2e-2 if lod else 1e-5)


def test_heap_preserves_native_resolution():
    """A texture LARGER than the atlas layer keeps full detail in array mode
    (the atlas path must downscale it to fit)."""
    from diligentfx_tpu.ops.texture import TextureHeapBuilder, sample_heap
    # 128x128 one-white-texel image; atlas layers are 32x32
    img = np.zeros((128, 128, 3), np.float32)
    img[5, 9] = 1.0
    hb = TextureHeapBuilder()
    tid = hb.add(img)
    heap = hb.build(num_mips=1)
    ab = AtlasBuilder(size=32)
    ab.add(img)
    atlas = ab.build(num_mips=1)
    uv = jnp.array([[(9 + 0.5) / 128, (5 + 0.5) / 128]])
    t = jnp.array([tid])
    h = sample_heap(heap, t, uv, jnp.array([0.0]))
    a = sample_atlas(atlas, t, uv, jnp.array([0.0]))
    assert float(h[0, 0]) == pytest.approx(1.0, abs=1e-5)   # exact texel
    assert float(a[0, 0]) < 0.5                             # averaged away


def test_heap_wrap_modes():
    from diligentfx_tpu.ops.texture import TextureHeapBuilder, sample_heap
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = 1.0
    hb = TextureHeapBuilder()
    tid = hb.add(img)
    heap = hb.build(num_mips=1)
    t = jnp.array([tid])
    v_rep = sample_heap(heap, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                        wrap_u=jnp.array([0]), wrap_v=jnp.array([0]))
    assert float(v_rep[0, 0]) > 0.9
    v_clamp = sample_heap(heap, t, jnp.array([[1.25, 0.5]]), jnp.array([0.0]),
                          wrap_u=jnp.array([2]), wrap_v=jnp.array([2]))
    assert float(v_clamp[0, 0]) < 0.1


def test_render_scene_array_mode_matches_atlas(tmp_path):
    """End-to-end binding-mode parity: the same textured glTF scene renders
    pixel-identically through render_gbuffer under both modes when every
    texture fits the atlas (VERDICT r3 #5 done-criterion)."""
    from diligentfx_tpu import math3d as m3
    from diligentfx_tpu.attribs import (CameraAttribs, PBRLightAttribs,
                                        PBRRendererShaderParameters)
    from diligentfx_tpu.config import (PBRRendererCreateInfo,
                                       RasterizerConfig)
    from diligentfx_tpu.gltf.loader import load_gltf
    from diligentfx_tpu.gltf.model import build_render_scene
    from diligentfx_tpu.ops.texture import TextureHeap
    from diligentfx_tpu.pbr.deferred import render_gbuffer
    from diligentfx_tpu.pbr.renderer import PBRRenderer, RenderInfo
    from tests.test_gltf import make_quad_gltf

    model = load_gltf(make_quad_gltf(str(tmp_path)))
    rs_a = build_render_scene(model, atlas_size=64)
    rs_h = build_render_scene(model, texture_binding_mode="array")
    assert isinstance(rs_h.atlas, TextureHeap)
    renderer = PBRRenderer(PBRRendererCreateInfo(
        brdf_lut_dim=16, num_brdf_samples=8, irradiance_cube_dim=8,
        prefiltered_env_map_dim=16, num_specular_env_samples=8))
    eye = [0.5, 0.0, 3.0]
    cam = CameraAttribs.create(m3.look_at(eye, [0.5, 0.0, 0.0]),
                               m3.perspective(1.0, 2.0, 0.1, 10.0),
                               eye, 0.1, 10.0, 128, 64)
    info = RenderInfo(camera=cam,
                      lights=PBRLightAttribs.directional([0, 0, -1], [2, 2, 2]),
                      renderer_params=PBRRendererShaderParameters.create())
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                           max_tiles_per_tri=16, big_tri_capacity=16, chunk=8)
    kw = dict(width=128, height=64, cfg=cfg, use_ibl=True, use_textures=True)
    gb_a = render_gbuffer(rs_a.scene, info, renderer.ibl_maps,
                          renderer.env_oct, atlas=rs_a.atlas, **kw)
    gb_h = render_gbuffer(rs_h.scene, info, renderer.ibl_maps,
                          renderer.env_oct, atlas=rs_h.atlas, **kw)
    a = np.asarray(gb_a.base_color)
    h = np.asarray(gb_h.base_color)
    hit = np.asarray(gb_h.hit)
    assert hit.sum() > 200
    assert np.isfinite(h).all()
    # compare quad-INTERIOR pixels: at the quad border the checker samples at
    # texture uv 0/1 where atlas sub-rect bleed vs the heap's exact REPEAT
    # wrap legitimately differ (the heap is the correct one)
    interior = hit.copy()
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            interior &= np.roll(hit, (dy, dx), axis=(0, 1))
    assert interior.sum() > 200
    np.testing.assert_allclose(h[interior], a[interior], atol=2e-2)
