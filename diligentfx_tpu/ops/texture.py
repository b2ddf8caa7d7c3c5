"""Material texture system — the TPU analogue of the reference's texture
binding modes (SHADER_TEXTURE_ARRAY_MODE_* at PBR_Renderer.hpp:100-119, atlas
suballocation via GLTF::ResourceManager, sampling indirection in
PBR_Textures.fxh and AtlasSampling.fxh).

All material textures live in ONE mip-mapped texture array
(layers, size, size, 4); each logical texture occupies a rectangle of a layer
described by `AtlasUVScaleAndBias` exactly as in
PBRMaterialTextureAttribs (PBR_Structures.fxh:244-255).  Sampling is a
per-pixel trilinear gather with the mip level chosen from the rasterizer's
analytic UV derivatives (replacing ddx/ddy, RenderPBR.psh:115-116).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diligentfx_tpu.ops.sampling import WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT

Array = jax.Array


class TextureAtlas(NamedTuple):
    """Device-resident atlas: tuple of mip arrays (L, S>>m, S>>m, 4)."""
    mips: tuple               # tuple of (L, Sm, Sm, 4) float32
    # host-side metadata (python lists, static per scene build)
    scale_bias: Array         # (N, 4) = (su, sv, bu, bv) per logical texture
    layer: Array              # (N,) int32

    @property
    def size(self) -> int:
        return self.mips[0].shape[1]

    @property
    def num_layers(self) -> int:
        return self.mips[0].shape[0]


class AtlasBuilder:
    """Host-side packer (the GLTF::ResourceManager atlas analogue): shelf
    packing of arbitrary images into fixed-size layers; call build() once."""

    def __init__(self, size: int = 1024, srgb_slots=()):
        self.size = size
        self.images: List[np.ndarray] = []

    def add(self, img: np.ndarray) -> int:
        """img: (h, w, c) uint8 or float in [0,1]. Returns texture id."""
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        h, w = img.shape[:2]
        if max(h, w) > self.size:
            s = self.size / max(h, w)
            nh, nw = max(int(h * s), 1), max(int(w * s), 1)
            yi = (np.arange(nh) * (h / nh)).astype(np.int32)
            xi = (np.arange(nw) * (w / nw)).astype(np.int32)
            img = img[yi][:, xi]
        self.images.append(img.astype(np.float32))
        return len(self.images) - 1

    def build(self, num_mips: int = 6) -> TextureAtlas:
        size = self.size
        layers: List[np.ndarray] = []
        scale_bias = []
        layer_ids = []
        # shelf packing per layer
        cur = np.zeros((size, size, 4), np.float32)
        shelf_y = 0
        shelf_h = 0
        cursor_x = 0
        started = False

        def new_layer():
            nonlocal cur, shelf_y, shelf_h, cursor_x, started
            if started:
                layers.append(cur)
            cur = np.zeros((size, size, 4), np.float32)
            shelf_y = 0
            shelf_h = 0
            cursor_x = 0
            started = True

        new_layer()
        for img in self.images:
            h, w = img.shape[:2]
            if cursor_x + w > size:
                shelf_y += shelf_h
                cursor_x = 0
                shelf_h = 0
            if shelf_y + h > size:
                new_layer()
            cur[shelf_y:shelf_y + h, cursor_x:cursor_x + w] = img
            scale_bias.append([w / size, h / size, cursor_x / size, shelf_y / size])
            layer_ids.append(len(layers))
            cursor_x += w
            shelf_h = max(shelf_h, h)
        layers.append(cur)

        stack = np.stack(layers)  # (L, S, S, 4)
        mips = [jnp.asarray(stack)]
        curm = stack
        for _ in range(num_mips - 1):
            if curm.shape[1] < 2:
                break
            curm = 0.25 * (curm[:, 0::2, 0::2] + curm[:, 1::2, 0::2]
                           + curm[:, 0::2, 1::2] + curm[:, 1::2, 1::2])
            mips.append(jnp.asarray(curm))
        if not scale_bias:
            scale_bias = [[1.0, 1.0, 0.0, 0.0]]
            layer_ids = [0]
        return TextureAtlas(
            mips=tuple(mips),
            scale_bias=jnp.asarray(scale_bias, jnp.float32),
            layer=jnp.asarray(layer_ids, jnp.int32),
        )


def white_atlas() -> TextureAtlas:
    """Default 4x4 white texture (CreateDefaultTextures analogue)."""
    b = AtlasBuilder(size=8)
    b.add(np.ones((8, 8, 4), np.float32))
    return b.build(num_mips=2)


def _wrap_uv(u: Array, wrap: Array) -> Array:
    """Dynamic per-pixel wrap mode (PBRMaterialTextureAttribs packed wrap)."""
    rep = u - jnp.floor(u)
    mir = jnp.abs(u - 2.0 * jnp.floor(u * 0.5) - 1.0)
    mir = 1.0 - jnp.abs(mir)  # triangle wave
    clp = jnp.clip(u, 0.0, 1.0)
    return jnp.where(wrap == WRAP_REPEAT, rep,
                     jnp.where(wrap == WRAP_MIRROR, mir, clp))


def sample_atlas(atlas: TextureAtlas, tex_id: Array, uv: Array, lod: Array,
                 wrap_u: Optional[Array] = None,
                 wrap_v: Optional[Array] = None) -> Array:
    """Trilinear atlas sample.

    tex_id: (...,) int32 logical texture index (clamped; callers pass 0 with a
      white default when unused); uv (..., 2) in texture space; lod (...,).
    Returns (..., 4).
    """
    sb = atlas.scale_bias[tex_id]                         # (..., 4)
    layer = atlas.layer[tex_id]                           # (...,)
    u = _wrap_uv(uv[..., 0], wrap_u if wrap_u is not None else jnp.int32(0))
    v = _wrap_uv(uv[..., 1], wrap_v if wrap_v is not None else jnp.int32(0))
    au = u * sb[..., 0] + sb[..., 2]
    av = v * sb[..., 1] + sb[..., 3]

    n_mips = len(atlas.mips)
    lod = jnp.clip(lod, 0.0, n_mips - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(jnp.float32))[..., None]

    def sample_level_pair(level_idx):
        """bilinear at static mip `level_idx` (dynamic selection by weight)."""
        mip = atlas.mips[level_idx]
        s = mip.shape[1]
        fx = au * s - 0.5
        fy = av * s - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = (fx - x0.astype(jnp.float32))[..., None]
        ty = (fy - y0.astype(jnp.float32))[..., None]
        x0c = jnp.clip(x0, 0, s - 1)
        x1c = jnp.clip(x0 + 1, 0, s - 1)
        y0c = jnp.clip(y0, 0, s - 1)
        y1c = jnp.clip(y0 + 1, 0, s - 1)
        flat = mip.reshape(-1, 4)
        base = layer * (s * s)
        c00 = flat[base + y0c * s + x0c]
        c10 = flat[base + y0c * s + x1c]
        c01 = flat[base + y1c * s + x0c]
        c11 = flat[base + y1c * s + x1c]
        top = c00 + (c10 - c00) * tx
        bot = c01 + (c11 - c01) * tx
        return top + (bot - top) * ty

    # static sum over levels weighted by the trilinear blend (bounded by the
    # small static mip count; keeps gathers at 8/pixel via 2 nonzero levels)
    out = jnp.zeros(uv.shape[:-1] + (4,), jnp.float32)
    for i in range(n_mips):
        w_i = jnp.where(l0 == i, 1.0 - frac[..., 0],
                        jnp.where(l0 == i - 1, frac[..., 0], 0.0))
        if i == n_mips - 1:
            w_i = jnp.where(l0 >= n_mips - 1, 1.0, w_i)
        needed = w_i > 0
        s_val = sample_level_pair(i)
        out = out + s_val * w_i[..., None]
    return out


class TextureHeap(NamedTuple):
    """SHADER_TEXTURE_ARRAY_MODE_DYNAMIC analogue (PBR_Renderer.hpp:100-119):
    every texture keeps its NATIVE resolution and mip chain — no atlas
    repacking, no resolution cap at the atlas layer size, exact wrap
    arithmetic at the texture's own edges (the atlas emulates wrap inside a
    sub-rectangle).  The reference implements this as a texture array indexed
    by a per-material TextureSlice at run time; the TPU-native equivalent is
    a flat texel HEAP plus a per-texture mip table: a sample computes
    `mip_base[tex, lod] + y * w + x` and gathers — the per-pixel "slice
    index" is just integer math into one buffer, and (unlike the atlas path,
    which must enumerate its static mip arrays) the trilinear footprint
    touches exactly two mip levels → 8 texel gathers per pixel total."""
    texels: Array      # (total, 4) f32 — mip-major per texture
    mip_base: Array    # (N, M) int32 flat offset of mip m of texture n;
    #                    levels past a texture's last mip repeat the last
    mip_size: Array    # (N, M, 2) int32 (w, h) of each mip (>= 1)
    num_mips: int      # static table width M

    @property
    def max_levels(self) -> int:
        return self.mip_base.shape[1]


class TextureHeapBuilder:
    """Host-side builder for SHADER_TEXTURE_ARRAY_MODE_DYNAMIC: stores every
    added image at native size with a box-filtered mip chain.  Same `add`
    contract as AtlasBuilder so scene builds can switch modes."""

    def __init__(self, max_size: int = 4096):
        self.max_size = max_size
        self.images: List[np.ndarray] = []

    def add(self, img: np.ndarray) -> int:
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        if max(img.shape[:2]) > self.max_size:
            h, w = img.shape[:2]
            s = self.max_size / max(h, w)
            nh, nw = max(int(h * s), 1), max(int(w * s), 1)
            yi = (np.arange(nh) * (h / nh)).astype(np.int32)
            xi = (np.arange(nw) * (w / nw)).astype(np.int32)
            img = img[yi][:, xi]
        self.images.append(img.astype(np.float32))
        return len(self.images) - 1

    def build(self, num_mips: int = 6) -> TextureHeap:
        if not self.images:
            self.add(np.ones((4, 4, 4), np.float32))
        chunks, bases, sizes = [], [], []
        off = 0
        for img in self.images:
            tb, ts = [], []
            cur = img
            for m in range(num_mips):
                h, w = cur.shape[:2]
                tb.append(off)
                ts.append([w, h])
                chunks.append(cur.reshape(-1, 4))
                off += h * w
                if h < 2 and w < 2:
                    break
                # box filter; odd edges clamp-pad so every mip stays >= 1
                if h % 2 or w % 2:
                    cur = np.pad(cur, ((0, h % 2), (0, w % 2), (0, 0)),
                                 mode="edge")
                cur = 0.25 * (cur[0::2, 0::2] + cur[1::2, 0::2]
                              + cur[0::2, 1::2] + cur[1::2, 1::2])
            while len(tb) < num_mips:       # repeat the last mip
                tb.append(tb[-1])
                ts.append(ts[-1])
            bases.append(tb)
            sizes.append(ts)
        return TextureHeap(
            texels=jnp.asarray(np.concatenate(chunks, axis=0)),
            mip_base=jnp.asarray(bases, jnp.int32),
            mip_size=jnp.asarray(sizes, jnp.int32),
            num_mips=num_mips)


def sample_heap(heap: TextureHeap, tex_id: Array, uv: Array, lod: Array,
                wrap_u: Optional[Array] = None,
                wrap_v: Optional[Array] = None) -> Array:
    """Trilinear sample from the texture heap — the DYNAMIC-mode counterpart
    of `sample_atlas` (same signature family).  Exactly two mip levels are
    gathered regardless of the chain length (the mip base is data, not a
    static array choice)."""
    mb = heap.mip_base[tex_id]                            # (..., M)
    ms = heap.mip_size[tex_id]                            # (..., M, 2)
    n_mips = heap.num_mips
    lod = jnp.clip(lod, 0.0, n_mips - 1.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    wu = wrap_u if wrap_u is not None else jnp.int32(0)
    wv = wrap_v if wrap_v is not None else jnp.int32(0)
    u = _wrap_uv(uv[..., 0], wu)
    v = _wrap_uv(uv[..., 1], wv)
    flat = heap.texels

    def wrap_texel(x, n, mode):
        """Texel-level edge rule after the uv fold: REPEAT tiles across the
        texture's own edge (x == -1 → n-1, x == n → 0 — exact, which the
        atlas mode cannot do inside a packed sub-rect); MIRROR's edge
        continuation equals clamp after the uv fold; CLAMP clamps."""
        rep = jnp.where(x < 0, x + n, jnp.where(x >= n, x - n, x))
        return jnp.where(mode == WRAP_REPEAT, rep, jnp.clip(x, 0, n - 1))

    def sample_level(lv):
        base = jnp.take_along_axis(mb, lv[..., None], axis=-1)[..., 0]
        wh = jnp.take_along_axis(ms, lv[..., None, None],
                                 axis=-2)[..., 0, :]       # (..., 2)
        w = wh[..., 0]
        h = wh[..., 1]
        fx = u * w.astype(jnp.float32) - 0.5
        fy = v * h.astype(jnp.float32) - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = (fx - x0.astype(jnp.float32))[..., None]
        ty = (fy - y0.astype(jnp.float32))[..., None]
        x0c = wrap_texel(x0, w, wu)
        x1c = wrap_texel(x0 + 1, w, wu)
        y0c = wrap_texel(y0, h, wv)
        y1c = wrap_texel(y0 + 1, h, wv)
        c00 = flat[base + y0c * w + x0c]
        c10 = flat[base + y0c * w + x1c]
        c01 = flat[base + y1c * w + x0c]
        c11 = flat[base + y1c * w + x1c]
        top = c00 + (c10 - c00) * tx
        bot = c01 + (c11 - c01) * tx
        return top + (bot - top) * ty

    s0 = sample_level(l0)
    s1 = sample_level(jnp.minimum(l0 + 1, n_mips - 1))
    return s0 + (s1 - s0) * frac


def texture_base_size(tex, tex_id: Array):
    """(w, h) f32 of a logical texture at mip 0 — the LOD metric both
    binding modes share (the atlas reports the packed sub-rect extent)."""
    if isinstance(tex, TextureHeap):
        wh = tex.mip_size[tex_id, 0]
        return wh[..., 0].astype(jnp.float32), wh[..., 1].astype(jnp.float32)
    res = tex.mips[0].shape[1]
    sb = tex.scale_bias[tex_id]
    return res * sb[..., 0], res * sb[..., 1]


def sample_material_texture(tex, tex_id: Array, uv: Array, lod: Array,
                            wrap_u: Optional[Array] = None,
                            wrap_v: Optional[Array] = None) -> Array:
    """Binding-mode dispatch (PBR_Textures.fxh's compile-time indirection):
    the texture container's TYPE selects atlas vs dynamic-array sampling."""
    if isinstance(tex, TextureHeap):
        return sample_heap(tex, tex_id, uv, lod, wrap_u=wrap_u, wrap_v=wrap_v)
    return sample_atlas(tex, tex_id, uv, lod, wrap_u=wrap_u, wrap_v=wrap_v)


def apply_uv_transform(uv: Array, scale_rotation: Array, bias: Array) -> Array:
    """KHR_texture_transform (UVScaleAndRotation + UBias/VBias,
    PBR_Structures.fxh:249-251): uv @ 2x2 + bias."""
    m00 = scale_rotation[..., 0]
    m01 = scale_rotation[..., 1]
    m10 = scale_rotation[..., 2]
    m11 = scale_rotation[..., 3]
    u = uv[..., 0] * m00 + uv[..., 1] * m10 + bias[..., 0]
    v = uv[..., 0] * m01 + uv[..., 1] * m11 + bias[..., 1]
    return jnp.stack([u, v], axis=-1)
