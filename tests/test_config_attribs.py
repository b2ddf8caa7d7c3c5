import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu.config import (
    AlphaMode, DebugViewType, PBRRendererCreateInfo, PSOFlags, PSOKey,
    RasterizerConfig, ToneMappingMode,
)
from diligentfx_tpu import attribs as at


def test_pso_flags_match_reference_bits():
    # Bit positions must match PBR_Renderer.hpp:538-616.
    assert PSOFlags.USE_COLOR_MAP == 1 << 0
    assert PSOFlags.USE_THICKNESS_MAP == 1 << 16
    assert PSOFlags.USE_VERTEX_COLORS == 1 << 17
    assert PSOFlags.USE_JOINTS == 1 << 22
    assert PSOFlags.USE_IBL == 1 << 29
    assert PSOFlags.ENABLE_SHADOWS == 1 << 38
    assert PSOFlags.ALL_TEXTURES() == (1 << 17) - 1
    default = PSOFlags.DEFAULT()
    assert PSOFlags.USE_IBL in default and PSOFlags.USE_LIGHTS in default
    assert PSOFlags.ENABLE_TONE_MAPPING in default


def test_pso_key_hashable_jit_cache_key():
    k1 = PSOKey(flags=PSOFlags.DEFAULT(), alpha_mode=AlphaMode.OPAQUE)
    k2 = PSOKey(flags=PSOFlags.DEFAULT(), alpha_mode=AlphaMode.OPAQUE)
    assert k1 == k2 and hash(k1) == hash(k2)
    assert k1 != PSOKey(flags=PSOFlags.DEFAULT(), alpha_mode=AlphaMode.BLEND)
    # Usable as static jit arg
    calls = []

    @jax.jit
    def f(x, *, key: PSOKey):
        calls.append(key)
        return x * (2.0 if PSOFlags.USE_IBL in key.flags else 3.0)

    import functools
    g = jax.jit(lambda x, key: x, static_argnames="key")
    g(jnp.ones(4), key=k1)


def test_create_info_validation():
    PBRRendererCreateInfo(pcf_kernel_size=5)
    with pytest.raises(ValueError):
        PBRRendererCreateInfo(pcf_kernel_size=4)
    with pytest.raises(ValueError):
        RasterizerConfig(tile_w=100)


def test_debug_views_count_matches_reference():
    # 35 views incl. NONE (PBR_Renderer.hpp:401-439 NumDebugViews)
    assert len(DebugViewType) == 35
    assert len(ToneMappingMode) == 12


def test_material_attribs_pytree_flows_through_jit():
    mat = at.PBRMaterialBasicAttribs.create(base_color_factor=(1, 0, 0, 1), metallic_factor=0.5)

    @jax.jit
    def f(m):
        return m.base_color_factor * m.metallic_factor

    out = f(mat)
    np.testing.assert_allclose(np.asarray(out), [0.5, 0, 0, 0.5], atol=1e-6)


def test_stack_and_gather_materials():
    mats = [at.PBRMaterialBasicAttribs.create(metallic_factor=float(i)) for i in range(4)]
    batched = at.stack_materials(mats)
    assert batched.metallic_factor.shape == (4,)
    one = at.gather_material(batched, jnp.int32(2))
    assert float(one.metallic_factor) == 2.0


def test_lights_concat():
    l1 = at.PBRLightAttribs.directional([0, -1, 0], [1, 1, 1])
    l2 = at.PBRLightAttribs.point([0, 5, 0], [10, 10, 10], range=20.0)
    l3 = at.PBRLightAttribs.spot([0, 5, 0], [0, -1, 0], [5, 5, 5], 0.3, 0.6)
    lights = at.PBRLightAttribs.concat([l1, l2, l3])
    assert lights.count == 3
    assert lights.position.shape == (3, 3)
    # Spot params sane: scale positive, offset = -cos(outer)*scale
    assert float(lights.spot_angle_scale[2]) > 0


def test_camera_attribs():
    from diligentfx_tpu import math3d as m3
    view = m3.look_at([0, 0, 5], [0, 0, 0])
    proj = m3.perspective(1.0, 1.0, 0.1, 100.0)
    cam = at.CameraAttribs.create(view, proj, [0, 0, 5], 0.1, 100.0, 640, 480)
    vp = np.asarray(cam.view_proj)
    np.testing.assert_allclose(vp, np.asarray(view) @ np.asarray(proj), atol=1e-5)
    assert np.isfinite(np.asarray(cam.view_proj_inv)).all()
