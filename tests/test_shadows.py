"""Cascaded shadow map tests: partition invariants, end-to-end occlusion."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.config import RasterizerConfig, ShadowMode
from diligentfx_tpu.components.shadow_map_manager import (
    ShadowMapAttribs, basis_from_direction, convert_to_filterable,
    distribute_cascades, filter_shadow_pcf, find_cascade,
    gaussian_blur_separable, render_cascade_shadow_maps,
    sample_cascaded_shadows)
from diligentfx_tpu.gltf.primitives import cube, plane

CFG = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=256,
                       max_tiles_per_tri=16, big_tri_capacity=32, chunk=8)


def make_attribs(num_cascades=4, light_dir=(-0.3, -1.0, -0.2)):
    eye = [0.0, 3.0, 8.0]
    view = m3.look_at(eye, [0.0, 0.0, 0.0])
    world = m3.inverse(view)
    import math
    fov, aspect, near, far = 1.0, 16 / 9, 0.5, 60.0
    p00 = 1.0 / (math.tan(fov / 2) * aspect)
    p11 = 1.0 / math.tan(fov / 2)
    att = distribute_cascades(view, world, p00, p11, near, far, light_dir,
                              num_cascades=num_cascades, shadow_map_size=256)
    return att, view, (near, far)


def test_cascade_partition_monotone_and_covers_range():
    att, _, (near, far) = make_attribs()
    z = np.asarray(att.cascade_cam_z_end)
    assert (np.diff(z) > 0).all()
    assert z[-1] == pytest.approx(far, rel=1e-5)
    assert z[0] > near


def test_light_view_basis_orthonormal():
    m = np.asarray(basis_from_direction([-0.3, -1.0, -0.2]))[:3, :3]
    np.testing.assert_allclose(m.T @ m, np.eye(3), atol=1e-5)


def test_frustum_points_inside_their_cascade():
    att, view, (near, far) = make_attribs()
    # Points along the view ray at various depths must select increasing
    # cascades and land inside [-1,1]² of the selected cascade.
    world = m3.inverse(view)
    depths = jnp.array([1.0, 5.0, 15.0, 40.0])
    pts_view = jnp.stack([jnp.zeros(4), jnp.zeros(4), -depths], axis=-1)
    pts_world = m3.transform_points(pts_view, world)[..., :3]
    plv = m3.transform_points(pts_world, att.world_to_light_view)[..., :3]
    info = find_cascade(att, plv, depths)
    ci = np.asarray(info.cascade_idx)
    assert (np.diff(ci) >= 0).all()
    assert bool(info.in_any.all())
    uv = np.asarray(info.uv)
    assert (uv > 0).all() and (uv < 1).all()
    d = np.asarray(info.depth)
    assert (d > 0).all() and (d < 1).all()


def test_end_to_end_shadow_occlusion():
    """A cube floating above a ground plane with a near-vertical sun:
    points under the cube are shadowed, points far away are lit."""
    from diligentfx_tpu.gltf.primitives import transform_mesh
    c = cube(2.0)
    lift = np.eye(4, dtype=np.float32)
    lift[3, 1] = 3.0  # cube center at y=3
    c = transform_mesh(c, lift)
    g = plane(40.0)
    from diligentfx_tpu.gltf.primitives import merge
    mesh = merge([c, g])

    att, view, _ = make_attribs(light_dir=(0.0, -1.0, 0.01))
    smaps = render_cascade_shadow_maps(
        jnp.asarray(mesh.positions), jnp.asarray(mesh.indices), att,
        shadow_map_size=256, cfg=CFG, backend="xla")
    assert smaps.shape == (4, 256, 256)
    assert float(smaps.min()) < 0.9  # something rendered

    # Receivers on the ground
    shadowed_pt = jnp.array([[0.0, 0.0, 0.0]])    # directly under cube
    lit_pt = jnp.array([[10.0, 0.0, 0.0]])        # far away
    for mode, extra in [(ShadowMode.PCF, {}),
                        (ShadowMode.EVSM2, {}),
                        (ShadowMode.VSM, {})]:
        moments = None
        if mode != ShadowMode.PCF:
            moments = gaussian_blur_separable(convert_to_filterable(smaps, mode))
        for pt, expect_lit in [(shadowed_pt, False), (lit_pt, True)]:
            view_z = -m3.transform_points(pt, view)[..., 2]
            f = sample_cascaded_shadows(pt, view_z, att, smaps, mode=mode,
                                        moments=moments, blend_cascades=False)
            val = float(f[0])
            if expect_lit:
                assert val > 0.7, (mode, val)
            else:
                assert val < 0.3, (mode, val)


def test_vsm_chebyshev_behavior():
    # Uniform depth plane at 0.5: receivers nearer than 0.5 fully lit,
    # deeper receivers shadowed.
    smaps = jnp.full((1, 64, 64), 0.5, jnp.float32)
    moments = convert_to_filterable(smaps, ShadowMode.VSM)
    from diligentfx_tpu.components.shadow_map_manager import filter_shadow_vsm, CascadeSamplingInfo
    info = CascadeSamplingInfo(
        uv=jnp.array([[0.5, 0.5]]), depth=jnp.array([[0.4]]),
        cascade_idx=jnp.array([0]), min_dist_to_margin=jnp.array([[1.0]]),
        in_any=jnp.array([True]))
    lit = filter_shadow_vsm(moments, info, ShadowMode.VSM)
    assert float(lit[0]) > 0.99
    info_deep = info._replace(depth=jnp.array([[0.8]]))
    assert float(filter_shadow_vsm(moments, info_deep, ShadowMode.VSM)[0]) < 0.1


def test_vsm_16bit_quantization():
    from diligentfx_tpu.components.shadow_map_manager import (
        ShadowMode, convert_to_filterable)
    z = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 16, 16)).astype(np.float32))
    m16 = np.asarray(convert_to_filterable(z, ShadowMode.VSM,
                                           emulate_16bit=True))
    m32 = np.asarray(convert_to_filterable(z, ShadowMode.VSM))
    # quantized to exact RG16_UNORM steps, within half a step of fp32
    assert np.allclose(m16 * 65535.0, np.round(m16 * 65535.0), atol=1e-3)
    assert np.abs(m16 - m32).max() <= 0.5 / 65535.0 + 1e-7
