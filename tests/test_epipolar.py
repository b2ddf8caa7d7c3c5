"""Epipolar light scattering: atmosphere LUT, inscattering, god rays."""
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.postfx.epipolar import (
    EpipolarSettings, apply_light_scattering, phase_mie, phase_rayleigh,
    precompute_optical_depth_lut)

H, W = 64, 64
SMALL = EpipolarSettings(num_epipolar_slices=64, max_samples_in_slice=32,
                         num_ray_march_steps=16)


def make_camera(eye=(0, 2, 0), target=(0, 2, -10)):
    view = m3.look_at(list(eye), list(target))
    proj = m3.perspective(1.2, W / H, 0.5, 2000.0)
    return CameraAttribs.create(view, proj, list(eye), 0.5, 2000.0, W, H)


@pytest.fixture(scope="module")
def lut():
    return precompute_optical_depth_lut(32, 64, 32)


def test_optical_depth_lut_monotonic(lut):
    a = np.asarray(lut)
    assert np.isfinite(a).all() and (a >= 0).all()
    # more atmosphere toward the horizon (cos→0.0+) than straight up (cos→1)
    ground = a[0]  # altitude 0 row
    up = ground[-1, 0]      # cos=+1
    horiz = ground[33, 0]   # cos≈0+
    assert horiz > up * 3


def test_phase_functions_normalized():
    # ∫ phase dω = 1 over the sphere (MC check)
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(-1, 1, 200_000), jnp.float32)
    pr = float(jnp.mean(phase_rayleigh(c)) * 4 * np.pi)
    pm = float(jnp.mean(phase_mie(c, jnp.float32(0.76))) * 4 * np.pi)
    assert abs(pr - 1.0) < 0.02
    assert abs(pm - 1.0) < 0.1


def test_sky_inscatter_and_sun_disk(lut):
    cam = make_camera()
    color = jnp.zeros((H, W, 3))
    depth = jnp.ones((H, W))          # all sky
    sun_dir = m3.normalize(jnp.array([0.0, -0.3, -1.0]))  # sun ahead, lowish
    out = apply_light_scattering(color, depth, cam, sun_dir, lut, SMALL)
    a = np.asarray(out.color)
    assert np.isfinite(a).all()
    assert a.max() > 0.01              # sky is lit
    ins = np.asarray(out.inscatter)
    # blue-dominant sky away from the sun (Rayleigh)
    corner = ins[-4, 4]
    assert corner[2] >= corner[0] * 0.8
    # transmittance through the whole atmosphere is < 1
    assert np.asarray(out.transmittance).max() < 1.0


def test_god_rays_shadowing(lut):
    """With a cascaded shadow blocker, shadowed rays carry less inscatter."""
    from diligentfx_tpu.components.shadow_map_manager import (
        distribute_cascades, render_cascade_shadow_maps)
    from diligentfx_tpu.config import RasterizerConfig
    from diligentfx_tpu.gltf.primitives import cube, transform_mesh
    import numpy as _np

    cam = make_camera()
    sun_dir = m3.normalize(jnp.array([0.0, -0.5, -1.0]))
    # big blocker above and ahead
    c = cube(30.0)
    lift = _np.eye(4, dtype=_np.float32)
    lift[3, :3] = [0.0, 25.0, -30.0]
    c = transform_mesh(c, lift)
    att = distribute_cascades(cam.view, m3.inverse(cam.view),
                              float(cam.proj[0, 0]), float(cam.proj[1, 1]),
                              0.5, 200.0, sun_dir, num_cascades=2,
                              shadow_map_size=128)
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                           max_tiles_per_tri=8, big_tri_capacity=32, chunk=8)
    smaps = render_cascade_shadow_maps(jnp.asarray(c.positions),
                                       jnp.asarray(c.indices), att,
                                       shadow_map_size=128, cfg=cfg)
    color = jnp.zeros((H, W, 3))
    depth = jnp.full((H, W), 0.99)     # distant ground everywhere
    out_lit = apply_light_scattering(color, depth, cam, sun_dir, lut, SMALL)
    out_shadow = apply_light_scattering(color, depth, cam, sun_dir, lut, SMALL,
                                        shadow_data=(att, smaps))
    lit = float(np.asarray(out_lit.inscatter).mean())
    shd = float(np.asarray(out_shadow.inscatter).mean())
    assert np.isfinite(shd)
    assert shd < lit * 0.9, (shd, lit)


def test_multiple_scattering_lut():
    from diligentfx_tpu.postfx.epipolar import (
        precompute_multiple_scattering_lut, precompute_optical_depth_lut)
    od = precompute_optical_depth_lut(height_res=16, angle_res=16, steps=16)
    psi = precompute_multiple_scattering_lut(od, height_res=8, angle_res=8,
                                             num_dirs=16, steps=8)
    p = np.asarray(psi)
    assert p.shape == (8, 8, 3)
    assert np.isfinite(p).all() and (p >= 0).all()
    # more ambient light with the sun up than below the horizon
    assert p[:, -1].mean() > p[:, 0].mean() * 2.0
    # Rayleigh multiple scattering is blue-ish (b channel strongest)
    up = p[0, -1]
    assert up[2] > up[0]


def test_ms_lut_brightens_sky():
    from diligentfx_tpu.postfx.epipolar import (
        EpipolarSettings, apply_light_scattering,
        precompute_multiple_scattering_lut, precompute_optical_depth_lut)
    od = precompute_optical_depth_lut(height_res=16, angle_res=32, steps=16)
    ms = precompute_multiple_scattering_lut(od, height_res=8, angle_res=8,
                                            num_dirs=16, steps=8)
    cam = make_camera()
    color = jnp.zeros((H, W, 3), jnp.float32)
    depth = jnp.ones((H, W), jnp.float32)      # sky everywhere
    s = EpipolarSettings(num_epipolar_slices=32, max_samples_in_slice=32,
                         num_ray_march_steps=8)
    sun = [0.3, -0.5, -0.8]
    out0 = apply_light_scattering(color, depth, cam, sun, od, s)
    out1 = apply_light_scattering(color, depth, cam, sun, od, s, ms_lut=ms)
    a0 = np.asarray(out0.color)
    a1 = np.asarray(out1.color)
    assert np.isfinite(a1).all()
    assert a1.mean() > a0.mean()               # multiple scattering adds light


def test_refinement_matches_full_march(lut):
    """Fixed-budget sample refinement (march every M-th sample + compacted
    depth-break samples, interpolate the rest) must closely match the full
    per-sample march on a frame with smooth + discontinuous depth."""
    cam = make_camera()
    depth = np.full((H, W), 0.9995, np.float32)
    depth[24:40, 8:56] = 0.6          # a building-like occluder: depth break
    depth = jnp.asarray(depth)
    color = jnp.zeros((H, W, 3), jnp.float32) + 0.05
    sun = [-0.3, -0.25, -0.9]
    full = apply_light_scattering(color, depth, cam, sun, lut, SMALL)
    ref = apply_light_scattering(
        color, depth, cam, sun, lut,
        SMALL._replace(refinement_factor=4, refinement_budget_div=4))
    a, b = np.asarray(full.color), np.asarray(ref.color)
    assert np.isfinite(b).all()
    # refined output tracks the full march closely (exact at breaks and at
    # every 4th sample; interpolated between)
    assert np.abs(a - b).mean() < 0.01
    assert np.abs(a - b).max() < 0.25


def test_minmax_tree_shadowed_march(lut):
    """The 1D min/max shadow-line tree path produces god rays consistent
    with the per-step PCF march (same scene, both shadowed)."""
    from diligentfx_tpu.components.shadow_map_manager import (
        distribute_cascades)

    cam = make_camera()
    depth = np.full((H, W), 0.9995, np.float32)
    depth[20:44, 20:44] = 0.5
    depth = jnp.asarray(depth)
    color = jnp.zeros((H, W, 3), jnp.float32) + 0.05
    sun = jnp.asarray([-0.3, -0.5, -0.8], jnp.float32)

    att = distribute_cascades(
        cam.view, m3.inverse(cam.view), float(cam.proj[0, 0]),
        float(cam.proj[1, 1]), float(cam.near_z), float(cam.far_z),
        m3.normalize(sun), num_cascades=2, shadow_map_size=128)
    # a floating occluder quad shadow map: render a fake depth (half lit)
    smaps = jnp.ones((2, 128, 128), jnp.float32)
    smaps = smaps.at[:, 40:80, 40:80].set(0.3)

    base = SMALL._replace(num_ray_march_steps=16)
    pcf = apply_light_scattering(color, depth, cam, sun, lut, base,
                                 shadow_data=(att, smaps))
    tree = apply_light_scattering(
        color, depth, cam, sun, lut,
        base._replace(use_minmax_tree=True, minmax_tree_res=256),
        shadow_data=(att, smaps))
    a, b = np.asarray(pcf.color), np.asarray(tree.color)
    assert np.isfinite(b).all()
    # both see the same occluder: the shadowed inscatter fields agree in the
    # mean (the tree trades PCF softness for span-exact min/max tests)
    assert np.abs(np.asarray(pcf.inscatter) - np.asarray(tree.inscatter)).mean() < 0.02
    # and the tree actually darkens relative to the unshadowed march
    noshadow = apply_light_scattering(color, depth, cam, sun, lut, base)
    assert float(np.asarray(tree.inscatter).mean()) < float(
        np.asarray(noshadow.inscatter).mean()) + 1e-6


def test_single_sctr_lut_matches_integration(lut):
    """SINGLE_SCTR_MODE_LUT parity: on an unshadowed scene the cumulative-
    table path must closely match the per-sample march (same integrand,
    different quadrature)."""
    cam = make_camera()
    color = jnp.zeros((H, W, 3))
    yy = (jnp.arange(H, dtype=jnp.float32) / H)[:, None]
    depth = jnp.clip(0.995 + 0.004 * yy * jnp.ones((H, W)), 0.0, 1.0)
    sun_dir = m3.normalize(jnp.array([0.3, -0.4, -1.0]))
    out_m = apply_light_scattering(color, depth, cam, sun_dir, lut, SMALL)
    out_l = apply_light_scattering(
        color, depth, cam, sun_dir, lut,
        SMALL._replace(single_sctr_lut=True))
    a = np.asarray(out_m.inscatter)
    b = np.asarray(out_l.inscatter)
    assert np.isfinite(b).all()
    scale = max(a.max(), 1e-12)
    err = np.abs(a - b) / scale
    assert np.percentile(err, 99) < 0.08, np.percentile(err, 99)
    ta = np.asarray(out_m.transmittance)
    tb = np.asarray(out_l.transmittance)
    np.testing.assert_allclose(tb, ta, atol=0.02)


def test_single_sctr_lut_shadowed(lut):
    """LUT mode with shadows: the contiguous-lit-section approximation
    (fDistToFirstLitSection/fTotalLitLength, RayMarch.fx) must still darken
    shadowed rays and stay within a loose band of the exact march."""
    from diligentfx_tpu.components.shadow_map_manager import (
        distribute_cascades, render_cascade_shadow_maps)
    from diligentfx_tpu.config import RasterizerConfig
    from diligentfx_tpu.gltf.primitives import cube, transform_mesh
    import numpy as _np

    cam = make_camera()
    sun_dir = m3.normalize(jnp.array([0.0, -0.5, -1.0]))
    c = cube(30.0)
    lift = _np.eye(4, dtype=_np.float32)
    lift[3, :3] = [0.0, 25.0, -30.0]
    c = transform_mesh(c, lift)
    att = distribute_cascades(cam.view, m3.inverse(cam.view),
                              float(cam.proj[0, 0]), float(cam.proj[1, 1]),
                              0.5, 200.0, sun_dir, num_cascades=2,
                              shadow_map_size=128)
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                           max_tiles_per_tri=8, big_tri_capacity=32, chunk=8)
    smaps = render_cascade_shadow_maps(jnp.asarray(c.positions),
                                       jnp.asarray(c.indices), att,
                                       shadow_map_size=128, cfg=cfg)
    color = jnp.zeros((H, W, 3))
    depth = jnp.full((H, W), 0.99)
    s_lut = SMALL._replace(single_sctr_lut=True)
    out_lit = apply_light_scattering(color, depth, cam, sun_dir, lut, s_lut)
    out_shd = apply_light_scattering(color, depth, cam, sun_dir, lut, s_lut,
                                     shadow_data=(att, smaps))
    out_ref = apply_light_scattering(color, depth, cam, sun_dir, lut, SMALL,
                                     shadow_data=(att, smaps))
    lit = float(np.asarray(out_lit.inscatter).mean())
    shd = float(np.asarray(out_shd.inscatter).mean())
    ref = float(np.asarray(out_ref.inscatter).mean())
    assert np.isfinite(shd)
    assert shd < lit * 0.9, (shd, lit)
    # within 35% of the exact shadowed march (the lit section really is
    # near-contiguous for one blocker; tolerance covers the span approx)
    assert abs(shd - ref) < 0.35 * max(ref, 1e-12), (shd, ref)


def test_single_sctr_lut_with_tree_and_refinement(lut):
    """LUT mode composes with the min/max shadow tree (the lit-span march
    then uses tree gathers) + sample refinement; shadowing still darkens."""
    from diligentfx_tpu.components.shadow_map_manager import (
        distribute_cascades, render_cascade_shadow_maps)
    from diligentfx_tpu.config import RasterizerConfig
    from diligentfx_tpu.gltf.primitives import cube, transform_mesh
    import numpy as _np

    cam = make_camera()
    sun_dir = m3.normalize(jnp.array([0.0, -0.5, -1.0]))
    c = cube(30.0)
    lift = _np.eye(4, dtype=_np.float32)
    lift[3, :3] = [0.0, 25.0, -30.0]
    c = transform_mesh(c, lift)
    att = distribute_cascades(cam.view, m3.inverse(cam.view),
                              float(cam.proj[0, 0]), float(cam.proj[1, 1]),
                              0.5, 200.0, sun_dir, num_cascades=2,
                              shadow_map_size=128)
    cfg = RasterizerConfig(tile_h=8, tile_w=128, bin_capacity=64,
                           max_tiles_per_tri=8, big_tri_capacity=32, chunk=8)
    smaps = render_cascade_shadow_maps(jnp.asarray(c.positions),
                                       jnp.asarray(c.indices), att,
                                       shadow_map_size=128, cfg=cfg)
    color = jnp.zeros((H, W, 3))
    depth = jnp.full((H, W), 0.99)
    s = SMALL._replace(single_sctr_lut=True, refinement_factor=2,
                       use_minmax_tree=True, minmax_tree_res=64)
    out_lit = apply_light_scattering(color, depth, cam, sun_dir, lut,
                                     SMALL._replace(single_sctr_lut=True))
    out = apply_light_scattering(color, depth, cam, sun_dir, lut, s,
                                 shadow_data=(att, smaps))
    assert np.isfinite(np.asarray(out.color)).all()
    assert (float(np.asarray(out.inscatter).mean())
            < float(np.asarray(out_lit.inscatter).mean()) * 0.9)
