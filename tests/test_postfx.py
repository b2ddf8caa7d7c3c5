"""Post-processing effects: numerical behavior tests (CPU, small frames)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs

H, W = 64, 64


def make_camera(eye=(0, 0, 5), target=(0, 0, 0), near=0.5, far=50.0):
    view = m3.look_at(list(eye), list(target))
    proj = m3.perspective(1.0, W / H, near, far)
    return CameraAttribs.create(view, proj, list(eye), near, far, W, H)


def depth_of_plane_at(view_dist, camera):
    """NDC depth of a view-facing plane at given distance."""
    n, f = float(camera.near_z), float(camera.far_z)
    return (view_dist * f - n * f) / (view_dist * (f - n))


# ---------------------------------------------------------------------------


def test_depth_roundtrip_and_world_reconstruction():
    from diligentfx_tpu.postfx.context import depth_to_camera_z, reconstruct_world_pos
    cam = make_camera()
    d = depth_of_plane_at(5.0, cam)
    depth = jnp.full((H, W), d, jnp.float32)
    z = depth_to_camera_z(depth, cam)
    np.testing.assert_allclose(np.asarray(z), 5.0, rtol=1e-4)
    world = reconstruct_world_pos(depth, cam)
    # camera at +5z looking at origin → plane through origin
    np.testing.assert_allclose(float(world[H // 2, W // 2, 2]), 0.0, atol=0.15)


def test_static_camera_zero_motion():
    from diligentfx_tpu.postfx.context import compute_camera_motion
    cam = make_camera()
    depth = jnp.full((H, W), depth_of_plane_at(5.0, cam), jnp.float32)
    motion = compute_camera_motion(depth, cam, cam)
    assert float(jnp.abs(motion).max()) < 1e-4


def test_moving_camera_nonzero_motion():
    from diligentfx_tpu.postfx.context import compute_camera_motion
    cam = make_camera(eye=(0, 0, 5))
    prev = make_camera(eye=(0.2, 0, 5))
    depth = jnp.full((H, W), depth_of_plane_at(5.0, cam), jnp.float32)
    motion = compute_camera_motion(depth, cam, prev)
    assert float(jnp.abs(motion[..., 0]).mean()) > 1e-3


def test_jitter_sequence_and_proj():
    from diligentfx_tpu.postfx.context import (apply_jitter_to_proj,
                                               jitter_to_ndc,
                                               taa_jitter_sequence)
    seq = np.asarray(taa_jitter_sequence(16))
    assert (np.abs(seq) <= 0.5).all()
    assert np.abs(seq.mean(0)).max() < 0.15  # roughly centered
    # jittered projection shifts NDC by the requested amount
    cam = make_camera()
    j = jitter_to_ndc(jnp.array([0.5, 0.25]), W, H)
    pj = apply_jitter_to_proj(cam.proj, j)
    p = jnp.array([0.3, -0.2, -5.0])
    c0 = m3.transform_points(p, cam.proj)
    c1 = m3.transform_points(p, pj)
    ndc0 = np.asarray(c0[:2] / c0[3])
    ndc1 = np.asarray(c1[:2] / c1[3])
    np.testing.assert_allclose(ndc1 - ndc0, np.asarray(j), atol=1e-5)


def test_noise_generators():
    from diligentfx_tpu.postfx.context import (interleaved_gradient_noise,
                                               r2_noise_pair)
    n1 = interleaved_gradient_noise(H, W, 0)
    n2 = interleaved_gradient_noise(H, W, 1)
    assert 0.4 < float(n1.mean()) < 0.6
    assert float(jnp.abs(n1 - n2).mean()) > 0.1  # animates
    r = r2_noise_pair(H, W, 0)
    assert r.shape == (H, W, 2)
    assert 0.4 < float(r.mean()) < 0.6


# ---------------------------------------------------------------------------


def test_taa_converges_on_static_scene():
    from diligentfx_tpu.postfx.context import prepare_postfx_resources
    from diligentfx_tpu.postfx.taa import TAAState, taa_accumulate
    cam = make_camera()
    depth = jnp.full((H, W), depth_of_plane_at(5.0, cam), jnp.float32)
    res = prepare_postfx_resources(depth, cam, cam, None, 0)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0.2, 0.8, (H, W, 3)), jnp.float32)
    state = None
    outs = []
    for f in range(6):
        noisy = base + jnp.asarray(rng.normal(0, 0.05, (H, W, 3)), jnp.float32)
        out, state = taa_accumulate(noisy, state, res)
        outs.append(np.asarray(out))
    # accumulated result is closer to the clean base than a single noisy frame
    err_first = np.abs(outs[0] - np.asarray(base)).mean()
    err_last = np.abs(outs[-1] - np.asarray(base)).mean()
    assert err_last < err_first * 0.7
    assert float(state.sample_count.min()) >= 5


def test_taa_rejects_on_disocclusion():
    from diligentfx_tpu.postfx.context import prepare_postfx_resources
    from diligentfx_tpu.postfx.taa import TAAState, taa_accumulate
    cam = make_camera()
    depth = jnp.full((H, W), depth_of_plane_at(5.0, cam), jnp.float32)
    res = prepare_postfx_resources(depth, cam, cam, None, 0)
    # history is black, current is white: variance clip drags history to
    # the current neighborhood → result close to white
    state = TAAState(color=jnp.zeros((H, W, 3)), sample_count=jnp.full((H, W), 32.0))
    cur = jnp.ones((H, W, 3))
    out, _ = taa_accumulate(cur, state, res)
    assert float(out.mean()) > 0.9


# ---------------------------------------------------------------------------


def test_bloom_spreads_and_preserves_dark():
    from diligentfx_tpu.postfx.bloom import BloomSettings, apply_bloom
    img = jnp.zeros((H, W, 3), jnp.float32).at[32, 32].set(jnp.array([50.0, 50.0, 50.0]))
    out = apply_bloom(img, BloomSettings(intensity=jnp.float32(0.5)), num_mips=4)
    a = np.asarray(out)
    assert np.isfinite(a).all()
    # energy spread: neighbors of the spot are now lit
    assert a[36, 36].sum() > 1e-4
    # dark image stays dark
    dark = jnp.full((H, W, 3), 0.1, jnp.float32)
    out_d = np.asarray(apply_bloom(dark, BloomSettings(), num_mips=4))
    np.testing.assert_allclose(out_d, 0.1, atol=5e-3)


# ---------------------------------------------------------------------------


def test_ssao_flat_plane_unoccluded_and_corner_occluded():
    from diligentfx_tpu.postfx.ssao import (apply_ssao, compute_gtao,
                                            view_space_normal_from_depth)
    cam = make_camera()
    # flat plane facing the camera
    depth = jnp.full((H, W), depth_of_plane_at(5.0, cam), jnp.float32)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (H, W, 3))
    ao_flat = compute_gtao(depth, normal, cam, 0, num_slices=2, num_steps=4)
    assert float(ao_flat[H // 2, W // 2]) > 0.82
    # a step edge within the effect radius (0.5 m step, 1 m radius): pixels
    # just right of the edge (far side) are occluded by the near wall
    d_far = depth_of_plane_at(5.0, cam)
    d_near = depth_of_plane_at(4.5, cam)
    depth2 = jnp.full((H, W), d_far, jnp.float32).at[:, :W // 2].set(d_near)
    ao2 = compute_gtao(depth2, normal, cam, 0, num_slices=2, num_steps=6)
    assert float(ao2[H // 2, W // 2 + 2]) < float(ao_flat[H // 2, W // 2]) - 0.1


def test_ssao_full_pipeline_shapes():
    from diligentfx_tpu.postfx.ssao import apply_ssao
    cam = make_camera()
    depth = jnp.full((H, W), depth_of_plane_at(5.0, cam), jnp.float32)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (H, W, 3))
    ao, state = apply_ssao(depth, normal, cam, 0, half_resolution=True)
    assert ao.shape == (H, W)
    assert np.isfinite(np.asarray(ao)).all()
    assert state.history.shape == (H, W)


# ---------------------------------------------------------------------------


def test_ssr_mirror_floor_reflects():
    from diligentfx_tpu.postfx.ssr import SSRSettings, compute_ssr
    cam = make_camera(eye=(0, 1.0, 4.0), target=(0, 0.5, 0))
    # Construct a synthetic G-buffer: bottom half = floor (normal up),
    # top half = emissive wall at depth.
    n, f = 0.5, 50.0
    # Depth image: wall at 8m for top half; floor sloping for bottom half
    rows = np.linspace(0, 1, H)
    depth = np.zeros((H, W), np.float32)
    wall_d = (8.0 * f - n * f) / (8.0 * (f - n))
    for i in range(H):
        if i < H // 2:
            depth[i, :] = wall_d
        else:
            dist = 8.0 - (i - H // 2) / (H // 2) * 6.0  # floor approaching
            depth[i, :] = (dist * f - n * f) / (dist * (f - n))
    depth = jnp.asarray(depth)
    normal = np.zeros((H, W, 3), np.float32)
    normal[:H // 2] = [0, 0, 1]   # wall facing camera (view space)
    normal[H // 2:] = [0, 1, 0]   # floor facing up
    normal = jnp.asarray(normal)
    color = jnp.zeros((H, W, 3), jnp.float32).at[:H // 2].set(
        jnp.array([5.0, 3.0, 1.0]))
    rough = jnp.full((H, W, 1), 0.05, jnp.float32)
    rad, state = compute_ssr(color, depth, normal, rough, cam, 0,
                             SSRSettings(max_traversal_intersections=32))
    a = np.asarray(rad)
    assert np.isfinite(a).all()
    # some floor pixels should reflect the bright wall
    floor_conf = a[H // 2:, :, 3]
    assert floor_conf.max() > 0.3
    hit_px = a[H // 2:][floor_conf > 0.3]
    assert hit_px[:, 0].mean() > hit_px[:, 2].mean()  # reflects orange wall
    # ...with REAL wall energy, not self-intersection leakage: the wall is
    # (5, 3, 1), so confident hits must carry substantial red radiance
    assert hit_px[:, 0].mean() > 1.0


# ---------------------------------------------------------------------------


def test_dof_focus_sharp_defocus_blurred():
    from diligentfx_tpu.postfx.dof import DoFSettings, apply_dof
    cam = make_camera()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    # fast lens so defocus is strong even at this tiny test resolution
    s = DoFSettings(focus_distance=jnp.float32(2.0),
                    focal_length=jnp.float32(0.1),
                    f_stop=jnp.float32(0.7), max_coc_px=jnp.float32(8.0))
    # in focus: depth at the focus plane
    d_focus = jnp.full((H, W), depth_of_plane_at(2.0, cam), jnp.float32)
    out_f, _ = apply_dof(img, d_focus, cam, s)
    # strongly out of focus
    d_blur = jnp.full((H, W), depth_of_plane_at(30.0, cam), jnp.float32)
    out_b, _ = apply_dof(img, d_blur, cam, s)
    var_in = float(jnp.var(out_f))
    var_out = float(jnp.var(out_b))
    var_src = float(jnp.var(img))
    assert var_in > 0.8 * var_src          # focus: nearly unchanged
    assert var_out < 0.5 * var_src, (var_out, var_src)  # defocus: blurred


def test_dof_near_field_bleeds_far_field_does_not():
    """Separated-field semantics (DepthOfField.hpp:130-141): a blurred NEAR
    occluder bleeds over a sharp background edge, but a blurred BACKGROUND
    does not bleed over a sharp in-focus foreground."""
    import jax.numpy as jnp
    from diligentfx_tpu.postfx import dof as fx_dof
    H = W = 128
    cam = make_camera(eye=(0, 0, 0), near=0.1, far=100.0)
    s = fx_dof.DoFSettings(focus_distance=jnp.float32(5.0),
                           focal_length=jnp.float32(0.1),
                           f_stop=jnp.float32(2.0),
                           max_coc_px=jnp.float32(10.0))

    def ndc_depth_at(dist, camera):
        n, f = 0.1, 100.0
        return (dist * f - n * f) / (dist * (f - n))

    # scene A: left half NEAR (1m, strongly defocused, bright), right half
    # in focus (5m, dark) → near blur must leak brightness past the edge
    depth = np.full((H, W), ndc_depth_at(5.0, cam), np.float32)
    depth[:, :64] = ndc_depth_at(1.0, cam)
    color = np.zeros((H, W, 3), np.float32)
    color[:, :64] = 1.0
    out, _ = fx_dof.apply_dof(jnp.asarray(color), jnp.asarray(depth), cam, s)
    out = np.asarray(out)
    assert out[64, 70, 0] > 0.05, "near field must bleed over the sharp side"

    # scene B: left half FAR (50m, defocused, bright), right half in focus →
    # far blur must NOT leak over the in-focus side
    depth_b = np.full((H, W), ndc_depth_at(5.0, cam), np.float32)
    depth_b[:, :64] = ndc_depth_at(50.0, cam)
    out_b, _ = fx_dof.apply_dof(jnp.asarray(color), jnp.asarray(depth_b), cam, s)
    out_b = np.asarray(out_b)
    assert out_b[64, 72, 0] < out[64, 70, 0], (out_b[64, 72, 0], out[64, 70, 0])
    assert out_b[64, 76, 0] < 0.05, "far field must not bleed over focus"


def test_march_pallas_matches_reference():
    """The Pallas row-DDA march must lower to exactly the reference DDA
    math (march_dda_reference), and broadly agree with the XLA fixed-step
    march (a different discretization of the same crossing test)."""
    import functools
    from jax.experimental import pallas as pl
    from diligentfx_tpu.ops.march_pallas import (march_dda_reference,
                                                 march_small_table_pallas)
    from diligentfx_tpu.postfx.ssr import _march, build_min_depth_pyramid
    rng = np.random.default_rng(5)
    h, w = 16, 128
    # piecewise-smooth field (like a real depth buffer): per-texel noise
    # makes the row-exact DDA and a 48-step sampling legitimately disagree
    # on which noise spike a grazing ray clips first
    raw = 0.3 + 0.5 * rng.random((h, w)).astype(np.float32)
    k = np.ones((1, 8), np.float32) / 8.0
    sm = np.apply_along_axis(lambda r: np.convolve(r, k[0], mode="same"),
                             1, raw)
    depth = jnp.asarray(sm.astype(np.float32))
    mips = build_min_depth_pyramid(depth, 3)
    o = np.zeros((h, w, 3), np.float32)
    o[..., 0] = rng.random((h, w))
    o[..., 1] = rng.random((h, w))
    o[..., 2] = 0.2 + 0.2 * rng.random((h, w))
    d = rng.uniform(-0.6, 0.6, (h, w, 3)).astype(np.float32)
    d[..., 2] = rng.uniform(0.0, 0.6, (h, w))
    o, d = jnp.asarray(o), jnp.asarray(d)
    coarse = mips[-1]
    import unittest.mock as mock
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        tlo_p, thit_p, hit_p = march_small_table_pallas(
            coarse, o, d, jnp.float32(0.05))
    tlo_r, thit_r, hit_r = march_dda_reference(coarse, o, d,
                                               jnp.float32(0.05))
    np.testing.assert_array_equal(np.asarray(hit_p), np.asarray(hit_r))
    np.testing.assert_allclose(np.asarray(thit_p), np.asarray(thit_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(tlo_p), np.asarray(tlo_r),
                               atol=1e-6)

    # cross-check against the fixed-step XLA march: different sampling of
    # the same crossing predicate — hit masks must broadly agree and hit
    # positions must be close where both agree (one coarse cell).  Both
    # sides get the SAME table: the XLA path marches the finest mip it is
    # given (r5: fine-buffer march), so hand it the coarse one the DDA uses.
    with mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        uvz_p, hitm_p = _march([coarse], o, d, 48, jnp.float32(0.05),
                               use_pallas=True)
    uvz_x, hitm_x = _march([coarse], o, d, 48, jnp.float32(0.05))
    hp, hx = np.asarray(hitm_p), np.asarray(hitm_x)
    agree = (hp == hx).mean()
    assert agree > 0.85, f"hit masks diverge: {agree:.2%}"
    both = hp & hx
    if both.any():
        dp = np.abs(np.asarray(uvz_p)[both] - np.asarray(uvz_x)[both])
        assert np.median(dp[..., :2]) < 0.05, np.median(dp, axis=0)


def test_ssao_convolved_depth_history_rejects_on_depth_change():
    """ReBLUR-style convolved-depth-history validation (SSAO interface
    :144-152): when the depth under a pixel changes between frames, the
    reprojected AO history must be rejected even with zero motion."""
    from diligentfx_tpu.postfx.ssao import SSAOState, apply_ssao
    cam = make_camera()
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (H, W, 3))
    # bumpy depth: mid-range AO with real spatial variance, so the ±2σ
    # history clamp leaves room for the poisoned history to matter (a flat
    # plane's AO is ~1.0 with ~zero variance after the round-5 GTAO
    # side/angle fix — the clamp would pin both results to ~1 and the
    # ordering below would sit inside float noise)
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    bump = 0.02 * jnp.sin(yy * 0.9) * jnp.cos(xx * 0.7)
    d1 = jnp.clip(depth_of_plane_at(5.0, cam) + bump, 0.01, 0.99)
    d2 = jnp.clip(depth_of_plane_at(2.0, cam) + bump, 0.01, 0.99)
    motion = jnp.zeros((H, W, 2))
    _, st = apply_ssao(d1, normal, cam, 0, half_resolution=False)
    assert st.depth_history is not None
    # poison the AO history: if accepted it drags the result toward 0
    st = SSAOState(history=jnp.zeros((H, W)), depth_history=st.depth_history)
    ao_same, _ = apply_ssao(d1, normal, cam, 1, state=st, motion=motion,
                            half_resolution=False)
    ao_diff, _ = apply_ssao(d2, normal, cam, 1, state=st, motion=motion,
                            half_resolution=False)
    c = (H // 2, W // 2)
    # depth_history round-trips as the convolved current depth
    from diligentfx_tpu.postfx.ssao import convolved_depth
    np.testing.assert_allclose(float(st.depth_history[c]),
                               float(convolved_depth(d1)[c]), rtol=1e-5)
    # changed depth rejects MORE history than same depth (the variance
    # clamp already bounds the poisoned history, so the residual is small
    # but must be strictly ordered)
    assert float(ao_diff[c]) > float(ao_same[c]) + 5e-4
