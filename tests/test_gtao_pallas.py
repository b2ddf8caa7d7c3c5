"""Fused GTAO kernel (ops/gtao_pallas.py): interpret-mode parity with the
per-warp Pallas path it replaces (postfx/ssao.compute_gtao use_pallas=True).
Same mip-0 taps, same (±63, ±15) offset clamps — results must agree up to
the arccos-polynomial tolerance."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from diligentfx_tpu import math3d as m3
from diligentfx_tpu.attribs import CameraAttribs
from diligentfx_tpu.math3d import normalize
from diligentfx_tpu.postfx.ssao import SSAOSettings, compute_gtao


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def _scene(h=128, w=256, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = (0.55 + 0.25 * np.sin(yy * 0.11) * np.cos(xx * 0.05)
             + 0.05 * rng.random((h, w), dtype=np.float32))
    depth = np.clip(depth, 0.05, 0.98)
    n = np.stack([0.15 * np.sin(xx * 0.07), 0.15 * np.cos(yy * 0.09),
                  np.ones_like(xx)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    view = m3.look_at([0.0, 1.0, 7.5], [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, [0.0, 1.0, 7.5], 0.1, 100.0, w, h)
    return jnp.asarray(depth), jnp.asarray(n), cam


def test_fused_gtao_matches_warp_path(interpret_pallas, monkeypatch):
    depth, normal, cam = _scene()
    kw = dict(frame_index=jnp.int32(3), settings=SSAOSettings(),
              num_slices=2, num_steps=4, use_pallas=True)
    monkeypatch.setenv("DFX_GTAO_FUSED", "0")
    ref = compute_gtao(depth, normal, cam, **kw)
    monkeypatch.setenv("DFX_GTAO_FUSED", "1")
    fused = compute_gtao(depth, normal, cam, **kw)
    assert fused.shape == ref.shape
    assert bool(jnp.isfinite(fused).all())
    # interior parity: bulk must match tightly; a handful of pixels near
    # window-origin round-down boundaries may see different edge clamps
    # (the fused kernel's 32-row window vs the warp path's per-8-row one)
    a = np.asarray(fused)[2:-2, 2:-2]
    b = np.asarray(ref)[2:-2, 2:-2]
    d = np.abs(a - b)
    assert np.percentile(d, 99) < 1e-3, np.percentile(d, 99)
    assert np.max(d) < 6e-3, np.max(d)


def test_gtao_flat_plane_unoccluded(monkeypatch):
    """Ground-truth property (XeGTAO): an unoccluded fronto-parallel plane
    has visibility ~1 at the screen center and stays high off-center (only
    2-slice estimator variance, not the pre-round-5 side/angle swap that
    lost ~0.35 at grazing view angles)."""
    h, w = 64, 256
    depth = jnp.full((h, w), 0.6)
    n = jnp.zeros((h, w, 3)).at[..., 2].set(1.0)
    view = m3.look_at([0.0, 0.0, 5.0], [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, [0.0, 0.0, 5.0], 0.1, 100.0, w, h)
    ao = np.asarray(compute_gtao(depth, n, cam, frame_index=jnp.int32(0),
                                 settings=SSAOSettings(), num_slices=2,
                                 num_steps=4, use_pallas=False))
    assert ao[32, 128] > 0.98
    assert ao[8:-8, 8:-8].mean() > 0.8


def test_fused_gtao_range_and_occlusion(interpret_pallas, monkeypatch):
    """A deep step edge must occlude its floor pixels (AO < 1) and the
    visibility stays in [0, 1]."""
    h, w = 128, 256
    depth = np.full((h, w), 0.6, np.float32)
    depth[:, :w // 2] = 0.3          # near wall on the left
    n = np.zeros((h, w, 3), np.float32)
    n[..., 2] = 1.0
    view = m3.look_at([0.0, 0.0, 5.0], [0.0, 0.0, 0.0])
    proj = m3.perspective(0.7, w / h, 0.1, 100.0)
    cam = CameraAttribs.create(view, proj, [0.0, 0.0, 5.0], 0.1, 100.0, w, h)
    monkeypatch.setenv("DFX_GTAO_FUSED", "1")
    ao = compute_gtao(jnp.asarray(depth), jnp.asarray(n), cam,
                      frame_index=jnp.int32(0),
                      settings=SSAOSettings(effect_radius=jnp.float32(2.0)),
                      num_slices=2, num_steps=4, use_pallas=True)
    ao = np.asarray(ao)
    assert ao.min() >= 0.0 and ao.max() <= 1.0
    # pixels just right of the wall edge see the wall above their horizon
    edge_band = ao[8:-8, w // 2 + 2:w // 2 + 10]
    open_band = ao[8:-8, -24:-8]
    assert edge_band.mean() < open_band.mean() - 0.03
