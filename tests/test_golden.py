"""Golden-image regression test — the visual-validation tier SURVEY.md §4
notes the reference lacks in-repo but our per-pixel metric requires.
Regenerate with `python tests/golden/generate.py` after INTENTIONAL shading
changes (the diff in the PR then shows the visual delta)."""
import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_mr_spheres_matches_golden():
    sys.path.insert(0, GOLDEN_DIR)
    from generate import render_mr_spheres_golden
    from diligentfx_tpu.utils.image import psnr, read_png
    img = render_mr_spheres_golden()
    ref = read_png(os.path.join(GOLDEN_DIR, "mr_spheres_128.png"))[..., :3]
    ref = ref.astype(np.float64) / 255.0
    # golden PNG is 8-bit: quantization alone bounds PSNR near 50 dB
    p = psnr(np.clip(img, 0.0, 1.0), ref)
    assert p > 40.0, f"PSNR vs golden = {p:.1f} dB"


def _check(fn_name, png, min_psnr=40.0):
    sys.path.insert(0, GOLDEN_DIR)
    import generate
    from diligentfx_tpu.utils.image import psnr, read_png
    img = getattr(generate, fn_name)()
    ref = read_png(os.path.join(GOLDEN_DIR, png))[..., :3]
    ref = ref.astype(np.float64) / 255.0
    p = psnr(np.clip(img, 0.0, 1.0), ref)
    assert p > min_psnr, f"PSNR vs {png} = {p:.1f} dB"


def test_csm_matches_golden():
    """cfg2-class gate: cascaded EVSM2 shadows end-to-end."""
    _check("render_csm_golden", "csm_256.png")


def test_deferred_matches_golden():
    """cfg3-class gate: deferred G-buffer + SSAO + SSR, frame 2 (temporal
    accumulation included)."""
    _check("render_deferred_golden", "deferred_256.png")


def test_full_chain_matches_golden():
    """cfg4-class gate: + TAA + bloom + DoF, frame 2."""
    _check("render_full_chain_golden", "full_chain_256.png")


def test_bench_config_matches_golden():
    """Headline-bench gate: the exact bench.py feature set with every Pallas
    kernel in interpret mode (the bench's compiled variants are per-kernel
    parity-tested against interpret mode elsewhere)."""
    _check("render_bench_config_golden", "bench_cfg_256.png")
