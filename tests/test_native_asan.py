"""Native runtime under AddressSanitizer — the analogue of the reference's
dedicated Clang-ASAN CI job (.github/workflows/build-linux.yml:55-59).

Runs the native test surface in a SUBPROCESS with the ASAN build preloaded
(ASAN must be loaded before libc; the parent pytest process can't swap it
in).  Any heap/stack violation in dfx_native.cpp / radient_c.cpp aborts the
child with an ASAN report → test fails.  The round-1 dfx_content_hash tail
overflow (ADVICE r1, ASan-verified) is exactly the bug class this catches.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
os.environ["DFX_NATIVE_LIB"] = %(lib)r
from diligentfx_tpu.native import binding
assert binding.available()

# content hash: every tail length 0..31 (the round-1 overflow class)
for n in range(0, 32):
    a = np.arange(max(n, 1), dtype=np.uint8)[:n]
    binding.content_hash(a)
# pool alloc/free/coalesce churn
p = binding.GeometryPool(1 << 16)
offs = [p.alloc(100) for _ in range(50)]
for o in offs[::2]:
    p.free(o)
for _ in range(25):
    p.alloc(64)
# triangulation of mixed polygons
counts = np.array([3, 4, 5, 6], np.int32)
idx = np.arange(counts.sum(), dtype=np.int32)
binding.triangulate_faces(counts, idx)
print("ASAN-CLEAN")
"""


def _find_asan_runtime():
    try:
        out = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, text=True, check=True).stdout.strip()
        return out if out and os.path.sep in out else None
    except Exception:
        return None


@pytest.mark.skipif(_find_asan_runtime() is None, reason="no libasan")
def test_native_surface_under_asan():
    from diligentfx_tpu.native.build import build
    lib = build(force=False, asan=True)
    env = dict(os.environ)
    env["LD_PRELOAD"] = _find_asan_runtime()
    env["ASAN_OPTIONS"] = "detect_leaks=0:abort_on_error=1"
    r = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "lib": lib}],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"ASAN failure:\n{r.stdout}\n{r.stderr}"
    assert "ASAN-CLEAN" in r.stdout
