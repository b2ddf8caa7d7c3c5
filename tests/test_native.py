"""Native runtime module: hashing, pool suballocation, triangulation, batching.
Tests run against the C++ library when g++ built it, else the Python fallback —
both must behave identically."""
import numpy as np
import pytest

from diligentfx_tpu.native import binding


def test_native_builds():
    # On this image the toolchain exists; the native path should be live.
    assert binding.available()


def test_content_hash_stability_and_sensitivity():
    a = np.arange(1000, dtype=np.float32)
    h1 = binding.content_hash(a)
    h2 = binding.content_hash(a.copy())
    assert h1 == h2 and len(h1) == 16
    b = a.copy()
    b[500] += 1e-3
    assert binding.content_hash(b) != h1
    # dtype/shape sensitivity
    assert binding.content_hash(a.reshape(10, 100)) != h1
    assert binding.content_hash(a.astype(np.float64)) != h1


def test_geometry_pool_alloc_free_coalesce():
    p = binding.GeometryPool(1024)
    a = p.alloc(100, alignment=16)
    b = p.alloc(200, alignment=16)
    c = p.alloc(300, alignment=16)
    assert a == 0 and b % 16 == 0 and c % 16 == 0
    assert len({a, b, c}) == 3
    cap, used, peak, frags = p.stats()
    assert cap == 1024 and used == 600
    p.free(b)
    cap, used, peak, frags = p.stats()
    assert used == 400 and peak == 600
    # freed region is reusable
    d = p.alloc(200, alignment=16)
    assert d == b
    # full coalescing back to one block
    for off in (a, c, d):
        p.free(off)
    cap, used, peak, frags = p.stats()
    assert used == 0 and frags == 1
    # exhaustion
    big = p.alloc(2048)
    assert big == -1
    # freeing an un-allocated offset is an error in both implementations
    with pytest.raises(KeyError):
        binding.GeometryPool(64).free(32)


def test_triangulate_faces():
    # one quad + one pentagon + one triangle
    counts = np.array([4, 5, 3], np.int32)
    indices = np.array([0, 1, 2, 3,  4, 5, 6, 7, 8,  9, 10, 11], np.int32)
    tris = binding.triangulate_faces(counts, indices)
    assert tris.shape == (2 + 3 + 1, 3)
    np.testing.assert_array_equal(tris[0], [0, 1, 2])
    np.testing.assert_array_equal(tris[1], [0, 2, 3])
    np.testing.assert_array_equal(tris[2], [4, 5, 6])
    np.testing.assert_array_equal(tris[-1], [9, 10, 11])

def test_content_hash_tail_bytes_enter_hash():
    """Regression (ADVICE r1): tails of 9..15 bytes overflowed an 8-byte
    buffer and bytes 8..n-1 never entered the hash (dedup collisions)."""
    for n in range(1, 16):
        a = np.arange(n, dtype=np.uint8)
        b = a.copy()
        b[n - 1] ^= 0xFF                     # flip the LAST byte
        ha = binding.content_hash(a)
        hb = binding.content_hash(b)
        assert ha != hb, f"tail byte {n-1} ignored for len {n}"
    base = np.arange(12, dtype=np.uint8)
    assert binding.content_hash(base) == binding.content_hash(base.copy())
