"""Native C++ extension tests (skipped when no toolchain)."""

import numpy as np
import pytest

from unitygaussiansplatting_tpu.native import chunk_minmax, get_native, morton_order
from unitygaussiansplatting_tpu.ops.morton import morton_encode3_np

native = get_native()
pytestmark = pytest.mark.skipif(native is None, reason="native extension unavailable")


def _codes_for(pos, order):
    pmin, pmax = pos.min(0), pos.max(0)
    extent = np.maximum(pmax - pmin, 1e-12)
    scaled = ((pos[order] - pmin) / extent * ((1 << 21) - 1)).astype(np.uint64)
    return morton_encode3_np(scaled)


def test_morton_order_is_valid_z_order():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-2, 2, (50_000, 3)).astype(np.float32)
    order = morton_order(pos)
    assert sorted(order.tolist()) == list(range(len(pos)))  # permutation
    codes = _codes_for(pos, order)
    # Morton codes along the native order must be (near-)non-decreasing; the
    # native path quantizes in f32 vs numpy's f64, so allow coordinate-LSB
    # slack rather than strict monotonicity.
    frac_sorted = np.mean(codes[1:].astype(np.float64) >= codes[:-1].astype(np.float64))
    assert frac_sorted > 0.999


def test_morton_locality():
    rng = np.random.default_rng(1)
    pos = rng.uniform(size=(20_000, 3)).astype(np.float32)
    order = morton_order(pos)
    d0 = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
    d1 = np.linalg.norm(np.diff(pos[order], axis=0), axis=1).mean()
    assert d1 < 0.5 * d0


def test_radix_argsort_matches_numpy():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, size=100_000, dtype=np.uint64)
    perm = np.frombuffer(native.radix_argsort_u64(keys.tobytes()), dtype=np.int64)
    np.testing.assert_array_equal(keys[perm], np.sort(keys))


def test_chunk_minmax_matches_numpy():
    rng = np.random.default_rng(3)
    vals = rng.normal(size=(10_000, 7)).astype(np.float32)
    mn, mx = chunk_minmax(vals, 256)
    full = (10_000 // 256) * 256
    ref_mn = vals[:full].reshape(-1, 256, 7).min(1)
    ref_mx = vals[:full].reshape(-1, 256, 7).max(1)
    np.testing.assert_array_equal(mn[: len(ref_mn)], ref_mn)
    np.testing.assert_array_equal(mx[: len(ref_mx)], ref_mx)
    # tail chunk
    np.testing.assert_array_equal(mn[-1], vals[full:].min(0))
