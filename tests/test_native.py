"""Native C++ setup kernels: equivalence with the numpy fallback."""

import numpy as np
import pytest

from proximalgalerkin_tpu import native


def test_native_builds():
    assert native.available(), "g++ toolchain should build the native lib"


def test_unique_with_inverse_matches_numpy():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1000, size=20000).astype(np.int64)
    uniq, slot = native.unique_with_inverse(keys)
    uniq_np, slot_np = np.unique(keys, return_inverse=True)
    assert np.array_equal(uniq, uniq_np)
    assert np.array_equal(slot, slot_np)


def test_scatter_add_matches_numpy():
    rng = np.random.default_rng(1)
    vals = rng.normal(size=50000)
    slots = rng.integers(0, 997, size=50000).astype(np.int64)
    out = native.scatter_add(vals, slots, 997)
    ref = np.zeros(997)
    np.add.at(ref, slots, vals)
    assert np.allclose(out, ref, atol=1e-12)


def test_native_speedup_large():
    """The native path should beat numpy on large inputs (soft check)."""
    import time
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 10_000_000, size=4_000_000).astype(np.int64)
    t0 = time.perf_counter()
    native.unique_with_inverse(keys)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.unique(keys, return_inverse=True)
    t_numpy = time.perf_counter() - t0
    # only assert it is not drastically slower (CI variance safe)
    assert t_native < 3 * t_numpy
