"""Native shuffle-gather packer: build, correctness vs numpy, fallback."""

import numpy as np

from mega_nerf_tpu.data.native_packer import native_available, shuffle_gather


def test_native_builds_and_matches_numpy():
    assert native_available(), "g++ is in this image; the packer must build"
    rng = np.random.default_rng(0)
    perm = rng.permutation(10_000).astype(np.int64)
    for arr in (
        rng.random((10_000, 8)).astype(np.float32),
        rng.integers(0, 255, (10_000, 3)).astype(np.uint8),
        rng.integers(0, 2**31 - 1, 10_000).astype(np.int32),
    ):
        np.testing.assert_array_equal(shuffle_gather(arr, perm), arr[perm])


def test_unsupported_dtype_falls_back():
    rng = np.random.default_rng(1)
    arr = rng.random((100, 2)).astype(np.float64)  # no native f64 kernel
    perm = rng.permutation(100)
    np.testing.assert_array_equal(shuffle_gather(arr, perm), arr[perm])


def test_partial_permutation():
    # perm may select a subset (e.g. resampling); output length follows perm.
    arr = np.arange(50, dtype=np.float32).reshape(25, 2)
    perm = np.array([3, 1, 20], np.int64)
    np.testing.assert_array_equal(shuffle_gather(arr, perm), arr[perm])
