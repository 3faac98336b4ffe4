"""Native data runtime (C++ via ctypes) vs numpy reference."""

import numpy as np
import pytest

from myconvnet_tpu.data import native_loader as nl


def test_native_builds_and_loads():
    assert nl.native_available(), "g++ build of libmcn_data.so failed"


def test_shuffle_indices_is_permutation_and_deterministic():
    a = nl.shuffle_indices(42, 1000)
    b = nl.shuffle_indices(42, 1000)
    c = nl.shuffle_indices(43, 1000)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))
    # actually shuffled
    assert (a != np.arange(1000)).mean() > 0.9


def test_gather_batch_matches_numpy():
    rng = np.random.RandomState(0)
    pool = rng.randint(0, 256, (100, 8, 8, 3), dtype=np.uint8)
    idx = rng.randint(0, 100, 32).astype(np.int64)
    out = nl.gather_batch(pool, idx)
    np.testing.assert_array_equal(out, pool[idx])
    assert out.flags.c_contiguous


def test_gather_batch_noncontiguous_falls_back():
    rng = np.random.RandomState(1)
    pool = rng.randint(0, 256, (50, 8, 8, 4), dtype=np.uint8)[..., :3]
    idx = np.asarray([0, 5, 7], np.int64)
    out = nl.gather_batch(pool, idx)
    np.testing.assert_array_equal(out, pool[idx])


def test_normalize_u8_host_matches_numpy():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    out = nl.normalize_u8_host(imgs, mean, std)
    expect = (imgs.astype(np.float32) / 255.0 - np.asarray(
        mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)


def test_array_source_uses_gather():
    from myconvnet_tpu.data.pipeline import ArraySource
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (20, 4, 4, 3), dtype=np.uint8)
    labels = np.arange(20, dtype=np.int32)
    src = ArraySource(imgs, labels)
    x, y = src.get_batch(np.asarray([3, 1, 19]))
    np.testing.assert_array_equal(x, imgs[[3, 1, 19]])
    np.testing.assert_array_equal(y, [3, 1, 19])
