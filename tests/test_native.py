"""Native C++ preprocessing kernel: builds, matches the PIL fallback."""

import numpy as np
import pytest

from imagharmony_tpu import native


def test_builds_and_loads():
    assert native.available(), "g++ build of csrc/image_ops.cpp failed"


def _batch():
    rng = np.random.default_rng(0)
    return [
        rng.integers(0, 255, (96, 64, 3), dtype=np.uint8),
        rng.integers(0, 255, (64, 100, 3), dtype=np.uint8),
    ]


def test_matches_fallback_closely():
    imgs = _batch()
    kw = dict(tops=[4, 0], lefts=[0, 6], mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    fast = native.batch_preprocess(imgs, 32, **kw)

    # force the PIL fallback
    lib, native._LIB, native._TRIED = native._LIB, None, True
    try:
        slow = native.batch_preprocess(imgs, 32, **kw)
    finally:
        native._LIB, native._TRIED = lib, True

    assert fast.shape == slow.shape == (2, 32, 32, 3)
    # bilinear implementations differ in rounding; demand close agreement
    err = np.abs(fast - slow)
    assert np.median(err) < 0.02
    assert err.mean() < 0.05


def test_output_range():
    imgs = _batch()
    out = native.batch_preprocess(
        imgs, 32, tops=[0, 0], lefts=[0, 0], mean=(0.5,) * 3, std=(0.5,) * 3
    )
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_out_of_range_offset_does_not_crash():
    """Regression: an offset overrunning the resized axis used to compute a
    negative-size weight vector in the C++ kernel and abort the process
    (found feeding the square 1024² reference demo images with a nonzero
    crop offset). Out-of-range now degrades to edge replication."""
    imgs = [_batch()[0]]
    out = native.batch_preprocess(
        imgs, 32, tops=[5], lefts=[5], mean=(0.5,) * 3, std=(0.5,) * 3
    )
    assert np.isfinite(out).all()


def test_threading_consistency():
    imgs = _batch() * 4
    kw = dict(tops=[0] * 8, lefts=[0] * 8, mean=(0.5,) * 3, std=(0.5,) * 3)
    a = native.batch_preprocess(imgs, 32, num_threads=1, **kw)
    b = native.batch_preprocess(imgs, 32, num_threads=8, **kw)
    np.testing.assert_array_equal(a, b)
