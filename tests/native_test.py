"""Tests for the native augmentation kernels (vs numpy reference)."""

from __future__ import annotations

import numpy as np
import pytest

from kfac_pytorch_tpu.utils.native import (
    _crop_flip_numpy,
    native_available,
    random_crop_flip,
)


def test_crop_flip_matches_numpy() -> None:
    rng = np.random.default_rng(0)
    padded = rng.normal(0, 1, (8, 40, 40, 3)).astype(np.float32)
    offs = rng.integers(0, 9, (8, 2)).astype(np.int32)
    flips = (rng.random(8) < 0.5).astype(np.uint8)
    out = random_crop_flip(padded, offs, flips, 32, 32)
    expected = _crop_flip_numpy(padded, offs, flips, 32, 32)
    np.testing.assert_allclose(out, expected)
    assert out.shape == (8, 32, 32, 3)


def test_native_toolchain_builds() -> None:
    # In this environment g++ is available; the fast path must build.
    assert native_available()


@pytest.mark.parametrize('c', [1, 3])
def test_crop_flip_channels(c) -> None:
    rng = np.random.default_rng(1)
    padded = rng.normal(0, 1, (2, 12, 12, c)).astype(np.float32)
    offs = np.zeros((2, 2), np.int32)
    flips = np.array([0, 1], np.uint8)
    out = random_crop_flip(padded, offs, flips, 8, 8)
    np.testing.assert_allclose(out[0], padded[0, :8, :8])
    np.testing.assert_allclose(out[1], padded[1, :8, 7::-1])
