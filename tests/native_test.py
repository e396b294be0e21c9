"""Tests for the native augmentation kernels (vs numpy reference)."""

from __future__ import annotations

import numpy as np
import pytest

from kfac_pytorch_tpu.utils.native import (
    _crop_flip_numpy,
    decode_cifar_records,
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


def test_decode_cifar_records_matches_numpy() -> None:
    """The fused native CIFAR decode must equal the 3-step numpy path
    (label split, CHW->NHWC transpose, /255 + mean/std normalize)."""
    rng = np.random.default_rng(2)
    n, h, w, c = 16, 32, 32, 3
    raw = rng.integers(0, 256, (n, 1 + c * h * w)).astype(np.uint8)
    raw[:, 0] = rng.integers(0, 10, n)
    mean = np.array([0.49, 0.48, 0.45], np.float32)
    std = np.array([0.25, 0.24, 0.26], np.float32)

    imgs, labels = decode_cifar_records(raw, mean, std, h, w, c)

    ref_labels = raw[:, 0].astype(np.int32)
    ref = raw[:, 1:].reshape(n, c, h, w).transpose(0, 2, 3, 1)
    ref = (ref.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_array_equal(labels, ref_labels)
    np.testing.assert_allclose(imgs, ref, rtol=1e-6, atol=1e-6)
    assert imgs.shape == (n, h, w, c)
    assert imgs.dtype == np.float32
