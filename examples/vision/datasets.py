"""Vision dataset loaders (CIFAR-10 binary format + synthetic fallback).

Counterpart of reference ``examples/vision/datasets.py:19-153`` of
gpauloski/kfac-pytorch. This environment has no network egress and no
torchvision, so CIFAR-10 is read directly from the standard
``cifar-10-batches-bin`` binary layout when ``--data-dir`` points at it;
otherwise a deterministic synthetic dataset with the same shapes is used
(sufficient for perf runs and smoke training).

Batches are yielded as numpy arrays (NHWC, normalized); sharded
``device_put`` happens in the engine.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np

__all__ = ['cifar10', 'synthetic', 'DataConfig', 'Dataset']

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.247, 0.243, 0.262], np.float32)


class Dataset:
    """In-memory dataset with shuffled batch iteration and augmentation."""

    def __init__(
        self,
        images: np.ndarray,  # (N, H, W, C) float32, normalized
        labels: np.ndarray,  # (N,) int32
        batch_size: int,
        train: bool,
        seed: int = 0,
        augment: bool = False,
    ) -> None:
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.train = train
        self.augment = augment and train
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.images) // self.batch_size

    def epoch(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = len(self.images)
        order = (
            self._rng.permutation(n) if self.train else np.arange(n)
        )
        for i in range(len(self)):
            idx = order[i * self.batch_size:(i + 1) * self.batch_size]
            x = self.images[idx]
            y = self.labels[idx]
            if self.augment:
                x = self._augment(x)
            yield x, y

    def _augment(self, x: np.ndarray) -> np.ndarray:
        """Random crop (pad 4) + horizontal flip, the standard CIFAR recipe.

        Uses the native C++ kernel when the toolchain is available (see
        ``kfac_pytorch_tpu/utils/native``); numpy fallback otherwise.
        """
        from kfac_pytorch_tpu.utils.native import random_crop_flip

        n, h, w, c = x.shape
        padded = np.pad(
            x, ((0, 0), (4, 4), (4, 4), (0, 0)), mode='reflect',
        )
        offs = self._rng.integers(0, 9, size=(n, 2)).astype(np.int32)
        flips = (self._rng.random(n) < 0.5).astype(np.uint8)
        return random_crop_flip(padded, offs, flips, h, w)


def _load_cifar_binaries(data_dir: str) -> tuple[np.ndarray, ...] | None:
    base = None
    for cand in (
        data_dir,
        os.path.join(data_dir, 'cifar-10-batches-bin'),
    ):
        if os.path.exists(os.path.join(cand, 'data_batch_1.bin')):
            base = cand
            break
    if base is None:
        return None

    def read(fname: str) -> tuple[np.ndarray, np.ndarray]:
        # Fused native decode (label split + CHW->NHWC + /255 +
        # mean/std) with a numpy fallback; see utils/native.
        from kfac_pytorch_tpu.utils.native import decode_cifar_records

        raw = np.fromfile(os.path.join(base, fname), np.uint8)
        return decode_cifar_records(
            raw.reshape(-1, 3073), CIFAR_MEAN, CIFAR_STD,
        )

    train_parts = [read(f'data_batch_{i}.bin') for i in range(1, 6)]
    train_x = np.concatenate([p[0] for p in train_parts])
    train_y = np.concatenate([p[1] for p in train_parts])
    test_x, test_y = read('test_batch.bin')
    return train_x, train_y, test_x, test_y


def cifar10(
    data_dir: str | None,
    batch_size: int,
    val_batch_size: int | None = None,
    seed: int = 0,
    synthetic_size: int = 2560,
) -> tuple[Dataset, Dataset]:
    """CIFAR-10 train/val datasets, falling back to synthetic data."""
    val_batch_size = val_batch_size or batch_size
    loaded = _load_cifar_binaries(data_dir) if data_dir else None
    if loaded is None:
        return synthetic(
            (32, 32, 3), 10, batch_size, val_batch_size, seed,
            synthetic_size,
        )
    train_x, train_y, test_x, test_y = loaded
    # Images arrive already normalized from the fused decode path.
    return (
        Dataset(
            train_x, train_y, batch_size,
            train=True, seed=seed, augment=True,
        ),
        Dataset(
            test_x, test_y, val_batch_size,
            train=False, seed=seed,
        ),
    )


def synthetic(
    shape: tuple[int, ...],
    num_classes: int,
    batch_size: int,
    val_batch_size: int | None = None,
    seed: int = 0,
    size: int = 2560,
) -> tuple[Dataset, Dataset]:
    """Deterministic synthetic dataset (classifiable: class-dependent means)."""
    val_batch_size = val_batch_size or batch_size
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, size).astype(np.int32)
    means = rng.normal(0, 1, (num_classes,) + shape).astype(np.float32)
    images = (
        0.5 * means[labels]
        + rng.normal(0, 1, (size,) + shape).astype(np.float32)
    )
    split = int(size * 0.9)
    return (
        Dataset(
            images[:split], labels[:split], batch_size,
            train=True, seed=seed,
        ),
        Dataset(
            images[split:], labels[split:], val_batch_size,
            train=False, seed=seed,
        ),
    )


class DataConfig:
    """Bundled dataset metadata for the CLI scripts."""

    def __init__(self, name: str, shape: tuple[int, ...], classes: int):
        self.name = name
        self.shape = shape
        self.classes = classes
