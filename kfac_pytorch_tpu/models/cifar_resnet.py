"""CIFAR ResNet family (ResNet-20/32/44/56/110), NHWC flax.

Counterpart of the reference's example model zoo
(``examples/vision/cifar_resnet.py:212-241`` of gpauloski/kfac-pytorch):
the classic 3-stage CIFAR ResNet of He et al. with 6n+2 layers, built
TPU-idiomatic (NHWC, channels-last, bf16-friendly compute dtype knob).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import flax.linen as nn
import jax

__all__ = [
    'CifarResNet',
    'resnet20',
    'resnet32',
    'resnet44',
    'resnet56',
    'resnet110',
]


class BasicBlock(nn.Module):
    """Pre-activationless basic residual block (3x3 + 3x3)."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=self.strides,
            padding='SAME',
            use_bias=False,
            dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            padding='SAME',
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=self.strides,
                use_bias=False,
                dtype=self.dtype,
                name='shortcut',
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train,
                dtype=self.dtype,
                name='shortcut_bn',
            )(residual)
        return nn.relu(y + residual)


class CifarResNet(nn.Module):
    """3-stage CIFAR ResNet: 16/32/64 channels, n blocks per stage."""

    n: int = 3  # depth = 6n + 2
    num_classes: int = 10
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        y = nn.Conv(
            16, (3, 3), padding='SAME', use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        for stage, features in enumerate((16, 32, 64)):
            for block in range(self.n):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                y = BasicBlock(
                    features, strides=strides, dtype=self.dtype,
                )(y, train=train)
        y = y.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(y)


def _factory(n: int) -> Callable[..., CifarResNet]:
    def make(**kwargs: Any) -> CifarResNet:
        return CifarResNet(n=n, **kwargs)

    return make


resnet20 = _factory(3)
resnet32 = _factory(5)
resnet44 = _factory(7)
resnet56 = _factory(9)
resnet110 = _factory(18)
