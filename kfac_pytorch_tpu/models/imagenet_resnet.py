"""ImageNet ResNet family (ResNet-18/34/50/101/152), NHWC flax.

Counterpart of the reference's ImageNet example models (torchvision
``resnet50`` used in ``examples/torch_imagenet_resnet.py`` of
gpauloski/kfac-pytorch). Standard He-style ResNet v1.5 (stride-2 on the
3x3 in bottlenecks), channels-last for TPU.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import flax.linen as nn
import jax

__all__ = [
    'ImageNetResNet',
    'resnet18_imagenet',
    'resnet34_imagenet',
    'resnet50_imagenet',
    'resnet101_imagenet',
    'resnet152_imagenet',
]


class BasicBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Any = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding='SAME',
            use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding='SAME', use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            scale_init=nn.initializers.zeros_init(),
        )(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides,
                use_bias=False, dtype=self.dtype, name='shortcut',
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name='shortcut_bn',
            )(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding='SAME',
            use_bias=False, dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, dtype=self.dtype,
            scale_init=nn.initializers.zeros_init(),
        )(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * self.expansion, (1, 1),
                strides=self.strides, use_bias=False, dtype=self.dtype,
                name='shortcut',
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype,
                name='shortcut_bn',
            )(residual)
        return nn.relu(y + residual)


class ImageNetResNet(nn.Module):
    block: type[nn.Module] = BottleneckBlock
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name='stem',
        )(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(n_blocks):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                y = self.block(
                    features, strides=strides, dtype=self.dtype,
                )(y, train=train)
        y = y.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(y)


def _factory(
    block: type[nn.Module],
    sizes: tuple[int, ...],
) -> Callable[..., ImageNetResNet]:
    def make(**kwargs: Any) -> ImageNetResNet:
        return ImageNetResNet(block=block, stage_sizes=sizes, **kwargs)

    return make


resnet18_imagenet = _factory(BasicBlock, (2, 2, 2, 2))
resnet34_imagenet = _factory(BasicBlock, (3, 4, 6, 3))
resnet50_imagenet = _factory(BottleneckBlock, (3, 4, 6, 3))
resnet101_imagenet = _factory(BottleneckBlock, (3, 4, 23, 3))
resnet152_imagenet = _factory(BottleneckBlock, (3, 8, 36, 3))
