"""Small reference models (flax counterparts of reference ``testing/models.py``)."""

from __future__ import annotations

import flax.linen as nn
import jax

__all__ = ['TinyModel', 'LeNet']


class TinyModel(nn.Module):
    """Two dense layers (counterpart of reference ``TinyModel``,
    ``testing/models.py:13-26``)."""

    hidden: int = 20
    out: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dense(self.out)(x)
        return x


class LeNet(nn.Module):
    """LeNet-5-style conv net, NHWC (counterpart of reference ``LeNet``,
    ``testing/models.py:29-67``)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(6, (5, 5), padding='VALID')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), padding='VALID')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(120)(x)
        x = nn.relu(x)
        x = nn.Dense(84)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_classes)(x)
        return x
