"""Collective-communication helpers: symmetric packing + explicit reduces.

Counterpart of the reference's communicator utilities
(``kfac/distributed.py:388-465`` of gpauloski/kfac-pytorch). Most of the
reference communicator disappears on TPU -- async futures become XLA's
latency-hiding scheduler, bucketing becomes the block-stacked factor
layout, and factor allreduce is the psum XLA derives from the sharded
covariance contraction. What remains useful:

- **Symmetric (upper-triangle) packing**: halves the bytes of a symmetric
  factor before a DCN-crossing broadcast/gather (the reference's
  ``symmetry_aware`` path, ``distributed.py:422-465``). Pure index
  arithmetic, jit-friendly, batched.
- **Explicit collectives** for ``shard_map`` code paths that cannot rely
  on sharding-constraint propagation (e.g. custom Pallas collectives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    'triu_indices',
    'get_triu',
    'fill_triu',
    'reduce_factors',
    'NonSquareTensorError',
]


class NonSquareTensorError(Exception):
    """Raised when symmetric packing is applied to a non-square matrix."""


def triu_indices(dim: int) -> tuple[jax.Array, jax.Array]:
    """Row/col indices of the upper triangle (static, computed at trace)."""
    rows, cols = jnp.triu_indices(dim)
    return rows, cols


def get_triu(x: jax.Array) -> jax.Array:
    """Pack the upper triangle of ``(..., d, d)`` into ``(..., d(d+1)/2)``.

    Mirrors reference ``get_triu`` (``kfac/distributed.py:422-433``),
    batched over leading dims.
    """
    if x.shape[-1] != x.shape[-2]:
        raise NonSquareTensorError(
            f'tensor must be square, got shape {x.shape}',
        )
    d = x.shape[-1]
    rows, cols = triu_indices(d)
    return x[..., rows, cols]


def fill_triu(shape: tuple[int, ...], packed: jax.Array) -> jax.Array:
    """Unpack ``get_triu`` output back into a full symmetric matrix.

    Mirrors reference ``fill_triu`` (``kfac/distributed.py:436-465``).

    Args:
        shape: full output shape ``(..., d, d)``.
        packed: ``(..., d(d+1)/2)`` upper-triangle values.
    """
    if shape[-1] != shape[-2]:
        raise NonSquareTensorError(f'shape must be square, got {shape}')
    d = shape[-1]
    rows, cols = triu_indices(d)
    out = jnp.zeros(shape, packed.dtype)
    out = out.at[..., rows, cols].set(packed)
    lower = jnp.swapaxes(out, -1, -2)
    diag = out * jnp.eye(d, dtype=packed.dtype)
    return out + lower - diag


def reduce_factors(
    factors: jax.Array,
    axis_name: str,
    symmetric: bool = False,
) -> jax.Array:
    """Mean-allreduce factor blocks over a mesh axis inside ``shard_map``.

    The explicit form of the reference's factor allreduce
    (``kfac/layers/base.py:282-336``) for code that manages its own
    collectives. With ``symmetric=True``, only the upper triangle rides
    the interconnect (useful when the axis crosses DCN).
    """
    n = jax.lax.psum(1, axis_name)
    if not symmetric:
        return jax.lax.psum(factors, axis_name) / n
    packed = get_triu(factors)
    packed = jax.lax.psum(packed, axis_name) / n
    return fill_triu(factors.shape, packed)
