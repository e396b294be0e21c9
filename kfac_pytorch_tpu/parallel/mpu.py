"""Model-parallel utilities (gather/split over a mesh axis).

Counterpart of reference ``kfac/gpt_neox/mpu.py:9-133`` of
gpauloski/kfac-pytorch (EleutherAI megatron-style gather-to-dst and
tensor splitting). Under SPMD most call sites disappear -- a TP-sharded
array IS the logically-global array and XLA inserts the collectives -- but
explicit forms are provided for ``shard_map`` code paths and custom
kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    'split_tensor_along_axis',
    'gather_from_model_parallel',
    'scatter_to_model_parallel',
]


def split_tensor_along_axis(
    tensor: jax.Array,
    num_partitions: int,
    axis: int = -1,
) -> list[jax.Array]:
    """Split a tensor into equal partitions along an axis.

    Mirrors reference ``split_tensor_along_dim`` (``mpu.py:98-133``).
    """
    size = tensor.shape[axis]
    if size % num_partitions != 0:
        raise ValueError(
            f'axis size {size} not divisible by {num_partitions}',
        )
    return jnp.split(tensor, num_partitions, axis=axis)


def gather_from_model_parallel(
    x: jax.Array,
    axis_name: str,
    axis: int = -1,
) -> jax.Array:
    """All-gather shards over a mesh axis, concatenated along ``axis``.

    The SPMD analogue of reference ``gather_from_model_parallel_region``
    (``mpu.py:9-74``): instead of gathering to a primary rank, every
    device receives the full tensor (all_gather rides ICI). Use inside
    ``shard_map``.
    """
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def scatter_to_model_parallel(
    x: jax.Array,
    axis_name: str,
    axis: int = -1,
) -> jax.Array:
    """Keep only the local shard of a replicated tensor.

    The inverse of ``gather_from_model_parallel`` -- the SPMD analogue of
    the reference's reduce_scatter-as-scatter emulation
    (``gpt_neox/layer.py:281-307``). Use inside ``shard_map``.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    size = x.shape[axis] // n
    return jax.lax.dynamic_slice_in_dim(x, idx * size, size, axis=axis)
