"""Tensor-parallel Dense flax modules (Megatron column/row layout).

Counterparts of the GPT-NeoX ``ColumnParallelLinear`` / ``RowParallelLinear``
modules the reference's preconditioner registers by classname
(``kfac/gpt_neox/preconditioner.py:450-515`` and ``modules.py:13-62`` of
gpauloski/kfac-pytorch). TPU-native design:

- Parameters are declared at their GLOBAL (logical) shapes. Inside a
  mapped ``model`` axis (``shard_map``) each rank statically slices its
  kernel shard (``jax.lax.axis_size`` is static, so shapes stay static)
  and computes only its partial product; outside any mapped context the
  same module computes the identical full-width math, so TP and non-TP
  execution agree exactly by construction. Parameter STORAGE can still be
  model-sharded (see ``PipelineKFACPreconditioner.init_params``): the
  shard_map entry then gathers kernels over ICI, ZeRO-style, while the
  matmul FLOPs stay TP-distributed.
- ``ColumnParallelDense`` computes ``x @ kernel[:, shard]`` and
  all-gathers the pre-activation back to full width (``tiled``) before
  bias: layer inputs and output cotangents are full-width and replicated
  over ``model``, so K-FAC capture is TP-agnostic. The reference instead
  gathers activations/grads to a primary rank
  (``kfac/gpt_neox/layer.py:129-163``).
- ``RowParallelDense`` slices both its full-width input and its kernel's
  input dim by the local model coordinate and psums the partials.

Factor shapes are the GLOBAL dims (the reference scales sharded dims by
the TP world size, ``kfac/gpt_neox/modules.py:42-62``); no TP-aware layer
state is needed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ['ColumnParallelDense', 'RowParallelDense']


def _axis_size(name: str | None) -> int:
    """Static size of a mapped axis, or 1 when unbound (unmapped trace)."""
    if name is None:
        return 1
    try:
        return int(jax.lax.axis_size(name))
    except NameError:
        return 1


class ColumnParallelDense(nn.Module):
    """Dense with the kernel column-sharded over the ``model`` mesh axis.

    The pre-activation is all-gathered back to full width, so downstream
    computation (and K-FAC capture) sees the logical full-width output.
    """

    features: int  # GLOBAL output features
    use_bias: bool = True
    model_axis: str | None = 'model'
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.lecun_normal()
    )

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            'kernel', self.kernel_init, (x.shape[-1], self.features),
        )
        tp = _axis_size(self.model_axis)
        if tp > 1:
            if self.features % tp:
                raise ValueError(
                    f'features={self.features} must divide the '
                    f'{self.model_axis} axis size {tp}',
                )
            local = self.features // tp
            idx = jax.lax.axis_index(self.model_axis)
            k_local = jax.lax.dynamic_slice_in_dim(
                kernel, idx * local, local, axis=1,
            )
            z = x @ k_local
            z = jax.lax.all_gather(
                z, self.model_axis, axis=-1, tiled=True,
            )
        else:
            z = x @ kernel
        if self.use_bias:
            bias = self.param(
                'bias', nn.initializers.zeros, (self.features,),
            )
            z = z + bias
        return z


class RowParallelDense(nn.Module):
    """Dense with the kernel row-sharded over the ``model`` mesh axis.

    Consumes a full-width input (each model rank slices its rows of the
    kernel's input dim), computes the partial product, and sums partials
    over ``model``.
    """

    features: int
    use_bias: bool = True
    model_axis: str | None = 'model'
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.lecun_normal()
    )

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_in = x.shape[-1]
        kernel = self.param(
            'kernel', self.kernel_init, (d_in, self.features),
        )
        tp = _axis_size(self.model_axis)
        if tp > 1:
            if d_in % tp:
                raise ValueError(
                    f'input dim {d_in} must divide the '
                    f'{self.model_axis} axis size {tp}',
                )
            local = d_in // tp
            idx = jax.lax.axis_index(self.model_axis)
            x_local = jax.lax.dynamic_slice_in_dim(
                x, idx * local, local, axis=-1,
            )
            k_local = jax.lax.dynamic_slice_in_dim(
                kernel, idx * local, local, axis=0,
            )
            z = jax.lax.psum(x_local @ k_local, self.model_axis)
        else:
            z = x @ kernel
        if self.use_bias:
            bias = self.param(
                'bias', nn.initializers.zeros, (self.features,),
            )
            z = z + bias
        return z
