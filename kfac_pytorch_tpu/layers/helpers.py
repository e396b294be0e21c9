"""Per-layer-type helpers: factor extraction and gradient (un)packing.

Functional counterpart of the reference's ``ModuleHelper`` hierarchy
(``kfac/layers/modules.py:13-237`` of gpauloski/kfac-pytorch). A helper is a
small frozen dataclass of *static* layer metadata plus pure functions:

- ``get_a_factor(a)``:   captured layer input -> A covariance factor.
- ``get_g_factor(g)``:   captured output-gradient -> G covariance factor.
- ``get_grad(grads)``:   param-subtree grads -> 2D gradient matrix
  ``(out, in [+1])`` with the bias gradient appended as the last column.
- ``set_grad(grads, m)``: inverse of ``get_grad`` -- scatter a 2D matrix
  back into the param-subtree structure.

The gradient-matrix convention is ``(out_features, in_features + has_bias)``
exactly like the reference so the preconditioning formulas line up; flax
kernels ``(in, out)`` / ``(kh, kw, in, out)`` are transposed/reshaped at the
boundary (cheap relayouts XLA folds into the surrounding matmuls).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.ops.covariance import append_bias_ones
from kfac_pytorch_tpu.ops.covariance import extract_conv2d_patches
from kfac_pytorch_tpu.ops.covariance import get_cov

__all__ = ['LayerHelper', 'LinearHelper', 'Conv2dHelper']

Grads = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LayerHelper:
    """Static metadata + pure factor/grad functions for one layer."""

    in_features: int
    out_features: int
    has_bias: bool
    factor_dtype: Any = None  # None -> keep training dtype

    @property
    def a_factor_shape(self) -> tuple[int, int]:
        x = self.in_features + int(self.has_bias)
        return (x, x)

    @property
    def g_factor_shape(self) -> tuple[int, int]:
        return (self.out_features, self.out_features)

    @property
    def grad_shape(self) -> tuple[int, int]:
        return (self.out_features, self.in_features + int(self.has_bias))

    def has_symmetric_factors(self) -> bool:
        return True

    def get_a_factor(self, a: jax.Array) -> jax.Array:
        raise NotImplementedError

    def get_g_factor(self, g: jax.Array) -> jax.Array:
        raise NotImplementedError

    def get_grad(self, grads: Grads) -> jax.Array:
        raise NotImplementedError

    def set_grad(self, grads: Grads, matrix: jax.Array) -> Grads:
        raise NotImplementedError

    def _maybe_cast(self, x: jax.Array) -> jax.Array:
        if self.factor_dtype is not None:
            return x.astype(self.factor_dtype)
        return x


@dataclasses.dataclass(frozen=True)
class LinearHelper(LayerHelper):
    """Helper for dense layers (flax ``nn.Dense``).

    Mirrors reference ``LinearModuleHelper`` (``kfac/layers/modules.py:
    100-141``): leading dims (batch, sequence, ...) are folded into the
    covariance row dimension, so factor size is independent of sequence
    length.
    """

    def get_a_factor(self, a: jax.Array) -> jax.Array:
        a = self._maybe_cast(a)
        a = a.reshape(-1, a.shape[-1])
        if self.has_bias:
            a = append_bias_ones(a)
        return get_cov(a)

    def get_g_factor(self, g: jax.Array) -> jax.Array:
        g = self._maybe_cast(g)
        g = g.reshape(-1, g.shape[-1])
        return get_cov(g)

    def get_grad(self, grads: Grads) -> jax.Array:
        # flax Dense kernel is (in, out); the K-FAC convention is (out, in).
        g = grads['kernel'].T
        if self.has_bias:
            g = jnp.concatenate([g, grads['bias'][:, None]], axis=1)
        return g

    def set_grad(self, grads: Grads, matrix: jax.Array) -> Grads:
        out = dict(grads)
        if self.has_bias:
            out['kernel'] = matrix[:, :-1].T.astype(grads['kernel'].dtype)
            out['bias'] = matrix[:, -1].astype(grads['bias'].dtype)
        else:
            out['kernel'] = matrix.T.astype(grads['kernel'].dtype)
        return out


@dataclasses.dataclass(frozen=True)
class Conv2dHelper(LayerHelper):
    """Helper for 2D convolutions (flax ``nn.Conv``, NHWC).

    Mirrors reference ``Conv2dModuleHelper`` (``kfac/layers/modules.py:
    144-237``): activations are expanded to im2col patches, spatial
    positions are folded into the covariance rows, and both a and g are
    scaled by 1/spatial_size before the covariance contraction.

    ``in_features`` is ``in_channels * kh * kw`` (the patch dimension).
    """

    kernel_size: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: Any = 'SAME'

    def get_a_factor(self, a: jax.Array) -> jax.Array:
        a = self._maybe_cast(a)
        patches = extract_conv2d_patches(
            a,
            self.kernel_size,
            self.strides,
            self.padding,
        )
        spatial_size = patches.shape[1] * patches.shape[2]
        p = patches.reshape(-1, patches.shape[-1])
        if self.has_bias:
            p = append_bias_ones(p)
        p = p / spatial_size
        return get_cov(p)

    def get_g_factor(self, g: jax.Array) -> jax.Array:
        # g: (batch, out_h, out_w, out_channels) -- already channels-last.
        g = self._maybe_cast(g)
        spatial_size = g.shape[1] * g.shape[2]
        g2 = g.reshape(-1, g.shape[-1]) / spatial_size
        return get_cov(g2)

    def get_grad(self, grads: Grads) -> jax.Array:
        # flax Conv kernel is (kh, kw, in, out) -> (out, kh*kw*in), matching
        # the (kh, kw, c) patch feature ordering in extract_conv2d_patches.
        k = grads['kernel']
        g = k.reshape(-1, k.shape[-1]).T
        if self.has_bias:
            g = jnp.concatenate([g, grads['bias'][:, None]], axis=1)
        return g

    def set_grad(self, grads: Grads, matrix: jax.Array) -> Grads:
        out = dict(grads)
        kshape = grads['kernel'].shape
        if self.has_bias:
            out['kernel'] = (
                matrix[:, :-1].T.reshape(kshape).astype(grads['kernel'].dtype)
            )
            out['bias'] = matrix[:, -1].astype(grads['bias'].dtype)
        else:
            out['kernel'] = (
                matrix.T.reshape(kshape).astype(grads['kernel'].dtype)
            )
        return out
