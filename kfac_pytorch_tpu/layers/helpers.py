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

from kfac_pytorch_tpu.ops.covariance import _normalize_padding
from kfac_pytorch_tpu.ops.covariance import append_bias_ones
from kfac_pytorch_tpu.ops.covariance import extract_conv2d_patches
from kfac_pytorch_tpu.ops.covariance import get_cov
from kfac_pytorch_tpu.ops.covariance import get_cov_blocked

__all__ = ['LayerHelper', 'LinearHelper', 'Conv2dHelper']

Grads = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LayerHelper:
    """Static metadata + pure factor/grad functions for one layer."""

    in_features: int
    out_features: int
    has_bias: bool
    factor_dtype: Any = None  # None -> keep training dtype
    # dtype the covariance CONTRACTION runs in (accumulation is always
    # f32 via preferred_element_type). None keeps the activation dtype --
    # the reference's behavior (factors computed in training dtype,
    # kfac/layers/base.py:345-373). bf16 is the production TPU setting:
    # MXU-native single-pass matmuls, f32 statistics out.
    compute_dtype: Any = None
    # Gram contraction scheme for the plain (no patch extraction)
    # covariances -- Linear A/G, conv G, and the 1x1-conv A fast path:
    # 'full' (one dot_general), 'tri' (lower-block-triangle contraction,
    # get_cov_blocked: 0.75x FLOPs at ~1.5x row-matrix reads), or 'auto'.
    # The on-chip tri-vs-full A/B (docs/PERF_NOTES.md) is erratic -- tri
    # can be several-x slower at large d depending on XLA's fusion choice
    # -- so 'auto' resolves to 'full' until a stable on-chip threshold is
    # measured; 'tri' remains opt-in.
    gram_method: str = 'full'

    def _gram(
        self,
        p: jax.Array,
        scale: float | jax.Array | None = None,
    ) -> jax.Array:
        method = self.gram_method
        if method == 'auto':
            method = 'full'
        if method == 'tri':
            return get_cov_blocked(p, scale=scale)
        return get_cov(p, scale=scale)

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
        """Whether the layer's A/G covariance factors are symmetric.

        Always True for every supported layer type: Dense and Conv2d
        factors are Gram matrices (``X^T X``), symmetric by
        construction. The reference carries a nonsymmetric escape hatch
        (``torch.linalg.eig`` + separate eigenvector communication,
        ``kfac/layers/eigen.py:323-348`` of gpauloski/kfac-pytorch) that
        is likewise unreachable for its two supported module types --
        nonsymmetric factors are intentionally OUT OF SCOPE here (the
        engine's triu-packed communication, batched symmetric solvers,
        and PSD eigenvalue clamping all assume symmetry). A future
        module type with nonsymmetric factors must override this AND
        extend ``ops/curvature.py``.
        """
        return True

    def get_a_factor(self, a: jax.Array) -> jax.Array:
        raise NotImplementedError

    def get_g_factor(self, g: jax.Array) -> jax.Array:
        raise NotImplementedError

    def get_grad(self, grads: Grads) -> jax.Array:
        raise NotImplementedError

    def set_grad(self, grads: Grads, matrix: jax.Array) -> Grads:
        raise NotImplementedError

    def get_grad_t(self, grads: Grads) -> jax.Array:
        """Gradient matrix in the TRANSPOSED layout ``(in [+1], out)``.

        This is the natural flax kernel layout, so no transposes are
        materialized; the engine preconditions with the transposed
        formulation ``Qa [(Qa^T M Qg) / (da dg^T + damping)] Qg^T``
        (identical math to the reference's ``(out, in)`` convention).
        """
        raise NotImplementedError

    def set_grad_t(self, grads: Grads, matrix: jax.Array) -> Grads:
        raise NotImplementedError

    def _maybe_cast(self, x: jax.Array) -> jax.Array:
        if self.factor_dtype is not None:
            return x.astype(self.factor_dtype)
        return x

    def _compute_cast(self, x: jax.Array) -> jax.Array:
        if self.compute_dtype is not None:
            return x.astype(self.compute_dtype)
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
        a = self._compute_cast(self._maybe_cast(a))
        a = a.reshape(-1, a.shape[-1])
        if self.has_bias:
            a = append_bias_ones(a)
        return self._gram(a)

    def get_g_factor(self, g: jax.Array) -> jax.Array:
        g = self._compute_cast(self._maybe_cast(g))
        g = g.reshape(-1, g.shape[-1])
        return self._gram(g)

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

    def get_grad_t(self, grads: Grads) -> jax.Array:
        g = grads['kernel']  # (in, out) -- already the transposed layout
        if self.has_bias:
            g = jnp.concatenate([g, grads['bias'][None, :]], axis=0)
        return g

    def set_grad_t(self, grads: Grads, matrix: jax.Array) -> Grads:
        out = dict(grads)
        if self.has_bias:
            out['kernel'] = matrix[:-1].astype(grads['kernel'].dtype)
            out['bias'] = matrix[-1].astype(grads['bias'].dtype)
        else:
            out['kernel'] = matrix.astype(grads['kernel'].dtype)
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
    # A-factor algorithm: 'auto' picks per geometry from the on-chip
    # A/B sweep (scripts/profile_afactor_rn50.py, docs/PERF_NOTES.md):
    # 'convgrad' (kh*kw conv weight-gradients, no patch slab) wins
    # 3-6x on every ResNet-50 3x3 geometry; 'slices' (concat-of-slices
    # slab + Gram) wins when channels are too few to feed the lanes
    # (the 7x7/c=3 stem). Explicit choices: 'patches' (XLA
    # conv_general_dilated_patches + Gram), 'slices', 'convgrad', or
    # 'rowgram' (row-pair Grams + band extraction). 1x1 kernels always
    # use the strided-slice fast path. A Pallas fused slab kernel was
    # built and RETIRED in round 3: measured slower than the XLA paths
    # both standalone (~10x off speed-of-light, slab assembly bound) and
    # in-graph (+27 ms vs +4.7 ms -- the custom call broke XLA's
    # scheduling around the backward pass); see docs/PERF_NOTES.md
    # "Capture A/B".
    a_factor_method: str = 'auto'

    def _cov_permutation(self, c: int) -> Any:
        """Map XLA patches order (c, kh, kw) -> our (kh, kw, c) order."""
        import numpy as np

        kh, kw = self.kernel_size
        perm = [
            ci * kh * kw + k
            for k in range(kh * kw)
            for ci in range(c)
        ]
        if self.has_bias:
            perm.append(kh * kw * c)  # bias index stays last
        return np.asarray(perm)

    def get_a_factor(self, a: jax.Array) -> jax.Array:
        a = self._compute_cast(self._maybe_cast(a))
        method = self.a_factor_method
        if method == 'auto' and self.kernel_size != (1, 1):
            # Measured decision rule (see class comment): channel-starved
            # inputs take the slices slab; everything else convgrad.
            method = 'slices' if a.shape[-1] < 16 else 'convgrad'
        if method == 'rowgram':
            from kfac_pytorch_tpu.ops.covariance import (
                conv2d_a_factor_rowgram,
            )

            return conv2d_a_factor_rowgram(
                a,
                self.kernel_size,
                self.strides,
                self.padding,
                has_bias=self.has_bias,
            )
        if method == 'convgrad' and self.kernel_size != (1, 1):
            from kfac_pytorch_tpu.ops.covariance import (
                conv2d_a_factor_convgrad,
            )

            return conv2d_a_factor_convgrad(
                a,
                self.kernel_size,
                self.strides,
                self.padding,
                has_bias=self.has_bias,
            )
        if method == 'slices' and self.kernel_size != (1, 1):
            from kfac_pytorch_tpu.ops.covariance import (
                conv2d_a_factor_slices,
            )

            return conv2d_a_factor_slices(
                a,
                self.kernel_size,
                self.strides,
                self.padding,
                has_bias=self.has_bias,
            )
        if self.kernel_size == (1, 1):
            # 1x1 convs need no patch extraction: the "patch matrix" IS
            # the (strided) activation, and the (c, kh, kw) permutation
            # is the identity. A strided slice fuses into the Gram
            # contraction -- zero extra HBM traffic (ResNet-50 is
            # majority 1x1 convs). For k=1, SAME and VALID padding both
            # select positions 0, s, 2s, ...
            sh, sw = self.strides
            a_s = a[:, ::sh, ::sw, :]
            spatial_size = a_s.shape[1] * a_s.shape[2]
            p = a_s.reshape(-1, a_s.shape[-1])
            if self.has_bias:
                p = append_bias_ones(p)
            return self._gram(
                p, scale=float(p.shape[0]) * spatial_size**2,
            )
        # XLA's native patches op lowers ~2x faster on TPU than a
        # slice-stack im2col; its feature order is (c, kh, kw), fixed up
        # afterwards by permuting the SMALL (d, d) covariance instead of
        # the huge patch slab. Spatial/row scalings likewise apply to
        # the output, not the slab.
        pad = _normalize_padding(self.padding)
        if isinstance(pad, str):
            padding = pad
        else:
            padding = list(pad)
        p4 = jax.lax.conv_general_dilated_patches(
            a,
            self.kernel_size,
            self.strides,
            padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        )
        spatial_size = p4.shape[1] * p4.shape[2]
        p = p4.reshape(-1, p4.shape[-1])
        if self.has_bias:
            p = append_bias_ones(p)
        cov = get_cov(p, scale=float(p.shape[0]) * spatial_size**2)
        perm = self._cov_permutation(a.shape[-1])
        return cov[perm][:, perm]

    def get_g_factor(self, g: jax.Array) -> jax.Array:
        # g: (batch, out_h, out_w, out_channels) -- already channels-last.
        g = self._compute_cast(self._maybe_cast(g))
        spatial_size = g.shape[1] * g.shape[2]
        g2 = g.reshape(-1, g.shape[-1]) / spatial_size
        return self._gram(g2)

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

    def get_grad_t(self, grads: Grads) -> jax.Array:
        k = grads['kernel']  # (kh, kw, in, out)
        g = k.reshape(-1, k.shape[-1])  # (kh*kw*in, out) -- no transpose
        if self.has_bias:
            g = jnp.concatenate([g, grads['bias'][None, :]], axis=0)
        return g

    def set_grad_t(self, grads: Grads, matrix: jax.Array) -> Grads:
        out = dict(grads)
        kshape = grads['kernel'].shape
        if self.has_bias:
            out['kernel'] = (
                matrix[:-1].reshape(kshape).astype(grads['kernel'].dtype)
            )
            out['bias'] = matrix[-1].astype(grads['bias'].dtype)
        else:
            out['kernel'] = (
                matrix.reshape(kshape).astype(grads['kernel'].dtype)
            )
        return out
