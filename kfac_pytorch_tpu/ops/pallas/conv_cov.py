"""Fused im2col + covariance Pallas kernel for Conv2d A factors.

The TPU counterpart of the reference's CUDA-adjacent hot path: the conv
activation covariance (``kfac/layers/modules.py:170-178`` of
gpauloski/kfac-pytorch computes ``unfold`` -> scale -> ``a^T a``). A naive
XLA lowering materializes the patch matrix in HBM -- ``kh*kw`` times the
activation bytes -- and (when fused into a large training graph) can
degrade the covariance matmul badly. This kernel streams image tiles
through VMEM, forms the patch slab on-chip, and accumulates ``P^T P`` on
the MXU in float32, so HBM sees each activation byte exactly once.

Semantics exactly match ``Conv2dHelper.get_a_factor``:
``cov = Q^T Q / R`` where ``Q = [patches, 1] / spatial_size`` and
``R = batch * out_h * out_w``, symmetrized.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kfac_pytorch_tpu.ops.covariance import _normalize_padding
from kfac_pytorch_tpu.ops.covariance import conv2d_out_shape

__all__ = ['conv2d_a_factor_fused']


def _cov_kernel(
    x_ref,  # (TN, Hp, Wp, C) VMEM input tile (already padded)
    out_ref,  # (d, d) f32 output (incl. bias row/col when has_bias)
    patch_ref,  # (TN*oh*ow, d) VMEM scratch patch slab
    acc_ref,  # (d, d) f32 scratch accumulator
    *,
    kernel_size: tuple[int, int],
    strides: tuple[int, int],
    out_hw: tuple[int, int],
    has_bias: bool,
    inv_spatial: float,
    inv_rows: float,
) -> None:
    kh, kw = kernel_size
    sh, sw = strides
    out_h, out_w = out_hw
    tn = x_ref.shape[0]
    c = x_ref.shape[3]
    rows = tn * out_h * out_w
    d0 = kh * kw * c

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...] * jnp.asarray(inv_spatial, x_ref.dtype)
    # Build the patch slab in VMEM: column block (i*kw+j) holds the
    # (kh=i, kw=j) shifted window -> feature order (kh, kw, c), matching
    # flax kernel flattening. Each slice reshape only collapses leading
    # dims (Mosaic-supported shape cast). The homogeneous bias coordinate
    # is a constant last column.
    for i in range(kh):
        for j in range(kw):
            s = jax.lax.slice(
                x,
                (0, i, j, 0),
                (tn, i + (out_h - 1) * sh + 1, j + (out_w - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            k = i * kw + j
            patch_ref[:, k * c:(k + 1) * c] = s.reshape(rows, c)
    if has_bias:
        patch_ref[:, d0:d0 + 1] = jnp.full(
            (rows, 1), inv_spatial, patch_ref.dtype,
        )
    p = patch_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        p,
        p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _finish():
        cov = acc_ref[...] * inv_rows
        out_ref[...] = (cov + cov.T) / 2.0


def conv2d_a_factor_fused(
    x: jax.Array,
    kernel_size: tuple[int, int],
    strides: tuple[int, int] = (1, 1),
    padding: str | int | Sequence[int] | Sequence[tuple[int, int]] = 'SAME',
    has_bias: bool = True,
    batch_tile: int | None = None,
) -> jax.Array:
    """Conv2d A factor without materializing patches in HBM.

    Args:
        x: NHWC activations.
        kernel_size/strides/padding: conv geometry (flax conventions).
        has_bias: append the homogeneous bias coordinate.
        batch_tile: images per grid step (auto-sized for ~4MB of VMEM
            patch slab when None).

    Returns:
        ``(d, d)`` float32 factor, ``d = kh*kw*C + has_bias``.
    """
    if x.ndim != 4:
        raise ValueError(f'Expected NHWC input, got {x.shape}')
    n, h, w, c = x.shape
    kh, kw = kernel_size
    pad = _normalize_padding(padding)
    out_h, out_w = conv2d_out_shape((h, w), kernel_size, strides, padding)
    if pad == 'SAME':
        sh, sw = strides
        pad_h = max((out_h - 1) * sh + kh - h, 0)
        pad_w = max((out_w - 1) * sw + kw - w, 0)
        pad = (
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
        )
    elif pad == 'VALID':
        pad = ((0, 0), (0, 0))
    (ph0, ph1), (pw0, pw1) = pad
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    hp, wp = x.shape[1], x.shape[2]

    d = kh * kw * c + int(has_bias)
    spatial = out_h * out_w

    if batch_tile is None:
        # target <= ~4MB patch slab per step
        slab_row_bytes = d * x.dtype.itemsize
        batch_tile = max(1, (4 * 2**20) // max(spatial * slab_row_bytes, 1))
        batch_tile = min(batch_tile, n)
        while n % batch_tile != 0:
            batch_tile -= 1

    if n % batch_tile != 0:
        raise ValueError(
            f'batch {n} not divisible by batch_tile {batch_tile}',
        )
    grid = (n // batch_tile,)

    kernel = functools.partial(
        _cov_kernel,
        kernel_size=kernel_size,
        strides=strides,
        out_hw=(out_h, out_w),
        has_bias=has_bias,
        inv_spatial=1.0 / spatial,
        inv_rows=1.0 / (n * spatial),
    )
    d0 = kh * kw * c
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, hp, wp, c),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (d, d),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile * out_h * out_w, d), x.dtype),
            pltpu.VMEM((d, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * spatial * d * d,
            bytes_accessed=x.size * x.dtype.itemsize + 4 * d * d,
            transcendentals=0,
        ),
    )(x)
