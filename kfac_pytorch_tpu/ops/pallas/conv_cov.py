"""Fused im2col + covariance Pallas kernel for Conv2d A factors.

The TPU counterpart of the reference's CUDA-adjacent hot path: the conv
activation covariance (``kfac/layers/modules.py:170-178`` of
gpauloski/kfac-pytorch computes ``unfold`` -> scale -> ``a^T a``). A naive
XLA lowering materializes the patch matrix in HBM -- ``kh*kw`` times the
activation bytes -- so the tall-skinny covariance contraction is
bandwidth-bound; on the headline ResNet-20 bench the A factors alone cost
+4.15 ms per capture step (scripts/profile_capture.py). This kernel
streams image tiles through VMEM and accumulates ``P^T P`` on the MXU in
float32, so HBM sees each activation byte exactly once.

Slab assembly insight: in NHWC layout the im2col slab
``slab[n, y, x, (i, j, c)] = x[n, y+i, x+j, c]`` is ``kh*kw`` pure
slice-copies into lane blocks -- no transposes, no gathers::

    slab[:, :, :, k*C:(k+1)*C] = x[:, i:i+oh, j:j+ow, :]

(an earlier revision built the TRANSPOSED slab with a per-window
relayout, which measured slower than XLA at 16 channels). The flattened
``(tn*oh*ow, d0)`` view of the slab then feeds one MXU contraction per
tile.

The homogeneous bias row/column is assembled analytically outside the
kernel from the patch column-sums (``Q = [P, s*1]`` gives cross term
``s * colsum(P) / R`` and corner ``s^2``), avoiding width-1 lane
operations on the TPU.

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
    cov_ref,  # (d0, d0) f32 output
    sum_ref,  # (8, d0) f32 output, row 0 = column sums of P
    slab_ref,  # (TN, oh, ow, d0) scratch: im2col slab
    acc_ref,  # (d0, d0) f32 scratch accumulator
    sacc_ref,  # (8, d0) f32 scratch column-sum accumulator
    *,
    kernel_size: tuple[int, int],
    out_hw: tuple[int, int],
    inv_spatial: float,
    inv_rows: float,
    need_sums: bool,
) -> None:
    kh, kw = kernel_size
    out_h, out_w = out_hw
    tn = x_ref.shape[0]
    c = x_ref.shape[3]
    d0 = kh * kw * c
    rows = tn * out_h * out_w

    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        if need_sums:
            sacc_ref[...] = jnp.zeros_like(sacc_ref)

    x = x_ref[...] * jnp.asarray(inv_spatial, x_ref.dtype)
    # NHWC slab assembly: window (i, j) is a pure slice of the padded
    # tile copied into its lane block. Feature order (kh, kw, c)
    # matches flax kernel flattening.
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            slab_ref[:, :, :, k * c:(k + 1) * c] = jax.lax.slice(
                x,
                (0, i, j, 0),
                (tn, i + out_h, j + out_w, c),
            )
    p = slab_ref[...].reshape(rows, d0)
    acc_ref[...] += jax.lax.dot_general(
        p,
        p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if need_sums:
        sacc_ref[0, :] += jnp.sum(p, axis=0, dtype=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _finish():
        cov = acc_ref[...] * inv_rows
        cov_ref[...] = (cov + cov.T) / 2.0
        if need_sums:
            sum_ref[...] = sacc_ref[...]
        else:
            sum_ref[...] = jnp.zeros_like(sum_ref)


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
        kernel_size/strides/padding: conv geometry (flax conventions);
            only ``strides=(1, 1)`` is supported (the slab slice-copy
            needs unit stride) -- use the XLA helper path otherwise.
        has_bias: append the homogeneous bias coordinate.
        batch_tile: images per grid step (auto-sized for VMEM when None).

    Returns:
        ``(d, d)`` float32 factor, ``d = kh*kw*C + has_bias``.
    """
    if x.ndim != 4:
        raise ValueError(f'Expected NHWC input, got {x.shape}')
    if tuple(strides) != (1, 1):
        raise NotImplementedError(
            'conv2d_a_factor_fused supports strides=(1, 1) only; use the '
            'XLA helper path for strided convolutions.',
        )
    n, h, w, c = x.shape
    kh, kw = kernel_size
    pad = _normalize_padding(padding)
    out_h, out_w = conv2d_out_shape((h, w), kernel_size, strides, padding)
    if pad == 'SAME':
        pad_h = max(out_h - 1 + kh - h, 0)
        pad_w = max(out_w - 1 + kw - w, 0)
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

    d0 = kh * kw * c
    d = d0 + int(has_bias)
    spatial = out_h * out_w
    inv_spatial = 1.0 / spatial

    def _padded_bytes(shape: tuple[int, ...], itemsize: int) -> int:
        # VMEM tiles: minor dim pads to 128 lanes, second minor to 8
        # sublanes; small channel counts cost far more VMEM than their
        # logical size.
        lanes = -(-shape[-1] // 128) * 128
        subl = -(-shape[-2] // 8) * 8 if len(shape) >= 2 else 1
        lead = 1
        for s in shape[:-2]:
            lead *= s
        return lead * subl * lanes * itemsize

    if batch_tile is None:
        def vmem_cost(tile: int) -> int:
            xb = _padded_bytes((tile, hp, wp, c), x.dtype.itemsize)
            slab = _padded_bytes(
                (tile, out_h, out_w, d0), x.dtype.itemsize,
            )
            return 2 * xb + slab

        batch_tile = n
        while batch_tile > 1 and (
            n % batch_tile != 0 or vmem_cost(batch_tile) > 8 * 2**20
        ):
            batch_tile -= 1

    if n % batch_tile != 0:
        raise ValueError(
            f'batch {n} not divisible by batch_tile {batch_tile}',
        )
    grid = (n // batch_tile,)

    kernel = functools.partial(
        _cov_kernel,
        kernel_size=kernel_size,
        out_hw=(out_h, out_w),
        inv_spatial=inv_spatial,
        inv_rows=1.0 / (n * spatial),
        need_sums=has_bias,
    )
    cov0, sums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, hp, wp, c),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((d0, d0), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d0), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d0, d0), jnp.float32),
            jax.ShapeDtypeStruct((8, d0), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, out_h, out_w, d0), x.dtype),
            pltpu.VMEM((d0, d0), jnp.float32),
            pltpu.VMEM((8, d0), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * spatial * d0 * d0,
            bytes_accessed=x.size * x.dtype.itemsize + 4 * d0 * d0,
            transcendentals=0,
        ),
    )(x)
    if not has_bias:
        return cov0
    # Assemble homogeneous bias row/col: Q = [P, inv_spatial * 1].
    rows_total = n * spatial
    cross = sums[0] * (inv_spatial / rows_total)
    corner = jnp.asarray(inv_spatial * inv_spatial, jnp.float32)
    top = jnp.concatenate([cov0, cross[:, None]], axis=1)
    bottom = jnp.concatenate([cross, corner[None]])[None, :]
    return jnp.concatenate([top, bottom], axis=0)
