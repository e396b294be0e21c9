"""K-FAC state pytrees.

The reference keeps mutable per-layer tensors (possibly comm futures) on
``KFACBaseLayer`` objects (``kfac/layers/base.py:74-128`` of
gpauloski/kfac-pytorch). The TPU-native design is a pure pytree carried
through the training step, with layers of identical factor dimensions
*stacked into block-batched buckets* ``[n_blocks, d, d]``:

- one batched ``eigh``/``cholesky`` per bucket instead of a Python loop of
  small decompositions (MXU-friendly, single dispatch);
- owner-computes distribution becomes a sharding annotation on the block
  axis instead of per-rank control flow;
- the factor "bucketed allreduce" of the reference (``kfac/distributed.py:
  305-385``) is subsumed by the stacked layout: one psum per bucket.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

__all__ = ['BucketState', 'KFACState', 'init_bucket_state']


@flax.struct.dataclass
class BucketState:
    """Stacked per-bucket K-FAC state for layers sharing factor dims.

    Fields that do not apply to the configured compute method are ``None``
    (eigen: ``qa/qg/da/dg`` or ``dgda``; inverse: ``a_inv/g_inv``).
    """

    # Running-average Kronecker factors, shape [B, da, da] / [B, dg, dg].
    a_factor: jax.Array
    g_factor: jax.Array
    # Eigen method state.
    qa: jax.Array | None = None
    qg: jax.Array | None = None
    da: jax.Array | None = None  # [B, da] eigenvalues
    dg: jax.Array | None = None  # [B, dg] eigenvalues
    # Precomputed 1/(outer(da, dg) + damping), [B, da, dg] -- the
    # transposed layout of the reference's prediv_eigenvalues fast path
    # (kfac/layers/eigen.py:345-348), matching the engine's transpose-free
    # (in, out) gradient convention.
    dgda: jax.Array | None = None
    # Inverse method state.
    a_inv: jax.Array | None = None
    g_inv: jax.Array | None = None


@flax.struct.dataclass
class KFACState:
    """Complete preconditioner state: step counter + factor buckets."""

    steps: jax.Array  # int32 scalar
    buckets: dict[str, BucketState]


def _eye_stack(n_blocks: int, dim: int, dtype: Any) -> jax.Array:
    return jnp.broadcast_to(
        jnp.eye(dim, dtype=dtype),
        (n_blocks, dim, dim),
    )


def init_bucket_state(
    n_blocks: int,
    a_dim: int,
    g_dim: int,
    *,
    compute_method: str = 'eigen',
    prediv_eigenvalues: bool = True,
    factor_dtype: Any = jnp.float32,
    inv_dtype: Any = jnp.float32,
) -> BucketState:
    """Initialize one bucket.

    Factors start at the identity, matching the reference's first-update
    semantics (``kfac/layers/base.py:375-405`` initializes the running
    average to I immediately before the first EMA step). Second-order state
    starts at the identity decomposition so preconditioning before the first
    inverse update is a benign near-identity map.
    """
    a_factor = _eye_stack(n_blocks, a_dim, factor_dtype)
    g_factor = _eye_stack(n_blocks, g_dim, factor_dtype)
    if compute_method == 'eigen':
        qa = _eye_stack(n_blocks, a_dim, inv_dtype)
        qg = _eye_stack(n_blocks, g_dim, inv_dtype)
        if prediv_eigenvalues:
            return BucketState(
                a_factor=a_factor,
                g_factor=g_factor,
                qa=qa,
                qg=qg,
                dgda=jnp.ones((n_blocks, a_dim, g_dim), dtype=inv_dtype),
            )
        return BucketState(
            a_factor=a_factor,
            g_factor=g_factor,
            qa=qa,
            qg=qg,
            da=jnp.ones((n_blocks, a_dim), dtype=inv_dtype),
            dg=jnp.ones((n_blocks, g_dim), dtype=inv_dtype),
        )
    elif compute_method == 'inverse':
        return BucketState(
            a_factor=a_factor,
            g_factor=g_factor,
            a_inv=_eye_stack(n_blocks, a_dim, inv_dtype),
            g_inv=_eye_stack(n_blocks, g_dim, inv_dtype),
        )
    raise ValueError(f'Unknown compute_method={compute_method}')
