"""K-FAC state pytrees.

The reference keeps mutable per-layer tensors (possibly comm futures) on
``KFACBaseLayer`` objects (``kfac/layers/base.py:74-128`` of
gpauloski/kfac-pytorch). The TPU-native design is a pure pytree carried
through the training step, in two tiers:

- **Running factors** live per layer at their true dims (``factors`` in
  ``KFACState``). Like the reference (factors are allreduced to every
  rank, ``kfac/layers/base.py:282-336``), they are replicated; the EMA is
  then a set of independent small fused multiply-adds -- measured ~7ms
  cheaper per factor update than updating block-stacked buffers.
- **Second-order state** (eigendecompositions / inverses) is stacked into
  block-batched buckets ``[n_blocks, d, d]`` at inverse-update time: one
  batched ``eigh`` per bucket, sharded over the mesh on the block axis
  (owner-computes), with the KAISA strategy expressed as sharding
  constraints. This is also where the reference distributes its state
  (eigen state lives only on the inverse worker, ``eigen.py:74-85``).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.capture import CapturedFactors

__all__ = [
    'BucketState',
    'KFACState',
    'init_bucket_state',
    'init_layer_factors',
]


@flax.struct.dataclass
class BucketState:
    """Stacked per-bucket second-order state for same-dim layers.

    Fields that do not apply to the configured compute method are ``None``
    (eigen: ``qa/qg/da/dg`` or ``dgda``; inverse: ``a_inv/g_inv``).
    """

    # Eigen method state, [B, d, d] / [B, d].
    qa: jax.Array | None = None
    qg: jax.Array | None = None
    da: jax.Array | None = None
    dg: jax.Array | None = None
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
    """Complete preconditioner state.

    ``factors`` maps layer name -> running (A, G) covariance factors at
    true dims; ``buckets`` holds the block-stacked second-order state.

    ``hyperparams`` holds the schedulable hyperparameters as traced
    scalars (f32, or int32 for the update intervals). Keeping them in the
    state -- not as Python attributes baked into the trace -- is what makes
    ``LambdaParamScheduler`` work under jit: the compiled step reads the
    current values from its inputs every call, so host-side schedule
    mutations take effect without recompilation (the reference instead
    re-reads mutable object fields each Python-level step,
    ``kfac/base_preconditioner.py:160-208`` of gpauloski/kfac-pytorch).
    Hyperparameters passed to the preconditioner as *callables* are not
    stored here; they are resolved from ``steps`` inside the trace.
    """

    steps: jax.Array  # int32 scalar
    factors: dict[str, CapturedFactors]
    buckets: dict[str, BucketState]
    hyperparams: dict[str, jax.Array] = flax.struct.field(
        default_factory=dict,
    )


def _eye_stack(n_blocks: int, dim: int, dtype: Any) -> jax.Array:
    return jnp.broadcast_to(
        jnp.eye(dim, dtype=dtype),
        (n_blocks, dim, dim),
    )


def init_layer_factors(
    a_dim: int,
    g_dim: int,
    factor_dtype: Any = jnp.float32,
) -> CapturedFactors:
    """Identity-initialized running factors for one layer.

    Matches the reference's first-update semantics
    (``kfac/layers/base.py:375-405`` initializes the running average to I
    immediately before the first EMA step).
    """
    return CapturedFactors(
        a=jnp.eye(a_dim, dtype=factor_dtype),
        g=jnp.eye(g_dim, dtype=factor_dtype),
    )


def init_bucket_state(
    n_blocks: int,
    a_dim: int,
    g_dim: int,
    *,
    compute_method: str = 'eigen',
    prediv_eigenvalues: bool = True,
    inv_dtype: Any = jnp.float32,
) -> BucketState:
    """Initialize one bucket's second-order state.

    Starts at the identity decomposition so preconditioning before the
    first inverse update is a benign near-identity map.
    """
    if compute_method == 'eigen':
        qa = _eye_stack(n_blocks, a_dim, inv_dtype)
        qg = _eye_stack(n_blocks, g_dim, inv_dtype)
        if prediv_eigenvalues:
            return BucketState(
                qa=qa,
                qg=qg,
                dgda=jnp.ones((n_blocks, a_dim, g_dim), dtype=inv_dtype),
            )
        return BucketState(
            qa=qa,
            qg=qg,
            da=jnp.ones((n_blocks, a_dim), dtype=inv_dtype),
            dg=jnp.ones((n_blocks, g_dim), dtype=inv_dtype),
        )
    elif compute_method == 'inverse':
        return BucketState(
            a_inv=_eye_stack(n_blocks, a_dim, inv_dtype),
            g_inv=_eye_stack(n_blocks, g_dim, inv_dtype),
        )
    raise ValueError(f'Unknown compute_method={compute_method}')
