"""Second-order curvature math: EMA, eigendecomposition, inverse, precondition.

TPU-native counterpart of the reference's per-layer curvature computations
(``kfac/layers/base.py:375-405``, ``kfac/layers/eigen.py:295-385``,
``kfac/layers/inverse.py:186-234`` of gpauloski/kfac-pytorch).

Everything is a pure function over arrays, designed to be ``vmap``-ed over
block-batched factors (``[n_blocks, d, d]``) so the eigendecompositions can
be sharded across a device mesh with a single sharding constraint
(owner-computes semantics without per-rank control flow).

Numerical contract (mirrors the reference):

- Decompositions/inverses run in float32 regardless of training dtype
  (``inv_dtype`` discipline, reference ``eigen.py:310-321``).
- Eigenvalues are clamped at >= 0 (factors are PSD up to roundoff).
- ``precondition_eigen``:  ``Qg [(Qg^T grad Qa) / (dg da^T + damping)] Qa^T``.
- ``precondition_inverse``: ``(G + damping I)^-1 grad (A + damping I)^-1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    'ema_update',
    'eigh_factor',
    'damped_inverse',
    'precondition_eigen',
    'precondition_inverse',
    'kl_clip_scale',
]


def ema_update(
    running: jax.Array,
    batch_value: jax.Array,
    decay: float | jax.Array,
) -> jax.Array:
    """Running average update ``running <- decay*running + (1-decay)*new``.

    The reference initializes the running factor to the identity on first
    update (``kfac/layers/base.py:375-405``); here state is initialized to
    the identity at ``init`` time so the first call is identical.
    """
    return decay * running + (1.0 - decay) * batch_value


def eigh_factor(
    factor: jax.Array,
    inv_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Symmetric eigendecomposition of a (batched) Kronecker factor.

    Upcasts to float32, clamps eigenvalues at zero, and casts the results to
    ``inv_dtype`` (reference ``kfac/layers/eigen.py:295-321``).

    Args:
        factor: ``(..., d, d)`` symmetric PSD factor (may be block-batched).
        inv_dtype: storage dtype for the decomposition.

    Returns:
        ``(q, d)`` where ``q`` is ``(..., d, d)`` eigenvectors (columns) and
        ``d`` is ``(..., d)`` eigenvalues clamped at >= 0.
    """
    evals, evecs = jnp.linalg.eigh(factor.astype(jnp.float32))
    evals = jnp.maximum(evals, 0.0)
    return evecs.astype(inv_dtype), evals.astype(inv_dtype)


def damped_inverse(
    factor: jax.Array,
    damping: float | jax.Array,
    inv_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Damped explicit inverse ``(F + damping*I)^-1`` in float32.

    Mirrors reference ``kfac/layers/inverse.py:186-213``. ``factor`` may be
    block-batched ``(..., d, d)``. Uses a Cholesky-based solve (the factor
    plus damping is SPD), which lowers to MXU-friendly triangular ops on TPU
    rather than general LU pivoting.
    """
    f = factor.astype(jnp.float32)
    d = f.shape[-1]
    eye = jnp.eye(d, dtype=jnp.float32)
    damped = f + damping * eye
    # cho_solve is significantly faster than generic inv on TPU for SPD
    # matrices and is batch-friendly.
    chol = jax.scipy.linalg.cholesky(damped, lower=True)
    inv = jax.scipy.linalg.cho_solve(
        (chol, True),
        jnp.broadcast_to(eye, damped.shape),
    )
    return inv.astype(inv_dtype)


def precondition_eigen(
    grad: jax.Array,
    qa: jax.Array,
    qg: jax.Array,
    da: jax.Array | None,
    dg: jax.Array | None,
    damping: float | jax.Array,
    dgda: jax.Array | None = None,
) -> jax.Array:
    """Precondition a gradient matrix in the Kronecker eigenbasis.

    ``ghat = Qg [(Qg^T grad Qa) / (dg da^T + damping)] Qa^T``

    Mirrors reference ``kfac/layers/eigen.py:350-385``. If ``dgda`` (the
    precomputed elementwise reciprocal ``1/(dg da^T + damping)``) is given it
    is used directly (the ``prediv_eigenvalues`` fast path).

    Args:
        grad: ``(out, in)`` gradient matrix (bias column already appended).
        qa: ``(in, in)`` eigenvectors of A.
        qg: ``(out, out)`` eigenvectors of G.
        da: ``(in,)`` eigenvalues of A (ignored if dgda given).
        dg: ``(out,)`` eigenvalues of G (ignored if dgda given).
        damping: Tikhonov damping.
        dgda: optional precomputed ``1/(outer(dg, da) + damping)``.

    Returns:
        Preconditioned gradient with the same shape/dtype as ``grad``.
    """
    grad_dtype = grad.dtype
    g32 = grad.astype(qa.dtype)
    v1 = jax.lax.dot_general(
        jax.lax.dot_general(
            qg,
            g32,
            dimension_numbers=(((0,), (0,)), ((), ())),  # qg^T @ grad
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
        qa,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
    )
    if dgda is not None:
        v2 = v1 * dgda
    else:
        assert da is not None and dg is not None
        v2 = v1 / (jnp.outer(dg, da) + damping)
    out = jax.lax.dot_general(
        jax.lax.dot_general(
            qg,
            v2,
            dimension_numbers=(((1,), (0,)), ((), ())),  # qg @ v2
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
        qa,
        dimension_numbers=(((1,), (1,)), ((), ())),  # ... @ qa^T
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(grad_dtype)


def precondition_inverse(
    grad: jax.Array,
    a_inv: jax.Array,
    g_inv: jax.Array,
) -> jax.Array:
    """Precondition with explicit damped inverses: ``g_inv @ grad @ a_inv``.

    Mirrors reference ``kfac/layers/inverse.py:215-234``.
    """
    grad_dtype = grad.dtype
    g32 = grad.astype(a_inv.dtype)
    out = jax.lax.dot_general(
        jax.lax.dot_general(
            g_inv,
            g32,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ),
        a_inv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(grad_dtype)


def kl_clip_scale(
    vg_sum: jax.Array,
    kl_clip: float | jax.Array,
) -> jax.Array:
    """Gradient scale ``min(1, sqrt(kl_clip / |vg_sum|))``.

    ``vg_sum = sum_layers sum(precond_grad * grad * lr^2)``. A zero
    ``vg_sum`` yields scale 1.0. Mirrors reference
    ``kfac/base_preconditioner.py:411-435`` but stays on-device (no
    ``.item()`` host sync -- the reference's per-step sync point is removed).
    """
    vg = jnp.abs(vg_sum)
    safe = jnp.where(vg == 0.0, 1.0, vg)
    scale = jnp.minimum(1.0, jnp.sqrt(kl_clip / safe))
    return jnp.where(vg == 0.0, 1.0, scale)
