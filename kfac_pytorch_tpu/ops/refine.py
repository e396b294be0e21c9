"""Warm-started eigendecomposition refinement -- the TPU eigen-path solver.

Problem: XLA's TPU ``eigh`` (QDWH spectral divide & conquer) costs
47-77 ms for a ResNet-20-sized set of K-FAC factor buckets *regardless of
conditioning or shift* (measured on-chip; docs/PERF_NOTES.md) -- it is
latency-bound in its recursion, not FLOP-bound. A fixed-sweep batched
Jacobi (``ops/jacobi.py``) is exact but element-wise: its O(d) rounds per
sweep of VPU work measure ~300 ms/sweep for the same buckets in pure JAX.
Neither can sit inside the training loop.

Observation: inside the loop the eigendecomposition is never cold. K-FAC
factors are slow EMAs (``factor_decay=0.95``) and the engine already
carries the previous refresh's eigenbasis (``qa``/``qg`` in
``BucketState``). Refreshing an *almost-diagonalizing* basis is a
perturbation problem, solvable with a handful of batched matmuls -- MXU
work, microseconds on TPU.

Algorithm (``n_iter`` fixed iterations, all ``[B, d, d]`` batched):

1. ``B = V^T A V`` -- near-diagonal; split ``B = diag(w) + E``.
2. First-order rotation update toward annihilating ``E``:
   ``X_ij = E_ij (w_j - w_i) / ((w_j - w_i)^2 + mu_ij^2)`` --
   the Tikhonov-regularized Jacobi/Davidson correction. ``X`` is
   antisymmetric (``I + X ~ exp(X)`` is a rotation to first order).
   ``mu_ij = 0.1 (|w_i| + |w_j|) + 0.5 * damping`` suppresses rotations
   inside near-degenerate clusters and below the damping floor: both are
   preconditioner-irrelevant (``1/(w + damping)`` is flat there), and
   resolving them is exactly the ill-posed part of the problem. The
   entry clamp bounds the step when the drift is locally large.
3. ``V <- V (I + X)``, re-orthonormalized at the end. A Newton-Schulz
   orthonormality step runs after the FIRST rotation only: that is where
   ``X`` is largest (cold starts); at steady state ``X`` is tiny and the
   O(||X||^2) drift over the remaining iterations sits below the final
   repair range (measured: preconditioner residual unchanged at 3
   decimal places, ~25% fewer d^3 matmuls per refresh). The FINAL
   orthonormalization is adaptive (``final_orth='auto'``): the Gram
   ``V^T V`` is measured on-device and a ``lax.cond`` picks one
   Newton-Schulz step (matmul-only; every steady-state refresh) or
   exact CholeskyQR (``V <- V L^-T, L = chol(V^T V)``; cold starts and
   large drift, where NS would not converge) -- cholesky/
   triangular_solve are latency-bound on TPU, so skipping them at
   steady state removes the dominant refresh cost at transformer
   factor sizes.

Accuracy, measured against exact eigh on realistic rank-deficient
(cond >= 1e7) factors with 10 EMA updates of drift between refreshes:
preconditioner residual ``max |(A + damping I) P - I|`` is ~8e-3 at
``n_iter=2-3`` (stale basis: ~0.6), and V stays orthonormal to ~4e-7.
The identity-initialized *first* refresh is the worst case at ~3-6e-2,
recovered by the following refresh; cold starts outside the training
loop (checkpoint load) should use exact ``eigh`` instead.

The reference implementation has no analogue -- it can afford cuSOLVER's
``torch.linalg.eigh`` every refresh (``kfac/layers/eigen.py:295-348`` of
gpauloski/kfac-pytorch); this module is the TPU-native answer to the
same requirement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ['refine_eigh']

@functools.partial(
    jax.jit, static_argnames=('n_iter', 'precision', 'final_orth'),
)
def refine_eigh(
    a: jax.Array,
    v0: jax.Array,
    damping: jax.Array | float,
    n_iter: int = 3,
    precision: str = 'highest',
    final_orth: str = 'auto',
) -> tuple[jax.Array, jax.Array]:
    """Refresh an eigendecomposition from a warm basis.

    Args:
        a: ``[B, d, d]`` symmetric PSD factor batch.
        v0: ``[B, d, d]`` orthonormal warm start (previous eigenbasis;
            identity at the very first refresh).
        damping: preconditioner damping (absolute, like the reference's
            ``damping``); used only to scale the rotation regularizer.
        n_iter: fixed refinement iterations (2-3 suffice at K-FAC's
            refresh cadence).
        precision: matmul precision for the ~6 d^3 contractions per
            iteration. 'highest' emulates f32 (6 bf16 MXU passes);
            'high' (bf16x3) halves the refresh cost; 'mixed' keeps the
            diagnostic ``B = V^T A V`` (and the final CholeskyQR/Ritz
            contractions) at 'high' but applies rotations and Newton-
            Schulz in a single bf16 pass. Measured on-chip on realistic
            rank-deficient factors: 'high' leaves the preconditioner
            residual unchanged vs 'highest' (~8e-3, truncation-
            dominated; orthonormality 1e-7 -> 4e-5, inside the final
            CholeskyQR's repair range), and 'mixed' matches 'high'
            (res 1.16e-2/9.7e-3/7.7e-3 at d=145/512/1153) at ~30% less
            MXU work. Full-'default' is NOT safe: the bf16 diagnostic
            degrades the residual 5-10x (measured).
        final_orth: how the exact orthonormalization at the end is done.
            'cholqr' always runs CholeskyQR -- exact, but ``cholesky`` +
            ``triangular_solve`` are LATENCY-bound on TPU (~9-10 ms at
            d~2048 batched, several ms even at d=512; docs/PERF_NOTES.md)
            and dominate the refresh at transformer factor sizes. 'auto'
            (default) measures the Gram residual ``e = max |V^T V - I|``
            (the Gram is computed either way) and branches with
            ``lax.cond``: when ``e < 2e-3`` -- every steady-state refresh;
            one Newton-Schulz step at the diagnostic precision suffices
            (``e -> 0.75 e^2 <= 3e-6``, below the orthonormality
            contract) -- it runs matmul-only NS; otherwise (cold starts,
            large drift) it runs the exact CholeskyQR. 'ns' forces the
            NS branch (testing only: unsafe for cold starts).

    Returns:
        ``(v, w)``: refined orthonormal basis and Ritz values
        ``w_i = v_i^T a v_i`` (clamped >= 0), both f32, unsorted.
    """
    # 'mixed': accuracy-critical contractions (the diagnostic B, the
    # final CholeskyQR Gram and Ritz values) at 'high'; rotation apply +
    # Newton-Schulz at single-pass bf16 (their error is pure basis
    # drift, repaired by the final CholeskyQR).
    base = 'high' if precision == 'mixed' else precision
    _HI = dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision(base),
    )
    _LO = _HI if precision != 'mixed' else dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision('default'),
    )
    a = a.astype(jnp.float32)
    a = (a + jnp.swapaxes(a, -1, -2)) * 0.5
    v = v0.astype(jnp.float32)
    d_dim = a.shape[-1]
    eye = jnp.eye(d_dim, dtype=jnp.float32)
    lam = jnp.asarray(damping, jnp.float32)

    for it in range(n_iter):
        b = jnp.einsum('bji,bjk,bkl->bil', v, a, v, **_HI)
        b = (b + jnp.swapaxes(b, -1, -2)) * 0.5
        w = jnp.diagonal(b, axis1=-2, axis2=-1)
        e = b - w[..., None] * eye
        gap = w[:, None, :] - w[:, :, None]
        mu = 0.1 * (jnp.abs(w[:, None, :]) + jnp.abs(w[:, :, None])) + (
            0.5 * lam
        )
        x = e * gap / (gap * gap + mu * mu)
        x = jnp.clip(x, -0.7, 0.7)
        # Spectral safety: scale X so ||X||_F <= 0.9. X is exactly
        # antisymmetric, so (I+X)^T(I+X) = I - X^2 and the Newton-Schulz
        # correction below converges iff ||X^2|| < 1. Steady-state X is
        # tiny (the cap never binds); it only softens cold starts.
        fro = jnp.sqrt(
            jnp.sum(x * x, axis=(-2, -1), keepdims=True),
        )
        x = x / jnp.maximum(1.0, fro / 0.9)
        v = v + jnp.einsum('bij,bjk->bik', v, x, **_LO)
        if it == 0:
            # One Newton-Schulz step restores orthonormality to
            # O(||X^2||^2) using matmuls only -- cholesky/triangular_
            # solve are latency-bound on TPU, so the exact CholeskyQR
            # runs ONCE at the end. Only the first rotation needs it:
            # X is largest there (cold starts / large drift); later
            # iterations' drift is repaired by the final CholeskyQR
            # (A/B on the test spectra: residual unchanged, ~25% fewer
            # d^3 matmuls per refresh).
            vtv = jnp.einsum('bji,bjk->bik', v, v, **_LO)
            v = 1.5 * v - 0.5 * jnp.einsum('bij,bjk->bik', v, vtv, **_LO)
    vtv = jnp.einsum('bji,bjk->bik', v, v, **_HI)

    def _cholqr(vv: jax.Array) -> jax.Array:
        ell = jnp.linalg.cholesky(vtv)
        return jax.lax.linalg.triangular_solve(
            ell, vv, left_side=False, lower=True, transpose_a=True,
        )

    def _ns(vv: jax.Array) -> jax.Array:
        # One Newton-Schulz orthonormalization step at the diagnostic
        # precision: VtV = I + E maps to I - 0.75 E^2 + O(E^3). Matmul-
        # only -- replaces the latency-bound cholesky/triangular_solve
        # pair when E is already small (every steady-state refresh).
        return 1.5 * vv - 0.5 * jnp.einsum('bij,bjk->bik', vv, vtv, **_HI)

    if final_orth == 'cholqr':
        v = _cholqr(v)
    elif final_orth == 'ns':
        v = _ns(v)
    elif final_orth == 'auto':
        gram_err = jnp.max(jnp.abs(vtv - eye))
        v = jax.lax.cond(gram_err < 2e-3, _ns, _cholqr, v)
    else:
        raise ValueError(f'unknown final_orth: {final_orth!r}')
    av = jnp.einsum('bij,bjk->bik', a, v, **_HI)
    w = jnp.maximum(jnp.sum(v * av, axis=-2), 0.0)
    return v, w
