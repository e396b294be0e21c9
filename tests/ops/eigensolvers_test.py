"""Tests for the TPU-native eigensolvers (Jacobi oracle + warm refine).

The reference relies on LAPACK/cuSOLVER ``torch.linalg.eigh``
(``kfac/layers/eigen.py:295-348`` of gpauloski/kfac-pytorch) and needs no
solver tests of its own; here the solvers are ours, so their numerical
contracts are pinned against exact dense decompositions on realistic
(rank-deficient, cond >= 1e7) covariance spectra. All accuracy metrics
are evaluated in float64 numpy -- device matmuls on some backends round
through bf16 and would pollute the measurement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.ops.jacobi import jacobi_eigh
from kfac_pytorch_tpu.ops.refine import refine_eigh


def make_factors(
    d: int,
    n_blocks: int,
    cond: float = 1e7,
    seed: int = 0,
) -> np.ndarray:
    """Realistic covariance factors: correlated activations' Gram."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_blocks, 4 * d, d)).astype(np.float32)
    mix = rng.standard_normal((d, d)).astype(np.float32) * np.logspace(
        0, -np.log10(cond), d, dtype=np.float32,
    )
    x = x @ mix
    return np.einsum('bni,bnj->bij', x, x) / (4 * d)


def orth_error(v: np.ndarray) -> float:
    v = np.asarray(v, np.float64)
    d = v.shape[-1]
    return float(
        np.max(np.abs(np.einsum('bij,bik->bjk', v, v) - np.eye(d))),
    )


def reconstruction_error(
    a: np.ndarray, v: np.ndarray, w: np.ndarray,
) -> float:
    a = np.asarray(a, np.float64)
    v = np.asarray(v, np.float64)
    w = np.asarray(w, np.float64)
    rec = np.einsum('bij,bj,bkj->bik', v, w, v)
    return float(np.max(np.abs(rec - a)) / np.max(np.abs(a)))


def precond_residual(
    a: np.ndarray, v: np.ndarray, w: np.ndarray, lam: float,
) -> float:
    """``max |(A + lam I)(V diag(1/(w+lam)) V^T) - I|``.

    The metric that matters for K-FAC: how well the decomposition inverts
    the damped factor.
    """
    a = np.asarray(a, np.float64)
    v = np.asarray(v, np.float64)
    w = np.asarray(w, np.float64)
    d = a.shape[-1]
    p = np.einsum('bij,bj,bkj->bik', v, 1.0 / (np.maximum(w, 0) + lam), v)
    return float(
        np.max(
            np.abs(
                np.einsum('bij,bjk->bik', a + lam * np.eye(d), p)
                - np.eye(d),
            ),
        ),
    )


class TestJacobiEigh:
    """Two-sided Jacobi: the exact-solver oracle (fixed sweeps)."""

    @pytest.mark.parametrize('d', [4, 16, 65, 128])
    def test_cold_exactness(self, d: int) -> None:
        a = make_factors(d, 3)
        v, w = jacobi_eigh(jnp.asarray(a), sweeps=10)
        assert orth_error(v) < 1e-4
        assert reconstruction_error(a, v, w) < 1e-4
        lam = 3e-3 * float(np.trace(a[0]) / d)
        assert precond_residual(a, v, w, lam) < 1e-3

    def test_eigenvalues_match_lapack(self) -> None:
        a = make_factors(64, 3)
        v, w = jacobi_eigh(jnp.asarray(a), sweeps=12)
        w_ref = np.linalg.eigvalsh(np.asarray(a, np.float64))
        scale = np.max(np.abs(w_ref))
        np.testing.assert_allclose(
            np.sort(np.asarray(w), axis=-1), w_ref, atol=2e-6 * scale,
        )

    def test_warm_start_fewer_sweeps(self) -> None:
        a = make_factors(48, 2)
        v, _ = jacobi_eigh(jnp.asarray(a), sweeps=12)
        a2 = 0.95 * a + 0.05 * make_factors(48, 2, seed=1)
        v2, w2 = jacobi_eigh(jnp.asarray(a2), v0=v, sweeps=3)
        assert orth_error(v2) < 1e-4
        assert reconstruction_error(a2, v2, w2) < 1e-4

    def test_single_matrix_and_odd_dims(self) -> None:
        a = make_factors(7, 1)[0]
        v, w = jacobi_eigh(jnp.asarray(a), sweeps=10)
        rec = np.asarray(v) @ np.diag(np.asarray(w)) @ np.asarray(v).T
        np.testing.assert_allclose(rec, a, atol=1e-5 * np.max(np.abs(a)))

    def test_orthogonality_survives_rank_deficiency(self) -> None:
        # Exactly rank-deficient factor: the failure mode that ruled out
        # one-sided (Hestenes) Jacobi.
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 8, 32)).astype(np.float32)
        a = np.einsum('bni,bnj->bij', x, x) / 8  # rank 8 of 32
        v, w = jacobi_eigh(jnp.asarray(a), sweeps=10)
        assert orth_error(v) < 1e-4
        assert reconstruction_error(a, v, w) < 1e-4


class TestRefineEigh:
    """Warm refinement: the in-loop TPU refresh path."""

    @pytest.mark.parametrize('d', [33, 64, 145])
    def test_steady_state_refresh(self, d: int) -> None:
        """Mature factors + 10 EMA updates of drift: the common case."""
        a = make_factors(d, 3)
        w0, v0 = np.linalg.eigh(np.asarray(a, np.float64))
        drift = 0.9 * a + 0.1 * make_factors(d, 3, seed=1)
        for _ in range(10):
            a = 0.95 * a + 0.05 * drift
        lam = 3e-3 * float(np.trace(a[0]) / d)
        v, w = refine_eigh(
            jnp.asarray(a), jnp.asarray(v0.astype(np.float32)), lam,
            n_iter=3,
        )
        assert orth_error(v) < 1e-5
        assert precond_residual(a, v, w, lam) < 3e-2
        # and it must beat the stale basis by a wide margin
        w_stale = np.maximum(
            np.einsum('bji,bjk,bki->bi', v0, np.asarray(a, np.float64), v0),
            0,
        )
        assert precond_residual(a, v, w, lam) < 0.2 * precond_residual(
            a, v0, w_stale, lam,
        )

    def test_first_refresh_from_identity(self) -> None:
        """Identity basis + identity-EMA factors: the worst (first) case."""
        d = 96
        a = np.broadcast_to(
            np.eye(d, dtype=np.float32), (3, d, d),
        ).copy()
        c = make_factors(d, 3)
        c = c / np.trace(c, axis1=-2, axis2=-1)[:, None, None] * d
        for _ in range(10):
            a = 0.95 * a + 0.05 * c
        lam = 3e-3 * float(np.trace(a[0]) / d)
        v0 = np.broadcast_to(np.eye(d, dtype=np.float32), (3, d, d))
        v, w = refine_eigh(jnp.asarray(a), jnp.asarray(v0), lam, n_iter=3)
        assert orth_error(v) < 1e-5
        assert precond_residual(a, v, w, lam) < 0.15

    def test_stability_under_large_drift(self) -> None:
        """A completely wrong warm basis must not diverge (clamped X +
        CholeskyQR keep V orthonormal no matter what)."""
        d = 64
        a = make_factors(d, 2)
        rng = np.random.default_rng(3)
        q, _ = np.linalg.qr(rng.standard_normal((2, d, d)))
        v, w = refine_eigh(
            jnp.asarray(a), jnp.asarray(q.astype(np.float32)),
            3e-3 * float(np.trace(a[0]) / d), n_iter=5,
        )
        assert orth_error(v) < 1e-5
        assert np.all(np.isfinite(np.asarray(v)))
        assert np.all(np.isfinite(np.asarray(w)))

    def test_identity_padding_blocks_stay_identity(self) -> None:
        """Bucket padding embeds small factors with identity tails; the
        refinement must leave the padded subspace alone."""
        d, dpad = 24, 32
        small = make_factors(d, 1)[0]
        a = np.eye(dpad, dtype=np.float32)
        a[:d, :d] = small
        w0, v0 = np.linalg.eigh(small.astype(np.float64))
        vpad = np.eye(dpad, dtype=np.float32)
        vpad[:d, :d] = v0.astype(np.float32)
        a2 = a.copy()
        a2[:d, :d] = 0.95 * small + 0.05 * make_factors(d, 1, seed=2)[0]
        lam = 3e-3 * float(np.trace(a2) / dpad)
        v, w = refine_eigh(
            jnp.asarray(a2[None]), jnp.asarray(vpad[None]), lam, n_iter=3,
        )
        assert orth_error(v) < 1e-5
        assert precond_residual(a2[None], v, w, lam) < 3e-2


class TestFinalOrth:
    """Adaptive final orthonormalization (final_orth='auto'): one
    Newton-Schulz step at steady state (matmul-only -- skips the
    latency-bound cholesky/triangular_solve), exact CholeskyQR on cold
    starts. Branch selection is pinned by equality with the forced
    variants."""

    @staticmethod
    def _steady(d: int = 96) -> tuple[np.ndarray, np.ndarray, float]:
        a = make_factors(d, 3)
        _, v0 = np.linalg.eigh(np.asarray(a, np.float64))
        drift = 0.9 * a + 0.1 * make_factors(d, 3, seed=1)
        for _ in range(10):
            a = 0.95 * a + 0.05 * drift
        lam = 3e-3 * float(np.trace(a[0]) / d)
        return a, v0.astype(np.float32), lam

    def test_steady_state_takes_ns_branch(self) -> None:
        a, v0, lam = self._steady()
        v_auto, w_auto = refine_eigh(
            jnp.asarray(a), jnp.asarray(v0), lam, n_iter=2,
            final_orth='auto',
        )
        v_ns, w_ns = refine_eigh(
            jnp.asarray(a), jnp.asarray(v0), lam, n_iter=2,
            final_orth='ns',
        )
        np.testing.assert_array_equal(np.asarray(v_auto), np.asarray(v_ns))
        np.testing.assert_array_equal(np.asarray(w_auto), np.asarray(w_ns))
        assert orth_error(v_auto) < 1e-5
        assert precond_residual(a, v_auto, w_auto, lam) < 3e-2

    def test_cold_start_takes_cholqr_branch(self) -> None:
        d = 64
        a = make_factors(d, 2)
        rng = np.random.default_rng(7)
        q, _ = np.linalg.qr(rng.standard_normal((2, d, d)))
        q = q.astype(np.float32)
        lam = 3e-3 * float(np.trace(a[0]) / d)
        v_auto, w_auto = refine_eigh(
            jnp.asarray(a), jnp.asarray(q), lam, n_iter=2,
            final_orth='auto',
        )
        v_cqr, w_cqr = refine_eigh(
            jnp.asarray(a), jnp.asarray(q), lam, n_iter=2,
            final_orth='cholqr',
        )
        np.testing.assert_array_equal(np.asarray(v_auto), np.asarray(v_cqr))
        np.testing.assert_array_equal(np.asarray(w_auto), np.asarray(w_cqr))
        assert orth_error(v_auto) < 1e-5

    def test_cholqr_matches_legacy_contract(self) -> None:
        a, v0, lam = self._steady()
        v, w = refine_eigh(
            jnp.asarray(a), jnp.asarray(v0), lam, n_iter=3,
            final_orth='cholqr',
        )
        assert orth_error(v) < 1e-5
        assert precond_residual(a, v, w, lam) < 3e-2

    def test_unknown_final_orth_raises(self) -> None:
        a, v0, lam = self._steady(d=16)
        with pytest.raises(ValueError, match='final_orth'):
            refine_eigh(
                jnp.asarray(a), jnp.asarray(v0), lam, n_iter=1,
                final_orth='qr',
            )


def test_refine_mixed_precision_matches_high() -> None:
    """'mixed' (single-bf16-pass rotations) must track the 'high'
    refresh on realistic spectra. On CPU all precisions lower to f32 so
    this pins shape/flow; the accuracy ladder is measured on-chip and
    recorded in the refine_eigh docstring."""
    d = 96
    a = make_factors(d, 3)
    w0, v0 = np.linalg.eigh(np.asarray(a, np.float64))
    drift = 0.9 * a + 0.1 * make_factors(d, 3, seed=1)
    for _ in range(10):
        a = 0.95 * a + 0.05 * drift
    lam = 3e-3 * float(np.trace(a[0]) / d)
    v, w = refine_eigh(
        jnp.asarray(a), jnp.asarray(v0.astype(np.float32)), lam,
        n_iter=2, precision='mixed',
    )
    assert orth_error(v) < 1e-5
    assert precond_residual(a, v, w, lam) < 3e-2
