"""Unit tests for second-order curvature math."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kfac_pytorch_tpu.ops.curvature import damped_inverse
from kfac_pytorch_tpu.ops.curvature import eigh_factor
from kfac_pytorch_tpu.ops.curvature import ema_update
from kfac_pytorch_tpu.ops.curvature import kl_clip_scale
from kfac_pytorch_tpu.ops.curvature import precondition_eigen
from kfac_pytorch_tpu.ops.curvature import precondition_inverse


def _random_psd(key: jax.Array, dim: int) -> jax.Array:
    m = jax.random.normal(key, (dim, dim))
    return m @ m.T / dim + 0.1 * jnp.eye(dim)


def test_ema_update() -> None:
    running = jnp.eye(3)
    new = 2.0 * jnp.ones((3, 3))
    out = ema_update(running, new, 0.95)
    expected = 0.95 * np.eye(3) + 0.05 * 2.0 * np.ones((3, 3))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_eigh_factor_reconstruction() -> None:
    key = jax.random.PRNGKey(0)
    f = _random_psd(key, 8)
    q, d = eigh_factor(f)
    recon = (q * d[None, :]) @ q.T
    np.testing.assert_allclose(np.asarray(recon), np.asarray(f), atol=1e-2)
    # orthogonality is the tighter invariant in f32
    np.testing.assert_allclose(
        np.asarray(q.T @ q),
        np.eye(8),
        atol=1e-3,
    )
    assert (np.asarray(d) >= 0).all()


def test_eigh_factor_batched() -> None:
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    fs = jnp.stack([_random_psd(k, 6) for k in keys])
    q, d = eigh_factor(fs)
    assert q.shape == (4, 6, 6)
    assert d.shape == (4, 6)
    recon = jnp.einsum('bij,bj,bkj->bik', q, d, q)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(fs), atol=1e-2)


def test_damped_inverse() -> None:
    key = jax.random.PRNGKey(2)
    f = _random_psd(key, 8)
    inv = damped_inverse(f, 0.1)
    expected = np.linalg.inv(np.asarray(f) + 0.1 * np.eye(8))
    np.testing.assert_allclose(np.asarray(inv), expected, atol=1e-4)

    # batched
    fs = jnp.stack([f, 2.0 * f])
    invs = damped_inverse(fs, 0.1)
    np.testing.assert_allclose(np.asarray(invs[0]), expected, atol=1e-4)


def test_precondition_eigen_is_kronecker_solve() -> None:
    """Eigen preconditioning == (G (x) A + damping I)^-1 vec(grad)."""
    key = jax.random.PRNGKey(3)
    ka, kg, kw = jax.random.split(key, 3)
    a_fac = _random_psd(ka, 4)
    g_fac = _random_psd(kg, 3)
    grad = jax.random.normal(kw, (3, 4))
    damping = 0.01

    qa, da = eigh_factor(a_fac)
    qg, dg = eigh_factor(g_fac)
    out = precondition_eigen(grad, qa, qg, da, dg, damping)

    big = np.kron(np.asarray(g_fac), np.asarray(a_fac)) + damping * np.eye(12)
    expected = np.linalg.solve(big, np.asarray(grad).reshape(-1))
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1),
        expected,
        atol=1e-4,
    )

    # prediv path must agree exactly with the explicit eigenvalue path
    dgda = 1.0 / (jnp.outer(dg, da) + damping)
    out2 = precondition_eigen(grad, qa, qg, None, None, damping, dgda=dgda)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_precondition_inverse() -> None:
    key = jax.random.PRNGKey(4)
    ka, kg, kw = jax.random.split(key, 3)
    a_fac = _random_psd(ka, 4)
    g_fac = _random_psd(kg, 3)
    grad = jax.random.normal(kw, (3, 4))
    a_inv = damped_inverse(a_fac, 0.01)
    g_inv = damped_inverse(g_fac, 0.01)
    out = precondition_inverse(grad, a_inv, g_inv)
    expected = np.asarray(g_inv) @ np.asarray(grad) @ np.asarray(a_inv)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_kl_clip_scale() -> None:
    # |vg| < kl_clip -> sqrt > 1 -> clipped at 1
    assert float(kl_clip_scale(jnp.asarray(0.0001), 0.001)) == 1.0
    # |vg| > kl_clip -> scale < 1
    out = float(kl_clip_scale(jnp.asarray(0.1), 0.001))
    np.testing.assert_allclose(out, np.sqrt(0.001 / 0.1), rtol=1e-6)
    # negative vg uses absolute value
    out2 = float(kl_clip_scale(jnp.asarray(-0.1), 0.001))
    np.testing.assert_allclose(out2, out, rtol=1e-6)
    # zero -> 1.0 (and no NaN)
    assert float(kl_clip_scale(jnp.asarray(0.0), 0.001)) == 1.0
