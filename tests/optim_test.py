"""Tests for the optax integration and orbax checkpointing."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu import kfac_transform
from kfac_pytorch_tpu import restore_kfac_state
from kfac_pytorch_tpu import save_kfac_state
from kfac_pytorch_tpu.models import TinyModel


def _setup():
    model = TinyModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 10))
    params = model.init(jax.random.PRNGKey(2), x)

    def loss_fn(p, bx, by):
        return jnp.mean((model.apply(p, bx) - by) ** 2)

    precond = KFACPreconditioner(model, example_args=(x,), lr=0.1)
    return model, params, precond, loss_fn, x, y


def test_optax_chain_matches_manual_step() -> None:
    model, params, precond, loss_fn, x, y = _setup()
    tx = optax.chain(
        kfac_transform(precond),
        optax.sgd(0.1),
    )
    opt_state = tx.init(params)
    fn = precond.value_and_grad(loss_fn)
    _, grads, captured = fn(params, x, y)
    updates, _ = tx.update(grads, opt_state, params, captured=captured)

    # manual: precondition then sgd scale
    state = precond.init()
    pgrads, _ = precond.step(state, grads, captured)
    expected = jax.tree.map(lambda g: -0.1 * g, pgrads)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
        ),
        updates,
        expected,
    )


def test_as_gradient_transformation_method() -> None:
    _, params, precond, loss_fn, x, y = _setup()
    tx = precond.as_gradient_transformation()
    state = tx.init(params)
    _, grads, captured = precond.value_and_grad(loss_fn)(params, x, y)
    updates, new_state = tx.update(grads, state, captured=captured)
    assert int(new_state.steps) == 1
    assert jnp.isfinite(updates['params']['Dense_0']['kernel']).all()


def test_orbax_round_trip(tmp_path) -> None:
    model, params, precond, loss_fn, x, y = _setup()
    state = precond.init()
    fn = precond.value_and_grad(loss_fn)
    _, grads, captured = fn(params, x, y)
    _, state = precond.step(state, grads, captured)

    path = os.path.join(str(tmp_path), 'kfac_ckpt')
    save_kfac_state(path, state)
    restored = restore_kfac_state(path, precond)
    assert int(restored.steps) == int(state.steps)
    for name in state.factors:
        np.testing.assert_allclose(
            np.asarray(restored.factors[name].a),
            np.asarray(state.factors[name].a),
            atol=1e-6,
        )
    for key in state.buckets:
        # inverses recomputed -> same preconditioning
        np.testing.assert_allclose(
            np.asarray(restored.buckets[key].qa),
            np.asarray(state.buckets[key].qa),
            atol=1e-4,
        )


def test_restore_without_inverses(tmp_path) -> None:
    _, params, precond, loss_fn, x, y = _setup()
    state = precond.init()
    path = os.path.join(str(tmp_path), 'kfac_ckpt2')
    save_kfac_state(path, state)
    restored = restore_kfac_state(path, precond, compute_inverses=False)
    np.testing.assert_allclose(
        np.asarray(restored.buckets[precond.plan[0].key].qa),
        np.asarray(state.buckets[precond.plan[0].key].qa),
    )
