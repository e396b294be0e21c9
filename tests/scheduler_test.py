"""Tests for LambdaParamScheduler + hyperparam schedules + tracing
(counterpart of reference ``tests/scheduler_test.py``,
``tests/hyperparams_test.py``, ``tests/tracing_test.py``)."""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.hyperparams import exp_decay_factor_averaging
from kfac_pytorch_tpu.models import TinyModel
from kfac_pytorch_tpu.scheduler import LambdaParamScheduler
from kfac_pytorch_tpu.tracing import clear_trace
from kfac_pytorch_tpu.tracing import get_trace
from kfac_pytorch_tpu.tracing import log_trace
from kfac_pytorch_tpu.tracing import trace


def _precond(**kw) -> KFACPreconditioner:
    return KFACPreconditioner(
        TinyModel(),
        example_args=(jnp.zeros((2, 8)),),
        **kw,
    )


def test_scheduler_multiplies_params() -> None:
    precond = _precond(
        damping=0.01,
        factor_update_steps=4,
        inv_update_steps=8,
        kl_clip=0.002,
        lr=0.1,
        factor_decay=0.9,
    )
    state = precond.init()
    sched = LambdaParamScheduler(
        precond,
        damping_lambda=lambda step: 0.5,
        factor_update_steps_lambda=lambda step: 2,
        inv_update_steps_lambda=lambda step: 2,
        kl_clip_lambda=lambda step: 0.5,
        lr_lambda=lambda step: 0.1,
        factor_decay_lambda=lambda step: 1.0,
    )
    state = sched.step(state)
    hp = state.hyperparams
    assert float(hp['damping']) == pytest.approx(0.005)
    assert int(hp['factor_update_steps']) == 8
    assert int(hp['inv_update_steps']) == 16
    assert float(hp['kl_clip']) == pytest.approx(0.001)
    assert float(hp['lr']) == pytest.approx(0.01)
    assert float(hp['factor_decay']) == pytest.approx(0.9)
    # Python-side mirrors stay consistent for introspection.
    assert precond._damping == pytest.approx(0.005)
    assert precond._factor_update_steps == 8


def test_scheduler_rejects_callable_params() -> None:
    precond = _precond(damping=lambda s: 0.01)
    with pytest.raises(ValueError):
        LambdaParamScheduler(precond, damping_lambda=lambda s: 0.5)


def test_scheduler_rejects_literal_one_interval() -> None:
    # A step compiled with factor_update_steps=1 specializes away the
    # interval gate; scheduling it upward could never take effect, so
    # the scheduler must fail loudly at construction.
    precond = _precond(factor_update_steps=1, inv_update_steps=8)
    with pytest.raises(ValueError, match='factor_update_steps=1'):
        LambdaParamScheduler(
            precond, factor_update_steps_lambda=lambda s: 10,
        )
    precond = _precond(factor_update_steps=2, inv_update_steps=1)
    with pytest.raises(ValueError, match='inv_update_steps=1'):
        LambdaParamScheduler(precond, inv_update_steps_lambda=lambda s: 10)
    # Non-interval lambdas stay allowed alongside literal-1 intervals.
    precond = _precond(factor_update_steps=1, inv_update_steps=1)
    LambdaParamScheduler(precond, damping_lambda=lambda s: 0.5)
    # And intervals > 1 can still be scheduled (downward to 1 included).
    precond = _precond(factor_update_steps=10, inv_update_steps=10)
    sched = LambdaParamScheduler(
        precond, factor_update_steps_lambda=lambda s: 0.1,
    )
    state = sched.step(precond.init())
    assert int(state.hyperparams['factor_update_steps']) == 1


def test_scheduler_step_override() -> None:
    precond = _precond(lr=1.0)
    state = precond.init()
    factors = {0: 1.0, 5: 0.1}
    sched = LambdaParamScheduler(
        precond,
        lr_lambda=lambda step: factors.get(step, 1.0),
    )
    state = sched.step(state, step=5)
    assert float(state.hyperparams['lr']) == pytest.approx(0.1)


def test_scheduler_default_step_is_precond_steps() -> None:
    """Lambdas see the actual K-FAC step count, not a call counter."""
    precond = _precond(lr=1.0)
    state = precond.init()
    state = state.replace(steps=jnp.asarray(7, jnp.int32))
    seen = []

    def lam(step: int) -> float:
        seen.append(step)
        return 1.0

    sched = LambdaParamScheduler(precond, lr_lambda=lam)
    sched.step(state)
    assert seen == [7]
    assert sched.calls == 1


def test_scheduler_mutation_reaches_jitted_step() -> None:
    """Regression: a jitted ``precond.step`` must use post-mutation
    hyperparameters (round-1 VERDICT: mutations were baked in at trace
    time and silently ignored)."""
    import jax

    precond = _precond(
        damping=0.001,
        factor_update_steps=1,
        inv_update_steps=1,
        kl_clip=None,
    )
    state = precond.init()
    vag = jax.jit(precond.value_and_grad(lambda p, x: ((
        TinyModel().apply({'params': p['params']}, x) ** 2).sum())))
    step = jax.jit(precond.step)

    x = jnp.ones((4, 8))
    params = TinyModel().init(jax.random.PRNGKey(0), x)
    (_, _), grads, captured = vag(params, x)
    pg_before, state2 = step(state, grads, captured)

    sched = LambdaParamScheduler(
        precond, damping_lambda=lambda s: 1000.0,
    )
    state_mut = sched.step(state)
    pg_after, _ = step(state_mut, grads, captured)

    before = jax.tree.leaves(pg_before)[0]
    after = jax.tree.leaves(pg_after)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), (
        'damping mutation had no effect on the jitted step'
    )


def test_exp_decay_factor_averaging() -> None:
    fn = exp_decay_factor_averaging()
    assert fn(0) == 0.0  # k=0 treated as k=1 -> 1 - 1/1
    assert fn(1) == 0.0
    assert fn(2) == pytest.approx(0.5)
    assert fn(100) == pytest.approx(0.95)  # capped
    with pytest.raises(ValueError):
        fn(-1)
    with pytest.raises(ValueError):
        exp_decay_factor_averaging(0.0)
    # traced/jnp input path
    out = fn(jnp.asarray(2))
    np.testing.assert_allclose(float(out), 0.5, rtol=1e-6)


def test_trace_decorator() -> None:
    clear_trace()

    @trace()
    def slow_fn() -> int:
        time.sleep(0.01)
        return 42

    @trace(sync=True)
    def jax_fn() -> jnp.ndarray:
        return jnp.ones(4).sum()

    assert slow_fn() == 42
    assert slow_fn() == 42
    assert float(jax_fn()) == 4.0

    averages = get_trace()
    assert averages['slow_fn'] >= 0.01
    assert 'jax_fn' in averages
    totals = get_trace(average=False)
    assert totals['slow_fn'] >= 2 * 0.01
    limited = get_trace(max_history=1)
    assert limited['slow_fn'] >= 0.01
    log_trace()
    clear_trace()
    assert get_trace() == {}


def test_hostsync_returns_tree_and_forces_completion() -> None:
    """hostsync must return the tree unchanged (same objects) and be a
    no-op on non-array leaves; it is the portable sync point for all
    wall-clock timing (block_until_ready returns early on the tunnel
    TPU backend -- see tracing.hostsync docstring)."""
    from kfac_pytorch_tpu.tracing import hostsync

    big = jnp.ones((64, 64))
    small = jnp.zeros((2,))
    tree = {'a': big, 'b': small, 'meta': 'keep'}
    out = hostsync(tree)
    assert out is tree
    assert out['meta'] == 'keep'
    # Plain python values / empty trees are fine too.
    assert hostsync(5) == 5
    assert hostsync({}) == {}
