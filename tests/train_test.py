"""Tests for the scanned training-loop builders."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.models import TinyModel
from kfac_pytorch_tpu.train import KFACTrainCarry
from kfac_pytorch_tpu.train import make_train_step
from kfac_pytorch_tpu.train import scan_train


def _setup(fus: int = 1):
    model = TinyModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 10), 10,
    )
    params = model.init(jax.random.PRNGKey(2), x)

    def loss_fn(p, bx, by):
        return optax.softmax_cross_entropy(model.apply(p, bx), by).mean()

    precond = KFACPreconditioner(
        model,
        example_args=(x,),
        lr=0.1,
        damping=0.003,
        factor_update_steps=fus,
        inv_update_steps=max(fus, 1),
    )
    tx = optax.sgd(0.1)
    return model, params, precond, tx, loss_fn, x, y


@pytest.mark.parametrize('fus', [1, 4])
def test_scan_training_decreases_loss(fus: int) -> None:
    _, params, precond, tx, loss_fn, x, y = _setup(fus)
    step = make_train_step(precond, loss_fn, tx)
    carry = KFACTrainCarry(
        params=params,
        opt_state=tx.init(params),
        kfac_state=precond.init(),
    )
    batches = (
        jnp.broadcast_to(x, (20, *x.shape)),
        jnp.broadcast_to(y, (20, *y.shape)),
    )
    run = jax.jit(lambda c, b: scan_train(step, c, b))
    carry, losses = run(carry, batches)
    assert losses.shape == (20,)
    assert float(losses[-1]) < float(losses[0])
    assert int(carry.kfac_state.steps) == 20


def test_scan_matches_eager_loop() -> None:
    """The scanned gated step must match the eager two-function loop."""
    _, params, precond, tx, loss_fn, x, y = _setup(fus=2)
    step = make_train_step(precond, loss_fn, tx)
    carry = KFACTrainCarry(params, tx.init(params), precond.init())
    batches = (
        jnp.broadcast_to(x, (6, *x.shape)),
        jnp.broadcast_to(y, (6, *y.shape)),
    )
    carry_s, losses_s = jax.jit(
        lambda c, b: scan_train(step, c, b),
    )(carry, batches)

    # eager equivalent
    p2 = params
    o2 = tx.init(params)
    s2 = precond.init()
    vag = jax.jit(precond.value_and_grad(loss_fn))
    pstep = jax.jit(precond.step)
    losses_e = []
    for i in range(6):
        if precond.should_update_factors(i):
            (loss, _), grads, cap = vag(p2, x, y)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(p2, x, y)
            cap = None
        losses_e.append(float(loss))
        pg, s2 = pstep(s2, grads, cap)
        updates, o2 = tx.update(pg, o2, p2)
        p2 = optax.apply_updates(p2, updates)

    np.testing.assert_allclose(
        np.asarray(losses_s), np.asarray(losses_e), rtol=2e-4,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
        ),
        carry_s.params,
        p2,
    )


def test_period_step_matches_gated_step() -> None:
    """The static period schedule equals the dynamically-gated scan.

    Two full refresh periods (fus=2, ius=4): capture at steps 0,2,4,6,
    refresh at steps 0 and 4 -- the cond-free program must produce the
    identical trajectory.
    """
    from kfac_pytorch_tpu.train import make_period_train_step

    model = TinyModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 10), 10,
    )
    params = model.init(jax.random.PRNGKey(2), x)

    def loss_fn(p, bx, by):
        return optax.softmax_cross_entropy(model.apply(p, bx), by).mean()

    precond = KFACPreconditioner(
        model,
        example_args=(x,),
        lr=0.1,
        damping=0.003,
        factor_update_steps=2,
        inv_update_steps=4,
    )
    tx = optax.sgd(0.1)

    # 8 distinct batches so gating mistakes cannot cancel out.
    xs = jax.random.normal(jax.random.PRNGKey(3), (8, *x.shape))
    ys = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(4), (8,), 0, 10), 10,
    )

    gated = make_train_step(precond, loss_fn, tx)
    carry_g = KFACTrainCarry(params, tx.init(params), precond.init())
    carry_g, losses_g = jax.jit(
        lambda c, b: scan_train(gated, c, b),
    )(carry_g, (xs, ys))

    period = make_period_train_step(precond, loss_fn, tx)
    carry_p = KFACTrainCarry(params, tx.init(params), precond.init())
    pb = (
        xs.reshape(2, 4, *xs.shape[1:]),
        ys.reshape(2, 4, *ys.shape[1:]),
    )
    carry_p, losses_p = jax.jit(
        lambda c, b: jax.lax.scan(period, c, b),
    )(carry_p, pb)

    np.testing.assert_allclose(
        np.asarray(losses_p).reshape(-1),
        np.asarray(losses_g),
        rtol=2e-5,
    )
    assert int(carry_p.kfac_state.steps) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
        ),
        carry_p.params,
        carry_g.params,
    )
    # Second-order state advanced identically (refresh at steps 0 and 4).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            atol=1e-5,
        ),
        carry_p.kfac_state.buckets,
        carry_g.kfac_state.buckets,
    )


def test_period_step_with_accumulation_matches_gated() -> None:
    """Period schedule + microbatch accumulation == gated accumulation."""
    from kfac_pytorch_tpu.train import make_period_train_step

    model = TinyModel()
    accum, fus, ius, n = 2, 2, 4, 8
    params = model.init(
        jax.random.PRNGKey(2), jnp.zeros((4, 8)),
    )

    def loss_fn(p, bx, by):
        return optax.softmax_cross_entropy(model.apply(p, bx), by).mean()

    precond = KFACPreconditioner(
        model,
        example_args=(jnp.zeros((4, 8)),),
        lr=0.1,
        damping=0.003,
        factor_update_steps=fus,
        inv_update_steps=ius,
        accumulation_steps=accum,
    )
    tx = optax.sgd(0.1)
    xs = jax.random.normal(jax.random.PRNGKey(3), (n, accum, 4, 8))
    ys = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(4), (n, accum, 4), 0, 10),
        10,
    )

    gated = make_train_step(precond, loss_fn, tx)
    carry_g = KFACTrainCarry(params, tx.init(params), precond.init())
    carry_g, losses_g = jax.jit(
        lambda c, b: scan_train(gated, c, b),
    )(carry_g, (xs, ys))

    period = make_period_train_step(precond, loss_fn, tx)
    carry_p = KFACTrainCarry(params, tx.init(params), precond.init())
    pb = (
        xs.reshape(n // ius, ius, accum, 4, 8),
        ys.reshape(n // ius, ius, accum, 4, 10),
    )
    carry_p, losses_p = jax.jit(
        lambda c, b: jax.lax.scan(period, c, b),
    )(carry_p, pb)

    np.testing.assert_allclose(
        np.asarray(losses_p).reshape(-1),
        np.asarray(losses_g),
        rtol=2e-5,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
        ),
        carry_p.params,
        carry_g.params,
    )


def test_period_step_validation() -> None:
    from kfac_pytorch_tpu.train import make_period_train_step

    model = TinyModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    precond = KFACPreconditioner(
        model, example_args=(x,), factor_update_steps=3, inv_update_steps=4,
    )
    with pytest.raises(ValueError, match='multiple'):
        make_period_train_step(precond, lambda p, a, b: 0.0, optax.sgd(0.1))
    precond2 = KFACPreconditioner(
        model,
        example_args=(x,),
        factor_update_steps=lambda s: 2,
        inv_update_steps=4,
    )
    with pytest.raises(ValueError, match='static int'):
        make_period_train_step(precond2, lambda p, a, b: 0.0, optax.sgd(0.1))


def test_train_step_supports_callable_fus() -> None:
    """Callable update intervals resolve on the traced step counter."""
    _, params, precond, tx, loss_fn, x, y = _setup()
    precond._factor_update_steps = lambda s: 2
    state = precond.init()
    assert 'factor_update_steps' not in state.hyperparams
    step = jax.jit(make_train_step(precond, loss_fn, tx))
    carry = KFACTrainCarry(params, tx.init(params), state, None)
    carry, _ = step(carry, (x, y))  # step 0: capture
    f0 = carry.kfac_state.factors
    carry, _ = step(carry, (x, y))  # step 1: fast path, factors unchanged
    f1 = carry.kfac_state.factors
    for name in f0:
        np.testing.assert_array_equal(
            np.asarray(f0[name].a), np.asarray(f1[name].a),
        )


def test_bf16_training_end_to_end() -> None:
    """bf16 model training with K-FAC: factors/inverses stay f32-stable."""
    import flax.linen as nn

    class Bf16Model(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(32, dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
            return nn.Dense(10, dtype=jnp.bfloat16)(x)

    model = Bf16Model()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8), jnp.bfloat16)
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 10), 10,
    )
    params = model.init(jax.random.PRNGKey(2), x)

    def loss_fn(p, bx, by):
        logits = model.apply(p, bx).astype(jnp.float32)
        return optax.softmax_cross_entropy(logits, by).mean()

    precond = KFACPreconditioner(
        model, example_args=(x,), lr=0.1, damping=0.003,
    )
    state = precond.init()
    # factors stored f32 even though activations are bf16
    assert next(iter(state.factors.values())).a.dtype == jnp.float32
    tx = optax.sgd(0.1)
    step = make_train_step(precond, loss_fn, tx)
    carry = KFACTrainCarry(params, tx.init(params), state)
    batches = (
        jnp.broadcast_to(x, (15, *x.shape)),
        jnp.broadcast_to(y, (15, *y.shape)),
    )
    carry, losses = jax.jit(lambda c, b: scan_train(step, c, b))(
        carry, batches,
    )
    assert float(losses[-1]) < float(losses[0])
    assert jnp.isfinite(losses).all()


def test_chunked_matches_gated_step() -> None:
    """The statically-unrolled chunk must equal fus gated steps."""
    from kfac_pytorch_tpu.train import make_chunked_train_step

    _, params, precond, tx, loss_fn, x, y = _setup(fus=3)
    gated = make_train_step(precond, loss_fn, tx)
    chunked = make_chunked_train_step(precond, loss_fn, tx)

    carry_g = KFACTrainCarry(params, tx.init(params), precond.init())
    batches = (
        jnp.broadcast_to(x, (6, *x.shape)),
        jnp.broadcast_to(y, (6, *y.shape)),
    )
    carry_g, losses_g = jax.jit(lambda c, b: scan_train(gated, c, b))(
        carry_g, batches,
    )

    carry_c = KFACTrainCarry(params, tx.init(params), precond.init())
    chunk_batches = (
        batches[0].reshape(2, 3, *x.shape),
        batches[1].reshape(2, 3, *y.shape),
    )
    carry_c, losses_c = jax.jit(
        lambda c, b: jax.lax.scan(chunked, c, b),
    )(carry_c, chunk_batches)

    np.testing.assert_allclose(
        np.asarray(losses_c).reshape(-1),
        np.asarray(losses_g),
        rtol=2e-4,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
        ),
        carry_c.params,
        carry_g.params,
    )
    assert int(carry_c.kfac_state.steps) == 6


def test_accumulation_steps_matches_full_batch() -> None:
    """accumulation_steps=2 over batch halves == one full-batch step.

    Per-microbatch covariances and grads are means over rows, so averaging
    two half-batch microbatches reproduces the full-batch statistics
    exactly (up to fp associativity). Mirrors the reference's no_sync
    accumulation semantics (kfac/layers/base.py:338-405).
    """
    model = TinyModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    y = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (16,), 0, 10), 10,
    )
    params = model.init(jax.random.PRNGKey(2), x)

    def loss_fn(p, bx, by):
        return optax.softmax_cross_entropy(model.apply(p, bx), by).mean()

    def build(accum):
        precond = KFACPreconditioner(
            model,
            example_args=(x[:2],),
            lr=0.1,
            damping=0.003,
            factor_update_steps=2,
            inv_update_steps=2,
            accumulation_steps=accum,
        )
        tx = optax.sgd(0.1)
        step = jax.jit(make_train_step(precond, loss_fn, tx))
        carry = KFACTrainCarry(
            params=params,
            opt_state=tx.init(params),
            kfac_state=precond.init(),
        )
        return step, carry

    step1, c1 = build(1)
    step2, c2 = build(2)
    for _ in range(4):
        c1, l1 = step1(c1, (x, y))
        # same samples split into 2 microbatches with a leading accum axis
        c2, l2 = step2(
            c2, (x.reshape(2, 8, 8), y.reshape(2, 8, 10)),
        )
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6),
        c1.params,
        c2.params,
    )
