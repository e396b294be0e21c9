"""Convergence integration gate: K-FAC must beat the plain optimizer.

Counterpart of the reference's MNIST CI gate
(``tests/integration/mnist_integration_test.py:153-176`` of
gpauloski/kfac-pytorch): same model trained with and without the
preconditioner for an equal budget; the K-FAC run must reach at least the
baseline's accuracy. MNIST itself is not downloadable here, so a
deterministic synthetic digit-like task (class-dependent image means +
noise) at MNIST shapes stands in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.models import LeNet


def _make_data(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n).astype(np.int32)
    # one fixed set of class prototypes shared by train and test splits
    means = np.random.default_rng(1234).normal(
        0, 1, (10, 28, 28, 1),
    ).astype(np.float32)
    images = 0.7 * means[labels] + rng.normal(0, 1, (n, 28, 28, 1)).astype(
        np.float32,
    )
    return jnp.asarray(images), jnp.asarray(labels)


def _train(use_kfac: bool, steps: int = 600, batch: int = 64):
    model = LeNet()
    train_x, train_y = _make_data(batch * 8, seed=0)
    test_x, test_y = _make_data(512, seed=1)
    params = model.init(jax.random.PRNGKey(0), train_x[:2])

    def loss_fn(p, bx, by):
        logits = model.apply(p, bx)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, by,
        ).mean()

    # Matches the reference gate's setup: Adadelta(lr=0.1) with a 0.7
    # per-"epoch" LR decay and KFAC(factor=10, inv=100, lr=optimizer lr)
    # (reference mnist_integration_test.py:125-132).
    steps_per_epoch = max(steps // 5, 1)  # 5 "epochs" like the reference
    lr_schedule = optax.exponential_decay(
        0.1, transition_steps=steps_per_epoch, decay_rate=0.7,
        staircase=True,
    )
    tx = optax.chain(
        optax.scale_by_adadelta(),
        optax.scale_by_learning_rate(lr_schedule),
    )
    opt_state = tx.init(params)

    if use_kfac:
        precond = KFACPreconditioner(
            model,
            example_args=(train_x[:2],),
            factor_update_steps=10,
            inv_update_steps=100,
            damping=0.003,
            lr=lambda step: lr_schedule(step),
        )
        kfac_state = precond.init()
        vag = jax.jit(precond.value_and_grad(loss_fn))
        kstep = jax.jit(precond.step)
    else:
        vag_plain = jax.jit(jax.value_and_grad(loss_fn))

    n_batches = len(train_x) // batch
    for i in range(steps):
        j = i % n_batches
        bx = train_x[j * batch:(j + 1) * batch]
        by = train_y[j * batch:(j + 1) * batch]
        if use_kfac:
            (loss, _), grads, captured = vag(params, bx, by)
            grads, kfac_state = kstep(kfac_state, grads, captured)
        else:
            loss, grads = vag_plain(params, bx, by)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    logits = jax.jit(model.apply)(params, test_x)
    return float((logits.argmax(-1) == test_y).mean())


@pytest.mark.integration
def test_kfac_beats_plain_adadelta() -> None:
    baseline_acc = _train(use_kfac=False)
    kfac_acc = _train(use_kfac=True)
    print(f'baseline acc {baseline_acc:.4f}, kfac acc {kfac_acc:.4f}')
    # Strict >, matching the reference gate
    # (mnist_integration_test.py:163-176): a tie does not pass.
    assert kfac_acc > baseline_acc
