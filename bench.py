"""Headline benchmark: K-FAC step overhead vs plain SGD on ResNet-20/CIFAR.

Prints ONE JSON line:
``{"metric": "kfac_step_overhead_pct", "value": N, "unit": "%",
"vs_baseline": R}``

The baseline target (BASELINE.md / BASELINE.json) is K-FAC step overhead
<= 10% vs SGD on a ResNet workload at amortized update intervals
(factor_update_steps=10, inv_update_steps=100 -- the KAISA regime).
``vs_baseline`` is ``10 / value``; values > 1 beat the target.

Uses the reference's own gating semantics: statistics are only captured on
factor-update steps (the hook gate at ``base_preconditioner.py:444-446``),
expressed here as two compiled step functions selected in Python.

Runs on the default JAX backend (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import time
from typing import Any

import jax
import optax


def build() -> tuple[Any, ...]:
    from kfac_pytorch_tpu import KFACPreconditioner
    from kfac_pytorch_tpu.models import resnet20

    batch = 256
    model = resnet20()
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, 10)
    variables = model.init(jax.random.PRNGKey(2), x)
    params, batch_stats = variables['params'], variables['batch_stats']

    def loss_fn(p: Any, bn: Any, bx: jax.Array, by: jax.Array):
        out, updates = model.apply(
            {'params': p, 'batch_stats': bn},
            bx,
            train=True,
            mutable=['batch_stats'],
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out, by,
        ).mean()
        return loss, updates['batch_stats']

    precond = KFACPreconditioner(
        model,
        example_args=(x,),
        factor_update_steps=10,
        inv_update_steps=100,
        damping=0.003,
        lr=0.1,
        skip_layers=['shortcut'],
    )
    return model, params, batch_stats, precond, loss_fn, x, y


def main() -> None:
    model, params, batch_stats, precond, loss_fn, x, y = build()
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def sgd_step(params, batch_stats, opt_state, bx, by):
        (loss, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, bx, by,
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), bn, opt_state, loss

    vag = precond.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def kfac_capture_step(params, batch_stats, opt_state, kfac_state, bx, by):
        (loss, bn), grads, captured = vag(params, batch_stats, bx, by)
        pgrads, kfac_state = precond.step(kfac_state, grads, captured)
        updates, opt_state = tx.update(pgrads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, bn, opt_state, kfac_state, loss

    @jax.jit
    def kfac_fast_step(params, batch_stats, opt_state, kfac_state, bx, by):
        (loss, bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, bx, by,
        )
        pgrads, kfac_state = precond.step(kfac_state, grads, None)
        updates, opt_state = tx.update(pgrads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, bn, opt_state, kfac_state, loss

    kfac_state = precond.init()

    # Warm up all compilations.
    out = sgd_step(params, batch_stats, opt_state, x, y)
    jax.block_until_ready(out)
    out = kfac_capture_step(
        params, batch_stats, opt_state, kfac_state, x, y,
    )
    jax.block_until_ready(out)
    out = kfac_fast_step(params, batch_stats, opt_state, kfac_state, x, y)
    jax.block_until_ready(out)

    n = 50
    start = time.perf_counter()
    for _ in range(n):
        _, _, _, loss = sgd_step(params, batch_stats, opt_state, x, y)
    jax.block_until_ready(loss)
    t_sgd = (time.perf_counter() - start) / n

    # Amortized K-FAC cycle: 1 capture step per factor_update_steps.
    state = kfac_state
    start = time.perf_counter()
    for i in range(n):
        if precond.should_update_factors(i):
            _, _, _, state, loss = kfac_capture_step(
                params, batch_stats, opt_state, state, x, y,
            )
        else:
            _, _, _, state, loss = kfac_fast_step(
                params, batch_stats, opt_state, state, x, y,
            )
    jax.block_until_ready(loss)
    t_kfac = (time.perf_counter() - start) / n

    overhead_pct = max((t_kfac / t_sgd - 1.0) * 100.0, 0.0)
    result = {
        'metric': 'kfac_step_overhead_pct',
        'value': round(overhead_pct, 2),
        'unit': '%',
        'vs_baseline': round(10.0 / max(overhead_pct, 1e-6), 3),
        'detail': {
            'model': 'resnet20-cifar',
            'batch': 256,
            'sgd_step_ms': round(t_sgd * 1e3, 3),
            'kfac_step_ms': round(t_kfac * 1e3, 3),
            'backend': jax.default_backend(),
            'factor_update_steps': 10,
            'inv_update_steps': 100,
        },
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
