"""Breakdown profiling of the K-FAC step overhead on the real chip.

Times each component of the benchmark workload in isolation:
  - plain SGD step (baseline)
  - capture-every-step vag vs plain value_and_grad (capture cost)
  - precondition-only step (stages 3-5, captured=None, no inv update)
  - full K-FAC step at fus=10/ius=100 (cond-gated)
  - chunked (statically unrolled) variant
"""

from __future__ import annotations

import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def _hsync(tree):
    from kfac_pytorch_tpu.tracing import hostsync
    return hostsync(tree)


_FLOOR: float | None = None


def _floor() -> float:
    """Per-dispatch host-sync RPC latency (see bench._rpc_floor)."""
    global _FLOOR
    if _FLOOR is None:
        tiny = jnp.zeros((4,), jnp.float32)
        run = jax.jit(lambda v: v + 1.0)
        _hsync(run(tiny))
        best = float('inf')
        for _ in range(5):
            t0 = time.perf_counter()
            _hsync(run(tiny))
            best = min(best, time.perf_counter() - t0)
        _FLOOR = best
    return _FLOOR


def timed_scan(step_fn: Any, carry: Any, length: int) -> float:
    @jax.jit
    def run(c: Any) -> Any:
        return jax.lax.scan(step_fn, c, xs=None, length=length)

    out = _hsync(run(carry))
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        out = _hsync(run(out[0]))
        best = min(best, time.perf_counter() - start)
    return max(best - _floor(), 1e-9) / length


def main() -> None:
    import os
    import sys

    sys.path.insert(0, '/root/repo')
    import bench

    if '--rn50' in sys.argv:
        model, params, batch_stats, precond, loss_fn, x, y = (
            bench.build_rn50(int(os.environ.get('PROFILE_BATCH', '128')))
        )
    else:
        model, params, batch_stats, precond, loss_fn, x, y = bench.build()
    tx = optax.sgd(0.1, momentum=0.9)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    n = int(os.environ.get('PROFILE_STEPS', '100'))

    # 1. SGD baseline
    def sgd_body(carry, _):
        p, bn, o = carry
        (loss, bn2), grads = grad_fn(p, bn, x, y)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), bn2, o), loss

    t_sgd = timed_scan(sgd_body, (params, batch_stats, tx.init(params)), n)
    print(f'sgd_step:            {t_sgd*1e3:8.3f} ms')

    # 2. capture-every-step (vag) + sgd update, no precondition
    vag = precond.value_and_grad(loss_fn, has_aux=True)

    def cap_body(carry, _):
        p, bn, o = carry
        (loss, bn2), grads, captured = vag(p, bn, x, y)
        # keep captured alive via a trivial use so XLA can't DCE it
        loss = loss + 0.0 * sum(
            jnp.sum(c.a[0]) + jnp.sum(c.g[0]) for c in captured.values()
        )
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), bn2, o), loss

    t_cap = timed_scan(cap_body, (params, batch_stats, tx.init(params)), n)
    print(f'capture_step:        {t_cap*1e3:8.3f} ms  (+{(t_cap-t_sgd)*1e3:.3f} capture cost)')

    # 3. precondition-only (captured=None each step, inv never updates)
    precond_no_inv = _clone_precond(precond, inv_update_steps=10**9)
    state0 = precond_no_inv.init()

    def pre_body(carry, _):
        p, bn, o, ks = carry
        (loss, bn2), grads = grad_fn(p, bn, x, y)
        pgrads, ks = precond_no_inv.step(ks, grads, None)
        updates, o = tx.update(pgrads, o)
        return (optax.apply_updates(p, updates), bn2, o, ks), loss

    t_pre = timed_scan(
        pre_body, (params, batch_stats, tx.init(params), state0), n,
    )
    print(f'precond_only_step:   {t_pre*1e3:8.3f} ms  (+{(t_pre-t_sgd)*1e3:.3f} precondition cost)')

    # 4. full kfac (cond-gated) — the bench path
    from kfac_pytorch_tpu.train import KFACTrainCarry, make_train_step

    kstep = make_train_step(precond, loss_fn, tx, has_aux=True)

    def kfac_body(carry, _):
        return kstep(carry, (x, y))

    t_kfac = timed_scan(
        kfac_body,
        KFACTrainCarry(params, tx.init(params), precond.init(), batch_stats),
        n,
    )
    print(f'kfac_full_step:      {t_kfac*1e3:8.3f} ms  (overhead {((t_kfac/t_sgd)-1)*100:.1f}%)')

    if '--rn50' in sys.argv:
        # The 10x-unrolled chunked variant is a multi-hour compile at
        # ResNet-50 scale; skip straight to the refresh cost.
        _second_order(precond)
        return

    # 5. chunked variant
    from kfac_pytorch_tpu.train import make_chunked_train_step

    cstep = make_chunked_train_step(precond, loss_fn, tx, has_aux=True)
    xs10 = jnp.broadcast_to(x, (10,) + x.shape)
    ys10 = jnp.broadcast_to(y, (10,) + y.shape)

    def chunk_body(carry, _):
        return cstep(carry, (xs10, ys10))

    t_chunk = timed_scan(
        chunk_body,
        KFACTrainCarry(params, tx.init(params), precond.init(), batch_stats),
        n // 10,
    ) / 10
    print(f'chunked_step:        {t_chunk*1e3:8.3f} ms  (overhead {((t_chunk/t_sgd)-1)*100:.1f}%)')

    # 6. eigh cost: one _compute_second_order call
    _second_order(precond)


def _second_order(precond: Any) -> None:
    state = precond.init()
    f = jax.jit(
        lambda s: precond._compute_second_order(s.buckets, s.factors, 0.003),
    )
    _hsync(f(state))
    start = time.perf_counter()
    for _ in range(5):
        _hsync(f(state))
    t_eig = (time.perf_counter() - start) / 5 - _floor()
    print(f'second_order refresh: {t_eig*1e3:8.3f} ms per refresh')


def _clone_precond(p: Any, **over: Any) -> Any:
    from kfac_pytorch_tpu import KFACPreconditioner

    kw = dict(
        specs=p.specs,
        factor_update_steps=p._factor_update_steps,
        inv_update_steps=p._inv_update_steps,
        damping=p._damping,
        lr=p._lr,
        precondition_precision=p.precondition_precision,
        factor_compute_dtype=p.factor_compute_dtype,
        bucket_padding=p.bucket_padding,
        inv_dtype=p.inv_dtype,
        eigensolver=p.eigensolver,
        refine_iterations=p.refine_iterations,
        refine_precision=p.refine_precision,
    )
    kw.update(over)
    return KFACPreconditioner(**kw)


if __name__ == '__main__':
    main()
