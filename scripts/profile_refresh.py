"""Decompose the second-order refresh cost on the real chip.

Usage: python scripts/profile_refresh.py [--lm | --rn50]

Builds the chosen bench workload, runs ONE real capture to get
realistic factors, warms the eigenbasis with one refresh, then times:

  - the full ``_compute_second_order`` refresh with
    ``final_orth='cholqr'`` (the round-2 behavior) vs ``'auto'``
    (adaptive Newton-Schulz at steady state), and
  - each bucket's A/G ``refine_eigh`` individually (cholqr vs auto),

all as scanned dispatches with a scalar accumulator (see
docs/PERF_NOTES.md "Measurement integrity" -- never stack timing
outputs; the tunnel transfer would dominate).
"""

from __future__ import annotations

import sys
import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402


def _hsync(tree: Any) -> Any:
    from kfac_pytorch_tpu.tracing import hostsync

    return hostsync(tree)


_FLOOR = None


def _floor() -> float:
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


def timed(fn: Any, *args: Any, length: int = 10) -> float:
    """Best-of-3 scanned timing of fn(*args); scalar accumulator."""

    @jax.jit
    def run(a: Any) -> jax.Array:
        def body(acc: jax.Array, _: Any) -> tuple[jax.Array, None]:
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.ravel()[0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), xs=None, length=length,
        )
        return acc

    _hsync(run(args))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _hsync(run(args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _floor(), 1e-9) / length


def main() -> None:
    sys.path.insert(0, '/root/repo')
    import bench

    if '--lm' in sys.argv:
        built = bench.build_lm()
    elif '--rn50' in sys.argv:
        built = bench.build_rn50()
    else:
        built = bench.build()
    model, params, batch_stats, precond, loss_fn, x, y = built

    # One real capture -> realistic factors; one refresh -> warm basis.
    vag = precond.value_and_grad(loss_fn, has_aux=batch_stats is not None)
    if batch_stats is not None:
        (_, _), grads, captured = vag(params, batch_stats, x, y)
    else:
        (_, _), grads, captured = vag(params, x, y)
    state = precond.init()
    factors = precond._update_factors(state.factors, captured, 0.95)
    state = state.replace(factors=factors)
    # Only the factor/bucket state matters from here; free the training
    # tensors (grads + captured + params are several GB on the LM
    # workload and OOM the refresh timing otherwise).
    del grads, captured, params, model, x, y, built
    damping = 0.003

    from kfac_pytorch_tpu.ops.refine import refine_eigh

    warm = jax.jit(
        lambda bs, fs: precond._compute_second_order(bs, fs, damping),
    )
    buckets = _hsync(warm(state.buckets, state.factors))
    state = state.replace(buckets=buckets)

    for orth in ('cholqr', 'auto'):
        precond.refine_final_orth = orth
        t = timed(
            lambda bs, fs: precond._compute_second_order(bs, fs, damping),
            state.buckets,
            state.factors,
        )
        print(f'full refresh [{orth:6s}]: {t*1e3:8.3f} ms')

    # Per-bucket refine calls.
    for bucket in precond._plan:
        bs = state.buckets[bucket.key]
        a_stacked = precond._stack_bucket_factor(
            bucket, state.factors, 'a', bucket.a_dim,
        )
        g_stacked = precond._stack_bucket_factor(
            bucket, state.factors, 'g', bucket.g_dim,
        )
        for label, mat, v0 in (
            ('A', a_stacked, bs.qa),
            ('G', g_stacked, bs.qg),
        ):
            if v0 is None:
                continue
            row = []
            for orth in ('cholqr', 'auto'):
                t = timed(
                    lambda m, v: refine_eigh(
                        m, v.astype(jnp.float32), damping,
                        precond.refine_iterations,
                        precision=precond.refine_precision,
                        final_orth=orth,
                    ),
                    mat,
                    v0,
                )
                row.append(f'{orth}={t*1e3:7.3f}')
            shape = tuple(mat.shape)
            print(f'  {bucket.key:28s} {label} {shape!s:18s} ' + '  '.join(row))


if __name__ == '__main__':
    main()
