"""Split the capture-step cost: A factors vs G factors vs tap overhead.

Builds the headline bench workload and scans 100 capture steps with the
factor computations selectively replaced by zeros (graph shape preserved)
to attribute the +ms of the capture branch:

    sgd          : plain value_and_grad
    taps_only    : tapped vag, A and G covariances replaced by zeros
    a_only       : real A covariances, zero G
    g_only       : zero A, real G covariances
    full         : the production capture path

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_capture.py
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


import os
SCAN_LEN = int(os.environ.get('PROFILE_SCAN_LEN', '100'))


def _hsync(tree):
    from kfac_pytorch_tpu.tracing import hostsync
    return hostsync(tree)


def timed_scan(step_fn: Any, carry: Any, length: int | None = None) -> float:
    length = SCAN_LEN if length is None else length
    @jax.jit
    def run(c: Any) -> Any:
        return jax.lax.scan(step_fn, c, xs=None, length=length)

    out = _hsync(run(carry))
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        out = _hsync(run(out[0]))
        best = min(best, time.perf_counter() - start)
    return best / length


def zero_a(helper: Any) -> Any:
    d = helper.a_factor_shape[0]
    cls = type(
        f'ZeroA{type(helper).__name__}',
        (type(helper),),
        {'get_a_factor': lambda self, a, _d=d: jnp.zeros((_d, _d))},
    )
    return cls(**{f.name: getattr(helper, f.name)
                  for f in dataclasses.fields(helper)})


def zero_g(helper: Any) -> Any:
    d = helper.g_factor_shape[0]
    cls = type(
        f'ZeroG{type(helper).__name__}',
        (type(helper),),
        {'get_g_factor': lambda self, g, _d=d: jnp.zeros((_d, _d))},
    )
    return cls(**{f.name: getattr(helper, f.name)
                  for f in dataclasses.fields(helper)})


def main() -> None:
    import sys

    sys.path.insert(0, '/root/repo')
    import bench
    from kfac_pytorch_tpu import KFACPreconditioner

    if '--rn50' in sys.argv:
        model, params, batch_stats, precond, loss_fn, x, y = (
            bench.build_rn50(int(os.environ.get('PROFILE_BATCH', '128')))
        )
    else:
        model, params, batch_stats, precond, loss_fn, x, y = bench.build()
    tx = optax.sgd(0.1, momentum=0.9)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def sgd_body(carry, _):
        p, bn, o = carry
        (loss, bn2), grads = grad_fn(p, bn, x, y)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), bn2, o), loss

    carry0 = (params, batch_stats, tx.init(params))
    t_sgd = timed_scan(sgd_body, carry0)
    print(f'sgd        : {t_sgd * 1e3:7.3f} ms')

    def variant(name: str, mutate: Any) -> None:
        specs = {
            k: dataclasses.replace(s, helper=mutate(s.helper))
            if mutate is not None else s
            for k, s in precond.specs.items()
        }
        p2 = KFACPreconditioner(
            specs=specs,
            factor_update_steps=10,
            inv_update_steps=100,
            damping=0.003,
            lr=0.1,
            precondition_precision='high',
            factor_compute_dtype='bfloat16',
        )
        vag = p2.value_and_grad(loss_fn, has_aux=True)

        def body(carry, _):
            p, bn, o = carry
            (loss, bn2), grads, captured = vag(p, bn, x, y)
            loss = loss + 0.0 * sum(
                jnp.sum(c.a[0]) + jnp.sum(c.g[0])
                for c in captured.values()
            )
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), bn2, o), loss

        t = timed_scan(body, carry0)
        print(f'{name:11s}: {t * 1e3:7.3f} ms  (+{(t - t_sgd) * 1e3:.3f})')

    variant('taps_only', lambda h: zero_a(zero_g(h)))
    variant('a_only', zero_g)
    variant('g_only', zero_a)
    variant('full', None)




def main_methods() -> None:
    """In-graph A/B of the conv A-factor algorithms (full capture step).

    ``--rn50`` runs the headline ResNet-50 workload (batch via
    ``PROFILE_BATCH``, default 64); methods via ``PROFILE_METHODS``
    (comma-separated, default ``patches,convgrad``).
    """
    import os
    import sys

    sys.path.insert(0, '/root/repo')
    import bench
    from kfac_pytorch_tpu import KFACPreconditioner

    if '--rn50' in sys.argv:
        model, params, batch_stats, precond, loss_fn, x, y = (
            bench.build_rn50(int(os.environ.get('PROFILE_BATCH', '64')))
        )
    else:
        model, params, batch_stats, precond, loss_fn, x, y = bench.build()
    methods = os.environ.get('PROFILE_METHODS', 'patches,convgrad').split(',')
    tx = optax.sgd(0.1, momentum=0.9)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def sgd_body(carry, _):
        p, bn, o = carry
        (loss, bn2), grads = grad_fn(p, bn, x, y)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), bn2, o), loss

    carry0 = (params, batch_stats, tx.init(params))
    t_sgd = timed_scan(sgd_body, carry0)
    print(f'sgd     : {t_sgd * 1e3:7.3f} ms')

    for method in methods:
        specs = {
            k: dataclasses.replace(
                s,
                helper=dataclasses.replace(s.helper, a_factor_method=method)
                if hasattr(s.helper, 'a_factor_method') else s.helper,
            )
            for k, s in precond.specs.items()
        }
        p2 = KFACPreconditioner(
            specs=specs,
            factor_update_steps=10,
            inv_update_steps=100,
            damping=0.003,
            lr=0.1,
            precondition_precision='high',
            factor_compute_dtype='bfloat16',
        )
        vag = p2.value_and_grad(loss_fn, has_aux=True)

        def body(carry, _):
            p, bn, o = carry
            (loss, bn2), grads, captured = vag(p, bn, x, y)
            loss = loss + 0.0 * sum(
                jnp.sum(c.a[0]) + jnp.sum(c.g[0])
                for c in captured.values()
            )
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), bn2, o), loss

        t = timed_scan(body, carry0)
        print(f'{method:8s}: {t * 1e3:7.3f} ms  (+{(t - t_sgd) * 1e3:.3f})')


if __name__ == '__main__':
    import sys as _sys
    if '--methods' in _sys.argv:
        main_methods()
        raise SystemExit
    main()
