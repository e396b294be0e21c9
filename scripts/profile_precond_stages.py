"""Isolate the per-step precondition cost (stages 3-5) on the real chip.

Ablation ladder, each a 100-step scan over the chosen bench workload
(``--lm`` for the transformer LM, default ResNet-20/CIFAR):

    sgd        : plain value_and_grad + optax
    stack      : + grad-matrix stack + write-back (identity precondition)
                 -- the pure data-movement floor of stages 3/5
    nokl       : + the precondition matmuls, KL clip skipped
    direct     : + KL clip = full stages 3-5 math on a FROZEN bucket
                 state (no lax.cond, no state threading)
    step       : + the full precond.step(captured=None) with the inv
                 cond compiled in (ius=1e9: the cond never takes the
                 refresh branch)

Successive deltas attribute the cost: sgd->stack is stack/unstack
traffic, stack->nokl the matmuls, nokl->direct the KL clip,
direct->step the cond/state-threading overhead.
"""

from __future__ import annotations

import time
from typing import Any

import jax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


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


def timed_scan(step_fn: Any, carry: Any, length: int = 100) -> float:
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
    import sys

    sys.path.insert(0, '/root/repo')
    import bench

    lm = '--lm' in sys.argv
    if lm:
        model, params, batch_stats, precond, loss_fn, x, y = bench.build_lm()
    else:
        model, params, batch_stats, precond, loss_fn, x, y = bench.build()
    has_aux = batch_stats is not None
    tx = optax.sgd(0.1, momentum=0.9)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def fwd_bwd(p: Any, bn: Any) -> tuple[Any, Any, Any]:
        if has_aux:
            (loss, bn2), grads = grad_fn(p, bn, x, y)
        else:
            loss, grads = grad_fn(p, x, y)
            bn2 = bn
        return loss, bn2, grads

    def sgd_body(carry: Any, _: Any):
        p, bn, o = carry
        loss, bn2, grads = fwd_bwd(p, bn)
        updates, o = tx.update(grads, o)
        return (optax.apply_updates(p, updates), bn2, o), loss

    carry0 = (params, batch_stats, tx.init(params))
    t_sgd = timed_scan(sgd_body, carry0)
    print(f'sgd:     {t_sgd*1e3:7.3f} ms')

    # Frozen-state direct stages 3-5 (closure captures the state;
    # identical math, no cond, no state output).
    state0 = precond.init()
    from kfac_pytorch_tpu.utils.tree import params_root
    from kfac_pytorch_tpu.ops.curvature import kl_clip_scale

    def stages_345(grads: Any, kl: bool, matmuls: bool) -> Any:
        root = params_root(grads, precond._first_component)
        vg_sum = jnp.zeros((), jnp.float32)
        pgs = {}
        dts = {}
        for bucket in precond._plan:
            gm = precond._grad_mats_for_bucket(bucket, root)
            bs = state0.buckets[bucket.key]
            if matmuls:
                pg = precond._precondition_bucket(bucket, bs, gm, 0.003)
            else:
                pg = gm
            pgs[bucket.key] = pg
            dts[bucket.key] = gm.dtype
            if kl:
                vg_sum = vg_sum + jnp.sum(
                    pg.astype(jnp.float32) * gm.astype(jnp.float32),
                ) * jnp.float32(0.01)
        scale = kl_clip_scale(vg_sum, 0.001) if kl else jnp.float32(1.0)
        for bucket in precond._plan:
            pg = (pgs[bucket.key] * scale).astype(dts[bucket.key])
            root = precond._write_bucket_grads(bucket, root, pg)
        return root

    def make_body(kl: bool, matmuls: bool):
        def body(carry: Any, _: Any):
            p, bn, o = carry
            loss, bn2, grads = fwd_bwd(p, bn)
            pgrads = stages_345(grads, kl, matmuls)
            updates, o = tx.update(pgrads, o)
            return (optax.apply_updates(p, updates), bn2, o), loss

        return body

    t_stack = timed_scan(make_body(kl=False, matmuls=False), carry0)
    print(
        f'stack:   {t_stack*1e3:7.3f} ms  '
        f'(+{(t_stack-t_sgd)*1e3:.3f} stack/write-back traffic)',
    )
    t_nokl = timed_scan(make_body(kl=False, matmuls=True), carry0)
    print(
        f'nokl:    {t_nokl*1e3:7.3f} ms  '
        f'(+{(t_nokl-t_stack)*1e3:.3f} precondition matmuls)',
    )
    t_direct = timed_scan(make_body(kl=True, matmuls=True), carry0)
    print(
        f'direct:  {t_direct*1e3:7.3f} ms  '
        f'(+{(t_direct-t_nokl)*1e3:.3f} KL clip; '
        f'+{(t_direct-t_sgd)*1e3:.3f} stages 3-5 math total)',
    )

    # Full step with the never-taken inv cond.
    from kfac_pytorch_tpu import KFACPreconditioner

    pni = KFACPreconditioner(
        specs=precond.specs,
        factor_update_steps=precond._factor_update_steps,
        inv_update_steps=10**9,
        damping=precond._damping,
        lr=precond._lr,
        precondition_precision=precond.precondition_precision,
        factor_compute_dtype=precond.factor_compute_dtype,
        inv_dtype=precond.inv_dtype,
        eigensolver=precond.eigensolver,
        refine_iterations=precond.refine_iterations,
        refine_precision=precond.refine_precision,
    )
    ks0 = pni.init()

    def step_body(carry: Any, _: Any):
        p, bn, o, ks = carry
        loss, bn2, grads = fwd_bwd(p, bn)
        pgrads, ks = pni.step(ks, grads, None)
        updates, o = tx.update(pgrads, o)
        return (optax.apply_updates(p, updates), bn2, o, ks), loss

    t_step = timed_scan(
        step_body, (params, batch_stats, tx.init(params), ks0),
    )
    print(
        f'step:    {t_step*1e3:7.3f} ms  '
        f'(+{(t_step-t_sgd)*1e3:.3f} total; '
        f'+{(t_step-t_direct)*1e3:.3f} cond/threading)',
    )


if __name__ == '__main__':
    main()
