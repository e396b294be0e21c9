"""Transformer LM training with K-FAC on TPU.

Counterpart of reference ``examples/torch_language_model.py:1-297`` of
gpauloski/kfac-pytorch (Transformer on PennTreebank/WikiText with K-FAC on
the attention/FFN Linears). This environment has no network egress, so the
dataset is either a local text file (``--data-file``, byte-level encoding)
or a synthetic Zipf-distributed token stream; perplexity evaluation
matches the reference's engine.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description='Transformer LM + KFAC (TPU)',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument('--data-file', default=None,
                   help='local text file (byte-level); synthetic if absent')
    p.add_argument('--vocab-size', type=int, default=256)
    p.add_argument('--seq-len', type=int, default=128)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--epochs', type=int, default=5)
    p.add_argument('--steps-per-epoch', type=int, default=200)
    p.add_argument('--dim', type=int, default=256)
    p.add_argument('--layers', type=int, default=4)
    p.add_argument('--heads', type=int, default=8)
    p.add_argument('--ffn-dim', type=int, default=1024)
    p.add_argument('--base-lr', type=float, default=0.001)
    p.add_argument('--seed', type=int, default=42)
    # KFAC flags (reference torch_language_model.py:246-262)
    p.add_argument('--kfac-inv-update-steps', type=int, default=10)
    p.add_argument('--kfac-factor-update-steps', type=int, default=1)
    p.add_argument('--kfac-factor-decay', type=float, default=0.95)
    p.add_argument('--kfac-damping', type=float, default=0.003)
    p.add_argument('--kfac-kl-clip', type=float, default=0.001)
    p.add_argument('--kfac-worker-fraction', type=float, default=None)
    p.add_argument('--kfac-skip-layers', nargs='+', default=['lm_head'])
    p.add_argument('--kfac-gram-method', type=str, default='full',
                   choices=['full', 'tri', 'auto'],
                   help='Gram contraction scheme for the covariances')
    p.add_argument('--kfac-compute-method', type=str, default='inverse',
                   choices=['eigen', 'inverse'],
                   help='Second-order representation (reference '
                        'ComputeMethod). The LM production default is '
                        "'inverse': convergence-equivalent to exact "
                        'eigen in the LM regime and the fastest '
                        'configuration measured (docs/PERF_NOTES.md '
                        '"Round-4: transformer-LM under the bar").')
    p.add_argument('--kfac-eigensolver', type=str, default='xla',
                   choices=['auto', 'xla', 'refine', 'jacobi'],
                   help="In-loop eigensolver for --kfac-compute-method "
                        "eigen. Default 'xla' (exact): the warm refine "
                        'solver lags convergence on LM token-covariance '
                        'spectra at its aggressive defaults '
                        '(docs/PERF_NOTES.md LM convergence A/B).')
    p.add_argument('--force-cpu', action='store_true',
                   help='run on the CPU platform even when a TPU plugin '
                        'is registered; virtualizes 8 CPU devices '
                        '(xla_force_host_platform_device_count) so the '
                        'sharded/multi-device code paths are exercised')
    p.add_argument('--kfac-static-period', action='store_true',
                   help='compile the K-FAC update schedule statically '
                        '(make_period_train_step): one dispatch per '
                        'inv_update_steps batches, zero in-graph gating '
                        'conds. Measured ~2 ms/step faster than the '
                        'dynamically gated step on the LM bench workload '
                        '(docs/PERF_NOTES.md). Requires steps-per-epoch '
                        'divisible by inv-update-steps.')
    return p.parse_args()


def token_stream(args: argparse.Namespace) -> np.ndarray:
    if args.data_file and os.path.exists(args.data_file):
        raw = np.fromfile(args.data_file, np.uint8)
        return raw.astype(np.int32) % args.vocab_size
    rng = np.random.default_rng(args.seed)
    # Zipfian synthetic text with local bigram structure
    base = rng.zipf(1.3, size=500_000).astype(np.int32) % args.vocab_size
    return np.convolve(base, [1, 1], mode='same').astype(np.int32) % (
        args.vocab_size
    )


def batches(stream: np.ndarray, args: argparse.Namespace, rng: np.random.Generator):
    n = len(stream) - args.seq_len - 1
    while True:
        idx = rng.integers(0, n, args.batch_size)
        xs = np.stack([stream[i:i + args.seq_len] for i in idx])
        ys = np.stack([stream[i + 1:i + args.seq_len + 1] for i in idx])
        yield xs, ys


def main() -> None:
    from kfac_pytorch_tpu import KFACPreconditioner
    from kfac_pytorch_tpu.models.transformer import TransformerLM
    from kfac_pytorch_tpu.parallel import kaisa_mesh, KAISASharding
    from jax.sharding import NamedSharding

    from examples.utils import maybe_init_distributed

    args = parse_args()
    if args.force_cpu:
        from examples.utils import force_cpu_platform

        force_cpu_platform()
    maybe_init_distributed()
    rng = np.random.default_rng(args.seed)
    stream = token_stream(args)
    split = int(len(stream) * 0.95)
    train_iter = batches(stream[:split], args, rng)
    val_iter = batches(stream[split:], args, rng)

    model = TransformerLM(
        vocab_size=args.vocab_size,
        dim=args.dim,
        num_heads=args.heads,
        num_layers=args.layers,
        ffn_dim=args.ffn_dim,
        max_len=args.seq_len,
    )
    x0, _ = next(train_iter)
    params = model.init(jax.random.PRNGKey(args.seed), x0)['params']

    def loss_fn(p, bx, by):
        logits = model.apply({'params': p}, bx)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, by,
        ).mean()

    n_dev = len(jax.devices())
    sharding = None
    data_sharding = None
    if n_dev > 1:
        fraction = (
            args.kfac_worker_fraction
            if args.kfac_worker_fraction is not None
            else 1.0
        )
        mesh = kaisa_mesh(fraction)
        sharding = KAISASharding(mesh)
        data_sharding = NamedSharding(mesh, sharding.data_spec())

    precond = None
    if args.kfac_inv_update_steps > 0:
        precond = KFACPreconditioner(
            model,
            example_args=(x0,),
            factor_update_steps=args.kfac_factor_update_steps,
            inv_update_steps=args.kfac_inv_update_steps,
            damping=args.kfac_damping,
            factor_decay=args.kfac_factor_decay,
            kl_clip=args.kfac_kl_clip,
            lr=args.base_lr,
            skip_layers=args.kfac_skip_layers,
            sharding=sharding,
            gram_method=args.kfac_gram_method,
            compute_method=args.kfac_compute_method,
            compute_eigenvalue_outer_product=(
                args.kfac_compute_method == 'eigen'
            ),
            eigensolver=args.kfac_eigensolver,
        )
        print(f'KFAC registered {len(precond.specs)} layers:')
        for name in precond.specs:
            print(f'  {name}')

    tx = optax.adamw(args.base_lr)
    opt_state = tx.init(params)
    kfac_state = precond.init() if precond else ()

    vag = (
        precond.value_and_grad(loss_fn)
        if precond
        else None
    )

    @jax.jit
    def train_step_kfac(params, opt_state, kfac_state, bx, by):
        (loss, _), grads, captured = vag(params, bx, by)
        pgrads, kfac_state = precond.step(kfac_state, grads, captured)
        updates, opt_state = tx.update(pgrads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, kfac_state, loss

    @jax.jit
    def train_step_plain(params, opt_state, kfac_state, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        if precond is not None:
            grads, kfac_state = precond.step(kfac_state, grads, None)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, kfac_state, loss

    @jax.jit
    def eval_step(params, bx, by):
        return loss_fn(params, bx, by)

    def put(a, sharding=None):
        from examples.utils import shard_batch

        return shard_batch(a, data_sharding if sharding is None else sharding)

    # Static-period schedule: one dispatch per inv_update_steps batches
    # with the whole K-FAC update cadence baked into the compiled program
    # (no lax.cond gating; measured ~2 ms/step faster on the LM bench
    # workload, docs/PERF_NOTES.md). The dynamic two-function gating above
    # stays the default because it tolerates arbitrary step counts and
    # scheduled intervals.
    period_step = None
    if args.kfac_static_period:
        if precond is None:
            raise SystemExit(
                '--kfac-static-period requires K-FAC '
                '(--kfac-inv-update-steps > 0)',
            )
        if args.steps_per_epoch % args.kfac_inv_update_steps != 0:
            raise SystemExit(
                '--kfac-static-period requires --steps-per-epoch '
                f'({args.steps_per_epoch}) divisible by '
                f'--kfac-inv-update-steps ({args.kfac_inv_update_steps})',
            )
        if args.kfac_inv_update_steps % args.kfac_factor_update_steps != 0:
            raise SystemExit(
                '--kfac-static-period requires --kfac-inv-update-steps '
                f'({args.kfac_inv_update_steps}) divisible by '
                '--kfac-factor-update-steps '
                f'({args.kfac_factor_update_steps})',
            )
        from kfac_pytorch_tpu.train import (
            KFACTrainCarry,
            make_period_train_step,
        )

        period_step = jax.jit(make_period_train_step(precond, loss_fn, tx))
        period_sharding = None
        if data_sharding is not None:
            from jax.sharding import PartitionSpec

            # Stacked [ius, batch, ...] periods: replicate the scan axis,
            # shard the batch axis exactly as the per-step path does.
            period_sharding = NamedSharding(
                data_sharding.mesh,
                PartitionSpec(None, *data_sharding.spec),
            )
        carry = KFACTrainCarry(params, opt_state, kfac_state, None)

    step = 0
    for epoch in range(args.epochs):
        total = 0.0
        if period_step is not None:
            ius = args.kfac_inv_update_steps
            for _ in range(args.steps_per_epoch // ius):
                pairs = [next(train_iter) for _ in range(ius)]
                bxs = put(np.stack([p[0] for p in pairs]), period_sharding)
                bys = put(np.stack([p[1] for p in pairs]), period_sharding)
                carry, losses = period_step(carry, (bxs, bys))
                total += float(jnp.sum(losses))
                step += ius
            params = carry.params
        else:
            for _ in range(args.steps_per_epoch):
                bx, by = next(train_iter)
                bx, by = put(bx), put(by)
                if precond is not None and precond.should_update_factors(
                    step,
                ):
                    params, opt_state, kfac_state, loss = train_step_kfac(
                        params, opt_state, kfac_state, bx, by,
                    )
                else:
                    params, opt_state, kfac_state, loss = train_step_plain(
                        params, opt_state, kfac_state, bx, by,
                    )
                total += float(loss)
                step += 1
        val_losses = []
        for _ in range(20):
            bx, by = next(val_iter)
            val_losses.append(float(eval_step(params, put(bx), put(by))))
        val_loss = float(np.mean(val_losses))
        print(
            f'epoch {epoch}: train_loss={total / args.steps_per_epoch:.4f} '
            f'val_loss={val_loss:.4f} val_ppl={math.exp(val_loss):.2f}',
        )


if __name__ == '__main__':
    main()
