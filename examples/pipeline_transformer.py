"""Pipelined transformer training with K-FAC (the GPT-NeoX regime).

Counterpart of the reference's GPT-NeoX integration
(``kfac/gpt_neox/preconditioner.py:40-515`` of gpauloski/kfac-pytorch,
whose user drives a DeepSpeed ``PipelineModule``): a stack of
``PipelineTransformerStage`` blocks trained under
``PipelineKFACPreconditioner`` on a ``(pipe, data[, model])`` mesh --
GPipe schedule, stage-local factor capture, MEM-OPT second-order
sharding, interval-gated refresh with the warm refine solver.

Runs on any mesh-capable backend; for a local dry run use the virtual
CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/pipeline_transformer.py --force-cpu \
        --pipe 2 --data 2 --model 2
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description='Pipelined transformer + KFAC (TPU)',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument('--pipe', type=int, default=2, help='pipeline stages')
    p.add_argument('--data', type=int, default=2, help='data-parallel size')
    p.add_argument('--model', type=int, default=1,
                   help='tensor-parallel size (3D when > 1)')
    p.add_argument('--microbatches', type=int, default=4)
    p.add_argument('--batch-size', type=int, default=32,
                   help='global batch (must divide data x microbatches)')
    p.add_argument('--seq-len', type=int, default=64)
    p.add_argument('--dim', type=int, default=128)
    p.add_argument('--heads', type=int, default=4)
    p.add_argument('--ffn-dim', type=int, default=256)
    p.add_argument('--steps', type=int, default=200)
    p.add_argument('--log-every', type=int, default=20)
    p.add_argument('--lr', type=float, default=0.1)
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--force-cpu', action='store_true',
                   help='run on the (virtual) CPU mesh')
    # K-FAC flags (reference --kfac-* surface subset relevant here).
    p.add_argument('--kfac', type=int, default=1)
    p.add_argument('--kfac-factor-update-steps', type=int, default=10)
    p.add_argument('--kfac-inv-update-steps', type=int, default=100)
    p.add_argument('--kfac-damping', type=float, default=0.003)
    p.add_argument('--kfac-factor-decay', type=float, default=0.95)
    p.add_argument('--kfac-kl-clip', type=float, default=0.001)
    p.add_argument('--kfac-eigensolver', default='auto',
                   choices=['auto', 'xla', 'refine'])
    p.add_argument('--kfac-bucketed-comm', action='store_true',
                   help='coalesced triu factor all-reduce (DCN meshes)')
    p.add_argument('--kfac-static-period', action='store_true',
                   help='compile the K-FAC update schedule statically: '
                        'one dispatch per inv_update_steps batches, no '
                        'in-graph gating conds (the production GPT-NeoX-'
                        'style schedule; --steps must divide by '
                        'inv_update_steps, which must divide by '
                        'factor_update_steps)')
    p.add_argument('--kfac-inverse', action='store_true',
                   help="compute_method='inverse' (the measured-fastest "
                        'LM-regime configuration, steps-to-loss '
                        'identical to exact eigen there; '
                        'docs/PERF_NOTES.md "LM convergence A/B")')
    return p.parse_args()


def main() -> None:
    args = parse_args()
    if args.force_cpu:
        jax.config.update('jax_platforms', 'cpu')

    from jax.sharding import Mesh

    from examples.utils import maybe_init_distributed
    from kfac_pytorch_tpu import AllreduceMethod
    from kfac_pytorch_tpu import PipelineKFACPreconditioner
    from kfac_pytorch_tpu.models.transformer import PipelineTransformerStage
    from kfac_pytorch_tpu.parallel import make_pipeline_train_step

    maybe_init_distributed()
    world = args.pipe * args.data * args.model
    devices = jax.devices()[:world]
    if len(devices) < world:
        raise SystemExit(
            f'need {world} devices, have {len(jax.devices())}',
        )
    if args.model > 1:
        mesh = Mesh(
            np.array(devices).reshape(args.pipe, args.data, args.model),
            ('pipe', 'data', 'model'),
        )
    else:
        mesh = Mesh(
            np.array(devices).reshape(args.pipe, args.data),
            ('pipe', 'data'),
        )
    print(f'mesh={dict(mesh.shape)} microbatches={args.microbatches}')

    stage = PipelineTransformerStage(
        dim=args.dim, num_heads=args.heads, ffn_dim=args.ffn_dim,
    )
    mb = args.batch_size // (args.data * args.microbatches)

    def loss_fn(out: jax.Array, y: jax.Array) -> jax.Array:
        # Tied-embedding logit surrogate over the model dim.
        return optax.softmax_cross_entropy_with_integer_labels(
            out.astype(jnp.float32), y,
        ).mean()

    method_kw = (
        {
            'compute_method': 'inverse',
            'compute_eigenvalue_outer_product': False,
        }
        if args.kfac_inverse
        else {}
    )
    precond = PipelineKFACPreconditioner(
        stage,
        mesh=mesh,
        n_microbatches=args.microbatches,
        loss_fn=loss_fn,
        example_args=(jnp.zeros((mb, args.seq_len, args.dim)),),
        factor_update_steps=args.kfac_factor_update_steps,
        inv_update_steps=args.kfac_inv_update_steps,
        damping=args.kfac_damping,
        factor_decay=args.kfac_factor_decay,
        kl_clip=args.kfac_kl_clip,
        lr=args.lr,
        eigensolver=args.kfac_eigensolver,
        allreduce_method=(
            AllreduceMethod.ALLREDUCE_BUCKETED
            if args.kfac_bucketed_comm
            else AllreduceMethod.ALLREDUCE
        ),
        **method_kw,
    )
    print(
        f'KFAC registered {len(precond.specs)} stage layers x '
        f'{precond.n_stages} stages; '
        f'assignment MEM-OPT={not precond.assignment().broadcast_inverses()}',
    )

    params = precond.init_params(jax.random.PRNGKey(args.seed))
    tx = optax.sgd(args.lr, momentum=0.9)

    # Synthetic sequence-modeling task (no egress here): learnable
    # class-structured embeddings.
    rng = np.random.default_rng(args.seed)
    means = rng.normal(0, 1, (args.dim, args.dim)).astype(np.float32)

    def batch(seed: int) -> tuple[jax.Array, jax.Array]:
        r = np.random.default_rng(seed)
        y = r.integers(0, args.dim, (args.batch_size, args.seq_len))
        x = 0.5 * means[y] + 0.5 * r.normal(
            0, 1, (args.batch_size, args.seq_len, args.dim),
        ).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(y.astype(np.int32))

    if args.kfac and args.kfac_static_period:
        # Production schedule (see bench pipeline_chip_pipe1): one
        # dispatch per inv_update_steps batches, cond-free program.
        from kfac_pytorch_tpu.parallel import (
            make_pipeline_period_train_step,
        )

        ius = args.kfac_inv_update_steps
        if args.steps % ius != 0:
            raise SystemExit(
                f'--kfac-static-period requires --steps ({args.steps}) '
                f'divisible by --kfac-inv-update-steps ({ius})',
            )
        if ius % args.kfac_factor_update_steps != 0:
            raise SystemExit(
                '--kfac-static-period requires --kfac-inv-update-steps '
                f'({ius}) divisible by --kfac-factor-update-steps '
                f'({args.kfac_factor_update_steps})',
            )
        period_step = jax.jit(
            make_pipeline_period_train_step(precond, tx),
        )
        carry = (params, tx.init(params), precond.init())
        t0 = time.perf_counter()
        for chunk0 in range(0, args.steps, ius):
            pairs = [batch(chunk0 + i) for i in range(ius)]
            bxs = jnp.stack([p[0] for p in pairs])
            bys = jnp.stack([p[1] for p in pairs])
            carry, losses = period_step(carry, (bxs, bys))
            done = chunk0 + ius
            loss = float(losses[-1])
            print(
                f'step {done:5d}  loss {loss:.4f}  '
                f'ppl {math.exp(min(loss, 20.0)):.1f}  '
                f'({time.perf_counter() - t0:.1f}s)',
                flush=True,
            )
        return

    if args.kfac:
        step = jax.jit(make_pipeline_train_step(precond, tx))
        carry: tuple = (params, tx.init(params), precond.init())
    else:
        plain = precond.plain_value_and_grad()

        @jax.jit
        def step(carry, b):  # type: ignore[misc]
            p, o = carry
            loss, grads = plain(p, *b)
            updates, o = tx.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss

        carry = (params, tx.init(params))

    t0 = time.perf_counter()
    for i in range(args.steps):
        carry, loss = step(carry, batch(i))
        if (i + 1) % args.log_every == 0:
            print(
                f'step {i + 1:5d}  loss {float(loss):.4f}  '
                f'ppl {math.exp(min(float(loss), 20.0)):.1f}  '
                f'({time.perf_counter() - t0:.1f}s)',
                flush=True,
            )


if __name__ == '__main__':
    main()
