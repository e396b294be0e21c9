"""CIFAR-10 ResNet training with distributed K-FAC on TPU.

Counterpart of reference ``examples/torch_cifar10_resnet.py:148-394`` of
gpauloski/kfac-pytorch: same flag surface (--kfac-* hyperparameters, model
selection, LR schedule, checkpoint resume) re-targeted at a TPU mesh.
Data parallelism is pjit over the KAISA mesh instead of DDP; run once per
host, not once per device.

Example:
    python examples/cifar10_resnet.py --model resnet32 --epochs 10 \
        --kfac-inv-update-steps 10 --kfac-worker-fraction 0.5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description='CIFAR-10 ResNet + KFAC (TPU)',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    # Data/model (reference torch_cifar10_resnet.py:153-176)
    p.add_argument('--data-dir', default=None,
                   help='cifar-10-batches-bin dir (synthetic if absent)')
    p.add_argument('--model', default='resnet32',
                   choices=['resnet20', 'resnet32', 'resnet44', 'resnet56',
                            'resnet110'])
    p.add_argument('--batch-size', type=int, default=128)
    p.add_argument('--val-batch-size', type=int, default=128)
    p.add_argument('--batches-per-allreduce', type=int, default=1,
                   help='gradient accumulation microbatches')
    p.add_argument('--epochs', type=int, default=100)
    p.add_argument('--seed', type=int, default=42)
    # Optimizer (reference :178-198)
    p.add_argument('--base-lr', type=float, default=0.1)
    p.add_argument('--lr-decay', nargs='+', type=int, default=[35, 75, 90])
    p.add_argument('--warmup-epochs', type=int, default=5)
    p.add_argument('--momentum', type=float, default=0.9)
    p.add_argument('--weight-decay', type=float, default=5e-4)
    # KFAC (reference :200-237)
    p.add_argument('--kfac-inv-update-steps', type=int, default=10,
                   help='0 disables KFAC')
    p.add_argument('--kfac-factor-update-steps', type=int, default=1)
    p.add_argument('--kfac-update-steps-alpha', type=float, default=10)
    p.add_argument('--kfac-update-steps-decay', nargs='+', type=int,
                   default=None)
    p.add_argument('--kfac-inv-method', action='store_true',
                   help='use inverse method instead of eigen')
    p.add_argument('--kfac-factor-decay', type=float, default=0.95)
    p.add_argument('--kfac-damping', type=float, default=0.003)
    p.add_argument('--kfac-damping-alpha', type=float, default=0.5)
    p.add_argument('--kfac-damping-decay', nargs='+', type=int,
                   default=None)
    p.add_argument('--kfac-kl-clip', type=float, default=0.001)
    p.add_argument('--kfac-skip-layers', nargs='+', type=str,
                   default=['shortcut'])
    p.add_argument('--kfac-colocate-factors', action='store_true',
                   default=True)
    p.add_argument('--kfac-strategy', type=str, default='comm-opt',
                   choices=['comm-opt', 'mem-opt', 'hybrid-opt'])
    p.add_argument('--kfac-worker-fraction', type=float, default=None,
                   help='overrides --kfac-strategy when set')
    p.add_argument('--kfac-compute-eigenvalue-outer-product',
                   action='store_true', default=True)
    p.add_argument('--kfac-conv-a-factor-method', type=str, default='auto',
                   choices=['auto', 'patches', 'slices', 'convgrad',
                            'rowgram'],
                   help='conv A-factor algorithm (TPU perf knob)')
    p.add_argument('--kfac-gram-method', type=str, default='full',
                   choices=['full', 'tri', 'auto'],
                   help='Gram contraction scheme for plain covariances')
    # Checkpointing (reference :313-317)
    p.add_argument('--force-cpu', action='store_true',
                   help='run on the CPU platform even when a TPU plugin '
                        'is registered; virtualizes 8 CPU devices so the '
                        'sharded/multi-device code paths are exercised')
    p.add_argument('--synthetic-size', type=int, default=2560,
                   help='training-set size of the synthetic fallback '
                        'dataset (used when --data-dir is absent)')
    p.add_argument('--checkpoint-dir', default=None)
    p.add_argument('--checkpoint-freq', type=int, default=10)
    p.add_argument('--log-every', type=int, default=50)
    return p.parse_args()


def main() -> None:
    from examples.vision import datasets
    from examples.vision.engine import Trainer
    from kfac_pytorch_tpu import DistributedStrategy
    from kfac_pytorch_tpu import models
    from kfac_pytorch_tpu.parallel import kaisa_mesh
    from kfac_pytorch_tpu.parallel import KAISASharding
    from jax.sharding import NamedSharding

    from examples.utils import maybe_init_distributed

    args = parse_args()
    if args.force_cpu:
        from examples.utils import force_cpu_platform

        force_cpu_platform()
    maybe_init_distributed()
    args.kfac_compute_method = (
        'inverse' if args.kfac_inv_method else 'eigen'
    )

    np.random.seed(args.seed)

    if args.kfac_worker_fraction is not None:
        fraction = args.kfac_worker_fraction
    else:
        fraction = {
            'comm-opt': DistributedStrategy.COMM_OPT,
            'mem-opt': DistributedStrategy.MEM_OPT,
            'hybrid-opt': DistributedStrategy.HYBRID_OPT,
        }[args.kfac_strategy]

    n_dev = len(jax.devices())
    sharding = None
    data_sharding = None
    if n_dev > 1:
        mesh = kaisa_mesh(fraction)
        sharding = KAISASharding(mesh)
        data_sharding = NamedSharding(mesh, sharding.data_spec())
        print(f'devices={n_dev} mesh={dict(mesh.shape)}')

    train_ds, val_ds = datasets.cifar10(
        args.data_dir,
        args.batch_size * max(n_dev, 1),
        args.val_batch_size * max(n_dev, 1),
        seed=args.seed,
        synthetic_size=args.synthetic_size,
    )
    steps_per_epoch = len(train_ds)

    model = getattr(models, args.model)()
    x0, _ = next(iter(train_ds.epoch()))
    variables = model.init(jax.random.PRNGKey(args.seed), x0[:2])

    from examples.vision.optimizers import get_optimizer

    tx, precond, lr_schedule, kfac_scheduler = get_optimizer(
        model, x0[:2], args, steps_per_epoch, sharding=sharding,
    )
    if precond is not None:
        print(f'KFAC registered {len(precond.specs)} layers')

    trainer = Trainer(
        model=model,
        tx=tx,
        precond=precond,
        data_sharding=data_sharding,
    )
    state = trainer.init_state(
        variables['params'], variables['batch_stats'],
    )

    start_epoch = 0
    from examples.utils import latest_checkpoint, load_checkpoint, \
        save_checkpoint

    if args.checkpoint_dir:
        latest = latest_checkpoint(args.checkpoint_dir)
        if latest is not None:
            template = {
                'params': state.params,
                'opt_state': state.opt_state,
                'extra': {'epoch': 0},
            }
            restored = load_checkpoint(latest, template)
            state = state.replace(
                params=restored['params'],
                opt_state=restored['opt_state'],
            )
            start_epoch = int(restored['extra']['epoch']) + 1
            print(f'resumed from {latest} at epoch {start_epoch}')

    for epoch in range(start_epoch, args.epochs):
        if args.batches_per_allreduce > 1 and precond is not None:
            state, train_loss = trainer.train_epoch_accumulated(
                state, train_ds, epoch, args.batches_per_allreduce,
            )
        else:
            state, train_loss = trainer.train_epoch(
                state, train_ds, epoch, log_every=args.log_every,
            )
        val_loss, val_acc = trainer.evaluate(state, val_ds)
        print(
            f'epoch {epoch}: train_loss={train_loss:.4f} '
            f'val_loss={val_loss:.4f} val_acc={val_acc * 100:.2f}%',
        )
        if kfac_scheduler is not None:
            state = state.replace(
                kfac_state=kfac_scheduler.step(state.kfac_state, epoch),
            )
        if (
            args.checkpoint_dir
            and (epoch + 1) % args.checkpoint_freq == 0
        ):
            path = os.path.join(args.checkpoint_dir, f'ckpt_{epoch}')
            save_checkpoint(
                path,
                params=state.params,
                opt_state=state.opt_state,
                kfac_state=(
                    state.kfac_state if precond is not None else None
                ),
                extra={'epoch': epoch},
            )
            print(f'saved checkpoint {path}')


if __name__ == '__main__':
    main()
