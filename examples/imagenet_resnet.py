"""ImageNet ResNet training with distributed K-FAC on TPU.

Counterpart of reference ``examples/torch_imagenet_resnet.py:1-403`` of
gpauloski/kfac-pytorch: ResNet-50-class training with label smoothing,
warmup + step-decay LR, K-FAC with KAISA strategies, and checkpointing.
No-egress environment: data comes from a local directory of preprocessed
``.npy`` shards (``--data-dir`` with ``train_images.npy``/
``train_labels.npy``/``val_*.npy``) or a synthetic stream at ImageNet
shapes.
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
        description='ImageNet ResNet + KFAC (TPU)',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument('--data-dir', default=None)
    p.add_argument('--model', default='resnet50',
                   choices=['resnet18', 'resnet34', 'resnet50', 'resnet101',
                            'resnet152'])
    p.add_argument('--image-size', type=int, default=224)
    p.add_argument('--batch-size', type=int, default=32)
    p.add_argument('--val-batch-size', type=int, default=32)
    p.add_argument('--batches-per-allreduce', type=int, default=1)
    p.add_argument('--epochs', type=int, default=55)
    p.add_argument('--seed', type=int, default=42)
    p.add_argument('--label-smoothing', type=float, default=0.1)
    p.add_argument('--base-lr', type=float, default=0.0125)
    p.add_argument('--lr-decay', nargs='+', type=int, default=[25, 35, 40, 45,
                                                               50])
    p.add_argument('--warmup-epochs', type=int, default=5)
    p.add_argument('--momentum', type=float, default=0.9)
    p.add_argument('--weight-decay', type=float, default=5e-5)
    # KFAC
    p.add_argument('--kfac-inv-update-steps', type=int, default=100)
    p.add_argument('--kfac-factor-update-steps', type=int, default=10)
    p.add_argument('--kfac-update-steps-alpha', type=float, default=10)
    p.add_argument('--kfac-update-steps-decay', nargs='+', type=int,
                   default=None)
    p.add_argument('--kfac-inv-method', action='store_true')
    p.add_argument('--kfac-factor-decay', type=float, default=0.95)
    p.add_argument('--kfac-damping', type=float, default=0.001)
    p.add_argument('--kfac-damping-alpha', type=float, default=0.5)
    p.add_argument('--kfac-damping-decay', nargs='+', type=int, default=None)
    p.add_argument('--kfac-kl-clip', type=float, default=0.001)
    p.add_argument('--kfac-skip-layers', nargs='+', default=['shortcut'])
    p.add_argument('--kfac-colocate-factors', action='store_true',
                   default=True)
    p.add_argument('--kfac-strategy', default='comm-opt',
                   choices=['comm-opt', 'mem-opt', 'hybrid-opt'])
    p.add_argument('--kfac-worker-fraction', type=float, default=None)
    p.add_argument('--kfac-compute-eigenvalue-outer-product',
                   action='store_true', default=True)
    p.add_argument('--kfac-conv-a-factor-method', type=str, default='auto',
                   choices=['auto', 'patches', 'slices', 'convgrad',
                            'rowgram'],
                   help='conv A-factor algorithm (TPU perf knob)')
    p.add_argument('--kfac-gram-method', type=str, default='full',
                   choices=['full', 'tri', 'auto'],
                   help='Gram contraction scheme for plain covariances')
    p.add_argument('--checkpoint-dir', default=None)
    p.add_argument('--checkpoint-freq', type=int, default=5)
    p.add_argument('--log-every', type=int, default=50)
    p.add_argument('--synthetic-size', type=int, default=1280)
    p.add_argument('--force-cpu', action='store_true',
                   help='run on the CPU platform even when a TPU plugin '
                        'is registered; virtualizes 8 CPU devices so the '
                        'sharded/multi-device code paths are exercised')
    return p.parse_args()


def load_datasets(args: argparse.Namespace):
    from examples.vision.datasets import Dataset, synthetic

    shape = (args.image_size, args.image_size, 3)
    if args.data_dir:
        paths = {
            k: os.path.join(args.data_dir, f'{k}.npy')
            for k in ('train_images', 'train_labels', 'val_images',
                      'val_labels')
        }
        if all(os.path.exists(v) for v in paths.values()):
            train_x = np.load(paths['train_images'], mmap_mode='r')
            train_y = np.load(paths['train_labels'])
            val_x = np.load(paths['val_images'], mmap_mode='r')
            val_y = np.load(paths['val_labels'])
            return (
                Dataset(train_x, train_y, args.batch_size, train=True,
                        seed=args.seed),
                Dataset(val_x, val_y, args.val_batch_size, train=False),
            )
    return synthetic(
        shape, 1000, args.batch_size, args.val_batch_size, args.seed,
        size=args.synthetic_size,
    )


def main() -> None:
    from examples.utils import label_smooth_loss
    from examples.vision.engine import Trainer
    from examples.vision.optimizers import get_optimizer
    from kfac_pytorch_tpu import DistributedStrategy
    from kfac_pytorch_tpu.models import imagenet_resnet
    from kfac_pytorch_tpu.parallel import kaisa_mesh, KAISASharding
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

    fraction = (
        args.kfac_worker_fraction
        if args.kfac_worker_fraction is not None
        else {
            'comm-opt': DistributedStrategy.COMM_OPT,
            'mem-opt': DistributedStrategy.MEM_OPT,
            'hybrid-opt': DistributedStrategy.HYBRID_OPT,
        }[args.kfac_strategy]
    )

    n_dev = len(jax.devices())
    sharding = None
    data_sharding = None
    if n_dev > 1:
        mesh = kaisa_mesh(fraction)
        sharding = KAISASharding(mesh)
        data_sharding = NamedSharding(mesh, sharding.data_spec())
        print(f'devices={n_dev} mesh={dict(mesh.shape)}')

    train_ds, val_ds = load_datasets(args)
    model = getattr(
        imagenet_resnet, f'{args.model}_imagenet',
    )()
    x0, _ = next(iter(train_ds.epoch()))
    variables = model.init(jax.random.PRNGKey(args.seed), x0[:2])

    tx, precond, lr_schedule, kfac_scheduler = get_optimizer(
        model, x0[:2], args, len(train_ds), sharding=sharding,
    )
    if precond is not None:
        print(f'KFAC registered {len(precond.specs)} layers')

    trainer = Trainer(
        model=model,
        tx=tx,
        precond=precond,
        loss_fn=lambda logits, labels: label_smooth_loss(
            logits, labels, args.label_smoothing,
        ),
        data_sharding=data_sharding,
    )
    state = trainer.init_state(variables['params'], variables['batch_stats'])

    from examples.utils import latest_checkpoint, load_checkpoint, \
        save_checkpoint

    start_epoch = 0
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
        if args.checkpoint_dir and (epoch + 1) % args.checkpoint_freq == 0:
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
