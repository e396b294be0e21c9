"""Optimizer + preconditioner construction from CLI args.

Counterpart of reference ``examples/vision/optimizers.py:16-114`` of
gpauloski/kfac-pytorch: builds SGD, the KFAC preconditioner (when
``--kfac-update-freq > 0``), the LR schedule, and the KFAC param
scheduler from parsed args.
"""

from __future__ import annotations

import argparse
from typing import Any

import optax

from examples.utils import create_lr_schedule
from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.scheduler import LambdaParamScheduler

__all__ = ['get_optimizer']


def get_optimizer(
    model: Any,
    example_input: Any,
    args: argparse.Namespace,
    steps_per_epoch: int,
    sharding: Any = None,
) -> tuple[Any, KFACPreconditioner | None, Any, LambdaParamScheduler | None]:
    """Build (optax optimizer, preconditioner, lr schedule, kfac scheduler)."""
    lr_schedule = create_lr_schedule(
        args.base_lr,
        warmup_epochs=args.warmup_epochs,
        decay_epochs=args.lr_decay,
        steps_per_epoch=steps_per_epoch,
    )
    tx = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.sgd(lr_schedule, momentum=args.momentum),
    )

    if args.kfac_inv_update_steps <= 0:
        return tx, None, lr_schedule, None

    # lr callable wired to the same schedule, mirroring the reference's
    # ``lr=lambda x: optimizer.param_groups[0]['lr']``
    # (examples/vision/optimizers.py:63).
    precond = KFACPreconditioner(
        model,
        example_args=(example_input,),
        factor_update_steps=args.kfac_factor_update_steps,
        inv_update_steps=args.kfac_inv_update_steps,
        damping=args.kfac_damping,
        factor_decay=args.kfac_factor_decay,
        kl_clip=args.kfac_kl_clip,
        lr=lambda step: lr_schedule(step),
        accumulation_steps=args.batches_per_allreduce,
        colocate_factors=args.kfac_colocate_factors,
        compute_method=args.kfac_compute_method,
        compute_eigenvalue_outer_product=(
            args.kfac_compute_eigenvalue_outer_product
        ),
        grad_worker_fraction=args.kfac_worker_fraction,
        sharding=sharding,
        skip_layers=args.kfac_skip_layers,
        conv_a_factor_method=getattr(
            args, 'kfac_conv_a_factor_method', 'auto',
        ),
        gram_method=getattr(args, 'kfac_gram_method', 'full'),
    )

    # Epoch-boundary multiplicative schedules: damping and the update
    # intervals decay by alpha at their decay epochs (reference
    # ``examples/vision/optimizers.py:75-109``). The scheduler returns a
    # new KFACState; the caller threads it:
    #   state = sched.step(state.kfac_state, epoch)
    def decay_lambda(alpha: float, epochs: Any):
        eps = set(epochs or ())
        return lambda epoch: alpha if epoch in eps else 1.0

    kfac_scheduler = None
    update_decay = getattr(args, 'kfac_update_steps_decay', None)
    if args.kfac_damping_decay or update_decay:
        kwargs: dict[str, Any] = {}
        if args.kfac_damping_decay:
            kwargs['damping_lambda'] = decay_lambda(
                args.kfac_damping_alpha, args.kfac_damping_decay,
            )
        if update_decay:
            alpha = args.kfac_update_steps_alpha
            kwargs['factor_update_steps_lambda'] = decay_lambda(
                alpha, update_decay,
            )
            kwargs['inv_update_steps_lambda'] = decay_lambda(
                alpha, update_decay,
            )
        kfac_scheduler = LambdaParamScheduler(precond, **kwargs)
    return tx, precond, lr_schedule, kfac_scheduler
