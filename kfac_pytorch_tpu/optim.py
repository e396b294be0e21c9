"""Optax integration for the K-FAC preconditioner.

The reference sits between ``loss.backward()`` and ``optimizer.step()`` and
mutates ``param.grad`` in place (``README.md:60-68`` of
gpauloski/kfac-pytorch). The JAX-native equivalent is an optax gradient
transformation: chain it in front of any optimizer and the preconditioned
gradients flow through::

    precond = KFACPreconditioner(model, example_args=(x,), ...)
    tx = optax.chain(
        precond.as_gradient_transformation(),   # or kfac_transform(precond)
        optax.sgd(lr, momentum=0.9),
    )
    opt_state = tx.init(params)
    ...
    (loss, _), grads, captured = vag(params, batch)
    updates, opt_state = tx.update(grads, opt_state, params, captured=captured)
"""

from __future__ import annotations

from typing import Any

import optax

from kfac_pytorch_tpu.preconditioner import KFACPreconditioner

__all__ = ['kfac_transform']


def kfac_transform(
    precond: KFACPreconditioner,
) -> optax.GradientTransformationExtraArgs:
    """Wrap a ``KFACPreconditioner`` as an optax transformation.

    The per-step captured statistics are passed as the ``captured`` extra
    argument to ``update`` (None skips the factor-update stage, the fast
    path for non-factor-update steps).
    """

    def init_fn(params: Any) -> Any:
        del params
        return precond.init()

    def update_fn(
        updates: Any,
        state: Any,
        params: Any = None,
        *,
        captured: Any = None,
        **extra: Any,
    ) -> tuple[Any, Any]:
        del params, extra
        new_updates, new_state = precond.step(state, updates, captured)
        return new_updates, new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
