"""Common hyperparameter schedules.

Counterpart of reference ``kfac/hyperparams.py:8-47`` of
gpauloski/kfac-pytorch, written with jnp ops so schedules can run on traced
step counters inside jit.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax.numpy as jnp

__all__ = ['exp_decay_factor_averaging']


def exp_decay_factor_averaging(
    min_value: float = 0.95,
) -> Callable[[Any], Any]:
    """Exponentially decaying factor-averaging schedule (Martens 2015).

    Returns a callable mapping the K-FAC step ``k`` to
    ``min(1 - 1/k, min_value)`` with ``k=0`` treated as ``k=1``. The
    callable accepts either Python ints or traced jnp integers, so it can
    be passed as ``factor_decay`` and evaluated inside jit.
    """
    if min_value <= 0:
        raise ValueError('min_value must be greater than 0')

    def _factor_weight(step: Any) -> Any:
        if isinstance(step, int):
            if step < 0:
                raise ValueError(
                    f'step value cannot be negative. Got step={step}.',
                )
            k = max(step, 1)
            return min(1 - (1 / k), min_value)
        k = jnp.maximum(step, 1).astype(jnp.float32)
        return jnp.minimum(1.0 - 1.0 / k, min_value)

    return _factor_weight
