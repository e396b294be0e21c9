"""Multiplicative hyperparameter scheduler.

Counterpart of reference ``LambdaParamScheduler`` (``kfac/scheduler.py:
10-167`` of gpauloski/kfac-pytorch). The preconditioner's non-callable
hyperparameters are multiplied in place by per-step lambda factors. Because
the hyperparameters live on the (Python-side) preconditioner object and are
fed into jit as scalars, mutating them does not trigger recompilation.
"""

from __future__ import annotations

from collections.abc import Callable

from kfac_pytorch_tpu.preconditioner import KFACPreconditioner

__all__ = ['LambdaParamScheduler']

_FIELDS = (
    'factor_update_steps',
    'inv_update_steps',
    'damping',
    'factor_decay',
    'kl_clip',
    'lr',
)


class LambdaParamScheduler:
    """Multiplicative lambda schedules for K-FAC hyperparameters.

    Note:
        Mutually exclusive with passing callables for the corresponding
        hyperparameters to the preconditioner (same contract as the
        reference, ``kfac/scheduler.py:82-117``).
    """

    def __init__(
        self,
        preconditioner: KFACPreconditioner,
        *,
        factor_update_steps_lambda: Callable[[int], float] | None = None,
        inv_update_steps_lambda: Callable[[int], float] | None = None,
        damping_lambda: Callable[[int], float] | None = None,
        factor_decay_lambda: Callable[[int], float] | None = None,
        kl_clip_lambda: Callable[[int], float] | None = None,
        lr_lambda: Callable[[int], float] | None = None,
    ) -> None:
        self._preconditioner = preconditioner
        self._lambdas = {
            'factor_update_steps': factor_update_steps_lambda,
            'inv_update_steps': inv_update_steps_lambda,
            'damping': damping_lambda,
            'factor_decay': factor_decay_lambda,
            'kl_clip': kl_clip_lambda,
            'lr': lr_lambda,
        }
        self._steps = 0
        for field, lam in self._lambdas.items():
            if lam is not None and callable(
                getattr(preconditioner, f'_{field}'),
            ):
                raise ValueError(
                    f'preconditioner.{field} is already a callable and '
                    'cannot be updated by the LambdaParamScheduler.',
                )

    def step(self, step: int | None = None) -> None:
        """Multiply each scheduled hyperparameter by its lambda factor.

        Call after ``preconditioner.step()``; ``step`` overrides the
        internal call counter when given.
        """
        current = step if step is not None else self._steps
        for field, lam in self._lambdas.items():
            if lam is None:
                continue
            factor = lam(current)
            attr = f'_{field}'
            value = getattr(self._preconditioner, attr)
            assert not callable(value)
            new_value = value * factor
            if field in ('factor_update_steps', 'inv_update_steps'):
                new_value = int(new_value)
            setattr(self._preconditioner, attr, new_value)
        self._steps += 1
