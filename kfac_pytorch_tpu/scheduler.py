"""Multiplicative hyperparameter scheduler.

Counterpart of reference ``LambdaParamScheduler`` (``kfac/scheduler.py:
10-167`` of gpauloski/kfac-pytorch). The reference multiplies mutable
hyperparameter fields on the preconditioner object; here the schedulable
hyperparameters live in ``KFACState.hyperparams`` as traced scalars, so
``step`` is a *functional* update: it returns a new state whose values a
jitted ``precond.step`` reads as inputs on its next call. No
recompilation is triggered, and -- unlike mutating Python attributes --
the mutation actually reaches the compiled function.

One structural caveat: a step function compiled while an update interval
(``factor_update_steps`` / ``inv_update_steps``) is the literal constant 1
specializes away the interval gate entirely; scheduling that interval
upward later could never take effect, so ``__init__`` rejects interval
lambdas on literal-1 intervals loudly (see
``KFACPreconditioner._static_one``).
"""

from __future__ import annotations

from collections.abc import Callable

import jax.numpy as jnp

from kfac_pytorch_tpu.preconditioner import KFACPreconditioner
from kfac_pytorch_tpu.state import KFACState

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

    Usage::

        sched = LambdaParamScheduler(precond, damping_lambda=lambda e: 0.5)
        ...
        state = sched.step(state)          # at each decay boundary

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
        self._calls = 0
        for field, lam in self._lambdas.items():
            if lam is None:
                continue
            if callable(getattr(preconditioner, f'_{field}')):
                raise ValueError(
                    f'preconditioner.{field} is already a callable and '
                    'cannot be updated by the LambdaParamScheduler.',
                )
            if field == 'kl_clip' and preconditioner._kl_clip is None:
                raise ValueError(
                    'kl_clip_lambda given but the preconditioner was '
                    'constructed with kl_clip=None',
                )
            if (
                field in ('factor_update_steps', 'inv_update_steps')
                and preconditioner._static_one(field)
            ):
                # A step compiled with the interval as the literal 1
                # specializes the gate away entirely: scheduling the
                # interval upward later would silently keep every-step
                # updates. The reference mutates the field dynamically
                # (kfac/scheduler.py:119-167); here the caller must
                # construct the preconditioner with a non-1 interval (or
                # a traced initial value) to keep the gate compiled in.
                raise ValueError(
                    f'{field}_lambda given but the preconditioner was '
                    f'constructed with {field}=1: the compiled step '
                    'specializes away the interval gate and can never '
                    f'honor the schedule. Construct with {field} > 1 '
                    '(the scheduler can still scale it down to 1).',
                )

    def step(
        self,
        state: KFACState,
        step: int | None = None,
    ) -> KFACState:
        """Multiply each scheduled hyperparameter by its lambda factor.

        Args:
            state: current preconditioner state; the scheduled values in
                ``state.hyperparams`` are multiplied.
            step: value passed to the lambdas. Defaults to the
                preconditioner's actual step count ``int(state.steps)``
                (matching the reference, which feeds
                ``preconditioner.steps``, ``kfac/scheduler.py:128-167``) --
                NOT a per-call counter, so scan/chunked train loops that
                advance many K-FAC steps per host call keep reference
                cadence. Call-count cadence is available via
                ``step=scheduler.calls``.

        Returns:
            The state with updated ``hyperparams``.
        """
        current = int(state.steps) if step is None else step
        hp = dict(state.hyperparams)
        for field, lam in self._lambdas.items():
            if lam is None:
                continue
            factor = lam(current)
            value = hp[field] * factor
            if field in ('factor_update_steps', 'inv_update_steps'):
                value = jnp.asarray(value, jnp.int32)
            else:
                value = jnp.asarray(value, jnp.float32)
            hp[field] = value
            # Mirror onto the Python-side constant so introspection
            # (__repr__, should_update_factors) stays consistent.
            pyval = value.item()
            setattr(self._preconditioner, f'_{field}', pyval)
        self._calls += 1
        return state.replace(hyperparams=hp)

    @property
    def calls(self) -> int:
        """Number of times ``step`` has been called."""
        return self._calls
