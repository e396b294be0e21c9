"""Checkpoint save/restore for K-FAC state (Orbax-backed).

Counterpart of the reference's two-level checkpoint story
(``kfac/base_preconditioner.py:215-308`` and the GPT-NeoX
``factor_checkpoint_dir`` path, ``kfac/gpt_neox/preconditioner.py:352-447``
of gpauloski/kfac-pytorch). On TPU the sharded-factor gather problem
disappears: Orbax writes each device's shards of the block-stacked factor
arrays directly (the state pytree carries its shardings), so the MEM-OPT
"factors live only on their owner" layout checkpoints without any CPU
gather or per-layer files.

Only the running factors + step counter are persisted; second-order state
is recomputed on restore (same contract as the reference).
"""

from __future__ import annotations

from typing import Any

import jax

from kfac_pytorch_tpu.preconditioner import KFACPreconditioner
from kfac_pytorch_tpu.state import KFACState

__all__ = ['save_kfac_state', 'restore_kfac_state']


def _factors_only(state: KFACState) -> dict[str, Any]:
    return {
        'steps': state.steps,
        'factors': {
            name: {'a': cf.a, 'g': cf.g}
            for name, cf in state.factors.items()
        },
    }


def save_kfac_state(path: str, state: KFACState) -> None:
    """Write factors + step counter to an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _factors_only(state))


def restore_kfac_state(
    path: str,
    precond: KFACPreconditioner,
    compute_inverses: bool = True,
) -> KFACState:
    """Restore factors and (optionally) recompute second-order state.

    Mirrors ``load_state_dict(compute_inverses=True)`` semantics
    (reference ``base_preconditioner.py:249-308``): inverses are not
    stored, they are re-derived from the restored running factors.
    """
    import orbax.checkpoint as ocp

    template = _factors_only(precond.init())
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)

    from kfac_pytorch_tpu.capture import CapturedFactors

    state = precond.init()
    factors = {
        name: CapturedFactors(
            a=restored['factors'][name]['a'],
            g=restored['factors'][name]['g'],
        )
        for name in state.factors
    }
    state = state.replace(
        steps=jax.numpy.asarray(restored['steps'], jax.numpy.int32),
        factors=factors,
    )
    if compute_inverses:
        damping = precond._damping
        if callable(damping):
            damping = damping(state.steps)
        state = state.replace(
            buckets=precond._compute_second_order(
                state.buckets, state.factors, damping,
            ),
        )
    return state
