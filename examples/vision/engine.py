"""Train/eval engine for the vision examples.

Counterpart of reference ``examples/vision/engine.py:44-152`` of
gpauloski/kfac-pytorch, re-designed for jit: two compiled train steps
(with/without statistics capture) selected in Python by the
``factor_update_steps`` gate -- the functional equivalent of the
reference's hook gating -- plus a compiled eval step. Gradient
accumulation mirrors the reference's ``no_sync`` microbatch loop with a
``lax``-free Python accumulation of capture factors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

import flax.struct
import jax
import optax

from examples.utils import Metric
from examples.utils import Prefetcher
from kfac_pytorch_tpu.capture import accumulate_captures
from kfac_pytorch_tpu.capture import nonfinite_captures

__all__ = ['TrainState', 'Trainer']


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    kfac_state: Any
    step: int = 0


@dataclass
class Trainer:
    """Compiled train/eval loops for a classifier with optional K-FAC."""

    model: Any
    tx: Any  # optax optimizer (applied AFTER preconditioning)
    precond: Any = None  # KFACPreconditioner or None
    loss_fn: Any = None  # (logits, labels) -> loss
    data_sharding: Any = None  # NamedSharding for input batches
    # Layers whose factor EMA fold was dropped by the nonfinite guard
    # this epoch (AMP overflow observability; reset per train_epoch*).
    epoch_nonfinite_skips: int = 0

    def __post_init__(self) -> None:
        if self.loss_fn is None:
            self.loss_fn = (
                lambda logits, labels: (
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels,
                    ).mean()
                )
            )

        def full_loss(params: Any, batch_stats: Any, x: Any, y: Any):
            out, updates = self.model.apply(
                {'params': params, 'batch_stats': batch_stats},
                x,
                train=True,
                mutable=['batch_stats'],
            )
            return self.loss_fn(out, y), updates['batch_stats']

        self._full_loss = full_loss

        def sgd_step(state: TrainState, x: Any, y: Any):
            (loss, bn), grads = jax.value_and_grad(
                full_loss, has_aux=True,
            )(state.params, state.batch_stats, x, y)
            if self.precond is not None:
                pgrads, kfac_state = self.precond.step(
                    state.kfac_state, grads, None,
                )
            else:
                pgrads, kfac_state = grads, state.kfac_state
            updates, opt_state = self.tx.update(
                pgrads, state.opt_state, state.params,
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(
                params=params,
                batch_stats=bn,
                opt_state=opt_state,
                kfac_state=kfac_state,
                step=state.step + 1,
            ), loss

        self._fast_step = jax.jit(sgd_step, donate_argnums=(0,))

        if self.precond is not None:
            vag = self.precond.value_and_grad(full_loss, has_aux=True)

            def capture_step(state: TrainState, x: Any, y: Any):
                (loss, bn), grads, captured = vag(
                    state.params, state.batch_stats, x, y,
                )
                # Skipped-layer visibility for the AMP workflow: layers
                # whose batch factors came back inf/nan had their EMA
                # fold dropped by the engine's nonfinite_guard; surface
                # the count so overflow steps are observable in the
                # training log, the analogue of GradScaler's visible
                # skips in the reference's loop
                # (examples/vision/engine.py:80-88 of
                # gpauloski/kfac-pytorch).
                skipped = nonfinite_captures(captured)
                pgrads, kfac_state = self.precond.step(
                    state.kfac_state, grads, captured,
                )
                updates, opt_state = self.tx.update(
                    pgrads, state.opt_state, state.params,
                )
                params = optax.apply_updates(state.params, updates)
                return TrainState(
                    params=params,
                    batch_stats=bn,
                    opt_state=opt_state,
                    kfac_state=kfac_state,
                    step=state.step + 1,
                ), loss, skipped

            self._capture_step = jax.jit(capture_step, donate_argnums=(0,))

            def accum_grads(state: TrainState, x: Any, y: Any):
                """One microbatch: grads + capture, no update."""
                (loss, bn), grads, captured = vag(
                    state.params, state.batch_stats, x, y,
                )
                return loss, bn, grads, captured

            self._accum_grads = jax.jit(accum_grads)

        def eval_step(state: TrainState, x: Any, y: Any):
            logits = self.model.apply(
                {
                    'params': state.params,
                    'batch_stats': state.batch_stats,
                },
                x,
                train=False,
            )
            loss = self.loss_fn(logits, y)
            acc = (logits.argmax(-1) == y).mean()
            return loss, acc

        self._eval_step = jax.jit(eval_step)

    def init_state(self, params: Any, batch_stats: Any) -> TrainState:
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            kfac_state=(
                self.precond.init() if self.precond is not None else ()
            ),
            step=0,
        )

    def _put(self, x: Any) -> Any:
        from examples.utils import shard_batch

        return shard_batch(x, self.data_sharding)

    def train_epoch(
        self,
        state: TrainState,
        dataset: Any,
        epoch: int,
        log_every: int = 50,
        verbose: bool = True,
    ) -> tuple[TrainState, float]:
        meter = Metric('train/loss')
        start = time.perf_counter()
        py_step = int(state.step)
        self.epoch_nonfinite_skips = 0
        batches = Prefetcher(
            dataset.epoch(),
            put_fn=lambda x, y: (self._put(x), self._put(y)),
        )
        for i, (x, y) in enumerate(batches):
            use_capture = self.precond is not None and (
                self.precond.should_update_factors(py_step)
            )
            if use_capture:
                state, loss, skipped = self._capture_step(state, x, y)
                # Capture steps are 1-in-factor_update_steps; the
                # scalar fetch costs one host sync on those steps only.
                self.epoch_nonfinite_skips += int(skipped)
            else:
                state, loss = self._fast_step(state, x, y)
            py_step += 1
            meter.update(loss, n=len(y))
            if verbose and (i + 1) % log_every == 0:
                skips = (
                    f' kfac_nonfinite_skips {self.epoch_nonfinite_skips}'
                    if self.epoch_nonfinite_skips else ''
                )
                print(
                    f'epoch {epoch} step {i + 1}/{len(dataset)} '
                    f'loss {meter.avg:.4f}{skips}',
                )
        if verbose:
            wall = time.perf_counter() - start
            skips = (
                f' kfac_nonfinite_skips {self.epoch_nonfinite_skips}'
                if self.epoch_nonfinite_skips else ''
            )
            print(
                f'epoch {epoch} done: loss {meter.avg:.4f} '
                f'({wall:.1f}s, {len(dataset) / wall:.1f} it/s){skips}',
            )
        return state, meter.avg

    def train_epoch_accumulated(
        self,
        state: TrainState,
        dataset: Any,
        epoch: int,
        accumulation_steps: int,
    ) -> tuple[TrainState, float]:
        """Gradient accumulation: average grads/factors over microbatches.

        Mirrors the reference's ``no_sync`` accumulation loop
        (``examples/vision/engine.py:63-75``).
        """
        meter = Metric('train/loss')
        micro: list[tuple[Any, Any]] = []
        self.epoch_nonfinite_skips = 0
        batches = Prefetcher(
            dataset.epoch(),
            put_fn=lambda x, y: (self._put(x), self._put(y)),
        )
        for x, y in batches:
            micro.append((x, y))
            if len(micro) < accumulation_steps:
                continue
            grads_list, caps, losses = [], [], []
            bn = state.batch_stats
            for mx, my in micro:
                loss, bn, grads, captured = self._accum_grads(state, mx, my)
                grads_list.append(grads)
                caps.append(captured)
                losses.append(loss)
            grads = jax.tree.map(
                lambda *gs: sum(gs) / len(gs), *grads_list,
            )
            captured = accumulate_captures(caps)
            self.epoch_nonfinite_skips += int(nonfinite_captures(captured))
            pgrads, kfac_state = self.precond.step(
                state.kfac_state, grads, captured,
            )
            updates, opt_state = self.tx.update(
                pgrads, state.opt_state, state.params,
            )
            params = optax.apply_updates(state.params, updates)
            state = TrainState(
                params=params,
                batch_stats=bn,
                opt_state=opt_state,
                kfac_state=kfac_state,
                step=state.step + 1,
            )
            for loss, (_, my) in zip(losses, micro):
                meter.update(loss, n=len(my))
            micro = []
        return state, meter.avg

    def evaluate(self, state: TrainState, dataset: Any) -> tuple[float, float]:
        loss_m = Metric('val/loss')
        acc_m = Metric('val/acc')
        batches = Prefetcher(
            dataset.epoch(),
            put_fn=lambda x, y: (self._put(x), self._put(y)),
        )
        for x, y in batches:
            loss, acc = self._eval_step(state, x, y)
            loss_m.update(loss, n=len(y))
            acc_m.update(acc, n=len(y))
        return loss_m.avg, acc_m.avg
