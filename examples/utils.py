"""Shared example utilities.

Counterpart of reference ``examples/utils.py:20-114`` of
gpauloski/kfac-pytorch: metric averaging, label smoothing, LR schedule
with warmup + step decay, and checkpoint bundling.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
import optax

__all__ = [
    'DynamicLossScale',
    'force_cpu_platform',
    'maybe_init_distributed',
    'shard_batch',
    'Metric',
    'label_smooth_loss',
    'create_lr_schedule',
    'save_checkpoint',
    'load_checkpoint',
    'latest_checkpoint',
    'Prefetcher',
]


class Prefetcher:
    """Background-thread batch pipeline.

    The reference's input pipeline overlaps augmentation and H2D copy
    with device compute via torch DataLoader's worker pool
    (``examples/vision/datasets.py:19-153`` of gpauloski/kfac-pytorch).
    The TPU-native equivalent: one host thread drains the (numpy) batch
    iterator -- whose augmentation runs in the nogil C++ kernel
    (``kfac_pytorch_tpu/utils/native``) -- applies ``put_fn``
    (typically a sharded ``jax.device_put``), and keeps up to ``depth``
    batches enqueued ahead of the async XLA dispatch stream.

    Exceptions in the worker re-raise at the consuming ``__next__``.
    """

    _END = object()

    def __init__(
        self,
        iterator: Any,
        put_fn: Any = None,
        depth: int = 2,
    ) -> None:
        import queue
        import threading

        self._q: Any = queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None

        def work() -> None:
            try:
                for item in iterator:
                    self._q.put(put_fn(*item) if put_fn else item)
            except BaseException as e:  # noqa: BLE001 -- re-raised in consumer
                self._err = e
            finally:
                self._q.put(self._END)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self) -> Prefetcher:
        return self

    def __next__(self) -> Any:
        item = self._q.get()
        if item is self._END:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def force_cpu_platform(n_devices: int = 8) -> None:
    """Force the CPU platform with ``n_devices`` virtual devices.

    Backs the example CLIs' ``--force-cpu`` flag: must run before JAX
    initializes a backend. Uses ``jax.config`` (an installed accelerator
    plugin preempts the ``JAX_PLATFORMS`` env var) and virtualizes a
    multi-device platform so the sharded code paths are exercised, the
    same way the test harness does (``kfac_pytorch_tpu/testing.py``).
    Respects an explicit external device-count setting in ``XLA_FLAGS``.
    """
    jax.config.update('jax_platforms', 'cpu')
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count={n_devices}'
        ).strip()


def maybe_init_distributed() -> None:
    """Initialize JAX multi-host coordination.

    No-op on single-host setups. Two activation paths:

    - TPU pod slice: every host runs the same SPMD program and the TPU
      runtime supplies the topology (the analogue of the reference
      launcher's torchrun rendezvous, ``scripts/run_imagenet.sh:35-77``).
    - Explicit rendezvous via env vars ``KFAC_COORDINATOR_ADDRESS`` +
      ``KFAC_NUM_PROCESSES`` + ``KFAC_PROCESS_ID`` -- the analogue of
      torchrun's MASTER_ADDR/RANK/WORLD_SIZE contract
      (``testing/distributed.py:24-141`` of gpauloski/kfac-pytorch).
      This is how the multi-process CPU tests drive the same code path
      the pod launcher uses (``tests/multiprocess_test.py``).
    """
    coord = os.environ.get('KFAC_COORDINATOR_ADDRESS')
    if coord:
        nproc = os.environ.get('KFAC_NUM_PROCESSES')
        pid = os.environ.get('KFAC_PROCESS_ID')
        if nproc is None or pid is None:
            raise RuntimeError(
                'KFAC_COORDINATOR_ADDRESS is set but '
                'KFAC_NUM_PROCESSES/KFAC_PROCESS_ID are not -- all '
                'three are required for the explicit rendezvous '
                '(a stale exported address from a previous run also '
                'triggers this; unset it for single-process use).',
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        return
    if os.environ.get('TPU_WORKER_HOSTNAMES') or os.environ.get(
        'MEGASCALE_COORDINATOR_ADDRESS',
    ):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            pass  # already initialized or single-process


def shard_batch(array: Any, data_sharding: Any) -> Any:
    """Place a host batch onto the mesh, multi-host safe.

    Single-process: a plain sharded ``device_put``. Multi-host (DCN):
    each process holds only ITS shard of the global batch, so the global
    array is assembled with ``jax.make_array_from_process_local_data``
    (the data-feeding counterpart of the reference's per-rank
    ``DistributedSampler``, ``examples/vision/datasets.py:19-153`` of
    gpauloski/kfac-pytorch).
    """
    if data_sharding is None:
        return array
    if jax.process_count() == 1:
        return jax.device_put(array, data_sharding)
    return jax.make_array_from_process_local_data(data_sharding, array)


class Metric:
    """Running average meter.

    Counterpart of the reference's allreduce-averaged ``Metric``
    (``examples/utils.py:66-89``); on TPU the per-batch values are already
    global (pjit computes the global-batch loss), so no extra collective is
    needed -- accumulation happens on host floats.
    """

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.n = 0

    def update(self, val: float | jax.Array, n: int = 1) -> None:
        self.total += float(val) * n
        self.n += n

    @property
    def avg(self) -> float:
        return self.total / max(self.n, 1)


def label_smooth_loss(
    logits: jax.Array,
    labels: jax.Array,
    smoothing: float = 0.1,
) -> jax.Array:
    """Label-smoothed cross entropy (reference ``LabelSmoothLoss``,
    ``examples/utils.py:41-63``)."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes)
    smoothed = one_hot * (1 - smoothing) + smoothing / num_classes
    return optax.softmax_cross_entropy(logits, smoothed).mean()


def create_lr_schedule(
    base_lr: float,
    warmup_epochs: int,
    decay_epochs: Sequence[int],
    decay_factor: float = 0.1,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    """Linear warmup + step decay at given epochs (reference
    ``create_lr_schedule``, ``examples/utils.py:92-114``)."""

    def schedule(step: jax.Array) -> jax.Array:
        epoch = step / steps_per_epoch
        warm = jnp.minimum((epoch + 1) / max(warmup_epochs, 1e-8), 1.0)
        factor = jnp.asarray(1.0)
        for e in decay_epochs:
            factor = factor * jnp.where(epoch >= e, decay_factor, 1.0)
        return base_lr * jnp.where(warmup_epochs > 0, warm, 1.0) * factor

    return schedule


def save_checkpoint(
    path: str,
    *,
    params: Any,
    opt_state: Any,
    kfac_state: Any = None,
    extra: dict[str, Any] | None = None,
) -> None:
    """Bundle model/optimizer/preconditioner state into one Orbax dir.

    Counterpart of reference ``save_checkpoint`` (``examples/utils.py:
    20-38``) which torch.saves one file.
    """
    import orbax.checkpoint as ocp

    payload: dict[str, Any] = {'params': params, 'opt_state': opt_state}
    if kfac_state is not None:
        from kfac_pytorch_tpu.checkpoint import _factors_only

        payload['kfac'] = _factors_only(kfac_state)
    if extra:
        payload['extra'] = extra
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_checkpoint(path: str, template: dict[str, Any]) -> dict[str, Any]:
    """Restore a checkpoint bundle written by ``save_checkpoint``.

    ``template`` may cover a subset of the saved keys (partial restore),
    so callers can e.g. skip the K-FAC factors when resuming without the
    preconditioner.
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(
                item=template,
                partial_restore=True,
            ),
        )


def latest_checkpoint(directory: str, prefix: str = 'ckpt_') -> str | None:
    """Find the newest ``{prefix}{epoch}`` dir (reference resume-by-scan,
    ``examples/torch_cifar10_resnet.py:313-317``)."""
    if not os.path.isdir(directory):
        return None
    candidates = []
    for name in os.listdir(directory):
        if name.startswith(prefix):
            try:
                candidates.append((int(name[len(prefix):]), name))
            except ValueError:
                continue
    if not candidates:
        return None
    return os.path.join(directory, max(candidates)[1])


class DynamicLossScale:
    """GradScaler-style dynamic loss scaling for low-precision training.

    The functional counterpart of the reference examples' AMP loop
    (``torch.cuda.amp.GradScaler`` + ``scaler.unscale_`` before
    ``preconditioner.step()``, ``examples/vision/engine.py:63-88`` of
    gpauloski/kfac-pytorch). On an overflowed step, drop the update and
    call ``update(found_inf=True)`` -- the engine's ``nonfinite_guard``
    (default on) independently protects the factor EMAs, playing the
    role of the reference's ``reset_batch()``.

    Two integration patterns, by loop style:

    - **Eager loop** (each step dispatched separately, as in these
      example CLIs): pass ``scaler.scale`` as the preconditioner's
      ``grad_scale``. Each dispatch re-evaluates it, so backoff/growth
      take effect on the next step.
    - **Jitted/scanned loop**: a zero-arg ``grad_scale`` is evaluated
      at TRACE time and baked into the compiled program -- scale
      changes would be silently ignored. Thread the scale through the
      step as a traced input instead, and use the arg-taking
      ``grad_scale`` convention::

          pre = KFACPreconditioner(
              model, grad_scale=lambda x, y, scale: scale, ...,
          )
          # loss_fn(params, x, y, scale) multiplies the loss by scale;
          # the capture unscales the output-gradients with the SAME
          # traced value. Per step: step(carry, (x, y, scaler.scale()))
          # then scaler.update(found_inf=...).

      (Engine contract: ``kfac_pytorch_tpu/capture.py`` invokes an
      arg-taking ``grad_scale`` with ``loss_fn``'s post-params
      arguments.)
    """

    def __init__(
        self,
        init_scale: float = 2.0**15,
        growth_factor: float = 2.0,
        backoff_factor: float = 0.5,
        growth_interval: int = 2000,
    ) -> None:
        self._scale = float(init_scale)
        self.growth_factor = growth_factor
        self.backoff_factor = backoff_factor
        self.growth_interval = growth_interval
        self._good_steps = 0

    def scale(self) -> jax.Array:
        """Current loss scale as a traced scalar (use as ``grad_scale``)."""
        import jax.numpy as jnp

        return jnp.asarray(self._scale, jnp.float32)

    @staticmethod
    def grads_finite(grads: Any) -> jax.Array:
        """Jittable all-finite predicate over a gradient pytree."""
        import jax.numpy as jnp

        leaves = jax.tree.leaves(grads)
        ok = jnp.ones((), bool)
        for leaf in leaves:
            ok = ok & jnp.all(jnp.isfinite(leaf))
        return ok

    def update(self, found_inf: bool) -> None:
        """Adjust the scale after a step (reference GradScaler semantics)."""
        if found_inf:
            self._scale *= self.backoff_factor
            self._good_steps = 0
        else:
            self._good_steps += 1
            if self._good_steps >= self.growth_interval:
                self._scale *= self.growth_factor
                self._good_steps = 0
