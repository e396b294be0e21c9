"""KAISA distribution strategies as mesh shardings.

TPU-native re-design of the reference's distribution machinery: process
groups + per-rank control flow (``kfac/assignment.py:121-471``,
``kfac/distributed.py:124-385`` of gpauloski/kfac-pytorch) become a device
mesh factorization plus three sharding constraints. The entire
COMM-OPT / HYBRID-OPT / MEM-OPT strategy space of KAISA (SC'21) reduces to:

1. The world is reshaped to a ``(kfac_row x kfac_col)`` grid where
   ``kfac_row`` has size ``grad_workers`` (the reference's grid of
   grad-worker *columns* x grad-receiver *rows*, ``assignment.py:321-395``,
   with our ``col`` indexing the receiver-group coordinate). The devices of
   one column (fixed ``col``, varying ``row``) are a grad-worker group.
2. Running factors live sharded over the whole world on the block axis --
   each device stores and eigendecomposes only its assigned blocks
   (owner-computes, greedy-balanced by bucket construction).
3. After the decomposition, the state is constrained to
   ``P('kfac_col')``: XLA all-gathers Q/d over the ``row`` axis -- the
   "broadcast inverses within the grad worker group" collective.
4. Preconditioned gradients computed on that layout are constrained back
   to replicated: XLA all-gathers over ``col`` -- the "broadcast gradients
   to receiver group" collective.

Setting ``grad_workers = world`` makes (3) a full replication and (4) a
no-op (COMM-OPT: everyone preconditions, no grad comm). Setting
``grad_workers = 1`` makes (3) a no-op and (4) a world gather (MEM-OPT:
owner preconditions, gradients broadcast). Anything between is HYBRID.

The factor *reduction* of the reference (allreduce over the world,
``kfac/layers/base.py:282-336``) needs no machinery here: with the batch
sharded over both mesh axes, the covariance contraction in the capture
step is a local matmul + psum inserted by XLA.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from kfac_pytorch_tpu.enums import DistributedStrategy

__all__ = [
    'resolve_grad_workers',
    'order_devices_dcn',
    'kaisa_mesh',
    'KAISASharding',
]


def order_devices_dcn(devices: Any, cols: int) -> list[Any]:
    """Order devices host-major so ``kfac_col`` groups stay intra-host.

    On a multi-host (DCN-connected) deployment the per-step collective is
    the gradient gather over the ``kfac_col`` axis ('precond_grad' stage:
    second-order state is column-sharded, gradients re-replicate);
    keeping each row's ``cols`` consecutive devices on ONE host routes
    that gather over ICI instead of DCN. The rarer inverse broadcast
    (row axis, once per ``inv_update_steps``) takes the DCN hops.

    Contract (pinned by tests): devices are sorted by
    ``(process_index, id)``; when ``cols`` divides the per-host device
    count, every row-major group of ``cols`` consecutive devices shares
    a single ``process_index``. The reference analogue is the
    per-node torchrun rendezvous ordering of
    ``scripts/run_imagenet.sh:35-77`` (gpauloski/kfac-pytorch).
    """
    ordered = sorted(
        devices,
        key=lambda d: (
            getattr(d, 'process_index', 0),
            getattr(d, 'id', 0),
        ),
    )
    counts: dict[int, int] = {}
    for d in ordered:
        p = getattr(d, 'process_index', 0)
        counts[p] = counts.get(p, 0) + 1
    per_host = set(counts.values())
    if len(counts) > 1 and (
        len(per_host) != 1 or next(iter(per_host)) % cols != 0
    ):
        import logging

        logging.getLogger(__name__).warning(
            'kfac_col groups of %d devices cannot all stay intra-host '
            '(per-host device counts %s): the per-step gradient gather '
            'will cross DCN',
            cols,
            counts,
        )
    return ordered


def resolve_grad_workers(
    world_size: int,
    grad_worker_fraction: DistributedStrategy | float,
) -> int:
    """Map a grad-worker fraction / strategy enum to a worker count.

    Mirrors the validation in reference ``kfac/preconditioner.py:173-199``.
    """
    if isinstance(grad_worker_fraction, DistributedStrategy):
        strategy = grad_worker_fraction
        if strategy == DistributedStrategy.COMM_OPT:
            fraction = 1.0
        elif strategy == DistributedStrategy.HYBRID_OPT:
            fraction = 0.5
        elif strategy == DistributedStrategy.MEM_OPT:
            fraction = 1.0 / world_size
        else:
            raise AssertionError(f'Unknown strategy {strategy}')
    else:
        fraction = float(grad_worker_fraction)
        if not 0 <= fraction <= 1:
            raise ValueError('grad_worker_fraction must be in [0, 1]')
        if fraction == 0:
            fraction = 1.0 / world_size
    workers = max(1, round(world_size * fraction))
    if abs(world_size * fraction) > 0 and not np.isclose(
        world_size * fraction,
        round(world_size * fraction),
    ):
        raise ValueError(
            'world_size * grad_worker_fraction must be an integer. '
            f'Got {world_size} * {fraction}.',
        )
    if world_size % workers != 0:
        raise ValueError(
            'grad_worker_fraction must produce groups of equal size '
            f'(world_size={world_size}, grad_workers={workers})',
        )
    return workers


def kaisa_mesh(
    grad_worker_fraction: DistributedStrategy | float = (
        DistributedStrategy.COMM_OPT
    ),
    devices: Any = None,
    model_axis_size: int = 1,
    dcn_aware: bool = True,
) -> Mesh:
    """Build the (kfac_row x kfac_col [x model]) KAISA mesh.

    ``kfac_row`` has size ``grad_workers``; a grad-worker group is the set
    of devices sharing a ``kfac_col`` coordinate. Shard the data batch over
    BOTH kfac axes (``KAISASharding.data_spec()``) for data parallelism.

    With ``model_axis_size > 1`` a trailing ``model`` axis is added for
    tensor parallelism (the TPU counterpart of the reference's GPT-NeoX
    TP integration, ``kfac/gpt_neox/``): shard layer kernels over
    ``model``; the K-FAC factor contraction and preconditioning operate on
    the logically global arrays and XLA inserts the TP collectives -- no
    gather-to-primary-rank machinery needed
    (cf. ``kfac/gpt_neox/layer.py:129-163``).
    """
    if devices is None:
        devices = jax.devices()
    world = len(devices)
    if world % model_axis_size != 0:
        raise ValueError(
            f'world size {world} not divisible by '
            f'model_axis_size {model_axis_size}',
        )
    data_world = world // model_axis_size
    workers = resolve_grad_workers(data_world, grad_worker_fraction)
    cols = data_world // workers
    if dcn_aware:
        # Multi-host: host-major device order keeps each kfac_col group
        # (the per-step gradient-gather group) on one host's ICI where
        # the per-host device count allows (see order_devices_dcn).
        devices = order_devices_dcn(list(devices), cols * model_axis_size)
    grid = np.asarray(devices).reshape(
        workers, cols, model_axis_size,
    )
    if model_axis_size == 1:
        return Mesh(grid[:, :, 0], ('kfac_row', 'kfac_col'))
    return Mesh(grid, ('kfac_row', 'kfac_col', 'model'))


class KAISASharding:
    """Sharding-constraint policy implementing KAISA on a mesh.

    Passed as ``sharding=`` to ``KFACPreconditioner``; the engine calls
    ``constrain(tree, stage)`` at the three points described in the module
    docstring. Block arrays are assumed to carry the block index in dim 0.
    """

    def __init__(
        self,
        mesh: Mesh,
        row_axis: str = 'kfac_row',
        col_axis: str = 'kfac_col',
    ) -> None:
        if row_axis not in mesh.axis_names or col_axis not in mesh.axis_names:
            raise ValueError(
                f'mesh must define axes {row_axis!r} and {col_axis!r}; '
                f'got {mesh.axis_names}',
            )
        self.mesh = mesh
        self.row_axis = row_axis
        self.col_axis = col_axis

    @property
    def grad_workers(self) -> int:
        return self.mesh.shape[self.row_axis]

    @property
    def world_size(self) -> int:
        return self.mesh.shape[self.row_axis] * self.mesh.shape[self.col_axis]

    def broadcast_inverses(self) -> bool:
        """Parity predicate (reference ``assignment.py:405-411``)."""
        return self.grad_workers > 1

    def broadcast_gradients(self) -> bool:
        """Parity predicate (reference ``assignment.py:397-403``)."""
        return self.grad_workers < self.world_size

    def data_spec(self) -> P:
        """PartitionSpec for the leading (batch) dim of training data."""
        return P((self.row_axis, self.col_axis))

    def _block_spec(self, n_blocks: int, stage: str) -> P:
        rows = self.mesh.shape[self.row_axis]
        cols = self.mesh.shape[self.col_axis]
        if stage == 'factors':
            # Fully sharded owner-computes layout when divisible; degrade
            # gracefully to column sharding, then replication.
            if n_blocks % (rows * cols) == 0:
                return P((self.row_axis, self.col_axis))
            if n_blocks % cols == 0:
                return P(self.col_axis)
            return P()
        if stage == 'second_order':
            # Inverse-broadcast layout: replicated over the grad-worker
            # group (row axis), sharded across groups (col axis).
            if n_blocks % cols == 0:
                return P(self.col_axis)
            return P()
        # 'precond_grad': gradients are needed everywhere.
        return P()

    def constrain(self, tree: Any, stage: str) -> Any:
        def _apply(x: Any) -> Any:
            if not hasattr(x, 'ndim') or x.ndim < 1:
                return x
            spec = self._block_spec(x.shape[0], stage)
            return jax.lax.with_sharding_constraint(
                x,
                NamedSharding(self.mesh, spec),
            )

        return jax.tree.map(_apply, tree)
