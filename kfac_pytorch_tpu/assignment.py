"""KAISA work assignment: grad-worker grid partition + greedy load balance.

Counterpart of the reference's assignment layer (``kfac/assignment.py:
30-471`` of gpauloski/kfac-pytorch). The *logic* (grid factorization of the
world into grad-worker columns x grad-receiver rows, greedy lowest-load
placement of per-layer factor work) is retained because it is pure setup
Python, but the *output* is re-targeted at SPMD: instead of creating
``torch.distributed`` process groups, the assignment yields

- an ``inv_worker`` device index per (layer, factor) -- used to order block
  slots so each device's shard of the stacked factor arrays is exactly the
  set of blocks the greedy algorithm gave it, and
- group predicates (``broadcast_inverses`` / ``broadcast_gradients``) that
  select which sharding constraints the preconditioner applies (see
  ``parallel/strategy.py``). Mesh axes play the role of process groups.
"""

from __future__ import annotations

from abc import ABC
from abc import abstractmethod
from collections.abc import Iterable

__all__ = ['WorkAssignment', 'KAISAAssignment']


class WorkAssignment(ABC):
    """Abstract interface mirroring reference ``WorkAssignment``."""

    def __repr__(self) -> str:
        layer_strs = []
        for layer in self.get_layers():
            invs = {
                factor: self.inv_worker(layer, factor)
                for factor in self.get_factors(layer)
            }
            layer_strs.append(
                f'  layer="{layer}": '
                f'is_grad_worker={self.is_grad_worker(layer)}, '
                f'src_grad_worker={self.src_grad_worker(layer)}, '
                f'inv_workers={invs}',
            )
        body = ',\n'.join(layer_strs)
        return f'{type(self).__name__}(\n{body}\n)'

    @abstractmethod
    def broadcast_gradients(self) -> bool:
        """Whether preconditioned gradients must be shared beyond workers."""

    @abstractmethod
    def broadcast_inverses(self) -> bool:
        """Whether inverses must be shared within the grad worker group."""

    @abstractmethod
    def get_layers(self) -> tuple[str, ...]:
        """All assigned layer names."""

    @abstractmethod
    def get_factors(self, layer: str) -> tuple[str, ...]:
        """Factor names for a layer."""

    @abstractmethod
    def inv_worker(self, layer: str, factor: str) -> int:
        """Device index that computes this factor's second-order info."""

    @abstractmethod
    def is_grad_worker(self, layer: str) -> bool:
        """Whether the local device preconditions this layer's gradient."""

    @abstractmethod
    def src_grad_worker(self, layer: str) -> int:
        """Device that shares the preconditioned gradient with this one."""

    @abstractmethod
    def factor_group(self, layer: str, factor: str) -> frozenset[int] | None:
        """Device set over which factors are reduced (None = world)."""

    @abstractmethod
    def grad_worker_group(self, layer: str) -> frozenset[int] | None:
        """Device set for the inverse share (the grad worker column)."""

    @abstractmethod
    def grad_receiver_group(self, layer: str) -> frozenset[int] | None:
        """Device set for the gradient share (the receiver row)."""


class KAISAAssignment(WorkAssignment):
    """KAISA grid + greedy assignment over a flat device index space.

    Semantics match reference ``KAISAAssignment`` (``kfac/assignment.py:
    121-471``): the world is an (grad_workers x world/grad_workers) grid;
    grad-worker groups are the columns, receiver groups the rows; factor
    work is greedily assigned to the lowest-loaded device, constrained to a
    single column per layer (and a single device when
    ``colocate_factors``).
    """

    def __init__(
        self,
        work: dict[str, dict[str, float]],
        *,
        local_rank: int,
        world_size: int,
        grad_worker_fraction: float,
        colocate_factors: bool = True,
    ) -> None:
        if not 0 <= grad_worker_fraction <= 1:
            raise ValueError(
                'grad_worker_fraction must be in [0, 1]. '
                f'Got {grad_worker_fraction}.',
            )
        if local_rank < 0:
            raise ValueError('local_rank must be >= 0')
        if world_size <= 0:
            raise ValueError('world_size must be > 0')
        if local_rank >= world_size:
            raise ValueError(
                f'local_rank={local_rank} larger than '
                f'world_size={world_size}',
            )
        grad_workers_f = max(1.0, world_size * grad_worker_fraction)
        if grad_workers_f != int(grad_workers_f):
            raise ValueError(
                'world_size*grad_worker_fraction must produce an integer '
                f'value. Found {world_size}*{grad_worker_fraction}'
                f'={grad_workers_f}.',
            )
        self.local_rank = local_rank
        self.world_size = world_size
        self.grad_worker_fraction = grad_worker_fraction
        self.grad_workers = int(grad_workers_f)
        self.colocate_factors = colocate_factors

        worker_groups = self.partition_grad_workers(
            world_size,
            self.grad_workers,
        )
        receiver_groups = self.partition_grad_receivers(
            world_size,
            self.grad_workers,
        )

        self._inv_assignments = self.greedy_assignment(
            work,
            [sorted(g) for g in sorted(worker_groups, key=min)],
            world_size,
            colocate_factors,
        )

        self._grad_worker_groups: dict[str, frozenset[int]] = {}
        self._grad_receiver_groups: dict[str, frozenset[int]] = {}
        for layer, factors in self._inv_assignments.items():
            inv_worker = next(iter(factors.values()))
            for ranks in worker_groups:
                if inv_worker in ranks:
                    self._grad_worker_groups[layer] = ranks
            for ranks in receiver_groups:
                if local_rank in ranks:
                    self._grad_receiver_groups[layer] = ranks

    @staticmethod
    def greedy_assignment(
        work: dict[str, dict[str, float]],
        worker_groups: list[list[int]],
        world_size: int,
        colocate_factors: bool,
    ) -> dict[str, dict[str, int]]:
        """Lowest-current-load greedy assignment, group constrained.

        Layers are processed in descending total-cost order; each layer
        goes to the worker group with the lowest summed load; within the
        group, either the whole layer goes to the least-loaded device
        (colocated) or each factor does independently.
        """
        loads = [0.0] * world_size
        assignments: dict[str, dict[str, int]] = {
            layer: dict.fromkeys(factors, -1)
            for layer, factors in work.items()
        }
        totals = {
            layer: sum(factors.values()) for layer, factors in work.items()
        }
        ordered = sorted(totals, key=lambda k: totals[k], reverse=True)

        for layer in ordered:
            group_loads = [
                sum(loads[i] for i in group) for group in worker_groups
            ]
            group = worker_groups[group_loads.index(min(group_loads))]
            if colocate_factors:
                member_loads = [loads[i] for i in group]
                device = group[member_loads.index(min(member_loads))]
                loads[device] += totals[layer]
                for factor in work[layer]:
                    assignments[layer][factor] = device
            else:
                factors = sorted(
                    work[layer].items(),
                    key=lambda kv: (kv[1], kv[0]),
                    reverse=True,
                )
                for factor, cost in factors:
                    member_loads = [loads[i] for i in group]
                    device = group[member_loads.index(min(member_loads))]
                    loads[device] += cost
                    assignments[layer][factor] = device

        for layer in assignments:
            for factor in assignments[layer]:
                assert assignments[layer][factor] >= 0
        return assignments

    @staticmethod
    def partition_grad_workers(
        world_size: int,
        grad_workers: int,
    ) -> set[frozenset[int]]:
        """Columns of the (grad_workers x world/grad_workers) rank grid.

        Example (world=8, grad_workers=2):
        columns {0,4}, {1,5}, {2,6}, {3,7}; rows {0..3}, {4..7}.
        """
        if world_size <= 0:
            raise ValueError('world_size must be > 0')
        if world_size % grad_workers != 0:
            raise ValueError(
                'world_size must be an integer multiple of the gradient '
                'worker count',
            )
        partitions = world_size // grad_workers
        return {
            frozenset(range(i, world_size, partitions))
            for i in range(partitions)
        }

    @staticmethod
    def partition_grad_receivers(
        world_size: int,
        grad_workers: int,
    ) -> set[frozenset[int]]:
        """Rows of the rank grid (see ``partition_grad_workers``)."""
        if world_size <= 0:
            raise ValueError('world_size must be > 0')
        if world_size % grad_workers != 0:
            raise ValueError(
                'world_size must be an integer multiple of the gradient '
                'worker count',
            )
        partitions = world_size // grad_workers
        return {
            frozenset(range(i * partitions, (i + 1) * partitions))
            for i in range(grad_workers)
        }

    def broadcast_gradients(self) -> bool:
        return self.grad_workers < self.world_size

    def broadcast_inverses(self) -> bool:
        return self.grad_workers > 1

    def get_layers(self) -> tuple[str, ...]:
        return tuple(self._inv_assignments.keys())

    def get_factors(self, layer: str) -> tuple[str, ...]:
        return tuple(self._inv_assignments[layer].keys())

    def inv_worker(self, layer: str, factor: str) -> int:
        return self._inv_assignments[layer][factor]

    def is_grad_worker(self, layer: str) -> bool:
        return self.local_rank in self._grad_worker_groups[layer]

    def src_grad_worker(self, layer: str) -> int:
        overlap = (
            self._grad_worker_groups[layer]
            & self._grad_receiver_groups[layer]
        )
        return next(iter(overlap))

    def factor_group(self, layer: str, factor: str) -> frozenset[int] | None:
        # KAISA assumes pure data parallelism: factors reduce over the
        # world (on TPU: the psum XLA inserts for the sharded-batch cov).
        return None

    def grad_worker_group(self, layer: str) -> frozenset[int] | None:
        return self._grad_worker_groups[layer]

    def grad_receiver_group(self, layer: str) -> frozenset[int] | None:
        return self._grad_receiver_groups[layer]

    def inv_assignments(self) -> dict[str, dict[str, int]]:
        """Full (layer, factor) -> device mapping."""
        return {k: dict(v) for k, v in self._inv_assignments.items()}


def block_placement(
    assignment: KAISAAssignment,
    layer_order: Iterable[str],
) -> dict[str, int]:
    """Map each layer to its colocated owner device (for block ordering)."""
    return {
        layer: assignment.inv_worker(layer, 'A') for layer in layer_order
    }
