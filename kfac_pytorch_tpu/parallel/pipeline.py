"""Pipeline-topology-aware K-FAC work assignment (3D parallelism).

Counterpart of the reference's GPT-NeoX assignment
(``kfac/gpt_neox/assignment.py:20-236`` of gpauloski/kfac-pytorch), which
distributes factor work for a DeepSpeed ``PipelineModule`` (DP x TP x PP).
Key semantics preserved:

- A layer's factors physically exist only on the pipeline stage that owns
  the layer, so inverse work is balanced among that stage's *pipe peers*
  (devices at the same pipe coordinate across the data-parallel axis,
  reference ``assignment.py:75-114``).
- MEM-OPT only: ``broadcast_inverses() == False`` (each layer's
  second-order state stays on its owner) and ``broadcast_gradients() ==
  True`` (preconditioned gradients are shared over the layer's
  data-parallel group, reference ``assignment.py:116-130``).
- ``factor_group`` is the layer's data-parallel peer set: factors reduce
  over data-parallel replicas of the same stage, never across stages
  (reference ``assignment.py:132-142``).

On TPU the "groups" are device index sets over a ``(pipe, data, model)``
mesh; they are consumed as sharding metadata (block placement and
constraint axes), not as communicator handles.
"""

from __future__ import annotations

from kfac_pytorch_tpu.assignment import KAISAAssignment
from kfac_pytorch_tpu.assignment import WorkAssignment

__all__ = ['PipelineTopology', 'PipelineAssignment']


class PipelineTopology:
    """Flat device index <-> (pipe, data, model) coordinate mapping.

    Device order is pipe-major, then data, then model -- matching a
    ``Mesh(devices.reshape(P, D, M), ('pipe', 'data', 'model'))``.
    """

    def __init__(self, pipe: int, data: int, model: int) -> None:
        if pipe < 1 or data < 1 or model < 1:
            raise ValueError('all topology dims must be >= 1')
        self.pipe = pipe
        self.data = data
        self.model = model
        self.world_size = pipe * data * model

    def coords(self, rank: int) -> tuple[int, int, int]:
        m = rank % self.model
        d = (rank // self.model) % self.data
        p = rank // (self.model * self.data)
        return (p, d, m)

    def rank(self, p: int, d: int, m: int) -> int:
        return (p * self.data + d) * self.model + m

    def pipe_peers(self, rank: int) -> frozenset[int]:
        """All devices at the same pipe stage (reference
        ``pipe_parallel_peers``)."""
        p, _, _ = self.coords(rank)
        return frozenset(
            self.rank(p, d, m)
            for d in range(self.data)
            for m in range(self.model)
        )

    def data_group(self, rank: int) -> frozenset[int]:
        """Data-parallel peer set (same pipe + model coordinate)."""
        p, _, m = self.coords(rank)
        return frozenset(self.rank(p, d, m) for d in range(self.data))

    def model_group(self, rank: int) -> frozenset[int]:
        """Tensor-parallel peer set (same pipe + data coordinate)."""
        p, d, _ = self.coords(rank)
        return frozenset(self.rank(p, d, m) for m in range(self.model))


class PipelineAssignment(WorkAssignment):
    """MEM-OPT assignment constrained to pipeline-stage peers.

    Args:
        work: layer -> factor -> cost dict for layers OWNED BY THE LOCAL
            RANK'S PIPE STAGE (layers physically exist there only).
        local_rank: flat device index.
        topology: pipe/data/model shape.
    """

    def __init__(
        self,
        work: dict[str, dict[str, float]],
        *,
        local_rank: int,
        topology: PipelineTopology,
    ) -> None:
        self.local_rank = local_rank
        self.topology = topology
        peers = sorted(topology.pipe_peers(local_rank))
        # Greedy lowest-load balancing among pipe peers; factors of one
        # layer colocate (MEM-OPT requires a single owner per layer,
        # reference assignment.py:75-114).
        self._inv_assignments = KAISAAssignment.greedy_assignment(
            work,
            [peers],
            topology.world_size,
            colocate_factors=True,
        )

    def broadcast_gradients(self) -> bool:
        return True  # reference assignment.py:126-130

    def broadcast_inverses(self) -> bool:
        return False  # reference assignment.py:116-124

    def get_layers(self) -> tuple[str, ...]:
        return tuple(self._inv_assignments.keys())

    def get_factors(self, layer: str) -> tuple[str, ...]:
        return tuple(self._inv_assignments[layer].keys())

    def inv_worker(self, layer: str, factor: str) -> int:
        return self._inv_assignments[layer][factor]

    def is_grad_worker(self, layer: str) -> bool:
        # MEM-OPT: only the inverse owner preconditions the gradient.
        return self.local_rank == self.inv_worker(layer, 'A')

    def src_grad_worker(self, layer: str) -> int:
        return self.inv_worker(layer, 'A')

    def factor_group(self, layer: str, factor: str) -> frozenset[int]:
        # Factors reduce over the OWNER's data-parallel group (reference
        # routes the reduce to the inv worker's DP group on the primary
        # rank, gpt_neox/layer.py:61-127).
        return self.topology.data_group(self.inv_worker(layer, factor))

    def grad_worker_group(self, layer: str) -> frozenset[int]:
        return frozenset({self.inv_worker(layer, 'A')})

    def grad_receiver_group(self, layer: str) -> frozenset[int]:
        # Gradients broadcast over the owner's data-parallel group
        # (reference assignment.py:229-236).
        return self.topology.data_group(self.inv_worker(layer, 'A'))
