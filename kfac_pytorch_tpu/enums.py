"""K-FAC configuration enums.

Mirrors the configuration vocabulary of the reference
(``kfac/enums.py:8-54`` of gpauloski/kfac-pytorch). ``AllreduceMethod`` is
retained for API parity but is advisory on TPU: factor reduction is a psum
inserted by XLA from the sharded covariance contraction, and the stacked
bucket layout already coalesces small factors (the role of the reference's
bucketed allreduce).
"""

from __future__ import annotations

from enum import Enum

__all__ = [
    'AllreduceMethod',
    'AssignmentStrategy',
    'ComputeMethod',
    'DistributedStrategy',
]


class AllreduceMethod(Enum):
    """Allreduce method (advisory on TPU; see module docstring)."""

    ALLREDUCE = 1
    ALLREDUCE_BUCKETED = 2


class AssignmentStrategy(Enum):
    """Heuristic used to cost factor work for load balancing.

    COMPUTE costs a factor by its O(d^3) decomposition time, MEMORY by its
    O(d^2) storage.
    """

    COMPUTE = 1
    MEMORY = 2


class ComputeMethod(Enum):
    """Second-order computation method: eigendecomposition or inverse."""

    EIGEN = 1
    INVERSE = 2


class DistributedStrategy(Enum):
    """KAISA distribution strategy shortcuts for grad_worker_fraction.

    - COMM_OPT: grad_worker_fraction = 1
    - MEM_OPT: grad_worker_fraction = 1 / world_size
    - HYBRID_OPT: grad_worker_fraction = 0.5
    """

    COMM_OPT = 1
    MEM_OPT = 2
    HYBRID_OPT = 3
