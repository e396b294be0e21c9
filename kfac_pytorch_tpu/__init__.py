"""kfac_pytorch_tpu: TPU-native distributed K-FAC / KAISA preconditioning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gpauloski/kfac-pytorch: layer-wise Kronecker-factored curvature
preconditioning with the KAISA gradient-worker-fraction distribution
strategy, built for TPU device meshes (pjit/shard_map + XLA collectives)
instead of torch.distributed.
"""

from __future__ import annotations

from kfac_pytorch_tpu import assignment as assignment
from kfac_pytorch_tpu import capture as capture
from kfac_pytorch_tpu import enums as enums
from kfac_pytorch_tpu import hyperparams as hyperparams
from kfac_pytorch_tpu import layers as layers
from kfac_pytorch_tpu import ops as ops
from kfac_pytorch_tpu import parallel as parallel
from kfac_pytorch_tpu import scheduler as scheduler
from kfac_pytorch_tpu import state as state
from kfac_pytorch_tpu import tracing as tracing
from kfac_pytorch_tpu import train as train
from kfac_pytorch_tpu import warnings as warnings
from kfac_pytorch_tpu.capture import accumulate_captures as accumulate_captures
from kfac_pytorch_tpu.capture import CapturedFactors as CapturedFactors
from kfac_pytorch_tpu.capture import nonfinite_captures as nonfinite_captures
from kfac_pytorch_tpu.enums import AllreduceMethod as AllreduceMethod
from kfac_pytorch_tpu.enums import AssignmentStrategy as AssignmentStrategy
from kfac_pytorch_tpu.enums import ComputeMethod as ComputeMethod
from kfac_pytorch_tpu.enums import DistributedStrategy as DistributedStrategy
from kfac_pytorch_tpu.checkpoint import restore_kfac_state as restore_kfac_state
from kfac_pytorch_tpu.checkpoint import save_kfac_state as save_kfac_state
from kfac_pytorch_tpu.optim import kfac_transform as kfac_transform
from kfac_pytorch_tpu.parallel.pipe_precond import (
    PipelineKFACPreconditioner as PipelineKFACPreconditioner,
)
from kfac_pytorch_tpu.preconditioner import KFACPreconditioner as KFACPreconditioner
from kfac_pytorch_tpu.state import KFACState as KFACState

__version__ = '0.1.0'
