"""Mesh/sharding machinery for distributed K-FAC."""

from __future__ import annotations

from kfac_pytorch_tpu.parallel.strategy import kaisa_mesh as kaisa_mesh
from kfac_pytorch_tpu.parallel.strategy import KAISASharding as KAISASharding
from kfac_pytorch_tpu.parallel.strategy import (
    resolve_grad_workers as resolve_grad_workers,
)
from kfac_pytorch_tpu.parallel.pipe_precond import (
    make_pipeline_period_train_step as make_pipeline_period_train_step,
)
from kfac_pytorch_tpu.parallel.pipe_precond import (
    make_pipeline_train_step as make_pipeline_train_step,
)
from kfac_pytorch_tpu.parallel.pipe_precond import (
    PipelineKFACPreconditioner as PipelineKFACPreconditioner,
)
from kfac_pytorch_tpu.parallel.pipeline import (
    PipelineAssignment as PipelineAssignment,
)
from kfac_pytorch_tpu.parallel.pipeline import (
    PipelineTopology as PipelineTopology,
)
