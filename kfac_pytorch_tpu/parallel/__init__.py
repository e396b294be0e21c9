"""Mesh/sharding machinery for distributed K-FAC."""

from __future__ import annotations

from kfac_pytorch_tpu.parallel.strategy import kaisa_mesh as kaisa_mesh
from kfac_pytorch_tpu.parallel.strategy import KAISASharding as KAISASharding
from kfac_pytorch_tpu.parallel.strategy import (
    resolve_grad_workers as resolve_grad_workers,
)
from kfac_pytorch_tpu.parallel.pipe_exec import (
    init_pipeline_params as init_pipeline_params,
)
from kfac_pytorch_tpu.parallel.pipe_exec import (
    make_pipeline_kfac_step as make_pipeline_kfac_step,
)
from kfac_pytorch_tpu.parallel.pipe_exec import (
    pipeline_capture as pipeline_capture,
)
from kfac_pytorch_tpu.parallel.pipe_transformer import (
    init_transformer_params as init_transformer_params,
)
from kfac_pytorch_tpu.parallel.pipe_transformer import (
    make_transformer_pipeline_step as make_transformer_pipeline_step,
)
from kfac_pytorch_tpu.parallel.pipe_transformer import (
    transformer_pipeline_capture as transformer_pipeline_capture,
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
