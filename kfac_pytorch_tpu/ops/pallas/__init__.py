"""Pallas TPU kernels for the K-FAC hot path."""

from __future__ import annotations

from kfac_pytorch_tpu.ops.pallas.conv_cov import (
    conv2d_a_factor_fused as conv2d_a_factor_fused,
)
