"""Numerical ops for K-FAC on TPU."""

from __future__ import annotations

from kfac_pytorch_tpu.ops.covariance import append_bias_ones as append_bias_ones
from kfac_pytorch_tpu.ops.covariance import extract_conv2d_patches as extract_conv2d_patches
from kfac_pytorch_tpu.ops.covariance import get_cov as get_cov
from kfac_pytorch_tpu.ops.covariance import reshape_data as reshape_data
from kfac_pytorch_tpu.ops.curvature import damped_inverse as damped_inverse
from kfac_pytorch_tpu.ops.curvature import eigh_factor as eigh_factor
from kfac_pytorch_tpu.ops.curvature import ema_update as ema_update
from kfac_pytorch_tpu.ops.curvature import kl_clip_scale as kl_clip_scale
from kfac_pytorch_tpu.ops.curvature import precondition_eigen as precondition_eigen
from kfac_pytorch_tpu.ops.curvature import precondition_inverse as precondition_inverse
