"""Model zoo for tests, examples, and benchmarks."""

from __future__ import annotations

from kfac_pytorch_tpu.models.simple import LeNet as LeNet
from kfac_pytorch_tpu.models.simple import TinyModel as TinyModel
