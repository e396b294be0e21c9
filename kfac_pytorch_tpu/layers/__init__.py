"""Layer helpers and registration."""

from __future__ import annotations

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper as Conv2dHelper
from kfac_pytorch_tpu.layers.helpers import LayerHelper as LayerHelper
from kfac_pytorch_tpu.layers.helpers import LinearHelper as LinearHelper
from kfac_pytorch_tpu.layers.registry import any_match as any_match
from kfac_pytorch_tpu.layers.registry import KNOWN_MODULES as KNOWN_MODULES
from kfac_pytorch_tpu.layers.registry import LayerSpec as LayerSpec
from kfac_pytorch_tpu.layers.registry import register_modules as register_modules
