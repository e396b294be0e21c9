"""Utility helpers."""

from __future__ import annotations

from kfac_pytorch_tpu.utils.tree import get_subtree as get_subtree
from kfac_pytorch_tpu.utils.tree import params_root as params_root
from kfac_pytorch_tpu.utils.tree import set_subtree as set_subtree
