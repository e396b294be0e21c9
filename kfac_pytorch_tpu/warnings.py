"""Warning types (parity with reference ``kfac/warnings.py``)."""

from __future__ import annotations

__all__ = ['ExperimentalFeatureWarning']


class ExperimentalFeatureWarning(Warning):
    """Warning for experimental features."""
