"""Example training scripts and shared utilities (see README)."""
