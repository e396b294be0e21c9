"""Mesh/sharding machinery for distributed K-FAC."""

from __future__ import annotations
