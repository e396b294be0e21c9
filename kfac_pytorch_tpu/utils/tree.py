"""Pytree path utilities for locating layer parameter subtrees."""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any

__all__ = ['params_root', 'get_subtree', 'set_subtree']


def params_root(tree: Any, first_component: str) -> Any:
    """Return the subtree acting as the flax 'params' collection root.

    Accepts either the raw params dict or a variables-style dict with a
    top-level 'params' key, so users can differentiate w.r.t. whichever
    structure their train loop uses.
    """
    if isinstance(tree, Mapping):
        if first_component in tree:
            return tree
        if 'params' in tree:
            return tree['params']
    return tree


def get_subtree(tree: Any, path: tuple[str, ...]) -> Any:
    """Fetch a nested subtree by string path."""
    node = tree
    for p in path:
        node = node[p]
    return node


def set_subtree(tree: Any, path: tuple[str, ...], value: Any) -> Any:
    """Return a copy of ``tree`` with the subtree at ``path`` replaced."""
    if not path:
        return value
    if not isinstance(tree, Mapping):
        raise TypeError(f'Cannot descend into non-mapping node: {type(tree)}')
    out = dict(tree)
    out[path[0]] = set_subtree(tree[path[0]], path[1:], value)
    return out
