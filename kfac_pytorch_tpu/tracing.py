"""Lightweight function tracing for performance debugging.

Counterpart of reference ``kfac/tracing.py:19-108`` of
gpauloski/kfac-pytorch: an opt-in decorator records wall time per function
into a module-global history. On TPU, honest timing requires waiting for
dispatched device work, so ``sync=True`` brackets the call with
``jax.block_until_ready`` over its inputs/outputs (the analogue of the
reference's ``dist.barrier()`` sync). For deep profiling use
``jax.profiler.trace`` -- this module is for cheap always-on counters.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from typing import Any, TypeVar

import jax

logger = logging.getLogger(__name__)

__all__ = ['trace', 'get_trace', 'log_trace', 'clear_trace', 'hostsync']


def hostsync(tree: Any) -> Any:
    """Force completion of ``tree``'s pending computation, portably.

    ``jax.block_until_ready`` is the documented sync point, but on
    remote-tunnel TPU backends it has been observed to return before the
    dispatched work finishes (making every wall-clock timing read ~0).
    Fetching data to the host cannot complete early, so this transfers the
    SMALLEST array leaf of ``tree`` (typically a scalar loss -- a few
    bytes) and returns ``tree`` unchanged. Use around timed regions;
    outputs of interest stay on device.
    """
    leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, 'dtype')
    ]
    if leaves:
        jax.block_until_ready(leaves)
        jax.device_get(min(leaves, key=lambda leaf: leaf.size))
    return tree

F = TypeVar('F', bound=Callable[..., Any])

_func_traces: dict[str, list[float]] = {}


def trace(sync: bool = False) -> Callable[[F], F]:
    """Decorator recording wall time of each call.

    Args:
        sync: if True, block until the function's jax array outputs are
            ready before stopping the timer (honest async-dispatch timing).
    """

    def decorator(func: F) -> F:
        name = func.__name__

        def wrapper(*args: Any, **kwargs: Any) -> Any:
            start = time.perf_counter()
            out = func(*args, **kwargs)
            if sync:
                out = hostsync(out)
            elapsed = time.perf_counter() - start
            _func_traces.setdefault(name, []).append(elapsed)
            return out

        wrapper.__name__ = name
        wrapper.__doc__ = func.__doc__
        return wrapper  # type: ignore[return-value]

    return decorator


def get_trace(
    average: bool = True,
    max_history: int | None = None,
) -> dict[str, float]:
    """Per-function timing summary (average or total over the history)."""
    out: dict[str, float] = {}
    for name, times in _func_traces.items():
        history = (
            times[-max_history:] if max_history is not None else times
        )
        total = sum(history)
        out[name] = total / len(history) if average else total
    return out


def log_trace(
    average: bool = True,
    max_history: int | None = None,
    loglevel: int = logging.INFO,
) -> None:
    """Log the timing summary."""
    for name, value in get_trace(average, max_history).items():
        logger.log(loglevel, f'{name}: {value:.6f}s')


def clear_trace() -> None:
    """Reset all recorded timings."""
    _func_traces.clear()
