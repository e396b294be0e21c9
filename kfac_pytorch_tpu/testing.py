"""Importable testing utilities.

Counterpart of the reference's installable ``testing/`` package
(``testing/distributed.py``, ``testing/assignment.py``,
``testing/models.py`` of gpauloski/kfac-pytorch). The fork+gloo
multi-process harness maps to a *virtual device mesh*: one process, N
XLA host-platform devices (see ``cpu_test_env`` below and
``tests/conftest.py``).
"""

from __future__ import annotations

import os
from typing import Any

__all__ = [
    'cpu_test_env',
    'open_port',
    'ReplicatedSharding',
    'TinyModel',
    'LeNet',
]

from kfac_pytorch_tpu.models import LeNet, TinyModel  # noqa: E402  (re-export)


def cpu_test_env(n_devices: int = 8) -> None:
    """Configure this process for an n-device virtual CPU mesh.

    Must run before JAX initializes a backend. The analogue of the
    reference's ``@distributed_test(world_size=n)`` fork harness
    (``testing/distributed.py:24-141``): instead of forking N processes
    with gloo, one process gets N XLA virtual devices and SPMD semantics
    are identical to a real multi-chip mesh.
    """
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count={n_devices}'
        ).strip()
    import jax

    jax.config.update('jax_platforms', 'cpu')


def open_port() -> int:
    """Find a free localhost port for a distributed-coordinator rendezvous.

    Counterpart of the reference's ``testing/utils.py:10-27`` (MASTER_PORT
    finder for the gloo fork harness); here it seeds
    ``KFAC_COORDINATOR_ADDRESS`` for multi-process
    ``jax.distributed.initialize`` tests.

    Same TOCTOU window as the reference's MASTER_PORT finder: the socket
    closes before the coordinator binds the port. ``SO_REUSEADDR``
    shrinks (does not eliminate) the window -- the coordinator can bind
    while the probe socket's TIME_WAIT lingers; callers that race
    concurrent harnesses should retry the rendezvous with a fresh port
    on bind failure (see ``tests/multiprocess_test.py``).
    """
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(('127.0.0.1', 0))
        return int(s.getsockname()[1])


class ReplicatedSharding:
    """Stub sharding policy: every constraint is a no-op.

    Counterpart of the reference's ``LazyAssignment``
    (``testing/assignment.py:10-86``): forces all control-flow branches of
    the preconditioner single-device, with configurable broadcast
    predicates for strategy-dependent assertions.
    """

    def __init__(self, broadcast: bool = True):
        self._broadcast = broadcast

    @property
    def grad_workers(self) -> int:
        return 1

    @property
    def world_size(self) -> int:
        return 1

    def broadcast_inverses(self) -> bool:
        return self._broadcast

    def broadcast_gradients(self) -> bool:
        return self._broadcast

    def constrain(self, tree: Any, stage: str) -> Any:
        del stage
        return tree
