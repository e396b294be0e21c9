"""Test configuration: force an 8-device virtual CPU platform.

The JAX analogue of the reference's fork+gloo multi-process harness
(``testing/distributed.py:24-141``): multi-device semantics are tested on
one host by asking XLA for 8 virtual CPU devices.

Note: the environment may pre-register a remote TPU platform plugin via
sitecustomize and pin ``jax_platforms`` to it; ``jax.config.update`` after
import (but before first backend use) reliably overrides that, whereas the
``JAX_PLATFORMS`` env var does not.
"""

from __future__ import annotations

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
