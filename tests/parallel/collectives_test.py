"""Tests for symmetric packing + shard_map factor reduction."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from kfac_pytorch_tpu.parallel.collectives import fill_triu
from kfac_pytorch_tpu.parallel.collectives import get_triu
from kfac_pytorch_tpu.parallel.collectives import NonSquareTensorError
from kfac_pytorch_tpu.parallel.collectives import reduce_factors


def test_triu_round_trip() -> None:
    m = jax.random.normal(jax.random.PRNGKey(0), (5, 5))
    sym = (m + m.T) / 2
    packed = get_triu(sym)
    assert packed.shape == (15,)
    restored = fill_triu(sym.shape, packed)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(sym), rtol=1e-6)


def test_triu_batched() -> None:
    m = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4))
    sym = (m + jnp.swapaxes(m, -1, -2)) / 2
    packed = get_triu(sym)
    assert packed.shape == (3, 10)
    restored = fill_triu(sym.shape, packed)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(sym), atol=1e-6)


def test_triu_non_square() -> None:
    with pytest.raises(NonSquareTensorError):
        get_triu(jnp.zeros((3, 4)))
    with pytest.raises(NonSquareTensorError):
        fill_triu((3, 4), jnp.zeros(6))


@pytest.mark.parametrize('symmetric', [False, True])
def test_reduce_factors_shard_map(symmetric: bool) -> None:
    mesh = Mesh(np.array(jax.devices()), ('world',))
    m = jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4))
    sym = (m + jnp.swapaxes(m, -1, -2)) / 2

    fn = shard_map(
        functools.partial(
            reduce_factors, axis_name='world', symmetric=symmetric,
        ),
        mesh=mesh,
        in_specs=P('world'),
        out_specs=P('world'),
    )
    out = jax.jit(fn)(sym)
    # each device contributed one block; mean over the axis on a
    # block-sharded input reduces each device's single block with itself
    # => identity. Use replicated input instead for a real check:
    fn2 = shard_map(
        functools.partial(
            reduce_factors, axis_name='world', symmetric=symmetric,
        ),
        mesh=mesh,
        in_specs=P(),
        out_specs=P(),
    )
    out2 = jax.jit(fn2)(sym)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(sym), atol=1e-5)
    assert out.shape == sym.shape
