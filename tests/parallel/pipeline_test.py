"""Tests for pipeline topology + assignment and mpu utilities.

Counterpart of reference ``tests/gpt_neox/assignment_test.py`` semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from kfac_pytorch_tpu.parallel.mpu import gather_from_model_parallel
from kfac_pytorch_tpu.parallel.mpu import scatter_to_model_parallel
from kfac_pytorch_tpu.parallel.mpu import split_tensor_along_axis
from kfac_pytorch_tpu.parallel.pipeline import PipelineAssignment
from kfac_pytorch_tpu.parallel.pipeline import PipelineTopology


def test_topology_coords_round_trip() -> None:
    topo = PipelineTopology(pipe=2, data=2, model=2)
    assert topo.world_size == 8
    for r in range(8):
        p, d, m = topo.coords(r)
        assert topo.rank(p, d, m) == r


def test_topology_groups() -> None:
    topo = PipelineTopology(pipe=2, data=2, model=2)
    # rank 0: stage 0 -> peers = ranks 0..3
    assert topo.pipe_peers(0) == frozenset({0, 1, 2, 3})
    assert topo.pipe_peers(5) == frozenset({4, 5, 6, 7})
    # data group of rank 0 (p=0, m=0): ranks 0 and 2
    assert topo.data_group(0) == frozenset({0, 2})
    # model group of rank 0 (p=0, d=0): ranks 0 and 1
    assert topo.model_group(0) == frozenset({0, 1})


def test_topology_validation() -> None:
    with pytest.raises(ValueError):
        PipelineTopology(0, 1, 1)


def test_pipeline_assignment_balances_within_stage() -> None:
    topo = PipelineTopology(pipe=2, data=4, model=1)
    work = {f'l{i}': {'A': 1.0, 'G': 1.0} for i in range(4)}
    asn = PipelineAssignment(work, local_rank=5, topology=topo)

    assert not asn.broadcast_inverses()
    assert asn.broadcast_gradients()
    owners = [asn.inv_worker(f'l{i}', 'A') for i in range(4)]
    # all owners are pipe peers of rank 5 (stage 1 = ranks 4..7),
    # spread evenly
    assert sorted(owners) == [4, 5, 6, 7]
    for i in range(4):
        layer = f'l{i}'
        owner = asn.inv_worker(layer, 'A')
        assert asn.grad_worker_group(layer) == frozenset({owner})
        assert asn.src_grad_worker(layer) == owner
        assert asn.grad_receiver_group(layer) == topo.data_group(owner)
        assert asn.factor_group(layer, 'A') == topo.data_group(owner)
    assert asn.is_grad_worker('l0') == (asn.inv_worker('l0', 'A') == 5)


def test_split_tensor() -> None:
    x = jnp.arange(12.0).reshape(2, 6)
    parts = split_tensor_along_axis(x, 3, axis=-1)
    assert len(parts) == 3
    assert parts[0].shape == (2, 2)
    with pytest.raises(ValueError):
        split_tensor_along_axis(x, 5, axis=-1)


def test_gather_scatter_round_trip() -> None:
    mesh = Mesh(np.array(jax.devices()), ('model',))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))

    gathered = jax.jit(
        shard_map(
            functools.partial(gather_from_model_parallel, axis_name='model'),
            mesh=mesh,
            in_specs=P(None, 'model'),
            out_specs=P(),
            check_rep=False,
        ),
    )(x)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(x), atol=0)

    scattered = jax.jit(
        shard_map(
            functools.partial(scatter_to_model_parallel, axis_name='model'),
            mesh=mesh,
            in_specs=P(),
            out_specs=P(None, 'model'),
        ),
    )(x)
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(x), atol=0)
