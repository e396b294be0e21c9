"""Executable pipeline-parallel K-FAC tests (GPipe over a pipe x data mesh).

Counterpart of the reference's GPT-NeoX preconditioner capability
(``kfac/gpt_neox/preconditioner.py:40-515`` of gpauloski/kfac-pytorch): a
pipe-staged model trains under K-FAC with stage-local factors. The pinning
invariant: the pipelined capture (microbatches, ppermute schedule, masked
accumulation, DP-group psum) produces EXACTLY the factors, loss, and
gradients of the equivalent unpipelined model on the full batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.parallel.pipe_exec import (
    init_pipeline_params,
    make_pipeline_kfac_step,
    pipeline_capture,
    _derive_layout,
)

STAGES, DATA, LAYERS, WIDTH, MICRO = 4, 2, 2, 8, 2
BATCH = 32


def _mesh() -> Mesh:
    devices = np.array(jax.devices()[: STAGES * DATA]).reshape(
        STAGES, DATA,
    )
    return Mesh(devices, ('pipe', 'data'))


class _MLP(nn.Module):
    """The unpipelined equivalent: S*L Dense+relu layers."""

    n_layers: int
    width: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(self.n_layers):
            x = nn.relu(nn.Dense(self.width)(x))
        return x


def _flax_params_from_stacked(params: dict) -> dict:
    out = {}
    for s in range(STAGES):
        for layer in range(LAYERS):
            out[f'Dense_{s * LAYERS + layer}'] = {
                'kernel': params['w'][s, layer],
                'bias': params['b'][s, layer],
            }
    return out


def _data():
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, WIDTH))
    y = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, WIDTH)
    return x, y


def test_pipeline_capture_matches_unpipelined() -> None:
    mesh = _mesh()
    params = init_pipeline_params(
        jax.random.PRNGKey(3), STAGES, LAYERS, WIDTH,
    )
    x, y = _data()

    loss_p, grads_p, a_blocks, g_blocks = jax.jit(
        lambda p, bx, by: pipeline_capture(mesh, p, bx, by, MICRO),
    )(params, x, y)

    model = _MLP(n_layers=STAGES * LAYERS, width=WIDTH)
    fparams = _flax_params_from_stacked(params)

    def loss_fn(p, bx, by):
        return optax.softmax_cross_entropy_with_integer_labels(
            model.apply({'params': p}, bx), by,
        ).mean()

    precond = KFACPreconditioner(model, example_args=(x,))
    (loss_r, _), grads_r, captured = jax.jit(
        precond.value_and_grad(loss_fn),
    )(fparams, x, y)

    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-6)
    for s in range(STAGES):
        for layer in range(LAYERS):
            k = s * LAYERS + layer
            cap = captured[f'Dense_{k}']
            np.testing.assert_allclose(
                np.asarray(a_blocks[k]), np.asarray(cap.a),
                rtol=1e-5, atol=1e-6, err_msg=f'A mismatch layer {k}',
            )
            np.testing.assert_allclose(
                np.asarray(g_blocks[k]), np.asarray(cap.g),
                rtol=1e-5, atol=1e-8, err_msg=f'G mismatch layer {k}',
            )
            np.testing.assert_allclose(
                np.asarray(grads_p['w'][s, layer]),
                np.asarray(grads_r[f'Dense_{k}']['kernel']),
                rtol=1e-5, atol=1e-7,
            )
            np.testing.assert_allclose(
                np.asarray(grads_p['b'][s, layer]),
                np.asarray(grads_r[f'Dense_{k}']['bias']),
                rtol=1e-5, atol=1e-7,
            )


def test_pipeline_step_shards_second_order_state() -> None:
    """MEM-OPT: eigendecompositions live only on the owning pipe stage."""
    mesh = _mesh()
    params = init_pipeline_params(
        jax.random.PRNGKey(3), STAGES, LAYERS, WIDTH,
    )
    x, y = _data()
    init_state, step = make_pipeline_kfac_step(mesh, LAYERS, MICRO)
    state = init_state(WIDTH)
    state, params, loss = jax.jit(step)(state, params, x, y)
    jax.block_until_ready(state)

    nb = STAGES * LAYERS
    for arr in (state.qa, state.qg, state.a, state.g):
        spec = arr.sharding.spec
        assert spec[0] == 'pipe', spec
        shard_rows = {
            s.data.shape[0] for s in arr.addressable_shards
        }
        assert shard_rows == {nb // STAGES}, shard_rows
    assert np.isfinite(float(loss))


def test_pipeline_training_decreases_loss() -> None:
    mesh = _mesh()
    params = init_pipeline_params(
        jax.random.PRNGKey(7), STAGES, LAYERS, WIDTH,
    )
    x, y = _data()
    init_state, step = make_pipeline_kfac_step(
        mesh, LAYERS, MICRO, lr=0.2, damping=0.01,
    )
    state = init_state(WIDTH)
    jstep = jax.jit(step)
    losses = []
    for _ in range(40):
        state, params, loss = jstep(state, params, x, y)
        losses.append(float(loss))
    # Deep random-data relu MLP: expect a steady, meaningful decrease.
    assert losses[-1] < losses[0] - 0.1, losses


def test_layout_derived_from_assignment() -> None:
    mesh = _mesh()
    asn, axes, spec = _derive_layout(mesh, LAYERS)
    # MEM-OPT invariants (reference gpt_neox/assignment.py:116-130)
    assert not asn.broadcast_inverses()
    assert asn.broadcast_gradients()
    assert axes == ('data',)
    assert spec == P('pipe')


@pytest.mark.parametrize('micro', [1, 4])
def test_microbatch_count_invariance(micro: int) -> None:
    """Factor/grad results are independent of the GPipe microbatch split."""
    mesh = _mesh()
    params = init_pipeline_params(
        jax.random.PRNGKey(3), STAGES, LAYERS, WIDTH,
    )
    x, y = _data()
    base = jax.jit(
        lambda p, bx, by: pipeline_capture(mesh, p, bx, by, MICRO),
    )(params, x, y)
    alt = jax.jit(
        lambda p, bx, by: pipeline_capture(mesh, p, bx, by, micro),
    )(params, x, y)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
        ),
        base,
        alt,
    )


def test_symmetric_comm_matches_dense_reduce() -> None:
    """Triu-packed factor all-reduce == dense psum (lossless round trip).

    Wires collectives.reduce_factors(symmetric=True) into the pipeline's
    data-parallel factor reduce -- the reference's symmetry_aware wire
    format (kfac/distributed.py:422-465) on a real multi-device path.
    """
    mesh = _mesh()
    params = init_pipeline_params(
        jax.random.PRNGKey(3), STAGES, LAYERS, WIDTH,
    )
    x, y = _data()
    dense = jax.jit(
        lambda p, bx, by: pipeline_capture(mesh, p, bx, by, MICRO),
    )(params, x, y)
    packed = jax.jit(
        lambda p, bx, by: pipeline_capture(
            mesh, p, bx, by, MICRO, symmetric_comm=True,
        ),
    )(params, x, y)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9,
        ),
        dense,
        packed,
    )


def _mesh3d() -> Mesh:
    """2 pipe x 2 data x 2 model -- the reference's 3D-parallel regime
    (kfac/gpt_neox/preconditioner.py of gpauloski/kfac-pytorch)."""
    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    return Mesh(devices, ('pipe', 'data', 'model'))


def test_3d_pipeline_tp_capture_matches_unpipelined() -> None:
    """pipe x data x model: column-parallel Dense under the GPipe
    schedule must reproduce the unpipelined unsharded model's loss,
    grads, and factors exactly."""
    stages = 2
    mesh = _mesh3d()
    params = init_pipeline_params(
        jax.random.PRNGKey(3), stages, LAYERS, WIDTH,
    )
    x, y = _data()

    loss_p, grads_p, a_blocks, g_blocks = jax.jit(
        lambda p, bx, by: pipeline_capture(mesh, p, bx, by, MICRO),
    )(params, x, y)

    model = _MLP(n_layers=stages * LAYERS, width=WIDTH)
    fparams = {}
    for s in range(stages):
        for layer in range(LAYERS):
            fparams[f'Dense_{s * LAYERS + layer}'] = {
                'kernel': params['w'][s, layer],
                'bias': params['b'][s, layer],
            }

    def loss_fn(p, bx, by):
        return optax.softmax_cross_entropy_with_integer_labels(
            model.apply({'params': p}, bx), by,
        ).mean()

    precond = KFACPreconditioner(model, example_args=(x,))
    (loss_r, _), grads_r, captured = jax.jit(
        precond.value_and_grad(loss_fn),
    )(fparams, x, y)

    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-6)
    for s in range(stages):
        for layer in range(LAYERS):
            k = s * LAYERS + layer
            cap = captured[f'Dense_{k}']
            np.testing.assert_allclose(
                np.asarray(a_blocks[k]), np.asarray(cap.a),
                rtol=1e-5, atol=1e-6, err_msg=f'A mismatch layer {k}',
            )
            np.testing.assert_allclose(
                np.asarray(g_blocks[k]), np.asarray(cap.g),
                rtol=1e-5, atol=1e-8, err_msg=f'G mismatch layer {k}',
            )
            np.testing.assert_allclose(
                np.asarray(grads_p['w'][s, layer]),
                np.asarray(grads_r[f'Dense_{k}']['kernel']),
                rtol=1e-5, atol=1e-7,
            )


def test_3d_pipeline_tp_training_decreases_loss() -> None:
    """Full 3D step: TP-sharded kernels, pipe-sharded second-order
    state, data-parallel batch -- trains end-to-end."""
    stages = 2
    mesh = _mesh3d()
    params = init_pipeline_params(
        jax.random.PRNGKey(7), stages, LAYERS, WIDTH,
    )
    # Place kernels TP-sharded as a production caller would.
    from jax.sharding import NamedSharding

    params = {
        'w': jax.device_put(
            params['w'],
            NamedSharding(mesh, P('pipe', None, None, 'model')),
        ),
        'b': jax.device_put(
            params['b'], NamedSharding(mesh, P('pipe')),
        ),
    }
    x, y = _data()
    init_state, step = make_pipeline_kfac_step(
        mesh, LAYERS, MICRO, lr=0.2, damping=0.01,
    )
    state = init_state(WIDTH)
    jstep = jax.jit(step)
    losses = []
    for _ in range(40):
        state, params, loss = jstep(state, params, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses
    # Second-order state stays pipe-sharded (MEM-OPT) in 3D too.
    assert state.qa.sharding.spec[0] == 'pipe'


def test_3d_symmetric_comm_matches_dense_reduce() -> None:
    """Triu-packed factor reduce stays lossless on the 3D mesh (the
    'model' leg of the A reduce also rides the packed format)."""
    stages = 2
    mesh = _mesh3d()
    params = init_pipeline_params(
        jax.random.PRNGKey(3), stages, LAYERS, WIDTH,
    )
    x, y = _data()
    dense = jax.jit(
        lambda p, bx, by: pipeline_capture(mesh, p, bx, by, MICRO),
    )(params, x, y)
    packed = jax.jit(
        lambda p, bx, by: pipeline_capture(
            mesh, p, bx, by, MICRO, symmetric_comm=True,
        ),
    )(params, x, y)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9,
        ),
        dense,
        packed,
    )
