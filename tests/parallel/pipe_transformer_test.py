"""Pipelined transformer K-FAC tests (GPT-NeoX regime).

The pinning invariant, same as the MLP pipeline tests: the pipelined
capture (GPipe schedule, masked accumulation, stage-local factors,
DP-group psum) reproduces EXACTLY the loss, per-sublayer grads, and A/G
factors of the equivalent unpipelined single-device model, where the
unpipelined factors are computed straight from their definition
(input-row covariance and tap-cotangent covariance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from kfac_pytorch_tpu.parallel.pipe_transformer import (
    SUBLAYERS,
    block_forward,
    init_transformer_params,
    make_transformer_pipeline_step,
    transformer_pipeline_capture,
)

STAGES, DATA, MICRO = 4, 2, 2
D_MODEL, D_FF, HEADS, T_LEN = 8, 16, 2, 6
BATCH = 16


def _mesh() -> Mesh:
    devices = np.array(jax.devices()[: STAGES * DATA]).reshape(
        STAGES, DATA,
    )
    return Mesh(devices, ('pipe', 'data'))


def _data():
    x = jax.random.normal(
        jax.random.PRNGKey(0), (BATCH, T_LEN, D_MODEL),
    )
    y = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, T_LEN), 0, D_MODEL,
    )
    return x, y


def _unpipelined_reference(params, x, y):
    """Single-device forward through all stages with explicit taps;
    factors from their definitions."""
    n_stages = params['qkv'].shape[0]

    g_shapes = {
        'qkv': 3 * D_MODEL, 'attn_out': D_MODEL,
        'mlp_in': D_FF, 'mlp_out': D_MODEL,
    }
    taps = {
        name: jnp.zeros((n_stages, BATCH, T_LEN, dim))
        for name, dim in g_shapes.items()
    }

    a_inputs = {}

    def loss_of(params, taps):
        h = x
        for s in range(n_stages):
            sp = {k: v[s] for k, v in params.items()}
            tp = {k: v[s] for k, v in taps.items()}
            h, a_in = block_forward(sp, h, tp, HEADS)
            a_inputs[s] = a_in
        logits = h
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(logits.astype(jnp.float32)),
            y[..., None],
            axis=-1,
        ).mean()
        return ce

    loss, (grads, gtaps) = jax.value_and_grad(
        loss_of, argnums=(0, 1),
    )(params, taps)
    # run once more eagerly to collect a_inputs (value_and_grad traced)
    loss_of(params, taps)

    a_fac, g_fac = {}, {}
    rows_n = BATCH * T_LEN
    for name in SUBLAYERS:
        a_s, g_s = [], []
        for s in range(n_stages):
            rows = np.asarray(a_inputs[s][name]).reshape(rows_n, -1)
            rows = np.concatenate(
                [rows, np.ones((rows_n, 1), rows.dtype)], axis=-1,
            )
            fac = rows.T @ rows / rows_n
            a_s.append((fac + fac.T) / 2.0)
            gt = np.asarray(gtaps[name][s]).reshape(rows_n, -1)
            gfac = gt.T @ gt / rows_n
            g_s.append((gfac + gfac.T) / 2.0)
        a_fac[name] = np.stack(a_s)
        g_fac[name] = np.stack(g_s)
    return float(loss), grads, a_fac, g_fac


def test_transformer_pipeline_capture_matches_unpipelined() -> None:
    mesh = _mesh()
    params = init_transformer_params(
        jax.random.PRNGKey(3), STAGES, D_MODEL, D_FF,
    )
    x, y = _data()

    loss_p, grads_p, a_p, g_p = jax.jit(
        lambda p, bx, by: transformer_pipeline_capture(
            mesh, p, bx, by, MICRO, HEADS,
        ),
    )(params, x, y)
    loss_r, grads_r, a_r, g_r = _unpipelined_reference(params, x, y)

    np.testing.assert_allclose(float(loss_p), loss_r, rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(grads_p[k]), np.asarray(grads_r[k]),
            rtol=1e-4, atol=1e-7, err_msg=f'grad mismatch {k}',
        )
    for name in SUBLAYERS:
        np.testing.assert_allclose(
            np.asarray(a_p[name]), a_r[name],
            rtol=1e-5, atol=1e-6, err_msg=f'A mismatch {name}',
        )
        np.testing.assert_allclose(
            np.asarray(g_p[name]), g_r[name],
            rtol=1e-4, atol=1e-9, err_msg=f'G mismatch {name}',
        )


def test_transformer_pipeline_trains_and_shards_state() -> None:
    mesh = _mesh()
    params = init_transformer_params(
        jax.random.PRNGKey(7), STAGES, D_MODEL, D_FF,
    )
    x, y = _data()
    init_state, step = make_transformer_pipeline_step(
        mesh, MICRO, HEADS, lr=0.2, damping=0.01,
    )
    state = init_state(D_MODEL, D_FF)
    jstep = jax.jit(step)
    losses = []
    for _ in range(30):
        state, params, loss = jstep(state, params, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses
    # Owner-computes: every sublayer's second-order state is sharded
    # over the pipe axis (one stage's blocks per stage).
    for name in SUBLAYERS:
        arr = state.qa[name]
        assert arr.sharding.spec[0] == 'pipe', arr.sharding
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {1}, shard_rows


def test_3d_transformer_pipeline_matches_unpipelined() -> None:
    """pipe x data x model with column-parallel qkv/attn_out/mlp kernels
    (the GPT-NeoX 3D regime): pipelined capture must match the
    unpipelined unsharded model exactly."""
    stages = 2
    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devices, ('pipe', 'data', 'model'))
    params = init_transformer_params(
        jax.random.PRNGKey(3), stages, D_MODEL, D_FF,
    )
    x, y = _data()

    loss_p, grads_p, a_p, g_p = jax.jit(
        lambda p, bx, by: transformer_pipeline_capture(
            mesh, p, bx, by, MICRO, HEADS,
        ),
    )(params, x, y)
    loss_r, grads_r, a_r, g_r = _unpipelined_reference(params, x, y)

    np.testing.assert_allclose(float(loss_p), loss_r, rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(grads_p[k]), np.asarray(grads_r[k]),
            rtol=1e-4, atol=1e-7, err_msg=f'grad mismatch {k}',
        )
    for name in SUBLAYERS:
        np.testing.assert_allclose(
            np.asarray(a_p[name]), a_r[name],
            rtol=1e-5, atol=1e-6, err_msg=f'A mismatch {name}',
        )
        np.testing.assert_allclose(
            np.asarray(g_p[name]), g_r[name],
            rtol=1e-4, atol=1e-9, err_msg=f'G mismatch {name}',
        )


def test_transformer_pipe_state_checkpoint_roundtrip(tmp_path) -> None:
    """The pipelined-transformer second-order state is a plain pytree:
    it must round-trip through Orbax unchanged (sharded-save of the
    pipe-sharded blocks is handled by Orbax natively)."""
    import orbax.checkpoint as ocp

    mesh = _mesh()
    params = init_transformer_params(
        jax.random.PRNGKey(7), STAGES, D_MODEL, D_FF,
    )
    x, y = _data()
    init_state, step = make_transformer_pipeline_step(mesh, MICRO, HEADS)
    state = init_state(D_MODEL, D_FF)
    state, params, _ = jax.jit(step)(state, params, x, y)
    jax.block_until_ready(state)

    path = str(tmp_path / 'pipe_tf_ckpt')
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {'a': state.a, 'g': state.g,
                          'steps': state.steps})
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    for name in SUBLAYERS:
        np.testing.assert_array_equal(
            np.asarray(restored['a'][name]), np.asarray(state.a[name]),
        )
        np.testing.assert_array_equal(
            np.asarray(restored['g'][name]), np.asarray(state.g[name]),
        )
    assert int(restored['steps']) == int(state.steps)
