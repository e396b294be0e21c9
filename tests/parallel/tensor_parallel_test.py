"""Tensor-parallel K-FAC tests: DP x TP mesh on 8 virtual devices.

TPU-native counterpart of the reference's GPT-NeoX TP integration tests
(``tests/gpt_neox/`` of gpauloski/kfac-pytorch). Where the reference
gathers TP-sharded activations/grad-outputs to a primary rank before the
covariance (``kfac/gpt_neox/layer.py:129-163``), the SPMD design operates
on logically-global arrays: kernels sharded over the ``model`` axis, batch
over the kfac axes, and XLA inserts the TP collectives inside the jitted
step. These tests pin the invariant that the TP run matches the unsharded
run numerically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.models.transformer import TransformerLM
from kfac_pytorch_tpu.parallel import kaisa_mesh
from kfac_pytorch_tpu.parallel import KAISASharding


def _setup():
    model = TransformerLM(
        vocab_size=64, dim=32, num_heads=4, num_layers=2, ffn_dim=64,
        max_len=16,
    )
    x = jax.random.randint(jax.random.PRNGKey(0), (8, 16), 0, 64)
    y = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 64)
    params = model.init(jax.random.PRNGKey(2), x)['params']

    def loss_fn(p, bx, by):
        logits = model.apply({'params': p}, bx)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, by,
        ).mean()

    return model, params, loss_fn, x, y


def _shard_params_tp(params, mesh):
    """Column-parallel qkv/ffn_in, row-parallel proj/ffn_out kernels."""

    def place(path, leaf):
        names = [getattr(p, 'key', str(p)) for p in path]
        spec = P()
        if 'kernel' in names:
            if any(n in names for n in ('qkv', 'ffn_in')):
                spec = P(None, 'model')  # shard output dim
            elif any(n in names for n in ('proj', 'ffn_out')):
                spec = P('model', None)  # shard input dim
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def test_kaisa_mesh_with_model_axis() -> None:
    mesh = kaisa_mesh(0.5, model_axis_size=2)
    assert dict(mesh.shape) == {'kfac_row': 2, 'kfac_col': 2, 'model': 2}
    mesh1 = kaisa_mesh(1.0, model_axis_size=1)
    assert 'model' not in mesh1.axis_names


def test_tp_matches_unsharded() -> None:
    model, params, loss_fn, x, y = _setup()

    # Baseline: single-device, no sharding.
    base = KFACPreconditioner(
        model, example_args=(x,), lr=0.01, damping=0.003,
        skip_layers=['lm_head'],
    )
    state_b = base.init()
    vag_b = jax.jit(base.value_and_grad(loss_fn))
    step_b = jax.jit(base.step)
    _, grads_b, cap_b = vag_b(params, x, y)
    pg_b, _ = step_b(state_b, grads_b, cap_b)

    # TP x DP: 2-way model parallel, 4-way data parallel (hybrid kfac).
    mesh = kaisa_mesh(0.5, model_axis_size=2)
    sharding = KAISASharding(mesh)
    precond = KFACPreconditioner(
        model, example_args=(x,), lr=0.01, damping=0.003,
        skip_layers=['lm_head'], sharding=sharding,
    )
    params_tp = _shard_params_tp(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, sharding.data_spec()))
    ys = jax.device_put(y, NamedSharding(mesh, sharding.data_spec()))

    state_tp = precond.init()
    vag = jax.jit(precond.value_and_grad(loss_fn))
    step = jax.jit(precond.step)
    (loss, _), grads, cap = vag(params_tp, xs, ys)
    pg, _ = step(state_tp, grads, cap)

    assert jnp.isfinite(loss)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4,
        ),
        pg,
        pg_b,
    )


def test_tp_training_step_runs_and_decreases() -> None:
    model, params, loss_fn, x, y = _setup()
    mesh = kaisa_mesh(1.0, model_axis_size=2)
    sharding = KAISASharding(mesh)
    precond = KFACPreconditioner(
        model, example_args=(x,), lr=0.05, damping=0.003,
        skip_layers=['lm_head'], sharding=sharding,
    )
    params = _shard_params_tp(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, sharding.data_spec()))
    ys = jax.device_put(y, NamedSharding(mesh, sharding.data_spec()))
    state = precond.init()
    vag = jax.jit(precond.value_and_grad(loss_fn))
    step = jax.jit(precond.step)
    losses = []
    for _ in range(5):
        (loss, _), grads, cap = vag(params, xs, ys)
        losses.append(float(loss))
        pgrads, state = step(state, grads, cap)
        params = jax.tree.map(lambda p, g: p - 0.05 * g, params, pgrads)
    assert losses[-1] < losses[0]
