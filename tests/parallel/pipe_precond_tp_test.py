"""3D (pipe x data x model) pipelined K-FAC through the PUBLIC engine.

The GPT-NeoX regime of the reference (``kfac/gpt_neox/preconditioner.py``
+ ``layer.py`` of gpauloski/kfac-pytorch) on a USER transformer stage
built from ColumnParallelDense / RowParallelDense
(``kfac_pytorch_tpu/layers/tp.py``). Pinning invariants:

1. TP execution is exact: the 3D pipelined capture equals the
   unpipelined single-device run of the same module (which computes the
   identical full-width math outside any mapped context).
2. The full engine (gating, refine/xla solvers, KL clip, prediv)
   preconditions identically through the public class.
3. TP=2 equals TP=1 (model axis is a pure layout choice).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from kfac_pytorch_tpu import KFACPreconditioner
from kfac_pytorch_tpu.models.transformer import PipelineTransformerStage
from kfac_pytorch_tpu.parallel.pipe_precond import (
    PipelineKFACPreconditioner,
    make_pipeline_train_step,
)

PIPE, DATA, MODEL = 2, 2, 2
DIM, HEADS, FFN, SEQ, MICRO = 8, 2, 16, 4, 2
BATCH = 16  # mb = 16 / (2 * 2) = 4


def _mesh3d() -> Mesh:
    devices = np.array(jax.devices()[:8]).reshape(PIPE, DATA, MODEL)
    return Mesh(devices, ('pipe', 'data', 'model'))


def _mesh2d() -> Mesh:
    devices = np.array(jax.devices()[: PIPE * DATA]).reshape(PIPE, DATA)
    return Mesh(devices, ('pipe', 'data'))


def _loss(out: jax.Array, y: jax.Array) -> jax.Array:
    # Tied-embedding logit surrogate: project onto DIM classes.
    return optax.softmax_cross_entropy_with_integer_labels(
        out.astype(jnp.float32), y,
    ).mean()


def _data():
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, SEQ, DIM))
    y = jax.random.randint(
        jax.random.PRNGKey(1), (BATCH, SEQ), 0, DIM,
    )
    return x, y


def _make(mesh, **kw) -> PipelineKFACPreconditioner:
    mb = BATCH // (mesh.shape['data'] * MICRO)
    return PipelineKFACPreconditioner(
        PipelineTransformerStage(dim=DIM, num_heads=HEADS, ffn_dim=FFN),
        mesh=mesh,
        n_microbatches=MICRO,
        loss_fn=_loss,
        example_args=(jnp.zeros((mb, SEQ, DIM)),),
        **kw,
    )


class FullModel(nn.Module):
    n_stages: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for _ in range(self.n_stages):
            x = PipelineTransformerStage(
                dim=DIM, num_heads=HEADS, ffn_dim=FFN,
            )(x)
        return x


def _unpipelined_equiv(pipe_params):
    return {
        f'PipelineTransformerStage_{s}': jax.tree.map(
            lambda leaf: leaf[s], pipe_params,
        )
        for s in range(PIPE)
    }


def test_registration_marks_tp_layout() -> None:
    precond = _make(_mesh3d())
    tp = {name: spec.tp for name, spec in precond.specs.items()}
    assert tp == {
        'qkv': 'column',
        'attn_out': 'row',
        'ffn_in': 'column',
        'ffn_out': 'row',
    }


def test_3d_capture_matches_unpipelined() -> None:
    mesh = _mesh3d()
    precond = _make(mesh)
    params = precond.init_params(jax.random.PRNGKey(3))
    x, y = _data()
    (loss_p, _), grads_p, cap_p = jax.jit(precond.value_and_grad())(
        params, x, y,
    )

    model = FullModel(n_stages=PIPE)
    fparams = _unpipelined_equiv(params)
    ref = KFACPreconditioner(model, example_args=(x,))

    def full_loss(p, bx, by):
        return _loss(model.apply({'params': p}, bx), by)

    (loss_r, _), grads_r, cap_r = jax.jit(ref.value_and_grad(full_loss))(
        fparams, x, y,
    )

    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-6)
    for s in range(PIPE):
        for name in ('qkv', 'attn_out', 'ffn_in', 'ffn_out'):
            rname = f'PipelineTransformerStage_{s}/{name}'
            np.testing.assert_allclose(
                np.asarray(cap_p[name].a[s]),
                np.asarray(cap_r[rname].a),
                rtol=2e-5,
                atol=1e-6,
                err_msg=f'A mismatch {rname}',
            )
            np.testing.assert_allclose(
                np.asarray(cap_p[name].g[s]),
                np.asarray(cap_r[rname].g),
                rtol=2e-5,
                atol=1e-8,
                err_msg=f'G mismatch {rname}',
            )
            np.testing.assert_allclose(
                np.asarray(grads_p[name]['kernel'][s]),
                np.asarray(grads_r[f'PipelineTransformerStage_{s}'][name][
                    'kernel'
                ]),
                rtol=2e-5,
                atol=1e-6,
                err_msg=f'grad mismatch {rname}',
            )


def test_3d_engine_update_matches_unpipelined() -> None:
    mesh = _mesh3d()
    kw = dict(damping=0.01, kl_clip=0.01, lr=0.1, eigensolver='xla')
    precond = _make(mesh, **kw)
    params = precond.init_params(jax.random.PRNGKey(3))
    x, y = _data()

    model = FullModel(n_stages=PIPE)
    fparams = _unpipelined_equiv(params)
    ref = KFACPreconditioner(model, example_args=(x,), **kw)

    def full_loss(p, bx, by):
        return _loss(model.apply({'params': p}, bx), by)

    state_p, state_r = precond.init(), ref.init()
    (_, _), grads_p, cap_p = jax.jit(precond.value_and_grad())(params, x, y)
    (_, _), grads_r, cap_r = jax.jit(ref.value_and_grad(full_loss))(
        fparams, x, y,
    )
    pg_p, _ = jax.jit(precond.step)(state_p, grads_p, cap_p)
    pg_r, _ = jax.jit(ref.step)(state_r, grads_r, cap_r)
    for s in range(PIPE):
        for name in ('qkv', 'attn_out', 'ffn_in', 'ffn_out'):
            got = np.asarray(pg_p[name]['kernel'][s])
            want = np.asarray(
                pg_r[f'PipelineTransformerStage_{s}'][name]['kernel'],
            )
            scale = max(np.abs(want).max(), 1e-8)
            np.testing.assert_allclose(
                got / scale, want / scale, atol=1e-4,
                err_msg=f'stage {s} {name}',
            )


def test_tp2_equals_tp1() -> None:
    """The model axis is a pure layout choice: TP=2 == TP=1 numerics."""
    p3 = _make(_mesh3d())
    p2 = _make(_mesh2d())
    # Host copies: the two preconditioners run on different device sets.
    params = jax.tree.map(
        np.asarray, p2.init_params(jax.random.PRNGKey(3)),
    )
    x, y = _data()
    (l3, _), g3, c3 = jax.jit(p3.value_and_grad())(params, x, y)
    (l2, _), g2, c2 = jax.jit(p2.value_and_grad())(params, x, y)
    np.testing.assert_allclose(float(l3), float(l2), rtol=1e-6)
    for name in c2:
        np.testing.assert_allclose(
            np.asarray(c3[name].a), np.asarray(c2[name].a),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g3[name]['kernel']),
            np.asarray(g2[name]['kernel']),
            rtol=1e-5, atol=1e-6,
        )


def test_3d_training_loss_decreases_with_refine() -> None:
    mesh = _mesh3d()
    precond = _make(
        mesh,
        factor_update_steps=2,
        inv_update_steps=2,
        eigensolver='refine',
        refine_iterations=4,
        lr=0.1,
    )
    params = precond.init_params(jax.random.PRNGKey(3))
    x, y = _data()
    tx = optax.sgd(0.2, momentum=0.9)
    step = jax.jit(make_pipeline_train_step(precond, tx))
    carry = (params, tx.init(params), precond.init())
    losses = []
    for _ in range(14):
        carry, loss = step(carry, (x, y))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_transformer_state_dict_and_checkpoint_roundtrip(tmp_path) -> None:
    """Heterogeneous (4 factor dims) stage state round-trips through
    state_dict and Orbax (reference factor_checkpoint_dir contract,
    kfac/gpt_neox/preconditioner.py:352-447)."""
    from kfac_pytorch_tpu.checkpoint import restore_kfac_state
    from kfac_pytorch_tpu.checkpoint import save_kfac_state

    mesh = _mesh3d()
    precond = _make(mesh, damping=0.01)
    params = precond.init_params(jax.random.PRNGKey(3))
    x, y = _data()
    state = precond.init()
    (_, _), grads, cap = jax.jit(precond.value_and_grad())(params, x, y)
    _, state = jax.jit(precond.step)(state, grads, cap)

    sd = precond.state_dict(state)
    restored = precond.load_state_dict(sd)
    for name in precond.specs:
        np.testing.assert_allclose(
            np.asarray(restored.factors[name].a),
            np.asarray(state.factors[name].a),
            rtol=1e-6,
        )

    path = tmp_path / 'ckpt'
    save_kfac_state(str(path), state)
    restored = restore_kfac_state(str(path), precond)
    np.testing.assert_allclose(
        np.asarray(restored.factors['qkv'].g),
        np.asarray(state.factors['qkv'].g),
        rtol=1e-7,
    )
    assert int(restored.steps) == 1


def test_tp_kernels_are_model_sharded() -> None:
    mesh = _mesh3d()
    precond = _make(mesh)
    with mesh:
        params = jax.jit(precond.init_params)(jax.random.PRNGKey(3))
    qkv_spec = params['qkv']['kernel'].sharding.spec
    assert tuple(qkv_spec) == ('pipe', None, 'model'), qkv_spec
    row_spec = params['ffn_out']['kernel'].sharding.spec
    assert tuple(row_spec)[:2] == ('pipe', 'model'), row_spec
