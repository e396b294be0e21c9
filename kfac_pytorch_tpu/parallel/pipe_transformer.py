"""Pipelined K-FAC for transformer stages: the GPT-NeoX regime.

Where :mod:`kfac_pytorch_tpu.parallel.pipe_exec` pipelines homogeneous
Dense stacks, this module pipelines TRANSFORMER blocks -- the actual
model family of the reference's GPT-NeoX preconditioner
(``kfac/gpt_neox/preconditioner.py:40-515`` and ``layer.py:18-311`` of
gpauloski/kfac-pytorch, built for DeepSpeed ``PipelineModule`` GPT
models). One pipeline stage = one block:

- fused qkv projection ``[d, 3d]`` (the GPT-NeoX ColumnParallelLinear
  layout), causal multi-head attention, output projection ``[d, d]``,
- 2-layer relu MLP ``[d, f] / [f, d]``,
- parameterless RMS pre-norms + residuals (norms carry no K-FAC state,
  matching the reference's Linear-only registration).

Each stage therefore owns FOUR K-FAC layers with heterogeneous factor
dims (A: d+1, d+1, d+1, f+1; G: 3d, d, f, d) -- stacked per sublayer
kind with the block axis sharded over ``pipe`` (owner-computes,
MEM-OPT), exactly the invariant the reference's pipeline assignment
enforces (``gpt_neox/assignment.py:75-142``).

Capture works like pipe_exec: a statically-unrolled GPipe tick loop
under one ``shard_map``; A-factors accumulate masked ``x^T x`` sums of
each sublayer's input rows ((mb, T) folded) inside the pipe; G-factors
come from zero taps on each sublayer output, whose cotangents of the
pipelined loss are the per-tick output gradients (exact zeros on bubble
ticks). The pinning invariant, tested on the 8-device CPU mesh: the
pipelined capture reproduces the factors/loss/grads of the equivalent
unpipelined single-device model exactly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfac_pytorch_tpu.ops.curvature import (
    ema_update,
    eigh_factor,
    precondition_eigen,
)

__all__ = [
    'TransformerPipeState',
    'init_transformer_params',
    'transformer_pipeline_capture',
    'make_transformer_pipeline_step',
]

SUBLAYERS = ('qkv', 'attn_out', 'mlp_in', 'mlp_out')


def _shard_map(fn: Any, mesh: Mesh, in_specs: Any, out_specs: Any) -> Any:
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def init_transformer_params(
    key: jax.Array,
    n_stages: int,
    d_model: int,
    d_ff: int,
) -> dict[str, jax.Array]:
    """Stacked per-stage block params (leading axis shards over pipe)."""
    ks = jax.random.split(key, 4)
    s = n_stages

    def w(k: jax.Array, fan_in: int, fan_out: int) -> jax.Array:
        return jax.random.normal(
            k, (s, fan_in, fan_out), jnp.float32,
        ) / jnp.sqrt(fan_in)

    return {
        'qkv': w(ks[0], d_model, 3 * d_model),
        'qkv_b': jnp.zeros((s, 3 * d_model), jnp.float32),
        'attn_out': w(ks[1], d_model, d_model),
        'attn_out_b': jnp.zeros((s, d_model), jnp.float32),
        'mlp_in': w(ks[2], d_model, d_ff),
        'mlp_in_b': jnp.zeros((s, d_ff), jnp.float32),
        'mlp_out': w(ks[3], d_ff, d_model),
        'mlp_out_b': jnp.zeros((s, d_model), jnp.float32),
    }


def _rms_norm(x: jax.Array) -> jax.Array:
    """Parameterless RMS norm (no K-FAC state, like the reference's
    un-registered LayerNorms)."""
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6,
    )


def block_forward(
    params: dict[str, jax.Array],
    x: jax.Array,
    taps: dict[str, jax.Array],
    n_heads: int,
    tp: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One transformer block; returns (output, per-sublayer A inputs).

    ``x``: [mb, T, d]. ``taps[name]``: zeros shaped like the sublayer
    output. The returned dict maps sublayer name -> its INPUT rows
    [mb, T, fan_in] (the A-factor activations).

    With ``tp`` every projection kernel is a column shard over the
    ``model`` mesh axis (the GPT-NeoX ColumnParallelLinear layout for
    qkv); pre-activations are all-gathered back to full width before
    bias/taps, so capture stays TP-agnostic -- same design as
    ``pipe_exec._stage_forward``.
    """

    def dense(h: jax.Array, name: str) -> jax.Array:
        z = h @ params[name]
        if tp:
            z = jax.lax.all_gather(z, 'model', axis=-1, tiled=True)
        return z + params[f'{name}_b'] + taps[name]

    mb, t, d = x.shape
    dh = d // n_heads
    a_in: dict[str, jax.Array] = {}

    h = _rms_norm(x)
    a_in['qkv'] = h
    qkv = dense(h, 'qkv')
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z: jax.Array) -> jax.Array:
        return z.reshape(mb, t, n_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum('bhqd,bhkd->bhqk', q, k) / jnp.sqrt(dh)
    causal = jnp.tril(jnp.ones((t, t), bool))
    scores = jnp.where(causal, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    mix = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
    mix = mix.transpose(0, 2, 1, 3).reshape(mb, t, d)
    a_in['attn_out'] = mix
    x = x + dense(mix, 'attn_out')

    h = _rms_norm(x)
    a_in['mlp_in'] = h
    act = jax.nn.relu(dense(h, 'mlp_in'))
    a_in['mlp_out'] = act
    return x + dense(act, 'mlp_out'), a_in


def _a_dims(d_model: int, d_ff: int) -> dict[str, int]:
    return {
        'qkv': d_model + 1,
        'attn_out': d_model + 1,
        'mlp_in': d_model + 1,
        'mlp_out': d_ff + 1,
    }


def _g_dims(d_model: int, d_ff: int) -> dict[str, int]:
    return {
        'qkv': 3 * d_model,
        'attn_out': d_model,
        'mlp_in': d_ff,
        'mlp_out': d_model,
    }


def transformer_pipeline_capture(
    mesh: Mesh,
    params: dict[str, jax.Array],
    x: jax.Array,
    y: jax.Array,
    n_microbatches: int,
    n_heads: int,
) -> tuple[jax.Array, Any, dict[str, jax.Array], dict[str, jax.Array]]:
    """Pipelined transformer forward/backward with in-pipe capture.

    Args:
        mesh: ``(pipe, data)`` mesh.
        params: stacked block params (leading axis sharded over pipe).
        x: ``[B, T, d]`` global batch of embeddings (sharded over data).
        y: ``[B, T]`` int targets (next-token style; the loss projects
            the last stage's output back onto the embedding dim as a
            tied-vocab logit surrogate, keeping this module free of an
            embedding table).

    Returns:
        ``(loss, grads, a_factors, g_factors)`` -- the factor dicts map
        sublayer name -> ``[S, dim, dim]`` stacked blocks, block axis
        sharded over pipe, already reduced over each stage's DP group.
    """
    n_stages = mesh.shape['pipe']
    n_data = mesh.shape['data']
    tp = 'model' in mesh.axis_names and mesh.shape['model'] > 1
    n_model = mesh.shape['model'] if tp else 1
    d_model = x.shape[-1]
    # Kernels may arrive TP-sharded; shapes here are the GLOBAL view.
    d_ff = params['mlp_in'].shape[-1]
    t_len = x.shape[1]
    n_micro = n_microbatches
    batch_global = x.shape[0]
    if batch_global % (n_data * n_micro):
        raise ValueError('batch must divide n_data * n_microbatches')
    mb = batch_global // (n_data * n_micro)
    n_ticks = n_micro + n_stages - 1
    a_dims = _a_dims(d_model, d_ff)
    g_dims = _g_dims(d_model, d_ff)

    def body(
        stage_params: dict[str, jax.Array],  # [1, ...] local slices
        taps: dict[str, jax.Array],  # [1, 1, T_ticks, mb, t, gdim]
        xl: jax.Array,
        yl: jax.Array,
    ) -> tuple[jax.Array, tuple[jax.Array, ...]]:
        sp = {k: v[0] for k, v in stage_params.items()}
        tps = {k: v[0, 0] for k, v in taps.items()}
        stage = jax.lax.axis_index('pipe')
        xmb = xl.reshape(n_micro, mb, t_len, d_model)
        ymb = yl.reshape(n_micro, mb, t_len)
        buf = jnp.zeros((mb, t_len, d_model), xl.dtype)
        loss_acc = jnp.zeros((), jnp.float32)
        a_accs = {
            name: jnp.zeros((dim, dim), jnp.float32)
            for name, dim in a_dims.items()
        }
        for t in range(n_ticks):
            feed = xmb[min(t, n_micro - 1)]
            h_in = jnp.where(stage == 0, feed, buf)
            out, a_in = block_forward(
                sp, h_in, {k: v[t] for k, v in tps.items()},
                n_heads, tp,
            )
            valid = jnp.where(
                (stage <= t) & (t < stage + n_micro), 1.0, 0.0,
            )
            for name in SUBLAYERS:
                rows = a_in[name].reshape(-1, a_in[name].shape[-1])
                rows = jnp.concatenate(
                    [rows, jnp.ones((rows.shape[0], 1), rows.dtype)],
                    axis=-1,
                )
                a_accs[name] = a_accs[name] + valid * (rows.T @ rows)
            j = t - (n_stages - 1)
            if 0 <= j < n_micro:
                # Tied-embedding logit surrogate: project onto d_model
                # classes; cross-entropy per token.
                logits = out
                ce = -jnp.take_along_axis(
                    jax.nn.log_softmax(logits.astype(jnp.float32)),
                    ymb[j][..., None],
                    axis=-1,
                ).mean()
                loss_acc = loss_acc + jnp.where(
                    stage == n_stages - 1, ce, 0.0,
                )
            buf = jax.lax.ppermute(
                out, 'pipe',
                perm=[(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
        # Under TP the per-rank contributions are identical across
        # 'model' (capture sees gathered full-width tensors) but the
        # replication tracker sees them varying; the extra psum-mean
        # over 'model' is numerically a no-op that marks replication
        # (same dance as pipe_exec).
        loss_axes = (
            ('pipe', 'data', 'model') if tp else ('pipe', 'data')
        )
        loss = jax.lax.psum(loss_acc, loss_axes) / (
            n_micro * n_data * n_model
        )
        fac_axes = ('data', 'model') if tp else ('data',)
        rows_per_dev = n_micro * mb * t_len
        a_out = []
        for name in SUBLAYERS:
            fac = jax.lax.psum(a_accs[name], fac_axes) / (
                n_data * n_model * rows_per_dev
            )
            a_out.append(((fac + fac.T) / 2.0)[None])
        return loss, tuple(a_out)

    taps = {
        name: jnp.zeros(
            (n_stages, n_data, n_ticks, mb, t_len, g_dims[name]),
            jnp.float32,
        )
        for name in SUBLAYERS
    }

    def loss_of(params: dict[str, jax.Array], taps: Any):
        def pspec(name: str) -> P:
            # Kernels are column-sharded over 'model' under TP; biases
            # (and everything else) stay full-width per stage.
            if tp and not name.endswith('_b'):
                return P('pipe', None, 'model')
            return P('pipe')

        loss, a_fac = _shard_map(
            body,
            mesh,
            in_specs=(
                {k: pspec(k) for k in params},
                {k: P('pipe', 'data') for k in taps},
                P('data'), P('data'),
            ),
            out_specs=(P(), tuple(P('pipe') for _ in SUBLAYERS)),
        )(params, taps, x, y)
        return loss, a_fac

    (loss, a_fac), (grads, gtaps) = jax.value_and_grad(
        loss_of, argnums=(0, 1), has_aux=True,
    )(params, taps)

    def g_reduce(gt: jax.Array) -> jax.Array:
        gt = gt[0, 0]  # [T_ticks, mb, t, gdim]
        g2 = gt.reshape(-1, gt.shape[-1])
        g_sum = g2.T @ g2
        rows = n_micro * mb * t_len
        fac = jax.lax.psum(g_sum, 'data') / (n_data * rows)
        return ((fac + fac.T) / 2.0)[None]

    g_fac = {
        name: _shard_map(
            g_reduce, mesh,
            in_specs=(P('pipe', 'data'),), out_specs=P('pipe'),
        )(gtaps[name])
        for name in SUBLAYERS
    }
    a_fac = {name: a_fac[i] for i, name in enumerate(SUBLAYERS)}
    return loss, grads, a_fac, g_fac


class TransformerPipeState(NamedTuple):
    steps: jax.Array
    a: dict[str, jax.Array]
    g: dict[str, jax.Array]
    qa: dict[str, jax.Array]
    da: dict[str, jax.Array]
    qg: dict[str, jax.Array]
    dg: dict[str, jax.Array]


def make_transformer_pipeline_step(
    mesh: Mesh,
    n_microbatches: int,
    n_heads: int,
    *,
    damping: float = 0.003,
    factor_decay: float = 0.95,
    lr: float = 0.1,
) -> tuple[Any, Any]:
    """Build ``(init_state, step)`` for pipelined transformer K-FAC.

    Second-order state stacks per sublayer kind with the block (stage)
    axis sharded over ``pipe`` -- each stage eigendecomposes only its
    own four factors (owner-computes, MEM-OPT), the reference pipeline
    assignment's invariant.
    """
    n_stages = mesh.shape['pipe']

    def shard(tail: int) -> NamedSharding:
        return NamedSharding(mesh, P(*(('pipe',) + (None,) * tail)))

    def init_state(d_model: int, d_ff: int) -> TransformerPipeState:
        a_dims = _a_dims(d_model, d_ff)
        g_dims = _g_dims(d_model, d_ff)
        con = jax.lax.with_sharding_constraint

        def eye(dim: int) -> jax.Array:
            return con(
                jnp.broadcast_to(jnp.eye(dim), (n_stages, dim, dim)),
                shard(2),
            )

        def ones(dim: int) -> jax.Array:
            return con(jnp.ones((n_stages, dim)), shard(1))

        return TransformerPipeState(
            steps=jnp.zeros((), jnp.int32),
            a={k: eye(v) for k, v in a_dims.items()},
            g={k: eye(v) for k, v in g_dims.items()},
            qa={k: eye(v) for k, v in a_dims.items()},
            da={k: ones(v) for k, v in a_dims.items()},
            qg={k: eye(v) for k, v in g_dims.items()},
            dg={k: ones(v) for k, v in g_dims.items()},
        )

    def step(
        state: TransformerPipeState,
        params: dict[str, jax.Array],
        x: jax.Array,
        y: jax.Array,
    ) -> tuple[TransformerPipeState, dict[str, jax.Array], jax.Array]:
        loss, grads, a_blocks, g_blocks = transformer_pipeline_capture(
            mesh, params, x, y, n_microbatches, n_heads,
        )
        con = jax.lax.with_sharding_constraint
        a = {
            k: con(ema_update(state.a[k], a_blocks[k], factor_decay),
                   shard(2))
            for k in SUBLAYERS
        }
        g = {
            k: con(ema_update(state.g[k], g_blocks[k], factor_decay),
                   shard(2))
            for k in SUBLAYERS
        }
        qa, da, qg, dg = {}, {}, {}, {}
        new_params = dict(params)
        for k in SUBLAYERS:
            qa[k], da[k] = eigh_factor(con(a[k], shard(2)))
            qg[k], dg[k] = eigh_factor(con(g[k], shard(2)))
            qa[k] = con(qa[k], shard(2))
            qg[k] = con(qg[k], shard(2))
            # Grad matrix per K-FAC convention: (out, in+1) with bias col.
            gm = jnp.concatenate(
                [
                    jnp.swapaxes(grads[k], -1, -2),
                    grads[f'{k}_b'][..., None],
                ],
                axis=-1,
            )
            pg = jax.vmap(
                lambda m, vqa, vda, vqg, vdg: precondition_eigen(
                    m, vqa, vqg, vda, vdg, damping,
                ),
            )(con(gm, shard(2)), qa[k], da[k], qg[k], dg[k])
            pg = con(pg, shard(2))
            new_params[k] = params[k] - lr * jnp.swapaxes(
                pg[..., :-1], -1, -2,
            )
            new_params[f'{k}_b'] = params[f'{k}_b'] - lr * pg[..., -1]
        new_state = TransformerPipeState(
            state.steps + 1, a, g, qa, da, qg, dg,
        )
        return new_state, new_params, loss

    return init_state, step
