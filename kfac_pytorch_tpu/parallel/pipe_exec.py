"""Executable pipeline-parallel K-FAC: GPipe schedule + in-pipe capture.

The TPU-native counterpart of the reference's GPT-NeoX preconditioner for
DeepSpeed ``PipelineModule`` models (``kfac/gpt_neox/preconditioner.py:40-515``
and ``kfac/gpt_neox/layer.py:18-311`` of gpauloski/kfac-pytorch): K-FAC over
a model whose layers physically live on different pipeline stages.

Design (SPMD over a ``(pipe, data)`` or ``(pipe, data, model)`` mesh, one
program for all devices; with a ``model`` axis each stage kernel is
column-parallel -- the reference's 3D regime):

- The model is a stack of identical stages (the standard homogeneous-stage
  pipelining layout); stage parameters carry a leading ``pipe``-sharded
  axis. Each stage is ``n_layers`` Dense(+bias)+relu layers.
- One ``shard_map`` body runs the GPipe schedule: a statically-unrolled
  tick loop moves microbatch activations stage-to-stage with
  ``lax.ppermute`` over the ``pipe`` axis; the last stage accumulates the
  masked microbatch losses. ``jax.value_and_grad`` OUTSIDE the shard_map
  differentiates through the schedule (XLA transposes the ppermutes into
  the reverse schedule automatically -- the hand-written backward pipe of
  the reference's DeepSpeed engine is compiler-derived here).
- Statistics capture happens inside the pipe, stage-locally, exactly like
  the reference's per-stage hooks: A-factors accumulate masked
  ``x^T x`` sums over the ticks owning a real microbatch; G-factors come
  from zero "taps" added to each layer output -- the tap cotangents of the
  pipelined loss ARE the per-tick output gradients (bubble ticks
  contribute exact zeros because no real path reaches the loss).
- Collective layout is derived from :class:`PipelineAssignment`
  (``parallel/pipeline.py``), not hardcoded: factors all-reduce over each
  stage's data-parallel group only (``factor_group``), second-order state
  stays sharded to stage peers (``broadcast_inverses() == False``,
  MEM-OPT), and preconditioned gradients are replicated over the stage's
  DP group (``broadcast_gradients() == True``).

Factors never cross pipe stages and second-order work is owner-computed
per stage -- the two invariants the reference's assignment enforces
(``gpt_neox/assignment.py:75-142``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfac_pytorch_tpu.ops.curvature import (
    ema_update,
    eigh_factor,
    precondition_eigen,
)
from kfac_pytorch_tpu.parallel.pipeline import (
    PipelineAssignment,
    PipelineTopology,
)

__all__ = [
    'PipeKFACState',
    'init_pipeline_params',
    'pipeline_capture',
    'make_pipeline_kfac_step',
]


def _shard_map(fn: Any, mesh: Mesh, in_specs: Any, out_specs: Any) -> Any:
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


class PipeKFACState(NamedTuple):
    """Per-layer-block factor state, block axis sharded over ``pipe``."""

    steps: jax.Array
    a: jax.Array  # [P * n_layers, d+1, d+1] running A factors
    g: jax.Array  # [P * n_layers, d, d] running G factors
    qa: jax.Array
    da: jax.Array
    qg: jax.Array
    dg: jax.Array


def init_pipeline_params(
    key: jax.Array,
    n_stages: int,
    n_layers: int,
    width: int,
) -> dict[str, jax.Array]:
    """Stacked stage parameters: ``w [S, L, d, d]``, ``b [S, L, d]``."""
    kw, _ = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(width)
    w = jax.random.normal(
        kw, (n_stages, n_layers, width, width), jnp.float32,
    ) * scale
    b = jnp.zeros((n_stages, n_layers, width), jnp.float32)
    return {'w': w, 'b': b}


def _derive_layout(
    mesh: Mesh,
    n_layers: int,
) -> tuple[PipelineAssignment, tuple[str, ...], P]:
    """Build the PipelineAssignment for this mesh and translate its group
    structure into mesh-axis collectives/shardings.

    The assignment speaks in flat device-index sets (the reference's
    process groups); this maps them back onto named mesh axes and refuses
    layouts it cannot represent.
    """
    n_pipe = mesh.shape['pipe']
    n_data = mesh.shape['data']
    n_model = mesh.shape.get('model', 1)
    topo = PipelineTopology(pipe=n_pipe, data=n_data, model=n_model)
    # Equal per-layer cost: the greedy balancer spreads a stage's layers
    # over its pipe peers; with homogeneous stages every stage gets the
    # same placement, which is what the stacked-block layout executes.
    work = {
        f'layer{i}': {'A': 1.0, 'G': 1.0} for i in range(n_layers)
    }
    asn = PipelineAssignment(work, local_rank=0, topology=topo)

    # factor_group must be the owner's data-parallel peer set -> the
    # reduce rides the 'data' axis only (never across stages).
    for layer in asn.get_layers():
        for factor in asn.get_factors(layer):
            owner = asn.inv_worker(layer, factor)
            if asn.factor_group(layer, factor) != topo.data_group(owner):
                raise ValueError(
                    'assignment factor_group is not a data-parallel '
                    'group; cannot map to mesh axes',
                )
    # Factors reduce over the stage's DP group only; under TP the
    # in-body A reduce additionally spans 'model' (pipeline_capture
    # appends it -- numerically a no-op on identical contributions,
    # needed to mark SPMD replication), while tap cotangents arrive
    # already model-summed by the shard_map transpose.
    factor_reduce_axes = ('data',)

    # MEM-OPT: inverses stay on the owning stage (block axis sharded over
    # 'pipe'); broadcast_inverses() would mean replication instead.
    state_spec = P(None) if asn.broadcast_inverses() else P('pipe')
    return asn, factor_reduce_axes, state_spec


def _stage_forward(
    w: jax.Array,
    b: jax.Array,
    x: jax.Array,
    taps: jax.Array,
    tp: bool,
) -> tuple[jax.Array, jax.Array]:
    """One stage: n_layers of Dense+bias(+tap)+relu.

    With ``tp`` (a ``model`` mesh axis), each Dense is column-parallel:
    the local kernel slice ``w[layer]`` is ``[d, d/TP]`` and the
    pre-activation is all-gathered over ``model`` back to full width
    (the Megatron column-parallel pattern; the reference's TP-aware
    layer instead gathers activations to a primary rank --
    ``kfac/gpt_neox/layer.py:18-311`` of gpauloski/kfac-pytorch). Taps
    and biases apply to the GATHERED tensor, so layer inputs and tap
    cotangents are full-width and replicated over ``model`` -- factor
    capture is TP-agnostic.

    Returns the stage output and the stacked per-layer INPUTS (the
    A-factor activations), ``[L, mb, d]``.
    """
    n_layers = w.shape[0]
    xs = []
    h = x
    for layer in range(n_layers):
        xs.append(h)
        h = h @ w[layer]
        if tp:
            h = jax.lax.all_gather(h, 'model', axis=-1, tiled=True)
        h = h + b[layer] + taps[layer]
        h = jax.nn.relu(h)
    return h, jnp.stack(xs)


def pipeline_capture(
    mesh: Mesh,
    params: dict[str, jax.Array],
    x: jax.Array,
    y: jax.Array,
    n_microbatches: int,
    factor_reduce_axes: tuple[str, ...] = ('data',),
    symmetric_comm: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array], jax.Array, jax.Array]:
    """Pipelined forward/backward with stage-local factor capture.

    Args:
        mesh: ``(pipe, data)`` mesh.
        params: stacked stage params (leading axis sharded over ``pipe``).
        x: ``[B, d]`` global batch (sharded over ``data``).
        y: ``[B]`` int labels.
        n_microbatches: GPipe microbatch count per data shard.
        symmetric_comm: pack factors as upper triangles for the
            data-parallel all-reduce (``reduce_factors(symmetric=True)``)
            -- half the bytes on the wire, for meshes whose ``data`` axis
            crosses hosts/DCN. The reference's ``symmetry_aware`` path
            (``kfac/distributed.py:422-465``).

    Returns:
        ``(loss, grads, a_factors, g_factors)`` -- grads shaped like
        ``params`` and sharded over ``pipe``; factors
        ``[S*L, d+1, d+1]`` / ``[S*L, d, d]`` with the block axis sharded
        over ``pipe`` (each stage's blocks live on that stage's devices,
        already reduced over the stage's data-parallel group).
    """
    n_stages = mesh.shape['pipe']
    n_data = mesh.shape['data']
    tp = 'model' in mesh.axis_names and mesh.shape['model'] > 1
    # In the pipelined body the activations pass through per-kernel
    # all_gathers, which the SPMD replication tracker treats as still
    # varying over 'model' -- the A-factor reduce therefore spans
    # ('data', 'model') there (numerically a no-op: the contributions
    # are identical across 'model'). The tap cotangents arrive OUTSIDE
    # the body already summed over 'model' by the shard_map transpose,
    # so the G reduce keeps the caller's axes.
    body_factor_axes = tuple(factor_reduce_axes)
    if tp and 'model' not in body_factor_axes:
        body_factor_axes = body_factor_axes + ('model',)
    n_layers, width = params['w'].shape[1], params['w'].shape[-1]
    n_micro = n_microbatches
    batch_global = x.shape[0]
    if batch_global % (n_data * n_micro):
        raise ValueError('batch must divide n_data * n_microbatches')
    mb = batch_global // (n_data * n_micro)
    n_ticks = n_micro + n_stages - 1

    def _factor_allreduce(
        v: jax.Array, axes: tuple[str, ...],
    ) -> jax.Array:
        """Mean over the stage's DP group, optionally triu-packed.

        Factor sums are bitwise-symmetric (commutative dot products), so
        the triu pack/unpack round-trip is lossless.
        """
        from kfac_pytorch_tpu.parallel.collectives import reduce_factors

        if symmetric_comm:
            out = v
            for ax in axes:
                out = reduce_factors(out, ax, symmetric=True)
            return out
        n = 1
        for ax in axes:
            n = n * jax.lax.psum(1, ax)
        return jax.lax.psum(v, axes) / n

    def body(
        w: jax.Array,  # [1, L, d, d] local stage slice
        b: jax.Array,
        taps: jax.Array,  # [1, 1, T, L, mb, d] -- per (stage, data shard)
        xl: jax.Array,  # [B_local, d]
        yl: jax.Array,  # [B_local]
    ) -> tuple[jax.Array, jax.Array]:
        w, b, taps = w[0], b[0], taps[0, 0]
        stage = jax.lax.axis_index('pipe')
        xmb = xl.reshape(n_micro, mb, width)
        ymb = yl.reshape(n_micro, mb)
        buf = jnp.zeros((mb, width), xl.dtype)
        loss_acc = jnp.zeros((), jnp.float32)
        a_acc = jnp.zeros((n_layers, width + 1, width + 1), jnp.float32)
        for t in range(n_ticks):
            # Stage 0 feeds microbatch t (static); other stages read the
            # ppermuted buffer. A tick is "real" for this device iff
            # stage <= t < stage + n_micro (traced -> masked, not branched).
            feed = xmb[min(t, n_micro - 1)]
            h_in = jnp.where(stage == 0, feed, buf)
            out, xs = _stage_forward(w, b, h_in, taps[t], tp)
            valid = (stage <= t) & (t < stage + n_micro)
            xs_aug = jnp.concatenate(
                [xs, jnp.ones((n_layers, mb, 1), xs.dtype)], axis=-1,
            )
            a_acc = a_acc + jnp.where(
                valid, 1.0, 0.0,
            ) * jnp.einsum('lmi,lmj->lij', xs_aug, xs_aug)
            # Last stage: tick t completes microbatch j = t - (S-1).
            j = t - (n_stages - 1)
            if 0 <= j < n_micro:
                ce = -jnp.take_along_axis(
                    jax.nn.log_softmax(out.astype(jnp.float32)),
                    ymb[j][:, None],
                    axis=-1,
                ).mean()
                loss_acc = loss_acc + jnp.where(
                    stage == n_stages - 1, ce, 0.0,
                )
            buf = jax.lax.ppermute(
                out, 'pipe',
                perm=[(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
        # The per-rank loss contributions are identical across 'model'
        # (everything after the kernel all_gathers is full-width), but
        # the replication tracker sees them as varying -- the extra
        # psum-mean over 'model' is numerically a no-op that marks the
        # loss replicated.
        loss_axes: tuple[str, ...] = ('pipe', 'data')
        n_norm = n_micro * n_data
        if tp:
            loss_axes = loss_axes + ('model',)
            n_norm = n_norm * mesh.shape['model']
        loss = jax.lax.psum(loss_acc, loss_axes) / n_norm
        a_fac = _factor_allreduce(a_acc, body_factor_axes) / (
            n_micro * mb
        )
        a_fac = (a_fac + jnp.swapaxes(a_fac, -1, -2)) / 2.0
        return loss, a_fac[None]

    # One tap slab per (stage, data-shard): the data axis keeps each
    # shard's cotangents in separate slots (a data-replicated tap would
    # SUM the shards' cotangents and cross-contaminate the G outer
    # products).
    taps = jnp.zeros(
        (n_stages, n_data, n_ticks, n_layers, mb, width), jnp.float32,
    )

    def loss_of(params: dict[str, jax.Array], taps: jax.Array):
        w_spec = P('pipe', None, None, 'model') if tp else P('pipe')
        loss, a_fac = _shard_map(
            body,
            mesh,
            in_specs=(
                w_spec, P('pipe'), P('pipe', 'data'),
                P('data'), P('data'),
            ),
            out_specs=(P(), P('pipe')),
        )(params['w'], params['b'], taps, x, y)
        return loss, a_fac

    (loss, a_fac), (grads, gtaps) = jax.value_and_grad(
        loss_of, argnums=(0, 1), has_aux=True,
    )(params, taps)

    # Tap cotangents [S, T, L, mb, d] are the per-tick output gradients of
    # the mean loss; bubble ticks are exact zeros, so summing over ticks
    # sums over this device's n_micro real microbatches. The G convention
    # matches LinearHelper.get_g_factor: cov of the raw (1/B-scaled)
    # cotangent rows over the global row count.
    def g_reduce(gt: jax.Array) -> jax.Array:
        gt = gt[0, 0]  # [T, L, mb, d] local
        g_sum = jnp.einsum('tlmi,tlmj->lij', gt, gt)
        g_fac = _factor_allreduce(
            g_sum, tuple(factor_reduce_axes),
        ) / (n_micro * gt.shape[-2])
        g_fac = (g_fac + jnp.swapaxes(g_fac, -1, -2)) / 2.0
        return g_fac[None]

    g_fac = _shard_map(
        g_reduce, mesh, in_specs=(P('pipe', 'data'),), out_specs=P('pipe'),
    )(gtaps)

    a_blocks = a_fac.reshape(n_stages * n_layers, width + 1, width + 1)
    g_blocks = g_fac.reshape(n_stages * n_layers, width, width)
    return loss, grads, a_blocks, g_blocks


def make_pipeline_kfac_step(
    mesh: Mesh,
    n_layers: int,
    n_microbatches: int,
    *,
    damping: float = 0.003,
    factor_decay: float = 0.95,
    lr: float = 0.1,
    symmetric_comm: bool = False,
) -> tuple[Any, Any]:
    """Build ``(init_state, step)`` for pipelined K-FAC training.

    ``step(state, params, x, y) -> (state, params, loss)`` runs the GPipe
    capture, folds factors into the running averages, refreshes the
    eigendecompositions (owner-computed per stage: the block axis of every
    second-order array is constrained to the ``pipe`` axis, per
    ``PipelineAssignment``), preconditions the stage gradients locally,
    and applies an SGD update. Fully jittable.
    """
    asn, factor_axes, state_spec = _derive_layout(mesh, n_layers)

    n_stages = mesh.shape['pipe']

    def block_sharding(spec_tail: int) -> NamedSharding:
        return NamedSharding(
            mesh, P(*(state_spec + (None,) * spec_tail)),
        )

    def init_state(width: int) -> PipeKFACState:
        nb = n_stages * n_layers
        da = width + 1
        eye_a = jnp.broadcast_to(jnp.eye(da), (nb, da, da))
        eye_g = jnp.broadcast_to(jnp.eye(width), (nb, width, width))
        con = jax.lax.with_sharding_constraint
        return PipeKFACState(
            steps=jnp.zeros((), jnp.int32),
            a=con(eye_a, block_sharding(2)),
            g=con(eye_g, block_sharding(2)),
            qa=con(eye_a, block_sharding(2)),
            da=con(jnp.ones((nb, da)), block_sharding(1)),
            qg=con(eye_g, block_sharding(2)),
            dg=con(jnp.ones((nb, width)), block_sharding(1)),
        )

    def step(
        state: PipeKFACState,
        params: dict[str, jax.Array],
        x: jax.Array,
        y: jax.Array,
    ) -> tuple[PipeKFACState, dict[str, jax.Array], jax.Array]:
        loss, grads, a_blocks, g_blocks = pipeline_capture(
            mesh, params, x, y, n_microbatches, factor_axes,
            symmetric_comm=symmetric_comm,
        )
        con = jax.lax.with_sharding_constraint
        a = con(
            ema_update(state.a, a_blocks, factor_decay), block_sharding(2),
        )
        g = con(
            ema_update(state.g, g_blocks, factor_decay), block_sharding(2),
        )
        # Owner-computes: the eigh input/output block axes are pinned to
        # 'pipe', so each stage decomposes only its own layer blocks
        # (broadcast_inverses() == False -- state never leaves the stage).
        qa, da = eigh_factor(con(a, block_sharding(2)))
        qg, dg = eigh_factor(con(g, block_sharding(2)))
        qa = con(qa, block_sharding(2))
        qg = con(qg, block_sharding(2))

        width = params['w'].shape[-1]
        gw = grads['w'].reshape(n_stages * n_layers, width, width)
        gb = grads['b'].reshape(n_stages * n_layers, width)
        # K-FAC convention: grad matrix (out, in+1) with bias column.
        gm = jnp.concatenate(
            [jnp.swapaxes(gw, -1, -2), gb[..., None]], axis=-1,
        )
        pg = jax.vmap(
            lambda m, vqa, vda, vqg, vdg: precondition_eigen(
                m, vqa, vqg, vda, vdg, damping,
            ),
        )(con(gm, block_sharding(2)), qa, da, qg, dg)
        pg = con(pg, block_sharding(2))
        new_w = params['w'] - lr * jnp.swapaxes(
            pg[..., :-1], -1, -2,
        ).reshape(params['w'].shape)
        new_b = params['b'] - lr * pg[..., -1].reshape(params['b'].shape)
        new_state = PipeKFACState(
            state.steps + 1, a, g, qa, da, qg, dg,
        )
        return new_state, {'w': new_w, 'b': new_b}, loss

    return init_state, step
