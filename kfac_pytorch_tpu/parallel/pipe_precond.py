"""Pipelined K-FAC through the public engine, for USER flax models.

The reference's ``GPTNeoXKFACPreconditioner`` takes an arbitrary user
``PipelineModule``, registers its layers, and runs the FULL engine over it
-- intervals, state_dict/factor checkpointing, assignment
(``kfac/gpt_neox/preconditioner.py:40-515`` of gpauloski/kfac-pytorch,
registration ``:450-515``, checkpointing ``:352-447``). This module is the
TPU-native equivalent: :class:`PipelineKFACPreconditioner` subclasses the
public :class:`~kfac_pytorch_tpu.preconditioner.KFACPreconditioner` and
drives a **user-defined flax stage module** through a GPipe schedule over a
``(pipe, data)`` mesh, with every engine feature intact:

- registration via the same ``register_modules`` interceptor trace
  (arbitrary Dense/Conv compositions inside the stage);
- interval gating (``factor_update_steps`` / ``inv_update_steps`` via
  ``lax.cond`` on the traced counter -- reference
  ``base_preconditioner.py:310-362``);
- the warm-started ``refine_eigh`` solver (eigensolver='refine'/'auto'),
  prediv eigenvalues, both compute methods, KL clipping;
- ``LambdaParamScheduler`` compatibility (hyperparams live in
  ``KFACState.hyperparams``) and the ``state_dict``/Orbax checkpoint
  contract (factors carry a leading stage axis; inverses recomputed on
  load).

Pipelining model (SPMD, one program for all devices):

- The model is ``n_stages`` copies of ``stage_module`` (the standard
  homogeneous-stage layout); parameters are the stage param pytree with a
  leading ``pipe``-sharded stage axis. The stage must map its input to an
  output of the same shape/dtype (validated at construction).
- One ``shard_map`` body runs the GPipe schedule: a statically-unrolled
  tick loop moves microbatch activations stage-to-stage with
  ``lax.ppermute`` over ``pipe``; the last stage accumulates masked
  microbatch losses. ``jax.value_and_grad`` OUTSIDE the shard_map
  differentiates through the schedule (XLA derives the reverse pipe).
- Statistics capture happens inside the pipe, stage-locally, through the
  same flax method interceptor as the unpipelined engine
  (``kfac_pytorch_tpu.capture``): A-factors accumulate masked per-tick
  input covariances; G-factors come from zero taps on each registered
  layer output, whose cotangents of the pipelined loss are the per-tick
  output gradients (exact zeros on bubble ticks).
- Collective layout follows :class:`PipelineAssignment` semantics
  (``parallel/pipeline.py``): factors reduce over each stage's
  data-parallel group only, second-order state stays sharded to its stage
  (MEM-OPT, ``broadcast_inverses() == False``), and preconditioned
  gradients are shared over the stage's DP group.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kfac_pytorch_tpu.capture import Captured
from kfac_pytorch_tpu.capture import CapturedFactors
from kfac_pytorch_tpu.capture import _discover_tap_shapes
from kfac_pytorch_tpu.enums import AllreduceMethod
from kfac_pytorch_tpu.enums import ComputeMethod
from kfac_pytorch_tpu.layers.registry import module_path_name
from kfac_pytorch_tpu.layers.registry import register_modules
from kfac_pytorch_tpu.preconditioner import Bucket
from kfac_pytorch_tpu.preconditioner import KFACPreconditioner
from kfac_pytorch_tpu.preconditioner import _pad_factor
from kfac_pytorch_tpu.preconditioner import _pad_grad
from kfac_pytorch_tpu.state import init_bucket_state
from kfac_pytorch_tpu.state import KFACState

__all__ = [
    'PipelineKFACPreconditioner',
    'make_pipeline_period_train_step',
    'make_pipeline_train_step',
]


def ffd_chunks(sizes: dict[str, int], cap: float) -> list[list[str]]:
    """First-fit-decreasing segmentation of named items at a byte cap.

    Sorting by descending size lets small items backfill chunks a large
    item would otherwise close early (fewer psums than first-fit in name
    order) -- the efficiency property of the reference's size-capped
    gradient bucketing (``kfac/distributed.py:127-160``). The
    ``(size, name)`` key is host-side and identical on every rank, so
    chunk composition -- hence collective order -- stays deterministic
    across ranks. An item larger than the cap travels alone.
    """
    chunks: list[list[str]] = [[]]
    chunk_bytes = [0]
    for n in sorted(sizes, key=lambda n: (-sizes[n], n)):
        for i, used in enumerate(chunk_bytes):
            if not chunks[i] or used + sizes[n] <= cap:
                chunks[i].append(n)
                chunk_bytes[i] += sizes[n]
                break
        else:
            chunks.append([n])
            chunk_bytes.append(sizes[n])
    return chunks


def _shard_map(fn: Any, mesh: Mesh, in_specs: Any, out_specs: Any) -> Any:
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


class PipelineKFACPreconditioner(KFACPreconditioner):
    """K-FAC for a user flax model pipelined over a ``(pipe, data)`` mesh.

    Counterpart of reference ``GPTNeoXKFACPreconditioner``
    (``kfac/gpt_neox/preconditioner.py:40-515``), re-designed for SPMD
    pipelining: instead of wrapping a DeepSpeed ``PipelineModule``, the
    user provides the flax module of ONE pipeline stage; the model is
    ``mesh.shape['pipe']`` stacked copies of it.

    Example::

        mesh = Mesh(devices.reshape(4, 2), ('pipe', 'data'))
        precond = PipelineKFACPreconditioner(
            Block(), mesh=mesh, n_microbatches=4,
            loss_fn=lambda out, y: ce(out, y).mean(),
            example_args=(jnp.zeros((mb, d)),),
            factor_update_steps=10, inv_update_steps=100,
        )
        params = precond.init_params(jax.random.PRNGKey(0))
        state = precond.init()
        vag = jax.jit(precond.value_and_grad())
        step = jax.jit(precond.step)
        for x, y in data:
            (loss, _), grads, captured = vag(params, x, y)
            grads, state = step(state, grads, captured)
            params = optax.apply_updates(params, scale(-lr, grads))

    Args:
        stage_module: flax module of one pipeline stage. Must map a single
            array input ``[mb, ...]`` to an output of the SAME shape/dtype
            (activations flow stage-to-stage through a fixed ring buffer).
        mesh: mesh with a ``pipe`` axis (stages) and a ``data`` axis
            (data parallel replicas of the pipeline).
        n_microbatches: GPipe microbatches per data shard per step.
        loss_fn: ``loss_fn(last_stage_out, y_microbatch) -> scalar`` MEAN
            loss over the microbatch (applied on the last stage only).
        example_args: one example stage input (shapes only), used for
            layer registration.
        allreduce_method: ``AllreduceMethod.ALLREDUCE`` reduces each factor
            with its own psum over the stage's DP group;
            ``ALLREDUCE_BUCKETED`` packs factors' upper triangles into
            flat buffers of at most ``bucket_cap_mb`` for coalesced
            all-reduces -- the reference's size-capped bucketed
            allreduce + symmetric (triu-only) communication
            (``kfac/distributed.py:127-160,305-465``), worthwhile when
            the ``data`` axis crosses hosts (DCN).
        bucket_cap_mb: byte cap per coalesced bucket (reference default
            25 MB, ``kfac/distributed.py:127-135``); ``None`` packs
            everything into one buffer. Only used with
            ``ALLREDUCE_BUCKETED``.
        **kwargs: engine hyperparameters, forwarded to
            :class:`KFACPreconditioner` (factor_update_steps, damping,
            compute_method, eigensolver, skip_layers, ...).
    """

    def __init__(
        self,
        stage_module: nn.Module,
        *,
        mesh: Mesh,
        n_microbatches: int,
        loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
        example_args: tuple[Any, ...],
        example_kwargs: dict[str, Any] | None = None,
        allreduce_method: AllreduceMethod = AllreduceMethod.ALLREDUCE,
        bucket_cap_mb: float | None = 25.0,
        **kwargs: Any,
    ) -> None:
        if 'pipe' not in mesh.axis_names or 'data' not in mesh.axis_names:
            raise ValueError(
                "mesh must carry 'pipe' and 'data' axes; got "
                f'{mesh.axis_names}',
            )
        if len(example_args) != 1:
            raise ValueError(
                'the pipeline schedule threads exactly one activation '
                f'array between stages; got {len(example_args)} example '
                'args',
            )
        if n_microbatches < 1:
            raise ValueError('n_microbatches must be >= 1')
        self.mesh = mesh
        self.n_stages = int(mesh.shape['pipe'])
        self.n_data = int(mesh.shape['data'])
        # Optional tensor-parallel axis (3D: pipe x data x model). Stage
        # modules built from ColumnParallelDense / RowParallelDense
        # (kfac_pytorch_tpu.layers.tp) have their kernels sharded over it.
        self.n_model = int(mesh.shape.get('model', 1))
        self.stage_module = stage_module
        self.n_microbatches = int(n_microbatches)
        self._loss_fn = loss_fn
        self._example_kwargs = dict(example_kwargs or {})
        # Keep a concrete zeros copy for init_params (the user may pass
        # ShapeDtypeStructs).
        self._example_args = tuple(
            a if isinstance(a, jax.Array)
            else jnp.zeros(a.shape, getattr(a, 'dtype', jnp.float32))
            for a in example_args
        )
        if not isinstance(allreduce_method, AllreduceMethod):
            allreduce_method = AllreduceMethod[str(allreduce_method).upper()]
        self.allreduce_method = allreduce_method
        if bucket_cap_mb is not None and bucket_cap_mb <= 0:
            raise ValueError('bucket_cap_mb must be > 0 (or None)')
        self.bucket_cap_mb = bucket_cap_mb

        reg_kwargs = {
            k: kwargs[k]
            for k in (
                'skip_layers',
                'factor_dtype',
                'factor_compute_dtype',
                'conv_a_factor_method',
                'gram_method',
                'init_fn',
            )
            if k in kwargs
        }
        specs = register_modules(
            stage_module,
            *example_args,
            **reg_kwargs,
            **self._example_kwargs,
        )
        super().__init__(specs=specs, sharding=None, **kwargs)

        # The schedule's ring buffer requires shape-preserving stages.
        ek = self._example_kwargs

        def _init_abstract() -> Any:
            return stage_module.init(
                jax.random.PRNGKey(0), *self._example_args, **ek,
            )

        vars_struct = jax.eval_shape(_init_abstract)
        out_struct = jax.eval_shape(
            lambda v, a: stage_module.apply(v, a, **ek),
            vars_struct,
            self._example_args[0],
        )
        in_struct = self._example_args[0]
        if (
            tuple(out_struct.shape) != tuple(in_struct.shape)
            or out_struct.dtype != in_struct.dtype
        ):
            raise ValueError(
                'stage_module must be shape/dtype-preserving (output '
                'feeds the next stage); got input '
                f'{tuple(in_struct.shape)} -> output '
                f'{tuple(out_struct.shape)}',
            )
        # Tap shapes depend on the microbatch size; cached per signature.
        self._tap_cache: dict[Any, dict[str, list[jax.ShapeDtypeStruct]]] = {}

        # Derive the collective layout from the pipeline assignment
        # (reference gpt_neox/assignment.py:75-142) and refuse layouts
        # the mesh cannot represent: factors must reduce over the
        # owner's data-parallel group only (never across stages), and
        # MEM-OPT keeps second-order state on its owning stage.
        asn = self.assignment()
        topo = asn.topology
        for layer in asn.get_layers():
            for factor in asn.get_factors(layer):
                owner = asn.inv_worker(layer, factor)
                if asn.factor_group(layer, factor) != topo.data_group(
                    owner,
                ):
                    raise ValueError(
                        'assignment factor_group is not a data-parallel '
                        'group; cannot map to mesh axes',
                    )
        # broadcast_inverses() == False -> state sharded to stages.
        self._state_spec = (
            P(None) if asn.broadcast_inverses() else P('pipe')
        )

    # ------------------------------------------------------------------
    # Sharding: MEM-OPT per PipelineAssignment -- all second-order state
    # and factor blocks stay on their owning stage (block axis over
    # 'pipe'); nothing replicates across stages.
    # ------------------------------------------------------------------

    def _constrain(self, tree: Any, stage: str) -> Any:
        sh = NamedSharding(self.mesh, self._state_spec)
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, sh), tree,
        )

    # ------------------------------------------------------------------
    # State: factors carry a leading stage axis; buckets stack blocks in
    # stage-major order so a 'pipe' sharding is stage-local.
    # ------------------------------------------------------------------

    def init(self) -> KFACState:
        method = (
            'eigen' if self.compute_method == ComputeMethod.EIGEN
            else 'inverse'
        )
        s = self.n_stages
        factors = {
            name: CapturedFactors(
                a=self._constrain(
                    jnp.broadcast_to(
                        jnp.eye(spec.a_shape[0], dtype=self.store_dtype),
                        (s, spec.a_shape[0], spec.a_shape[0]),
                    ),
                    'factors',
                ),
                g=self._constrain(
                    jnp.broadcast_to(
                        jnp.eye(spec.g_shape[0], dtype=self.store_dtype),
                        (s, spec.g_shape[0], spec.g_shape[0]),
                    ),
                    'factors',
                ),
            )
            for name, spec in self._specs.items()
        }
        buckets = {
            bucket.key: jax.tree.map(
                lambda x: self._constrain(x, 'second_order'),
                init_bucket_state(
                    s * bucket.total_blocks,
                    bucket.a_dim,
                    bucket.g_dim,
                    compute_method=method,
                    prediv_eigenvalues=self.prediv_eigenvalues,
                    inv_dtype=self.inv_dtype,
                ),
            )
            for bucket in self._plan
        }
        return KFACState(
            steps=jnp.zeros((), jnp.int32),
            factors=factors,
            buckets=buckets,
            hyperparams=self.init_hyperparams(),
        )

    def _params_specs(self, params: Any) -> Any:
        """STORAGE PartitionSpec tree for the stacked stage params.

        Leading stage axis over ``pipe``; kernels of registered
        tensor-parallel layers additionally shard over ``model``
        (column: output dim, row: input dim). Inside the step's
        shard_map the params are gathered back to model-replicated
        (in_specs ``P('pipe')``) and TP modules slice their own shard
        statically -- storage stays distributed, compute gathers over
        ICI.
        """
        tp_kernels: dict[tuple[str, ...], P] = {}
        if self.n_model <= 1:
            return P('pipe')
        for name, spec in self._specs.items():
            if spec.tp == 'column':
                tp_kernels[self._paths[name] + ('kernel',)] = P(
                    'pipe', None, 'model',
                )
            elif spec.tp == 'row':
                tp_kernels[self._paths[name] + ('kernel',)] = P(
                    'pipe', 'model',
                )
        if not tp_kernels:
            return P('pipe')
        from jax.tree_util import DictKey
        from jax.tree_util import tree_map_with_path

        def leaf_spec(path: Any, leaf: Any) -> P:
            keys = tuple(
                k.key if isinstance(k, DictKey) else str(k) for k in path
            )
            return tp_kernels.get(keys, P('pipe'))

        return tree_map_with_path(leaf_spec, params)

    def init_params(self, rng: jax.Array) -> Any:
        """Stacked stage parameters: stage param pytree with leading
        ``[n_stages]`` axis (shard it over ``pipe``; TP kernels also
        over ``model``)."""
        keys = jax.random.split(rng, self.n_stages)
        ek = self._example_kwargs
        ea = self._example_args

        def one(k: jax.Array) -> Any:
            return self.stage_module.init(k, *ea, **ek)['params']

        params = jax.vmap(one)(keys)
        specs = self._params_specs(params)
        if isinstance(specs, P):
            specs = jax.tree.map(lambda _: specs, params)
        return jax.tree.map(
            lambda x, sp: jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, sp),
            ),
            params,
            specs,
        )

    # Engine hooks: fold the stage axis in stage-major order so the
    # 'pipe' sharding of the [S * n_layers, d, d] block stacks is exactly
    # stage-local (owner-computes without per-rank control flow).

    def _stack_bucket_factor(
        self,
        bucket: Bucket,
        factors: dict[str, CapturedFactors],
        attr: str,
        dim: int,
    ) -> jax.Array:
        pad = jax.vmap(lambda f: _pad_factor(f, dim))
        blocks = [
            pad(getattr(factors[s.name], attr)) for s in bucket.specs
        ]
        stacked = jnp.stack(blocks, axis=1).reshape(
            self.n_stages * len(bucket.specs), dim, dim,
        )
        return self._constrain(stacked, 'factors')

    def _grad_mats_for_bucket(self, bucket: Bucket, root: Any) -> jax.Array:
        from kfac_pytorch_tpu.utils.tree import get_subtree

        mats = []
        for spec in bucket.specs:
            sub = get_subtree(root, self._paths[spec.name])
            m = jax.vmap(spec.helper.get_grad_t)(sub)  # [S, da, dg]
            m = jax.vmap(
                lambda mm: _pad_grad(mm, bucket.a_dim, bucket.g_dim),
            )(m)
            mats.append(m)
        return jnp.stack(mats, axis=1).reshape(
            self.n_stages * len(bucket.specs),
            bucket.a_dim,
            bucket.g_dim,
        )

    def _write_bucket_grads(
        self,
        bucket: Bucket,
        root: Any,
        pg: jax.Array,
    ) -> Any:
        from kfac_pytorch_tpu.utils.tree import get_subtree
        from kfac_pytorch_tpu.utils.tree import set_subtree

        nl = len(bucket.specs)
        pgr = pg.reshape(self.n_stages, nl, pg.shape[-2], pg.shape[-1])
        for i, spec in enumerate(bucket.specs):
            path = self._paths[spec.name]
            sub = get_subtree(root, path)
            da, dg = spec.a_shape[0], spec.g_shape[0]
            root = set_subtree(
                root,
                path,
                jax.vmap(spec.helper.set_grad_t)(sub, pgr[:, i, :da, :dg]),
            )
        return root

    # ------------------------------------------------------------------
    # Capture: the GPipe schedule with in-pipe interceptor taps
    # ------------------------------------------------------------------

    def _tap_shapes(
        self,
        params_one: Any,
        x_mb: jax.ShapeDtypeStruct,
    ) -> dict[str, list[jax.ShapeDtypeStruct]]:
        key = (tuple(x_mb.shape), str(x_mb.dtype))
        shapes = self._tap_cache.get(key)
        if shapes is None:
            ek = self._example_kwargs

            def stage_loss(p: Any, a: jax.Array) -> jax.Array:
                out = self.stage_module.apply({'params': p}, a, **ek)
                return jnp.sum(out)

            shapes = _discover_tap_shapes(
                stage_loss, self._specs, params_one, (x_mb,), {},
            )
            missing = set(self._specs) - set(shapes)
            if missing:
                raise ValueError(
                    'Registered layers were not called in the stage '
                    f'module: {missing}',
                )
            self._tap_cache[key] = shapes
        return shapes

    def _devary_model(self, v: jax.Array) -> jax.Array:
        """Mark a value replicated over the ``model`` axis when the VMA
        tracker still considers it varying.

        A-factor inputs of row-parallel layers flow through
        ``all_gather``-produced tensors, which JAX's varying-axes
        inference conservatively keeps 'possibly varying' over ``model``
        even though the gathered values are identical on every rank. The
        psum-mean is numerically the identity on such values and marks
        them invariant (same dance as ``pipe_exec``'s body reduce).
        """
        if self.n_model <= 1:
            return v
        try:
            vma = jax.typeof(v).vma
        except AttributeError:  # pragma: no cover - older jax
            vma = getattr(getattr(v, 'aval', None), 'vma', frozenset())
        if 'model' in vma:
            return jax.lax.psum(v, 'model') / self.n_model
        return v

    def _factor_allreduce(
        self,
        acc: jax.Array,
        axes: tuple[str, ...] = ('data',),
    ) -> jax.Array:
        """Per-factor mean over the stage's DP group (plain path)."""
        n = 1
        for ax in axes:
            n *= int(self.mesh.shape[ax])
        return jax.lax.psum(acc, axes) / n

    def _bucketed_allreduce(
        self,
        accs: dict[str, jax.Array],
        axes: tuple[str, ...] = ('data',),
    ) -> dict[str, jax.Array]:
        """Coalesced symmetric factor all-reduce over the stage's DP group.

        Factors' upper triangles are packed into flat buffers, each
        capped at ``bucket_cap_mb`` (first-fit-decreasing whole-factor
        packing, ``ffd_chunks``; a single factor larger than the cap
        travels alone) -- the
        reference's size-capped bucketed allreduce + symmetric
        communication (``kfac/distributed.py:127-160,305-465``). The cap
        keeps each collective small enough for XLA to overlap earlier
        buckets' reduces with later buckets' packing instead of
        serializing one monolithic psum behind the last factor.
        ``bucket_cap_mb=None`` packs everything into one buffer.
        Factor sums are bitwise-symmetric, so triu round-trips losslessly.
        """
        from kfac_pytorch_tpu.parallel.collectives import fill_triu
        from kfac_pytorch_tpu.parallel.collectives import get_triu

        cap = (
            float('inf') if self.bucket_cap_mb is None
            else self.bucket_cap_mb * (1 << 20)
        )

        chunks = ffd_chunks(
            {
                n: (lambda d: d * (d + 1) // 2)(a.shape[-1])
                * a.dtype.itemsize
                for n, a in accs.items()
            },
            cap,
        )
        count = 1
        for ax in axes:
            count *= int(self.mesh.shape[ax])
        out: dict[str, jax.Array] = {}
        for chunk in chunks:
            flat = jnp.concatenate([get_triu(accs[n]) for n in chunk])
            flat = jax.lax.psum(flat, axes) / count
            offset = 0
            for n in chunk:
                d = accs[n].shape[-1]
                size = d * (d + 1) // 2
                out[n] = fill_triu((d, d), flat[offset:offset + size])
                offset += size
        return out

    def _pipe_loss_and_factors(
        self,
        params: Any,
        taps: dict[str, list[jax.Array]] | None,
        x: jax.Array,
        y: jax.Array,
        mb: int,
    ) -> Any:
        """Global-view pipelined loss (and A factors when capturing).

        Returns ``loss`` when ``taps is None`` (fast path), else
        ``(loss, a_factors)`` with ``a_factors[name]: [S, da, da]``.
        """
        s, d = self.n_stages, self.n_data
        n_micro = self.n_microbatches
        n_ticks = n_micro + s - 1
        specs = self._specs
        stage_mod = self.stage_module
        loss_fn = self._loss_fn
        ek = self._example_kwargs
        capture = taps is not None
        # Under TP the capture-point tensors pass through per-kernel
        # all_gathers/psums over 'model', which the varying-axes tracker
        # understands: everything at the capture points is already
        # model-INVARIANT, so loss/factor reduces ride 'data' (and
        # 'pipe' for the loss) only. Tap cotangents likewise arrive
        # outside the body already summed over 'model' by the shard_map
        # transpose.
        loss_axes = ('pipe', 'data')
        loss_norm = n_micro * d
        a_axes = ('data',)

        def body(plocal: Any, tlocal: Any, xl: jax.Array, yl: jax.Array):
            sp = jax.tree.map(lambda leaf: leaf[0], plocal)
            if capture:
                tps = {
                    k: [a[0, 0] for a in lst] for k, lst in tlocal.items()
                }
            stage_idx = jax.lax.axis_index('pipe')
            xmb = xl.reshape((n_micro, mb) + xl.shape[1:])
            ymb = yl.reshape((n_micro, mb) + yl.shape[1:])
            buf = jnp.zeros((mb,) + xl.shape[1:], xl.dtype)
            loss_acc = jnp.zeros((), jnp.float32)
            a_accs = {
                name: jnp.zeros(spec.a_shape, jnp.float32)
                for name, spec in specs.items()
            }
            for t in range(n_ticks):
                feed = xmb[min(t, n_micro - 1)]
                h_in = jnp.where(stage_idx == 0, feed, buf)
                a_covs: dict[str, list[jax.Array]] = {}
                call_idx: dict[str, int] = {}

                def interceptor(  # type: ignore[no-untyped-def]
                    next_fun, cargs, ckwargs, context, _t=t,
                ):
                    module = context.module
                    if context.method_name != '__call__' or not cargs:
                        return next_fun(*cargs, **ckwargs)
                    name = module_path_name(module)
                    if name not in specs:
                        return next_fun(*cargs, **ckwargs)
                    i = call_idx.get(name, 0)
                    call_idx[name] = i + 1
                    a_in = jax.lax.stop_gradient(cargs[0])
                    a_covs.setdefault(name, []).append(
                        specs[name].helper.get_a_factor(a_in),
                    )
                    out = next_fun(*cargs, **ckwargs)
                    return out + tps[name][i][_t]

                if capture:
                    with nn.intercept_methods(interceptor):
                        out = stage_mod.apply({'params': sp}, h_in, **ek)
                    if t == 0:
                        missing = set(specs) - set(a_covs)
                        if missing:
                            raise ValueError(
                                'Registered layers were not called by '
                                f'the stage module: {missing}',
                            )
                    valid = jnp.where(
                        (stage_idx <= t) & (t < stage_idx + n_micro),
                        1.0,
                        0.0,
                    )
                    for name, lst in a_covs.items():
                        a_accs[name] = a_accs[name] + valid * (
                            sum(lst) / len(lst)
                        ).astype(jnp.float32)
                else:
                    out = stage_mod.apply({'params': sp}, h_in, **ek)
                # Last stage: tick t completes microbatch j = t - (S-1).
                j = t - (s - 1)
                if 0 <= j < n_micro:
                    ce = loss_fn(out, ymb[j])
                    loss_acc = loss_acc + jnp.where(
                        stage_idx == s - 1, ce.astype(jnp.float32), 0.0,
                    )
                buf = jax.lax.ppermute(
                    out,
                    'pipe',
                    perm=[(i, (i + 1) % s) for i in range(s)],
                )
            loss = jax.lax.psum(loss_acc, loss_axes) / loss_norm
            if not capture:
                return loss
            accs = {
                k: self._devary_model(v / n_micro)
                for k, v in a_accs.items()
            }
            if self.allreduce_method == AllreduceMethod.ALLREDUCE_BUCKETED:
                accs = self._bucketed_allreduce(accs, a_axes)
            else:
                accs = {
                    k: self._factor_allreduce(v, a_axes)
                    for k, v in accs.items()
                }
            a_out = {
                k: ((v + jnp.swapaxes(v, -1, -2)) / 2.0)[None]
                for k, v in accs.items()
            }
            return loss, a_out

        # Params enter the body replicated over 'model' (P('pipe')); TP
        # modules statically slice their kernel shard inside. When the
        # STORED params are model-sharded (init_params), jit inserts the
        # gather at shard_map entry -- ZeRO-style weight gathering over
        # ICI while the matmul FLOPs stay TP-distributed.
        if capture:
            return _shard_map(
                body,
                self.mesh,
                in_specs=(
                    P('pipe'),
                    jax.tree.map(lambda _: P('pipe', 'data'), taps),
                    P('data'),
                    P('data'),
                ),
                out_specs=(
                    P(),
                    {name: P('pipe') for name in specs},
                ),
            )(params, taps, x, y)
        return _shard_map(
            lambda p, xl, yl: body(p, None, xl, yl),
            self.mesh,
            in_specs=(P('pipe'), P('data'), P('data')),
            out_specs=P(),
        )(params, x, y)

    def _microbatch_size(self, x: jax.Array) -> int:
        batch = x.shape[0]
        if batch % (self.n_data * self.n_microbatches):
            raise ValueError(
                f'global batch {batch} must divide data axis '
                f'{self.n_data} x n_microbatches {self.n_microbatches}',
            )
        return batch // (self.n_data * self.n_microbatches)

    def value_and_grad(
        self,
        loss_fn: Callable[..., Any] | None = None,
        has_aux: bool = False,
    ) -> Callable[..., tuple[Any, Any, Captured]]:
        """Jittable pipelined value+grad+factor capture.

        Unlike the unpipelined engine, the model application is owned by
        the preconditioner (the GPipe schedule), so ``loss_fn`` must be
        None (the constructor's per-microbatch loss is used). Returns
        ``fn(params, x, y) -> ((loss, None), grads, captured)`` with
        ``captured[name]`` stacked ``[S, d, d]`` factor blocks, block
        axis sharded over ``pipe`` and already reduced over each stage's
        DP group.
        """
        if loss_fn is not None or has_aux:
            raise ValueError(
                'the pipelined preconditioner owns the model application; '
                'pass the per-microbatch loss to the constructor',
            )

        def fn(
            params: Any,
            x: jax.Array,
            y: jax.Array,
        ) -> tuple[tuple[jax.Array, Any], Any, Captured]:
            mb = self._microbatch_size(x)
            params_one = jax.tree.map(lambda leaf: leaf[0], params)
            tap_shapes = self._tap_shapes(
                params_one,
                jax.ShapeDtypeStruct((mb,) + x.shape[1:], x.dtype),
            )
            s, d = self.n_stages, self.n_data
            n_ticks = self.n_microbatches + s - 1
            taps = {
                name: [
                    jnp.zeros((s, d, n_ticks) + st.shape, st.dtype)
                    for st in lst
                ]
                for name, lst in tap_shapes.items()
            }

            def loss_of(prm: Any, tps: Any):
                return self._pipe_loss_and_factors(prm, tps, x, y, mb)

            (loss, a_fac), (grads, gtaps) = jax.value_and_grad(
                loss_of, argnums=(0, 1), has_aux=True,
            )(params, taps)

            # Tap cotangents [S, D, T, mb, ...] are the per-tick output
            # gradients of the mean pipelined loss; bubble ticks are
            # exact zeros, so folding the tick axis into the covariance
            # rows sums over this device's n_micro real microbatches.
            n_micro = self.n_microbatches

            def g_reduce(gt: Any) -> Any:
                out = {}
                g_accs = {}
                for name, lst in gt.items():
                    helper = self._specs[name].helper
                    facs = []
                    for tap in lst:
                        g = tap[0, 0]  # [T, mb, ...]
                        rows = g.reshape((-1,) + g.shape[2:])
                        # get_g_factor divides by T*mb rows; rescale to
                        # the n_micro real (non-bubble) microbatches.
                        facs.append(
                            helper.get_g_factor(rows) * (n_ticks / n_micro),
                        )
                    g_accs[name] = (sum(facs) / len(facs)).astype(
                        jnp.float32,
                    )
                if (
                    self.allreduce_method
                    == AllreduceMethod.ALLREDUCE_BUCKETED
                ):
                    g_accs = self._bucketed_allreduce(g_accs)
                else:
                    g_accs = {
                        k: self._factor_allreduce(v)
                        for k, v in g_accs.items()
                    }
                for name, fac in g_accs.items():
                    out[name] = ((fac + jnp.swapaxes(fac, -1, -2)) / 2.0)[
                        None
                    ]
                return out

            g_fac = _shard_map(
                g_reduce,
                self.mesh,
                in_specs=(jax.tree.map(lambda _: P('pipe', 'data'), gtaps),),
                out_specs={name: P('pipe') for name in self._specs},
            )(gtaps)

            captured: Captured = {
                name: CapturedFactors(a=a_fac[name], g=g_fac[name])
                for name in self._specs
            }
            return (loss, None), grads, captured

        return fn

    def plain_value_and_grad(
        self,
    ) -> Callable[..., tuple[jax.Array, Any]]:
        """Pipelined loss+grad WITHOUT capture (the fast-path branch for
        Python/cond-gated factor updates)."""

        def fn(params: Any, x: jax.Array, y: jax.Array):
            mb = self._microbatch_size(x)
            return jax.value_and_grad(
                lambda prm: self._pipe_loss_and_factors(
                    prm, None, x, y, mb,
                ),
            )(params)

        return fn

    # ------------------------------------------------------------------
    # Introspection
    # ------------------------------------------------------------------

    def assignment(self, local_rank: int = 0) -> Any:
        """Materialized pipeline-topology assignment (MEM-OPT semantics,
        reference ``gpt_neox/assignment.py:20-236``)."""
        from kfac_pytorch_tpu.parallel.pipeline import PipelineAssignment
        from kfac_pytorch_tpu.parallel.pipeline import PipelineTopology

        topo = PipelineTopology(
            pipe=self.n_stages, data=self.n_data, model=self.n_model,
        )
        return PipelineAssignment(
            self.work(), local_rank=local_rank, topology=topo,
        )


def make_pipeline_train_step(
    precond: PipelineKFACPreconditioner,
    tx: Any,
) -> Callable[..., Any]:
    """Scan-compatible pipelined training step with gated capture.

    The capture gate is a single ``lax.cond`` on the traced step counter
    (reference hook gate, ``base_preconditioner.py:444-446``): the taken
    branch runs the capturing GPipe schedule and folds the factor EMA;
    the fast branch runs the capture-free schedule. ``precond.step``
    then applies the interval-gated second-order refresh (warm
    ``refine_eigh`` on TPU), preconditioning, KL clip, and the optax
    update.

    Returns ``step(carry, (x, y)) -> (carry, loss)`` with
    ``carry = (params, opt_state, kfac_state)``.
    """
    import optax

    vag = precond.value_and_grad()
    plain = precond.plain_value_and_grad()
    always_capture = precond._static_one('factor_update_steps')

    def step(carry: Any, batch: tuple[jax.Array, jax.Array]):
        params, opt_state, state = carry
        x, y = batch

        def cap_branch(factors: Any):
            (loss, _), grads, captured = vag(params, x, y)
            decay = precond._hp(state, 'factor_decay')
            return loss, grads, precond._update_factors(
                factors, captured, decay,
            )

        def fast_branch(factors: Any):
            loss, grads = plain(params, x, y)
            return loss, grads, factors

        if always_capture:
            loss, grads, factors = cap_branch(state.factors)
        else:
            fus = precond._hp(state, 'factor_update_steps')
            loss, grads, factors = jax.lax.cond(
                (state.steps % fus) == 0,
                cap_branch,
                fast_branch,
                state.factors,
            )
        state = state.replace(factors=factors)
        grads, state = precond.step(state, grads, captured=None)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, state), loss

    return step


def make_pipeline_period_train_step(
    precond: PipelineKFACPreconditioner,
    tx: Any,
) -> Callable[..., Any]:
    """Fully static pipelined K-FAC schedule: no in-graph gating conds.

    The pipelined analogue of ``train.make_period_train_step`` (same
    construction, same step-schedule contract): one call processes
    ``inv_update_steps`` consecutive batches -- the first runs the
    capturing GPipe schedule, folds the factor EMAs and refreshes the
    second-order state unconditionally; every
    ``factor_update_steps``-th step captures without a refresh; all
    other steps run the capture-free schedule with the bare
    precondition path. The update schedule is identical to the
    ``lax.cond``-gated ``make_pipeline_train_step`` when training
    starts at ``steps == 0`` and proceeds in whole periods, but the
    compiled program carries no conds: the branch operands (the full
    stage-stacked factor/bucket pytrees) stop being conditional inputs,
    which on the pipe1 bench stage measures ~0.9 ms/step of pure
    mechanism. This is the production schedule for the GPT-NeoX-style
    deployment, matching the reference's eager Python interval checks
    on its pipelined path (``kfac/base_preconditioner.py:310-362``,
    dispatched from ``kfac/gpt_neox/preconditioner.py`` of
    gpauloski/kfac-pytorch).

    HLO size stays bounded exactly as in the unpipelined builder:
    [capture+refresh head] + scan(plain) + scan([capture head] +
    scan(plain)) -- three step bodies regardless of period length.

    Returns ``period_step(carry, (xs, ys)) -> (carry, losses)`` with
    ``carry = (params, opt_state, kfac_state)`` and each batch leaf
    carrying a leading axis of size ``inv_update_steps``.
    """
    import optax

    fus = precond._factor_update_steps
    ius = precond._inv_update_steps
    if callable(fus) or callable(ius):
        raise ValueError(
            'make_pipeline_period_train_step requires static int '
            'factor_update_steps / inv_update_steps (use '
            'make_pipeline_train_step for scheduled intervals)',
        )
    if ius % fus != 0:
        raise ValueError(
            f'inv_update_steps ({ius}) must be a multiple of '
            f'factor_update_steps ({fus}) for the static period schedule',
        )
    vag = precond.value_and_grad()
    plain = precond.plain_value_and_grad()

    def _finish(carry: Any, state: Any, grads: Any, refresh: str) -> Any:
        params, opt_state, _ = carry
        pgrads, state = precond.step(state, grads, None, refresh=refresh)
        updates, opt_state = tx.update(pgrads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, state

    def cap_step(carry: Any, batch: Any, refresh: str):
        params, _, state = carry
        x, y = batch
        (loss, _), grads, captured = vag(params, x, y)
        decay = precond._hp(state, 'factor_decay')
        state = state.replace(
            factors=precond._update_factors(state.factors, captured, decay),
        )
        return _finish(carry, state, grads, refresh), loss

    def plain_step(carry: Any, batch: Any):
        params, _, state = carry
        x, y = batch
        loss, grads = plain(params, x, y)
        return _finish(carry, state, grads, 'skip'), loss

    def chunk(carry: Any, batches: Any, refresh: str):
        head = jax.tree.map(lambda v: v[0], batches)
        carry, loss0 = cap_step(carry, head, refresh)
        if fus == 1:
            return carry, loss0[None]
        rest = jax.tree.map(lambda v: v[1:], batches)
        carry, losses = jax.lax.scan(plain_step, carry, rest)
        return carry, jnp.concatenate([loss0[None], losses])

    n_chunks = ius // fus

    def period_step(carry: Any, batches: Any):
        for leaf in jax.tree.leaves(batches):
            if leaf.shape[0] != ius:
                raise ValueError(
                    'every batch leaf must carry a leading axis of '
                    f'inv_update_steps={ius}; got {leaf.shape}',
                )
        head = jax.tree.map(lambda v: v[:fus], batches)
        carry, losses0 = chunk(carry, head, 'force')
        if n_chunks == 1:
            return carry, losses0
        rest = jax.tree.map(
            lambda v: v[fus:].reshape((n_chunks - 1, fus) + v.shape[1:]),
            batches,
        )
        carry, rest_losses = jax.lax.scan(
            lambda c, cb: chunk(c, cb, 'skip'), carry, rest,
        )
        return carry, jnp.concatenate([losses0, rest_losses.reshape(-1)])

    return period_step
