"""KAISA K-FAC gradient preconditioner, TPU-native.

Functional re-design of the reference's preconditioner stack
(``kfac/preconditioner.py:34-334``, ``kfac/base_preconditioner.py:22-479``
of gpauloski/kfac-pytorch). Instead of a stateful object mutating
``param.grad`` in place, the engine is a pure function::

    (loss, aux), grads, captured = precond.value_and_grad(loss_fn)(params, batch)
    new_grads, new_state = precond.step(state, grads, captured)

Everything in ``step`` is jittable: interval gating (``factor_update_steps``,
``inv_update_steps``) uses ``lax.cond`` on the traced step counter; the KL
clip stays on-device (no ``.item()`` host sync as in the reference's
``_compute_grad_scale``, ``base_preconditioner.py:411-435``).

Distribution model (KAISA semantics, SPMD expression):

- Factor "allreduce" is the covariance contraction over the globally
  sharded batch -- XLA inserts the psum (free with pjit).
- Factors of same-shaped layers are stacked into block buckets; the
  eigendecompositions are sharded over the mesh on the block axis
  (owner-computes without per-rank control flow).
- The grad-worker-fraction strategy space (COMM/HYBRID/MEM-OPT) is three
  sharding constraints over a (receiver x worker) factorization of the mesh
  -- see ``kfac_pytorch_tpu/parallel/strategy.py``.
"""

from __future__ import annotations

import logging
import warnings
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.capture import Captured
from kfac_pytorch_tpu.capture import capture_value_and_grad
from kfac_pytorch_tpu.enums import AssignmentStrategy
from kfac_pytorch_tpu.enums import ComputeMethod
from kfac_pytorch_tpu.enums import DistributedStrategy
from kfac_pytorch_tpu.layers.registry import LayerSpec
from kfac_pytorch_tpu.layers.registry import register_modules
from kfac_pytorch_tpu.ops.curvature import damped_inverse
from kfac_pytorch_tpu.ops.curvature import eigh_factor
from kfac_pytorch_tpu.ops.curvature import ema_update
from kfac_pytorch_tpu.ops.curvature import kl_clip_scale
from kfac_pytorch_tpu.ops.refine import refine_eigh
from kfac_pytorch_tpu.capture import CapturedFactors
from kfac_pytorch_tpu.state import BucketState
from kfac_pytorch_tpu.state import init_bucket_state
from kfac_pytorch_tpu.state import init_layer_factors
from kfac_pytorch_tpu.state import KFACState
from kfac_pytorch_tpu.utils.tree import get_subtree
from kfac_pytorch_tpu.utils.tree import params_root
from kfac_pytorch_tpu.utils.tree import set_subtree
from kfac_pytorch_tpu.warnings import ExperimentalFeatureWarning

logger = logging.getLogger(__name__)

__all__ = ['KFACPreconditioner', 'Bucket']

HyperParam = Callable[[jax.Array], Any] | float | int


@dataclass(frozen=True)
class Bucket:
    """Static plan for one block bucket (layers sharing factor dims).

    ``pad_blocks`` virtual blocks (identity factors, zero gradients) are
    appended to the stack so the block count divides the mesh size and
    the owner-computes sharding never degrades to replication (the
    TPU realization of the reference's greedy placement driving
    execution, ``kfac/assignment.py:227-319`` feeding
    ``base_preconditioner.py:340-362`` of gpauloski/kfac-pytorch).
    """

    key: str
    specs: tuple[LayerSpec, ...]
    a_dim: int
    g_dim: int
    pad_blocks: int = 0

    @property
    def n_blocks(self) -> int:
        return len(self.specs)

    @property
    def total_blocks(self) -> int:
        return len(self.specs) + self.pad_blocks


def _pad_factor(f: jax.Array, dpad: int) -> jax.Array:
    """Embed a (d, d) factor into (dpad, dpad) with identity padding."""
    d = f.shape[-1]
    if d == dpad:
        return f
    eye_pad = jnp.zeros((dpad, dpad), f.dtype).at[
        jnp.arange(d, dpad), jnp.arange(d, dpad)
    ].set(1.0)
    return eye_pad.at[:d, :d].set(f)


def _pad_grad(m: jax.Array, a_pad: int, g_pad: int) -> jax.Array:
    """Zero-pad a (da, dg) gradient matrix to (a_pad, g_pad)."""
    if m.shape == (a_pad, g_pad):
        return m
    return jnp.pad(
        m,
        ((0, a_pad - m.shape[0]), (0, g_pad - m.shape[1])),
    )


def _resolve(hp: HyperParam, steps: jax.Array) -> Any:
    """Callable-or-constant hyperparameter resolution.

    Mirrors the reference's property pattern (``base_preconditioner.py:
    160-208``); callables receive the (possibly traced) step counter and
    must be jnp-traceable.
    """
    return hp(steps) if callable(hp) else hp


# Hyperparameters that live in ``KFACState.hyperparams`` (when given as
# constants) so that ``LambdaParamScheduler`` mutations reach jitted steps.
_SCHEDULABLE = (
    ('factor_update_steps', jnp.int32),
    ('inv_update_steps', jnp.int32),
    ('damping', jnp.float32),
    ('factor_decay', jnp.float32),
    ('kl_clip', jnp.float32),
    ('lr', jnp.float32),
)


class KFACPreconditioner:
    """KAISA K-FAC distributed gradient preconditioner for flax models.

    Counterpart of reference ``KFACPreconditioner``
    (``kfac/preconditioner.py:54-334``) plus the engine of
    ``BaseKFACPreconditioner``.

    Example::

        model = Net()
        precond = KFACPreconditioner(model, example_args=(x,), lr=0.1)
        state = precond.init()
        vag = jax.jit(precond.value_and_grad(loss_fn))
        step = jax.jit(precond.step)
        for batch in data:
            (loss, _), grads, captured = vag(params, batch)
            grads, state = step(state, grads, captured)
            params = optax.apply_updates(params, scale(-lr, grads))
    """

    def __init__(
        self,
        model: Any = None,
        *,
        example_args: tuple[Any, ...] = (),
        example_kwargs: dict[str, Any] | None = None,
        specs: dict[str, LayerSpec] | None = None,
        # K-FAC hyperparameters (constants or jnp-traceable callables of step)
        factor_update_steps: HyperParam = 1,
        inv_update_steps: HyperParam = 1,
        damping: HyperParam = 0.001,
        factor_decay: HyperParam = 0.95,
        kl_clip: HyperParam | None = 0.001,
        lr: HyperParam = 0.1,
        # Distribution.  accumulation_steps is consumed by
        # train.make_train_step (microbatches per optimizer update with
        # capture accumulation); the raw vag/step API instead takes
        # explicit accumulate_captures calls.
        accumulation_steps: int = 1,
        assignment_strategy: AssignmentStrategy | str = (
            AssignmentStrategy.COMPUTE
        ),
        colocate_factors: bool = True,
        compute_method: ComputeMethod | str = ComputeMethod.EIGEN,
        compute_eigenvalue_outer_product: bool = True,
        eigensolver: str = 'auto',  # 'auto' | 'xla' | 'refine' | 'jacobi'
        jacobi_sweeps: int = 6,
        refine_iterations: int = 3,
        refine_precision: str = 'highest',  # 'highest' (f32) | 'high'
        refine_final_orth: str = 'auto',  # 'auto' | 'cholqr' | 'ns'
        grad_worker_fraction: DistributedStrategy | float = (
            DistributedStrategy.COMM_OPT
        ),
        sharding: Any = None,  # parallel.strategy.KAISASharding or None
        bucket_padding: str = 'none',  # 'none' | 'pow2' | 'max'
        # Other
        capture_remat: bool = False,
        nonfinite_guard: bool = True,
        grad_scale: Callable[[], Any] | None = None,
        factor_dtype: Any = None,
        factor_compute_dtype: Any = None,
        inv_dtype: Any = jnp.float32,
        precondition_precision: str | jax.lax.Precision = (
            jax.lax.Precision.HIGHEST
        ),
        skip_layers: Sequence[str] = (),
        conv_a_factor_method: str = 'auto',
        gram_method: str = 'full',
        init_fn: Callable[..., Any] | None = None,
        loglevel: int = logging.DEBUG,
    ) -> None:
        if isinstance(assignment_strategy, str):
            assignment_strategy = AssignmentStrategy[
                assignment_strategy.upper()
            ]
        if isinstance(compute_method, str):
            compute_method = ComputeMethod[compute_method.upper()]
        if not callable(factor_update_steps) and factor_update_steps <= 0:
            raise ValueError('factor_update_steps must be > 0')
        if not callable(inv_update_steps) and inv_update_steps <= 0:
            raise ValueError('inv_update_steps must be > 0')
        if not callable(damping) and damping <= 0:
            raise ValueError('damping must be > 0')
        if not callable(factor_decay) and not 0 < factor_decay <= 1:
            raise ValueError('factor_decay must be in (0, 1]')
        if (
            kl_clip is not None
            and not callable(kl_clip)
            and kl_clip <= 0
        ):
            raise ValueError('kl_clip must be > 0')
        if accumulation_steps <= 0:
            raise ValueError('accumulation_steps must be > 0')
        if conv_a_factor_method not in (
            'auto', 'patches', 'slices', 'convgrad', 'rowgram',
        ):
            # 'pallas' was retired in round 3: the fused slab kernel
            # measured slower than the XLA paths both standalone and
            # in-graph (docs/PERF_NOTES.md "Capture A/B").
            raise ValueError(
                "conv_a_factor_method must be one of 'auto', 'patches', "
                f"'slices', 'convgrad', 'rowgram'; got "
                f'{conv_a_factor_method!r}',
            )
        if gram_method not in ('full', 'tri', 'auto'):
            raise ValueError(
                "gram_method must be one of 'full', 'tri', 'auto'; "
                f'got {gram_method!r}',
            )
        if (
            compute_method == ComputeMethod.EIGEN
            and compute_eigenvalue_outer_product
            and not colocate_factors
        ):
            raise ValueError(
                'colocate_factors must be True to use '
                'compute_eigenvalue_outer_product',
            )

        if specs is None:
            if model is None:
                raise ValueError('Provide either a model or explicit specs')
            specs = register_modules(
                model,
                *example_args,
                skip_layers=skip_layers,
                factor_dtype=factor_dtype,
                factor_compute_dtype=factor_compute_dtype,
                conv_a_factor_method=conv_a_factor_method,
                gram_method=gram_method,
                init_fn=init_fn,
                **(example_kwargs or {}),
            )
        if not specs:
            raise ValueError(
                'No supported layers found to register. KFAC supports '
                'nn.Dense and 2D nn.Conv flax modules.',
            )
        self._specs = dict(specs)
        for name, spec in self._specs.items():
            logger.log(
                loglevel,
                f'Registered name="{name}": {spec.module_type} '
                f'A{spec.a_shape} G{spec.g_shape}',
            )

        self.assignment_strategy = assignment_strategy
        self.colocate_factors = colocate_factors
        self.compute_method = compute_method
        self.prediv_eigenvalues = (
            compute_eigenvalue_outer_product
            and compute_method == ComputeMethod.EIGEN
        )
        # In-loop eigensolver. XLA's TPU eigh is latency-bound (47-77ms
        # per refresh for ResNet-20-sized buckets, any conditioning);
        # 'refine' replaces it with the warm-started matmul-only
        # refinement of ops/refine.py, exploiting that the engine always
        # carries the previous eigenbasis. 'jacobi' is the warm-started
        # fixed-sweep two-sided Jacobi solver (ops/jacobi.py): exact
        # plane rotations keep the basis orthonormal by construction at
        # any conditioning, at higher in-loop cost than 'refine' (O(d)
        # VPU rounds per sweep) -- use it when refine's residual
        # contract is in doubt for a new spectrum regime. 'auto' picks
        # 'refine' on accelerator backends and exact 'xla' on CPU
        # (where eigh is cheap and tests pin exact parity with the
        # reference). Regime caveat (measured, docs/PERF_NOTES.md
        # "LM convergence A/B"): on vision spectra 'refine' is both
        # faster and converges ahead of exact; on transformer LM
        # token-covariance spectra its aggressive defaults lag late
        # convergence, and pricing it at convergence-parity settings
        # (refine_iterations=3, 'highest') costs as much as exact --
        # for LM regimes use 'xla', or compute_method='inverse'
        # (fastest; steps-to-loss identical to exact eigen there).
        if eigensolver not in ('auto', 'xla', 'refine', 'jacobi'):
            raise ValueError(f'Unknown eigensolver={eigensolver}')
        if eigensolver == 'auto':
            if jax.default_backend() == 'cpu':
                eigensolver = 'xla'
            elif self.compute_method != ComputeMethod.EIGEN:
                # The inverse method never runs an eigensolver; resolve
                # silently (warning here would tell inverse users to
                # switch to the method they already use).
                eigensolver = 'xla'
            elif self._dense_dominated_large_dims():
                # Measured lag regime (docs/PERF_NOTES.md "LM
                # convergence A/B"): on Dense-dominated models with
                # large factor dims (transformer token-covariance
                # spectra) the warm 'refine' refresh lags exact eigen's
                # late convergence by ~40% steps-to-target, so 'auto'
                # must not pick it silently. Exact 'xla' is the
                # convergence-safe default there; compute_method=
                # 'inverse' is faster still (steps-to-loss identical
                # to exact eigen in that regime, same A/B).
                eigensolver = 'xla'
                warnings.warn(
                    "eigensolver='auto' selected exact 'xla' for this "
                    'Dense-dominated large-dim model: the warm '
                    "'refine' refresh lags late convergence on "
                    'transformer-LM spectra (docs/PERF_NOTES.md "LM '
                    'convergence A/B"). For the fastest measured LM '
                    "configuration use compute_method='inverse'; pass "
                    "eigensolver='refine' explicitly to override.",
                    ExperimentalFeatureWarning,
                    stacklevel=2,
                )
            else:
                eigensolver = 'refine'
        self.eigensolver = eigensolver
        if jacobi_sweeps <= 0:
            raise ValueError('jacobi_sweeps must be > 0')
        self.jacobi_sweeps = jacobi_sweeps
        if refine_iterations <= 0:
            raise ValueError('refine_iterations must be > 0')
        self.refine_iterations = refine_iterations
        # Matmul precision of the refine refresh. 'high' (bf16x3) halves
        # the refresh cost; 'mixed' additionally applies rotations in a
        # single bf16 pass (~30% less MXU work, residual unchanged);
        # on-chip A/Bs on realistic rank-deficient spectra in the
        # ops/refine.py docstring.
        if refine_precision not in ('highest', 'high', 'mixed'):
            raise ValueError(
                "refine_precision must be 'highest', 'high', or "
                f"'mixed'; got {refine_precision!r}",
            )
        if refine_precision == 'mixed':
            warnings.warn(
                "refine_precision='mixed' applies eigenbasis rotations in "
                'a single bf16 pass; validated on CIFAR/ImageNet ResNet '
                'spectra only (docs/PERF_NOTES.md)',
                ExperimentalFeatureWarning,
                stacklevel=2,
            )
        self.refine_precision = refine_precision
        # Final orthonormalization of the refine refresh: 'auto' conds
        # between one Newton-Schulz step (steady state; matmul-only) and
        # exact CholeskyQR (cold starts) -- cholesky/triangular_solve
        # are latency-bound on TPU (ops/refine.py docstring).
        if refine_final_orth not in ('auto', 'cholqr', 'ns'):
            raise ValueError(
                "refine_final_orth must be 'auto', 'cholqr', or 'ns'; "
                f'got {refine_final_orth!r}',
            )
        self.refine_final_orth = refine_final_orth
        self.grad_worker_fraction = grad_worker_fraction
        self.sharding = sharding
        self.accumulation_steps = accumulation_steps
        self.grad_scale = grad_scale
        self.capture_remat = capture_remat
        self.nonfinite_guard = nonfinite_guard
        self.factor_dtype = factor_dtype
        self.factor_compute_dtype = factor_compute_dtype
        self.gram_method = gram_method
        self.store_dtype = factor_dtype if factor_dtype is not None else (
            jnp.float32
        )
        self.inv_dtype = inv_dtype
        # Precision of the per-step preconditioning matmuls. HIGHEST is
        # full f32 on the MXU (6 bf16 passes); 'high' (bf16x3) is ~2x
        # faster with near-f32 accuracy -- the production setting. The
        # factor covariance and eigh always run at full f32.
        if isinstance(precondition_precision, str):
            precondition_precision = {
                'default': jax.lax.Precision.DEFAULT,
                'high': jax.lax.Precision.HIGH,
                'highest': jax.lax.Precision.HIGHEST,
            }[precondition_precision.lower()]
        self.precondition_precision = precondition_precision
        self.skip_layers = list(skip_layers)

        self._factor_update_steps = factor_update_steps
        self._inv_update_steps = inv_update_steps
        self._damping = damping
        self._factor_decay = factor_decay
        self._kl_clip = kl_clip
        self._lr = lr

        # Bucket plan: group layers by (g_dim, a_dim); same-shaped layers
        # batch into one decomposition and shard on the block axis.
        # bucket_padding widens the grouping by zero/identity-padding
        # factor blocks: 'pow2' buckets by next-power-of-two dims, 'max'
        # puts every layer in ONE bucket padded to the largest dims --
        # maximal batching (a single batched matmul set per precondition
        # stage) at the cost of padded FLOPs. Padded rows/cols carry
        # identity factors and zero gradients, so the math is unchanged.
        if bucket_padding not in ('none', 'pow2', 'max'):
            raise ValueError(f'Unknown bucket_padding={bucket_padding}')
        self.bucket_padding = bucket_padding

        def _pow2(n: int) -> int:
            p = 1
            while p < n:
                p *= 2
            return p

        grouped: dict[str, list[LayerSpec]] = {}
        dims: dict[str, tuple[int, int]] = {}
        if bucket_padding == 'max':
            a_max = max(s.a_shape[0] for s in self._specs.values())
            g_max = max(s.g_shape[0] for s in self._specs.values())
            key = f'g{g_max}xa{a_max}'
            grouped[key] = list(self._specs.values())
            dims[key] = (a_max, g_max)
        else:
            for spec in self._specs.values():
                a_d, g_d = spec.a_shape[0], spec.g_shape[0]
                if bucket_padding == 'pow2':
                    a_d, g_d = _pow2(a_d), _pow2(g_d)
                key = f'g{g_d}xa{a_d}'
                grouped.setdefault(key, []).append(spec)
                dims[key] = (a_d, g_d)
        # Owner-computes wiring (reference: greedy placement drives who
        # computes what, ``kfac/assignment.py:227-319`` ->
        # ``base_preconditioner.py:340-362``). With a mesh present:
        # order each bucket's block slots by the greedy assignment's
        # owner device, and pad the block count to world-size
        # divisibility (identity factors / zero grads -- mathematically
        # inert) so the 'factors'-stage sharding fully distributes the
        # decompositions instead of silently replicating on ragged
        # (real-model) block counts.
        pad_counts = dict.fromkeys(grouped, 0)
        if sharding is not None and sharding.world_size > 1:
            from kfac_pytorch_tpu.assignment import block_placement
            from kfac_pytorch_tpu.assignment import KAISAAssignment

            world = sharding.world_size
            assign = KAISAAssignment(
                self.work(),
                local_rank=0,
                world_size=world,
                grad_worker_fraction=sharding.grad_workers / world,
                colocate_factors=colocate_factors,
            )
            placement = block_placement(assign, self._specs.keys())
            for key, group in grouped.items():
                group.sort(key=lambda s: (placement[s.name], s.name))
                pad_counts[key] = -len(group) % world
        self._plan: tuple[Bucket, ...] = tuple(
            Bucket(
                key=key,
                specs=tuple(group),
                a_dim=dims[key][0],
                g_dim=dims[key][1],
                pad_blocks=pad_counts[key],
            )
            for key, group in grouped.items()
        )
        self._slot: dict[str, tuple[str, int]] = {}
        for bucket in self._plan:
            for i, spec in enumerate(bucket.specs):
                self._slot[spec.name] = (bucket.key, i)
        # Log the materialized work-assignment table, mirroring the
        # reference's init-time assignment log
        # (kfac/preconditioner.py:292-300 of gpauloski/kfac-pytorch).
        if sharding is not None and sharding.world_size > 1:
            assign = self.assignment()
            for layer in assign.get_layers():
                owners = {
                    factor: assign.inv_worker(layer, factor)
                    for factor in assign.get_factors(layer)
                }
                logger.log(loglevel, f'Assignment "{layer}": {owners}')
        self._paths: dict[str, tuple[str, ...]] = {
            name: tuple(name.split('/')) for name in self._specs
        }
        self._first_component = next(iter(self._paths.values()))[0]

    # ------------------------------------------------------------------
    # Introspection / parity helpers
    # ------------------------------------------------------------------

    def _dense_dominated_large_dims(
        self,
        linear_fraction: float = 2 / 3,
        dim_threshold: int = 1024,
    ) -> bool:
        """Whether the registered model sits in the measured refine-lag
        regime: mostly Dense layers with at least one large factor dim
        (transformer-LM shapes). Conv-dominated vision models and
        small-dim MLPs are NOT in it -- there 'refine' both wins on
        time and converges ahead of exact (docs/PERF_NOTES.md)."""
        n = len(self._specs)
        n_linear = sum(
            1 for s in self._specs.values() if s.module_type == 'linear'
        )
        max_dim = max(
            max(s.a_shape[-1], s.g_shape[-1])
            for s in self._specs.values()
        )
        return n_linear / n >= linear_fraction and max_dim >= dim_threshold

    def __repr__(self) -> str:
        params = [
            ('accumulation_steps', self.accumulation_steps),
            ('assignment_strategy', self.assignment_strategy),
            ('compute_method', self.compute_method),
            ('colocate_factors', self.colocate_factors),
            ('damping', self._damping),
            ('factor_decay', self._factor_decay),
            ('factor_update_steps', self._factor_update_steps),
            ('grad_worker_fraction', self.grad_worker_fraction),
            ('inv_update_steps', self._inv_update_steps),
            ('kl_clip', self._kl_clip),
            ('layers', len(self._specs)),
            ('lr', self._lr),
            ('prediv_eigenvalues', self.prediv_eigenvalues),
        ]
        body = '\n'.join(f'  {k}={v},' for k, v in sorted(params))
        return f'{type(self).__name__}(\n{body}\n)'

    @property
    def specs(self) -> dict[str, LayerSpec]:
        return dict(self._specs)

    @property
    def plan(self) -> tuple[Bucket, ...]:
        return self._plan

    def work(self) -> dict[str, dict[str, float]]:
        """Per-layer factor cost dict for work assignment.

        Mirrors reference ``kfac/preconditioner.py:270-285``: COMPUTE costs
        d^3 (decomposition flops), MEMORY costs d^2 (storage).
        """
        if self.assignment_strategy == AssignmentStrategy.COMPUTE:
            cost = lambda n: float(n) ** 3  # noqa: E731
        else:
            cost = lambda n: float(n) ** 2  # noqa: E731
        return {
            name: {
                'A': cost(spec.a_shape[0]),
                'G': cost(spec.g_shape[0]),
            }
            for name, spec in self._specs.items()
        }

    def assignment(self, local_rank: int = 0) -> Any:
        """Materialize the KAISA work assignment for introspection/logging.

        The SPMD engine realizes owner-computes placement through the
        bucket sharding (``parallel/strategy.py``); this method exposes
        the equivalent explicit (layer, factor) -> device mapping and
        group structure, mirroring the reference's logged assignment
        table (``kfac/preconditioner.py:292-300``).
        """
        from kfac_pytorch_tpu.assignment import KAISAAssignment

        if self.sharding is not None:
            world = self.sharding.world_size
            fraction = self.sharding.grad_workers / world
        else:
            world, fraction = 1, 1.0
        return KAISAAssignment(
            self.work(),
            local_rank=local_rank,
            world_size=world,
            grad_worker_fraction=fraction,
            colocate_factors=self.colocate_factors,
        )

    def memory_usage(self, state: KFACState) -> dict[str, int]:
        """Approximate bytes per category, mirroring the reference's
        ``memory_usage`` (``base_preconditioner.py:389-409``).

        ``a_batches``/``g_batches`` report the working memory of one
        capture (the per-layer batch covariances carried between
        ``value_and_grad`` and ``step``) -- the analogue of the
        reference's batch accumulator lists. Unlike the reference they
        are transient within a jitted step, so this is a peak-usage
        estimate, not a persistent allocation.
        """
        sizes = {
            'a_factors': 0,
            'g_factors': 0,
            'a_inverses': 0,
            'g_inverses': 0,
            'a_batches': 0,
            'g_batches': 0,
        }

        def nbytes(x: jax.Array | None) -> int:
            return 0 if x is None else x.size * x.dtype.itemsize

        itemsize = jnp.dtype(jnp.float32).itemsize
        for spec in self._specs.values():
            da, dg = spec.a_shape[0], spec.g_shape[0]
            sizes['a_batches'] += da * da * itemsize
            sizes['g_batches'] += dg * dg * itemsize
        for cf in state.factors.values():
            sizes['a_factors'] += nbytes(cf.a)
            sizes['g_factors'] += nbytes(cf.g)
        for bs in state.buckets.values():
            sizes['a_inverses'] += nbytes(bs.qa) + nbytes(bs.da)
            sizes['a_inverses'] += nbytes(bs.a_inv)
            sizes['g_inverses'] += (
                nbytes(bs.qg) + nbytes(bs.dg) + nbytes(bs.dgda)
            )
            sizes['g_inverses'] += nbytes(bs.g_inv)
        sizes['total'] = sum(sizes.values())
        return sizes

    # ------------------------------------------------------------------
    # State lifecycle
    # ------------------------------------------------------------------

    def _hp(self, state: KFACState, key: str) -> Any:
        """Resolve a hyperparameter for this step.

        Callable hyperparams are evaluated on the traced step counter;
        constants are read from ``state.hyperparams`` (traced, so scheduler
        mutations reach compiled functions). Falls back to the constructor
        constant for states without the hyperparams dict.
        """
        ctor = getattr(self, f'_{key}')
        if callable(ctor):
            return ctor(state.steps)
        hp = getattr(state, 'hyperparams', None)
        if hp and key in hp:
            return hp[key]
        return ctor

    def _static_one(self, key: str) -> bool:
        """Whether an update interval is the literal constant 1.

        Used to specialize the step structure (no ``lax.cond``). Note:
        a step compiled with this specialization updates every step even
        if a scheduler later raises the interval; rebuild the step to
        re-enable gating (scheduling an interval *away from 1* is the one
        schedule the compiled structure cannot express).
        """
        ctor = getattr(self, f'_{key}')
        return isinstance(ctor, int) and ctor == 1

    def init_hyperparams(self) -> dict[str, jax.Array]:
        """Traced-scalar snapshot of the constant hyperparameters."""
        out: dict[str, jax.Array] = {}
        for key, dtype in _SCHEDULABLE:
            value = getattr(self, f'_{key}')
            if value is None or callable(value):
                continue
            out[key] = jnp.asarray(value, dtype)
        return out

    def init(self) -> KFACState:
        """Create the initial preconditioner state."""
        method = (
            'eigen' if self.compute_method == ComputeMethod.EIGEN
            else 'inverse'
        )
        factors = {
            name: init_layer_factors(
                spec.a_shape[0],
                spec.g_shape[0],
                factor_dtype=self.store_dtype,
            )
            for name, spec in self._specs.items()
        }
        buckets = {
            bucket.key: init_bucket_state(
                bucket.total_blocks,
                bucket.a_dim,
                bucket.g_dim,
                compute_method=method,
                prediv_eigenvalues=self.prediv_eigenvalues,
                inv_dtype=self.inv_dtype,
            )
            for bucket in self._plan
        }
        for key, bs in buckets.items():
            so = lambda x: (  # noqa: E731
                None if x is None else self._constrain(x, 'second_order')
            )
            buckets[key] = bs.replace(
                qa=so(bs.qa),
                qg=so(bs.qg),
                da=so(bs.da),
                dg=so(bs.dg),
                dgda=so(bs.dgda),
                a_inv=so(bs.a_inv),
                g_inv=so(bs.g_inv),
            )
        return KFACState(
            steps=jnp.zeros((), jnp.int32),
            factors=factors,
            buckets=buckets,
            hyperparams=self.init_hyperparams(),
        )

    def as_gradient_transformation(self) -> Any:
        """Wrap this preconditioner as an optax transformation.

        See ``kfac_pytorch_tpu.optim.kfac_transform``.
        """
        from kfac_pytorch_tpu.optim import kfac_transform

        return kfac_transform(self)

    def should_update_factors(self, steps: int) -> bool:
        """Python-side gating helper for the two-function fast path.

        The reference's hooks only save statistics when
        ``steps % factor_update_steps == 0`` (``base_preconditioner.py:
        444-446``); callers that gate in Python (compiling a capture-free
        train step for the off-steps) skip the capture FLOPs entirely.
        Requires non-callable or Python-evaluable ``factor_update_steps``.
        """
        fus = _resolve(self._factor_update_steps, steps)
        return steps % int(fus) == 0

    def should_update_invs(self, steps: int) -> bool:
        """Python-side gating for the inverse-update interval."""
        ius = _resolve(self._inv_update_steps, steps)
        return steps % int(ius) == 0

    # ------------------------------------------------------------------
    # Capture
    # ------------------------------------------------------------------

    def value_and_grad(
        self,
        loss_fn: Callable[..., Any],
        has_aux: bool = False,
    ) -> Callable[..., tuple[Any, Any, Captured]]:
        """Jittable value+grad+factor-capture for ``loss_fn(params, ...)``."""
        return capture_value_and_grad(
            loss_fn,
            self._specs,
            has_aux=has_aux,
            grad_scale=self.grad_scale,
            remat=self.capture_remat,
        )

    # ------------------------------------------------------------------
    # Step
    # ------------------------------------------------------------------

    def _constrain(self, tree: Any, stage: str) -> Any:
        if self.sharding is None:
            return tree
        return self.sharding.constrain(tree, stage)

    def _update_factors(
        self,
        factors: dict[str, CapturedFactors],
        captured: Captured,
        decay: Any,
    ) -> dict[str, CapturedFactors]:
        """Per-layer running-average update (reference base.py:375-405).

        Factors are stored per layer at true dims -- the EMA is a set of
        independent fused multiply-adds. Block-stacking happens only at
        second-order time (measured ~7ms cheaper per factor update than
        maintaining stacked factor buffers).

        With ``nonfinite_guard`` (default) a layer whose captured batch
        factors contain inf/nan keeps its previous running factors: the
        AMP skip-step workflow where an overflowed microbatch must not
        poison the statistics. The reference handles this with a manual
        ``reset_batch()`` the user calls when the GradScaler skips a step
        (``kfac/base_preconditioner.py:384-387``, ``kfac/layers/base.py:
        206-222`` of gpauloski/kfac-pytorch); here the fold is gated
        on-device so no host round-trip sits in the step. Use
        :func:`nonfinite_captures` to count/log skipped layers.
        """
        guard = self.nonfinite_guard
        out = {}
        for name, cf in factors.items():
            cap = captured[name]
            a_new = ema_update(cf.a, cap.a.astype(cf.a.dtype), decay)
            g_new = ema_update(cf.g, cap.g.astype(cf.g.dtype), decay)
            if guard:
                ok = jnp.all(jnp.isfinite(cap.a)) & jnp.all(
                    jnp.isfinite(cap.g),
                )
                a_new = jnp.where(ok, a_new, cf.a)
                g_new = jnp.where(ok, g_new, cf.g)
            out[name] = CapturedFactors(a=a_new, g=g_new)
        return out

    def _stack_bucket_factor(
        self,
        bucket: Bucket,
        factors: dict[str, CapturedFactors],
        attr: str,
        dim: int,
    ) -> jax.Array:
        """Stack (and pad) per-layer running factors into the bucket's
        block batch; the 'factors' constraint shards the blocks over the
        mesh so each device decomposes only its assigned blocks
        (owner-computes). pad_blocks identity blocks keep the count
        mesh-divisible (see Bucket). Overridden by the pipelined engine
        to fold the stage axis in stage-major order.
        """
        blocks = [
            _pad_factor(getattr(factors[s.name], attr), dim)
            for s in bucket.specs
        ]
        stacked = jnp.stack(blocks)
        if bucket.pad_blocks:
            stacked = jnp.concatenate(
                [
                    stacked,
                    jnp.broadcast_to(
                        jnp.eye(dim, dtype=stacked.dtype),
                        (bucket.pad_blocks, dim, dim),
                    ),
                ],
            )
        return self._constrain(stacked, 'factors')

    def _compute_second_order(
        self,
        buckets: dict[str, BucketState],
        factors: dict[str, CapturedFactors],
        damping: Any,
        solver: str | None = None,
    ) -> dict[str, BucketState]:
        solver = self.eigensolver if solver is None else solver
        out = {}
        so = lambda x: self._constrain(x, 'second_order')  # noqa: E731
        for bucket in self._plan:
            bs = buckets[bucket.key]
            a_stacked = self._stack_bucket_factor(
                bucket, factors, 'a', bucket.a_dim,
            )
            g_stacked = self._stack_bucket_factor(
                bucket, factors, 'g', bucket.g_dim,
            )
            if self.compute_method == ComputeMethod.EIGEN:
                if solver == 'refine':
                    # Warm-started matmul-only refresh (ops/refine.py):
                    # the previous eigenbasis (identity at init) seeds
                    # the refinement -- the in-loop path on TPU where
                    # XLA's eigh is latency-bound.
                    qa, da = refine_eigh(
                        a_stacked, bs.qa, damping, self.refine_iterations,
                        precision=self.refine_precision,
                        final_orth=self.refine_final_orth,
                    )
                    qg, dg = refine_eigh(
                        g_stacked, bs.qg, damping, self.refine_iterations,
                        precision=self.refine_precision,
                        final_orth=self.refine_final_orth,
                    )
                    qa = qa.astype(self.inv_dtype)
                    da = da.astype(self.inv_dtype)
                    qg = qg.astype(self.inv_dtype)
                    dg = dg.astype(self.inv_dtype)
                elif solver == 'jacobi':
                    from kfac_pytorch_tpu.ops.jacobi import jacobi_eigh

                    # Warm-started (previous basis = identity at init);
                    # eigenvalues clamped >= 0 exactly as eigh_factor
                    # (reference kfac/layers/eigen.py:344).
                    qa, da = jacobi_eigh(
                        a_stacked.astype(jnp.float32),
                        bs.qa.astype(jnp.float32),
                        sweeps=self.jacobi_sweeps,
                    )
                    qg, dg = jacobi_eigh(
                        g_stacked.astype(jnp.float32),
                        bs.qg.astype(jnp.float32),
                        sweeps=self.jacobi_sweeps,
                    )
                    qa = qa.astype(self.inv_dtype)
                    da = jnp.maximum(da, 0.0).astype(self.inv_dtype)
                    qg = qg.astype(self.inv_dtype)
                    dg = jnp.maximum(dg, 0.0).astype(self.inv_dtype)
                else:
                    qa, da = eigh_factor(a_stacked, self.inv_dtype)
                    qg, dg = eigh_factor(g_stacked, self.inv_dtype)
                if self.prediv_eigenvalues:
                    # (B, a_dim, g_dim): transposed-prediv layout matching
                    # the (in, out) gradient convention.
                    dgda = (
                        1.0
                        / (da[:, :, None] * dg[:, None, :] + damping)
                    ).astype(self.inv_dtype)
                    out[bucket.key] = bs.replace(
                        qa=so(qa), qg=so(qg), dgda=so(dgda),
                    )
                else:
                    out[bucket.key] = bs.replace(
                        qa=so(qa), qg=so(qg), da=so(da), dg=so(dg),
                    )
            else:
                out[bucket.key] = bs.replace(
                    a_inv=so(
                        damped_inverse(a_stacked, damping, self.inv_dtype),
                    ),
                    g_inv=so(
                        damped_inverse(g_stacked, damping, self.inv_dtype),
                    ),
                )
        return out

    def _precondition_bucket(
        self,
        bucket: Bucket,
        bs: BucketState,
        grad_mats: jax.Array,
        damping: Any,
    ) -> jax.Array:
        """Batched preconditioning of a [B, a_dim, g_dim] gradient stack.

        Transposed formulation of reference ``kfac/layers/eigen.py:350-385``
        (identical math): gradients stay in the natural flax ``(in, out)``
        layout so no transposes are materialized:
        ``M_hat = Qa [(Qa^T M Qg) / (da dg^T + damping)] Qg^T``.
        """
        half, _ = self._precondition_half(
            bucket, bs, grad_mats, damping, need_vg=False,
        )
        return self._finish_bucket(bucket, bs, half, None)

    def _einsum_kw(self) -> dict[str, Any]:
        return dict(
            preferred_element_type=jnp.float32,
            precision=self.precondition_precision,
        )

    def _inter_dtype(self) -> Any:
        """Storage dtype for precondition intermediates (v1/v2).

        Under ``Precision.DEFAULT`` every matmul input is truncated to
        bf16 on the MXU anyway, so materializing the chained-einsum
        intermediates at f32 only spends HBM bandwidth on mantissa bits
        the next matmul discards -- carry them at ``inv_dtype`` (the
        dtype the eigenbases are already stored in). Accumulation stays
        f32 (``preferred_element_type``), elementwise divisor math stays
        f32, and the KL inner product is reduced in f32. Under
        HIGH/HIGHEST precision intermediates stay f32 (the multi-pass
        algorithms genuinely consume the extra bits).
        """
        if self.precondition_precision == jax.lax.Precision.DEFAULT:
            return self.inv_dtype
        return jnp.float32

    def _precondition_half(
        self,
        bucket: Bucket,
        bs: BucketState,
        grad_mats: jax.Array,
        damping: Any,
        need_vg: bool,
    ) -> tuple[jax.Array, jax.Array | None]:
        """First half of preconditioning: everything before the KL scale.

        For the eigen method returns the scaled eigenbasis coefficients
        ``v2 = (Qa^T M Qg) / (da dg^T + damping)`` -- the final rotation
        back (``Qa v2 Qg^T``) is deferred to :meth:`_finish_bucket` so the
        KL-clip scale (a function of ALL buckets) can be folded into the
        closing einsums instead of costing an extra full pass over ``pg``.

        ``vg`` is the bucket's KL inner product ``<pg, grads> = sum(pg*M)``.
        In the eigenbasis it is computed for free by trace cyclicity:
        ``<Qa v2 Qg^T, M> = <v2, Qa^T M Qg> = <v2, v1>`` (exact -- no
        orthogonality assumption), avoiding an HBM pass over both ``pg``
        and ``grad_mats`` (reference computes it on materialized grads,
        ``kfac/base_preconditioner.py:411-435``).
        """
        g32 = grad_mats.astype(self.inv_dtype)
        kw = self._einsum_kw()
        it = self._inter_dtype()
        vg = None
        if self.compute_method == ComputeMethod.EIGEN:
            v1 = jnp.einsum(
                'bji,bjk->bik', bs.qa, g32, **kw,
            ).astype(it)  # qa^T M
            v1 = jnp.einsum('bik,bkl->bil', v1, bs.qg, **kw)  # ... qg
            if self.prediv_eigenvalues:
                v2 = v1 * bs.dgda.astype(v1.dtype)
            else:
                # Divisor built in f32 (damping ~1e-3 against O(1)
                # eigenvalues deserves the mantissa); result stored at
                # the intermediate dtype -- one fused elementwise pass.
                v2 = v1 / (
                    bs.da.astype(jnp.float32)[:, :, None]
                    * bs.dg.astype(jnp.float32)[:, None, :]
                    + damping
                ).astype(v1.dtype)
            if need_vg:
                vg = jnp.sum(v1.astype(jnp.float32) * v2.astype(jnp.float32))
            return v2.astype(it), vg
        # (A^-1 M) G^-1 with symmetric inverses: no eigenbasis to hide the
        # inner product in -- compute pg fully here and take <pg, M>.
        pg = jnp.einsum('bij,bjk->bik', bs.a_inv, g32, **kw)
        pg = jnp.einsum('bik,bkl->bil', pg, bs.g_inv, **kw)
        if need_vg:
            vg = jnp.sum(pg.astype(jnp.float32) * g32.astype(jnp.float32))
        return pg, vg

    def _finish_bucket(
        self,
        bucket: Bucket,
        bs: BucketState,
        half: jax.Array,
        scale: jax.Array | None,
    ) -> jax.Array:
        """Close the preconditioning after the KL scale is known.

        The scale multiplies the small-rotation coefficients BEFORE the
        closing einsums (scalar commutes with the linear maps), so XLA
        fuses it into the matmul epilogue rather than re-reading ``pg``.
        """
        if scale is not None:
            half = half * scale
        if self.compute_method == ComputeMethod.EIGEN:
            kw = self._einsum_kw()
            pg = jnp.einsum('bij,bjk->bik', bs.qa, half, **kw)  # qa v2
            pg = jnp.einsum('bik,blk->bil', pg, bs.qg, **kw)  # ... qg^T
            return pg
        return half

    def _grad_mats_for_bucket(
        self,
        bucket: Bucket,
        root: Any,
    ) -> jax.Array:
        """Stack the bucket layers' gradient matrices ``[B, a_dim, g_dim]``.

        Overridden by the pipelined engine (stage axis folded stage-major).
        """
        grad_mats = jnp.stack(
            [
                _pad_grad(
                    spec.helper.get_grad_t(
                        get_subtree(root, self._paths[spec.name]),
                    ),
                    bucket.a_dim,
                    bucket.g_dim,
                )
                for spec in bucket.specs
            ],
        )
        if bucket.pad_blocks:
            # Virtual blocks carry zero gradients: preconditioning
            # and the KL-clip inner product are unaffected.
            grad_mats = jnp.concatenate(
                [
                    grad_mats,
                    jnp.zeros(
                        (bucket.pad_blocks,) + grad_mats.shape[1:],
                        grad_mats.dtype,
                    ),
                ],
            )
        return grad_mats

    def _write_bucket_grads(
        self,
        bucket: Bucket,
        root: Any,
        pg: jax.Array,
    ) -> Any:
        """Write a bucket's preconditioned stack back into the grad tree."""
        for i, spec in enumerate(bucket.specs):
            path = self._paths[spec.name]
            sub = get_subtree(root, path)
            da, dg = spec.a_shape[0], spec.g_shape[0]
            root = set_subtree(
                root,
                path,
                spec.helper.set_grad_t(sub, pg[i, :da, :dg]),
            )
        return root

    def step(
        self,
        state: KFACState,
        grads: Any,
        captured: Captured | None = None,
        force_factor_update: bool = False,
        refresh: str = 'auto',
    ) -> tuple[Any, KFACState]:
        """One K-FAC step: update factors, refresh inverses, precondition.

        Functional counterpart of ``BaseKFACPreconditioner.step``
        (``base_preconditioner.py:310-382``); returns the preconditioned
        gradient pytree and the new state instead of mutating in place.

        Args:
            state: current ``KFACState``.
            grads: gradient pytree matching the params structure (already
                averaged over data-parallel replicas / the global batch).
            captured: per-layer factors from ``value_and_grad`` (averaged
                over accumulation microbatches via ``accumulate_captures``).
                Pass None to skip the factor-update stage entirely, e.g.
                when the caller gates capture in Python for speed.
            refresh: second-order refresh gating. ``'auto'`` compiles the
                ``steps % inv_update_steps == 0`` gate as a ``lax.cond``
                (both branches in the program -- the reference's dynamic
                check, ``base_preconditioner.py:340``). ``'force'`` /
                ``'skip'`` bake the decision in at trace time for callers
                that schedule the refresh in Python or at static scan
                positions (``train.make_period_train_step``): the cond --
                and its measured state-threading cost on large models --
                disappears from the compiled step.

        Returns:
            ``(preconditioned_grads, new_state)``.
        """
        if refresh not in ('auto', 'force', 'skip'):
            raise ValueError(f'Unknown refresh={refresh!r}')
        steps = state.steps
        damping = self._hp(state, 'damping')
        decay = self._hp(state, 'factor_decay')
        lr = self._hp(state, 'lr')

        # Stage 1: factor running averages (reference base.py:375-405).
        # force_factor_update lets a caller that already gated the capture
        # (e.g. the scanned train step's outer lax.cond) skip the internal
        # gate -- one branch instead of two avoids re-threading the factor
        # buffers through a second cond.
        if captured is not None:
            fus = self._hp(state, 'factor_update_steps')
            if force_factor_update or self._static_one('factor_update_steps'):
                factors = self._update_factors(state.factors, captured, decay)
            else:
                factors = jax.lax.cond(
                    (steps % fus) == 0,
                    lambda fs: self._update_factors(fs, captured, decay),
                    lambda fs: fs,
                    state.factors,
                )
            state = state.replace(factors=factors)

        # Stage 2: second-order info (eigendecomp or damped inverse).
        if refresh == 'force' or (
            refresh == 'auto' and self._static_one('inv_update_steps')
        ):
            buckets = self._compute_second_order(
                state.buckets, state.factors, damping,
            )
            state = state.replace(buckets=buckets)
        elif refresh == 'auto':
            ius = self._hp(state, 'inv_update_steps')
            buckets = jax.lax.cond(
                (steps % ius) == 0,
                lambda bs: self._compute_second_order(
                    bs, state.factors, damping,
                ),
                lambda bs: bs,
                state.buckets,
            )
            state = state.replace(buckets=buckets)
        # refresh == 'skip': buckets pass through untouched.

        # Stage 3: precondition gradients (batched per bucket) up to the
        # KL scale -- the closing rotation is deferred so the scale folds
        # into the final einsums (see _precondition_half/_finish_bucket).
        root = params_root(grads, self._first_component)
        vg_sum = jnp.zeros((), jnp.float32)
        half_by_bucket: dict[str, jax.Array] = {}
        gm_dtypes: dict[str, Any] = {}
        for bucket in self._plan:
            grad_mats = self._grad_mats_for_bucket(bucket, root)
            bs = state.buckets[bucket.key]
            half, vg = self._precondition_half(
                bucket, bs, grad_mats, damping,
                need_vg=self._kl_clip is not None,
            )
            half = self._constrain(half, 'precond_grad')
            half_by_bucket[bucket.key] = half
            gm_dtypes[bucket.key] = grad_mats.dtype
            if vg is not None:
                vg_sum = vg_sum + vg * jnp.asarray(lr, jnp.float32) ** 2

        # Stage 4: KL clip scale (reference base_preconditioner.py:411-435).
        if self._kl_clip is not None:
            kl = self._hp(state, 'kl_clip')
            scale = kl_clip_scale(vg_sum, kl)
        else:
            scale = None

        # Stage 5: close the preconditioning and write back into the tree.
        for bucket in self._plan:
            bs = state.buckets[bucket.key]
            pg = self._finish_bucket(
                bucket, bs, half_by_bucket[bucket.key], scale,
            )
            pg = self._constrain(pg, 'precond_grad')
            pg = pg.astype(gm_dtypes[bucket.key])
            root = self._write_bucket_grads(bucket, root, pg)

        if (
            root is not grads
            and isinstance(grads, Mapping)
            and 'params' in grads
        ):
            # Rebuild with the original mapping type (matches params_root's
            # Mapping check) so e.g. a FrozenDict input round-trips as a
            # FrozenDict rather than silently changing pytree structure.
            rebuilt = dict(grads)
            rebuilt['params'] = root
            new_grads = (
                rebuilt if type(grads) is dict else type(grads)(rebuilt)
            )
        else:
            new_grads = root

        state = state.replace(steps=steps + 1)
        return new_grads, state

    # ------------------------------------------------------------------
    # Checkpointing (reference base_preconditioner.py:215-308)
    # ------------------------------------------------------------------

    def state_dict(
        self,
        state: KFACState,
        include_factors: bool = True,
    ) -> dict[str, Any]:
        """Serializable snapshot: steps, static hyperparams, per-layer A/G.

        Inverses are not saved (recomputed on load), matching the reference.
        """
        sd: dict[str, Any] = {'steps': int(state.steps)}
        hp = getattr(state, 'hyperparams', None) or {}
        for key, _ in _SCHEDULABLE:
            ctor = getattr(self, f'_{key}')
            if callable(ctor):
                continue
            if key in hp:
                value = hp[key].item()
                if key in ('factor_update_steps', 'inv_update_steps'):
                    value = int(value)
                sd[key] = value
            elif ctor is not None:
                sd[key] = ctor
        if include_factors:
            layers: dict[str, dict[str, jax.Array]] = {}
            for name in self._specs:
                layers[name] = {
                    'A': state.factors[name].a,
                    'G': state.factors[name].g,
                }
            sd['layers'] = layers
        return sd

    def load_state_dict(
        self,
        state_dict: dict[str, Any],
        compute_inverses: bool = True,
    ) -> KFACState:
        """Rebuild a ``KFACState`` from ``state_dict``.

        Non-callable hyperparameters stored in the dict override the
        constructor values (mirroring reference ``load_state_dict``,
        ``base_preconditioner.py:249-308``).

        Note: like the reference, this MUTATES the preconditioner
        object (the Python-side hyperparameter constants are overridden
        so ``init_hyperparams``/``__repr__``/``should_update_*`` stay
        consistent with the restored state). Do not share one
        preconditioner instance across logically independent training
        runs and then ``load_state_dict`` on one of them -- construct a
        fresh instance per run. The same applies to
        ``LambdaParamScheduler.step`` (it mirrors scheduled values onto
        the preconditioner).
        """
        for key, _ in _SCHEDULABLE:
            if key in state_dict:
                setattr(self, f'_{key}', state_dict[key])
        state = self.init()  # init_hyperparams() picks up the overrides
        state = state.replace(
            steps=jnp.asarray(state_dict['steps'], jnp.int32),
        )
        if 'layers' in state_dict:
            if len(state_dict['layers']) != len(self._specs):
                raise ValueError(
                    'loaded state dict contains a different number of layers',
                )
            factors = dict(state.factors)
            for name, layer_sd in state_dict['layers'].items():
                if name not in self._slot:
                    raise KeyError(f'Unknown layer in state dict: {name}')
                factors[name] = CapturedFactors(
                    a=jnp.asarray(layer_sd['A'], self.store_dtype),
                    g=jnp.asarray(layer_sd['G'], self.store_dtype),
                )
            state = state.replace(factors=factors)
            if compute_inverses:
                damping = self._hp(state, 'damping')
                # Cold start: no warm basis exists, so always use the
                # exact solver (this runs outside the training loop
                # where eigh's latency is acceptable).
                state = state.replace(
                    buckets=self._compute_second_order(
                        state.buckets,
                        state.factors,
                        damping,
                        solver='xla',
                    ),
                )
        return state
