"""Statistics capture: activations and output-gradients without hooks.

The reference attaches forward-pre/backward hooks to mutable modules
(``kfac/base_preconditioner.py:437-479`` of gpauloski/kfac-pytorch). JAX has
no hooks, so capture is re-designed functionally:

- **Activations** ``a`` are recorded by a flax method interceptor during the
  forward trace (they are the same residuals the backward pass saves anyway,
  so no extra memory is materialized after XLA fusion).
- **Output gradients** ``g = dL/dy`` are obtained with the *zero
  perturbation tap* trick: each registered layer's output gets ``y +
  tap[name]`` where ``tap`` is a zeros array. ``jax.value_and_grad`` over
  ``(params, taps)`` then yields the parameter gradients AND the layer
  output cotangents in a single backward pass. The added zeros are free:
  the tap cotangent CSEs with the cotangent XLA already computes for the
  weight gradient.

The captured statistics are reduced to covariance factors *inside* the same
jit so only the small ``(d, d)`` factors survive the step. With the batch
sharded over a mesh axis, the covariance contraction automatically becomes a
local-matmul + psum -- the TPU equivalent of the reference's factor
allreduce (``kfac/layers/base.py:282-336``), inserted by XLA for free.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kfac_pytorch_tpu.layers.registry import LayerSpec
from kfac_pytorch_tpu.layers.registry import module_path_name

__all__ = [
    'CapturedFactors',
    'accumulate_captures',
    'capture_value_and_grad',
    'nonfinite_captures',
]


class CapturedFactors(NamedTuple):
    """Per-layer batch covariance factors captured from one fwd/bwd pass."""

    a: jax.Array  # (da, da) batch A factor (already bias-augmented)
    g: jax.Array  # (dg, dg) batch G factor


Captured = dict[str, CapturedFactors]


def accumulate_captures(captures: list[Captured]) -> Captured:
    """Average captured factors over gradient-accumulation microbatches.

    Mirrors the reference's per-layer ``_a_batch/_a_count`` accumulation
    (``kfac/layers/base.py:338-405``): microbatch factors are summed and
    divided by the count at update time.
    """
    if not captures:
        raise ValueError('captures must be non-empty')
    n = len(captures)
    out: Captured = {}
    for name in captures[0]:
        a = sum(c[name].a for c in captures) / n
        g = sum(c[name].g for c in captures) / n
        out[name] = CapturedFactors(a=a, g=g)  # type: ignore[arg-type]
    return out


def nonfinite_captures(captured: Captured) -> jax.Array:
    """Count layers whose captured batch factors contain inf/nan.

    Observability companion to the engine's on-device nonfinite guard
    (``KFACPreconditioner(nonfinite_guard=True)``, the default): layers
    counted here had their factor EMA fold skipped this step. The
    reference's AMP workflow instead relies on the user calling
    ``reset_batch()`` after a GradScaler-skipped step
    (``kfac/base_preconditioner.py:384-387`` of gpauloski/kfac-pytorch).
    Jittable; returns an int32 scalar.
    """
    count = jnp.zeros((), jnp.int32)
    for cf in captured.values():
        ok = jnp.all(jnp.isfinite(cf.a)) & jnp.all(jnp.isfinite(cf.g))
        count = count + jnp.where(ok, 0, 1).astype(jnp.int32)
    return count


def _takes_args(fn: Callable[..., Any]) -> bool:
    """Whether a ``grad_scale`` callable accepts the loss args.

    Only a callable that REQUIRES positional arguments (a
    no-default positional parameter, or bare ``*args``) is invoked
    with ``loss_fn``'s post-``params`` arguments, so a traced scale
    can ride through the jitted step. A callable whose positional
    parameters all have defaults (``def scale(s=1024.0)``) or that
    takes only ``**kwargs`` keeps the zero-arg trace-time-constant
    convention -- invoking those with the batch args would silently
    bind a batch array as the loss scale (wrong covariances, no
    error). On un-inspectable callables (builtins, some C
    extensions) fall back to the zero-arg convention.
    """
    import inspect

    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return False
    for p in sig.parameters.values():
        if p.kind is inspect.Parameter.VAR_POSITIONAL:
            return True
        if (
            p.kind in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
            and p.default is inspect.Parameter.empty
        ):
            return True
    return False


def _tapped_loss_fn(
    loss_fn: Callable[..., Any],
    specs: dict[str, LayerSpec],
    has_aux: bool,
) -> Callable[..., Any]:
    """Wrap ``loss_fn``: add taps to layer outputs, record input covariances.

    The A-factor covariance is computed *inline in the forward graph* (on
    the intercepted layer input) rather than returning the raw activation
    and reducing later. The raw-activation variant forces every layer
    input to be materialized as a function output, which measured ~17x
    slower end-to-end on TPU (HBM pressure / lost fusion); the inline
    reduction keeps only the small ``(d, d)`` factors live.
    """

    def wrapped(params: Any, taps: dict[str, list[jax.Array]], *args: Any,
                **kwargs: Any) -> tuple[jax.Array, tuple[Any, dict]]:
        a_covs: dict[str, list[jax.Array]] = {}
        call_idx: dict[str, int] = {}

        def interceptor(next_fun, cargs, ckwargs, context):  # type: ignore[no-untyped-def]
            module = context.module
            if context.method_name != '__call__' or not cargs:
                return next_fun(*cargs, **ckwargs)
            name = module_path_name(module)
            if name not in taps:
                return next_fun(*cargs, **ckwargs)
            i = call_idx.get(name, 0)
            call_idx[name] = i + 1
            a_in = jax.lax.stop_gradient(cargs[0])
            a_covs.setdefault(name, []).append(
                specs[name].helper.get_a_factor(a_in),
            )
            y = next_fun(*cargs, **ckwargs)
            return y + taps[name][i]

        with nn.intercept_methods(interceptor):
            out = loss_fn(params, *args, **kwargs)
        if has_aux:
            loss, aux = out
        else:
            loss, aux = out, None
        return loss, (aux, a_covs)

    return wrapped


def _discover_tap_shapes(
    loss_fn: Callable[..., Any],
    specs: dict[str, LayerSpec],
    params: Any,
    args: tuple[Any, ...],
    kwargs: dict[str, Any],
) -> dict[str, list[jax.ShapeDtypeStruct]]:
    """Abstractly trace the loss to find layer output shapes for this batch."""
    shapes: dict[str, list[jax.ShapeDtypeStruct]] = {}

    def interceptor(next_fun, cargs, ckwargs, context):  # type: ignore[no-untyped-def]
        module = context.module
        if context.method_name != '__call__' or not cargs:
            return next_fun(*cargs, **ckwargs)
        name = module_path_name(module)
        y = next_fun(*cargs, **ckwargs)
        if name in specs and hasattr(y, 'shape'):
            shapes.setdefault(name, []).append(
                jax.ShapeDtypeStruct(y.shape, y.dtype),
            )
        return y

    def traced(p: Any, a: tuple[Any, ...], k: dict[str, Any]) -> Any:
        with nn.intercept_methods(interceptor):
            return loss_fn(p, *a, **k)

    jax.eval_shape(traced, params, args, kwargs)
    return shapes


def capture_value_and_grad(
    loss_fn: Callable[..., Any],
    specs: dict[str, LayerSpec],
    has_aux: bool = False,
    grad_scale: Callable[[], jax.Array | float] | None = None,
    remat: bool = False,
) -> Callable[..., tuple[Any, Any, Captured]]:
    """Build a jittable ``value_and_grad`` that also captures K-FAC factors.

    Args:
        loss_fn: ``loss_fn(params, *args, **kwargs) -> loss`` or
            ``(loss, aux)`` when ``has_aux``. Must call the flax modules
            named in ``specs`` somewhere inside (any nesting of ``apply``).
        specs: registered layers from ``register_modules``.
        has_aux: whether ``loss_fn`` returns an aux output.
        grad_scale: optional callable returning the AMP loss-scale; captured
            output-gradients are divided by it before the covariance, exactly
            like the reference's ``grad_scaler`` unscaling
            (``kfac/layers/base.py:359-373``). Two call conventions:

            - zero-argument (``lambda: scale``): evaluated at trace
              time -- under ``jax.jit`` the value is BAKED INTO the
              compiled program as a constant. Correct for a fixed
              scale, or for eager per-step calls.
            - arg-taking (``lambda *args, **kwargs: ...``): invoked
              with ``loss_fn``'s post-``params`` arguments, so a scale
              threaded through the step as a TRACED input (e.g.
              ``step(..., (x, y, scale))`` with
              ``grad_scale=lambda x, y, scale: scale``) updates
              without retracing -- the jit-correct dynamic-loss-scale
              pattern (see ``examples.utils.DynamicLossScale``).
        remat: rematerialize the capture forward (``jax.checkpoint``):
            activations are recomputed during the backward instead of
            kept live alongside the capture transients -- trades FLOPs
            for the HBM headroom that bounds the largest single-batch
            capture (docs/PERF_NOTES.md "Remaining opportunities" #1).
            Numerics are unchanged.

    Returns:
        ``fn(params, *args, **kwargs) -> ((loss, aux), grads, captured)``
        where ``grads`` matches the params structure and ``captured`` maps
        layer name -> CapturedFactors. Fully jittable.
    """
    wrapped = _tapped_loss_fn(loss_fn, specs, has_aux)
    if remat:
        wrapped = jax.checkpoint(wrapped)

    # Tap shapes depend only on the abstract signature of the inputs, so
    # cache them by (treedef, leaf shapes/dtypes): repeated un-jitted calls
    # skip the extra eval_shape trace of loss_fn (it is free under jit --
    # one trace -- but doubles Python overhead per step when called eagerly).
    shape_cache: dict[Any, dict[str, list[jax.ShapeDtypeStruct]]] = {}

    def _abstract_sig(tree: Any) -> Any:
        leaves, treedef = jax.tree.flatten(tree)
        return treedef, tuple(
            (getattr(x, 'shape', None), str(getattr(x, 'dtype', type(x))))
            for x in leaves
        )

    def fn(
        params: Any,
        *args: Any,
        **kwargs: Any,
    ) -> tuple[tuple[jax.Array, Any], Any, Captured]:
        key = _abstract_sig((params, args, kwargs))
        tap_shapes = shape_cache.get(key)
        if tap_shapes is None:
            tap_shapes = _discover_tap_shapes(
                loss_fn, specs, params, args, kwargs,
            )
            shape_cache[key] = tap_shapes
        missing = set(specs) - set(tap_shapes)
        if missing:
            raise ValueError(
                f'Registered layers were not called in loss_fn: {missing}. '
                'Did the model structure change since registration?',
            )
        taps = {
            name: [jnp.zeros(s.shape, s.dtype) for s in lst]
            for name, lst in tap_shapes.items()
            if name in specs
        }
        grad_fn = jax.value_and_grad(wrapped, argnums=(0, 1), has_aux=True)
        (loss, (aux, a_covs)), (gparams, gtaps) = grad_fn(
            params,
            taps,
            *args,
            **kwargs,
        )
        scale = (
            None
            if grad_scale is None
            else (
                grad_scale(*args, **kwargs)
                if _takes_args(grad_scale)
                else grad_scale()
            )
        )
        if scale is not None and jnp.ndim(scale) != 0:
            # A non-scalar here means the grad_scale callable bound a
            # batch array (wrong call convention) -- fail loudly at
            # trace time instead of producing silently wrong factors.
            raise ValueError(
                'grad_scale must return a scalar loss scale; got shape '
                f'{jnp.shape(scale)}. An arg-taking grad_scale receives '
                "loss_fn's post-params arguments -- did it bind a batch "
                'array?',
            )
        captured: Captured = {}
        for name, spec in specs.items():
            helper = spec.helper
            a_list = a_covs[name]
            g_list = gtaps[name]
            a_fac = sum(a_list) / len(a_list)
            if scale is not None:
                g_list = [g / scale for g in g_list]
            g_fac = sum(
                helper.get_g_factor(g) for g in g_list
            ) / len(g_list)
            captured[name] = CapturedFactors(a=a_fac, g=g_fac)
        return (loss, aux), gparams, captured

    return fn
