"""Layer discovery/registration for flax models.

TPU-native counterpart of the reference's module registry
(``kfac/layers/register.py:15-95`` of gpauloski/kfac-pytorch). Instead of
walking a mutable module tree and attaching hooks, we trace the model once
under ``jax.eval_shape`` with a flax method interceptor and record a static
``LayerSpec`` for every supported module that is actually called. The specs
drive state initialization, work assignment, and runtime capture.

Skip semantics match the reference: a layer is skipped if any regex in
``skip_layers`` matches either its path name or its module class name.
"""

from __future__ import annotations

import dataclasses
import re
from collections.abc import Callable
from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.layers.helpers import LayerHelper
from kfac_pytorch_tpu.layers.helpers import LinearHelper

__all__ = [
    'LayerSpec',
    'KNOWN_MODULES',
    'any_match',
    'module_path_name',
    'get_module_helper',
    'register_modules',
]

KNOWN_MODULES = {'linear', 'conv2d'}


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """Static description of one registered layer."""

    name: str  # '/'-joined flax module path; doubles as the state key
    module_type: str  # member of KNOWN_MODULES
    helper: LayerHelper
    n_calls: int = 1  # times the module is invoked per forward pass
    # Tensor-parallel layout of the layer's kernel over the 'model' mesh
    # axis: None (replicated), 'column' (output dim sharded), or 'row'
    # (input dim sharded). Mirrors the reference's Column/RowParallel
    # registration (kfac/gpt_neox/preconditioner.py:450-515).
    tp: str | None = None

    @property
    def a_shape(self) -> tuple[int, int]:
        return self.helper.a_factor_shape

    @property
    def g_shape(self) -> tuple[int, int]:
        return self.helper.g_factor_shape


def any_match(query: str, patterns: Sequence[str]) -> bool:
    """True if any regex in ``patterns`` matches anywhere in ``query``.

    Mirrors reference ``kfac/layers/register.py:46-54`` (``re.search``
    semantics, not ``match``).
    """
    return any(re.search(p, query) for p in patterns)


def module_path_name(module: nn.Module) -> str:
    """Stable string name for a flax module instance during apply."""
    return '/'.join(str(p) for p in module.path)


def _tuple2(v: Any) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(x) for x in v)
    if len(t) == 1:
        return (t[0], t[0])
    return t  # type: ignore[return-value]


def get_module_helper(
    module: nn.Module,
    input_shape: tuple[int, ...],
    factor_dtype: Any = None,
    compute_dtype: Any = None,
    conv_a_factor_method: str = 'patches',
    gram_method: str = 'full',
) -> tuple[str, LayerHelper] | None:
    """Build a helper for a supported flax module, else None.

    Counterpart of reference ``kfac/layers/register.py:36-43``. Supported
    types: ``nn.Dense`` ('linear') and 2D ``nn.Conv`` ('conv2d').
    """
    from kfac_pytorch_tpu.layers.tp import ColumnParallelDense
    from kfac_pytorch_tpu.layers.tp import RowParallelDense

    if isinstance(module, (nn.Dense, ColumnParallelDense, RowParallelDense)):
        return (
            'linear',
            LinearHelper(
                # TP modules declare GLOBAL param shapes, and their
                # inputs/outputs are full-width at the capture points
                # (gathered pre-activation / psum'd partials), so the
                # factor dims are the logical dims either way -- the
                # reference instead scales sharded dims by the TP world
                # size (kfac/gpt_neox/modules.py:42-62).
                in_features=int(input_shape[-1]),
                out_features=int(module.features),
                has_bias=bool(module.use_bias),
                factor_dtype=factor_dtype,
                compute_dtype=compute_dtype,
                gram_method=gram_method,
            ),
        )
    if isinstance(module, nn.Conv):
        kernel_size = tuple(int(k) for k in module.kernel_size)
        if len(kernel_size) != 2 or len(input_shape) != 4:
            return None  # only 2D convs on NHWC inputs are supported
        strides = _tuple2(module.strides if module.strides is not None else 1)
        in_ch = int(input_shape[-1])
        if module.feature_group_count != 1:
            return None  # grouped/depthwise convs not Kronecker-factorable
        return (
            'conv2d',
            Conv2dHelper(
                in_features=in_ch * kernel_size[0] * kernel_size[1],
                out_features=int(module.features),
                has_bias=bool(module.use_bias),
                factor_dtype=factor_dtype,
                compute_dtype=compute_dtype,
                kernel_size=kernel_size,  # type: ignore[arg-type]
                strides=strides,
                padding=module.padding,
                a_factor_method=conv_a_factor_method,
                gram_method=gram_method,
            ),
        )
    return None


def register_modules(
    model: nn.Module,
    *example_args: Any,
    skip_layers: Sequence[str] = (),
    factor_dtype: Any = None,
    factor_compute_dtype: Any = None,
    conv_a_factor_method: str = 'patches',
    gram_method: str = 'full',
    init_fn: Callable[..., Any] | None = None,
    **example_kwargs: Any,
) -> dict[str, LayerSpec]:
    """Discover supported layers by abstractly tracing ``model``.

    Args:
        model: flax module to scan.
        *example_args: example inputs for ``model.init`` (shapes only; the
            trace runs under ``jax.eval_shape`` so no FLOPs are spent).
        skip_layers: regex patterns applied to the layer path name and the
            module class name; a match skips registration (mirrors reference
            ``register_modules``, ``kfac/layers/register.py:57-95``).
        factor_dtype: optional dtype override for stored factors.
        conv_a_factor_method: A-factor algorithm for conv layers
            ('patches' | 'slices' | 'convgrad' | 'rowgram'); see
            ``Conv2dHelper.a_factor_method``.
        gram_method: Gram contraction scheme for the plain covariances
            ('full' | 'tri' | 'auto'); see ``LayerHelper.gram_method``.
        init_fn: optional replacement for ``model.init`` -- a callable
            invoked (abstractly) to run one forward pass. Use when ``init``
            needs rngs/mutable collections beyond the default.
        **example_kwargs: forwarded to the init call.

    Returns:
        dict mapping layer name -> LayerSpec, in call order.
    """
    specs: dict[str, LayerSpec] = {}
    counts: dict[str, int] = {}

    def interceptor(next_fun, args, kwargs, context):  # type: ignore[no-untyped-def]
        module = context.module
        if context.method_name != '__call__' or not args:
            return next_fun(*args, **kwargs)
        name = module_path_name(module)
        cls_name = type(module).__name__
        if any_match(name, skip_layers) or any_match(cls_name, skip_layers):
            return next_fun(*args, **kwargs)
        x = args[0]
        if not hasattr(x, 'shape'):
            return next_fun(*args, **kwargs)
        helper_info = get_module_helper(
            module,
            tuple(x.shape),
            factor_dtype,
            factor_compute_dtype,
            conv_a_factor_method=conv_a_factor_method,
            gram_method=gram_method,
        )
        if helper_info is not None:
            module_type, helper = helper_info
            if name in specs:
                counts[name] += 1
                specs[name] = dataclasses.replace(
                    specs[name],
                    n_calls=counts[name],
                )
            else:
                from kfac_pytorch_tpu.layers.tp import ColumnParallelDense
                from kfac_pytorch_tpu.layers.tp import RowParallelDense

                tp = None
                if isinstance(module, ColumnParallelDense):
                    tp = 'column'
                elif isinstance(module, RowParallelDense):
                    tp = 'row'
                counts[name] = 1
                specs[name] = LayerSpec(
                    name=name,
                    module_type=module_type,
                    helper=helper,
                    tp=tp,
                )
        return next_fun(*args, **kwargs)

    if init_fn is None:

        def default_init() -> Any:
            return model.init(
                jax.random.PRNGKey(0),
                *example_args,
                **example_kwargs,
            )

        trace_fn = default_init
    else:

        def trace_fn() -> Any:
            return init_fn(*example_args, **example_kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(trace_fn)

    return specs
