"""Exactness tests for the conv-weight-gradient conv A-factor.

``conv2d_a_factor_convgrad`` is an exact reformulation of the im2col
covariance (no patch slab); it must match the patches path within
float tolerance for every conv geometry, including strided, asymmetric,
and explicitly padded cases.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.ops.covariance import conv2d_a_factor_convgrad
from tests.ops.rowgram_test import CASES
from tests.ops.rowgram_test import patches_factor


@pytest.mark.parametrize('shape,ks,st,pad,bias', CASES)
def test_convgrad_matches_patches(shape, ks, st, pad, bias) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    a = patches_factor(x, ks, st, pad, bias)
    b = conv2d_a_factor_convgrad(x, ks, st, pad, bias)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5 * scale,
    )


def test_helper_method_convgrad() -> None:
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 3)), jnp.float32)
    mk = lambda m: Conv2dHelper(  # noqa: E731
        in_features=27,
        out_features=8,
        has_bias=True,
        kernel_size=(3, 3),
        strides=(1, 1),
        padding='SAME',
        a_factor_method=m,
    )
    a = mk('patches').get_a_factor(x)
    b = mk('convgrad').get_a_factor(x)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5 * scale,
    )


def test_helper_convgrad_1x1_uses_fast_path() -> None:
    # 1x1 kernels bypass convgrad for the strided-slice Gram fast path;
    # results must agree with the patches path regardless.
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 5)), jnp.float32)
    mk = lambda m: Conv2dHelper(  # noqa: E731
        in_features=5,
        out_features=8,
        has_bias=True,
        kernel_size=(1, 1),
        strides=(2, 2),
        padding='SAME',
        a_factor_method=m,
    )
    a = mk('patches').get_a_factor(x)
    b = mk('convgrad').get_a_factor(x)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5 * scale,
    )

def test_convgrad_matches_patches_bf16() -> None:
    # Production setting: bf16 compute dtype (f32 accumulate). Both paths
    # round the activation identically before contracting, so they agree
    # to bf16 resolution.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 10, 10, 6)), jnp.float32)
    mk = lambda m: Conv2dHelper(  # noqa: E731
        in_features=54,
        out_features=8,
        has_bias=True,
        kernel_size=(3, 3),
        strides=(2, 2),
        padding='SAME',
        a_factor_method=m,
        compute_dtype='bfloat16',
    )
    a = mk('patches').get_a_factor(x)
    b = mk('convgrad').get_a_factor(x)
    assert a.dtype == b.dtype
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=2e-2 * scale,
    )


def test_preconditioner_conv_a_factor_method_knob() -> None:
    # conv_a_factor_method threads ctor -> register_modules -> helper.
    import flax.linen as nn
    import jax

    import kfac_pytorch_tpu as ktpu

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(4, (3, 3))(x)
            return x.reshape(x.shape[0], -1)

    x = jnp.zeros((2, 8, 8, 3))
    p = ktpu.KFACPreconditioner(
        Net(), example_args=(x,), conv_a_factor_method='convgrad',
    )
    (spec,) = [
        s for s in p._specs.values() if s.module_type == 'conv2d'
    ]
    assert spec.helper.a_factor_method == 'convgrad'
    with pytest.raises(ValueError, match='conv_a_factor_method'):
        ktpu.KFACPreconditioner(
            Net(), example_args=(x,), conv_a_factor_method='bogus',
        )
