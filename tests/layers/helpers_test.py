"""Unit tests for layer helpers (counterpart of reference
``tests/layers/modules_test.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.layers.helpers import LinearHelper


def test_linear_shapes() -> None:
    h = LinearHelper(in_features=5, out_features=3, has_bias=True)
    assert h.a_factor_shape == (6, 6)
    assert h.g_factor_shape == (3, 3)
    assert h.grad_shape == (3, 6)
    h2 = LinearHelper(in_features=5, out_features=3, has_bias=False)
    assert h2.a_factor_shape == (5, 5)
    assert h2.grad_shape == (3, 5)


def test_linear_a_factor_closed_form() -> None:
    h = LinearHelper(in_features=2, out_features=1, has_bias=True)
    a = jnp.array([[1.0, 2.0]])
    out = np.asarray(h.get_a_factor(a))
    # row with bias: [1, 2, 1]; cov = outer/1
    expected = np.outer([1, 2, 1], [1, 2, 1]).astype(np.float32)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_linear_g_factor_folds_leading_dims() -> None:
    h = LinearHelper(in_features=4, out_features=3, has_bias=True)
    g = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3))
    out = np.asarray(h.get_g_factor(g))
    flat = np.asarray(g).reshape(-1, 3)
    np.testing.assert_allclose(
        out,
        flat.T @ flat / flat.shape[0],
        rtol=1e-5,
    )


@pytest.mark.parametrize('has_bias', [True, False])
def test_linear_grad_round_trip(has_bias: bool) -> None:
    h = LinearHelper(in_features=4, out_features=3, has_bias=has_bias)
    key = jax.random.PRNGKey(1)
    grads = {'kernel': jax.random.normal(key, (4, 3))}
    if has_bias:
        grads['bias'] = jax.random.normal(key, (3,))
    mat = h.get_grad(grads)
    assert mat.shape == h.grad_shape
    np.testing.assert_allclose(
        np.asarray(mat[:, :4] if has_bias else mat),
        np.asarray(grads['kernel']).T,
    )
    if has_bias:
        np.testing.assert_allclose(
            np.asarray(mat[:, -1]),
            np.asarray(grads['bias']),
        )
    restored = h.set_grad(grads, mat)
    for k in grads:
        np.testing.assert_allclose(
            np.asarray(restored[k]),
            np.asarray(grads[k]),
        )


@pytest.mark.parametrize('has_bias', [True, False])
def test_conv_grad_round_trip(has_bias: bool) -> None:
    h = Conv2dHelper(
        in_features=2 * 3 * 3,
        out_features=4,
        has_bias=has_bias,
        kernel_size=(3, 3),
    )
    key = jax.random.PRNGKey(2)
    grads = {'kernel': jax.random.normal(key, (3, 3, 2, 4))}
    if has_bias:
        grads['bias'] = jax.random.normal(key, (4,))
    mat = h.get_grad(grads)
    assert mat.shape == (4, 18 + int(has_bias))
    restored = h.set_grad(grads, mat)
    for k in grads:
        np.testing.assert_allclose(
            np.asarray(restored[k]),
            np.asarray(grads[k]),
        )


def test_conv_factor_shapes_and_scaling() -> None:
    h = Conv2dHelper(
        in_features=3 * 2 * 2,
        out_features=5,
        has_bias=True,
        kernel_size=(2, 2),
        strides=(1, 1),
        padding='VALID',
    )
    assert h.a_factor_shape == (13, 13)
    assert h.g_factor_shape == (5, 5)

    x = jnp.ones((2, 4, 4, 3))
    a_fac = np.asarray(h.get_a_factor(x))
    assert a_fac.shape == (13, 13)
    # all-ones input, VALID 2x2 patches -> rows all ones (12 features + 1)
    # then divided by spatial (3*3=9); cov = (ones/9)^T(ones/9)*... rows=18
    expected = np.ones((13, 13)) / 81.0
    np.testing.assert_allclose(a_fac, expected, rtol=1e-5)

    g = jnp.ones((2, 3, 3, 5))
    g_fac = np.asarray(h.get_g_factor(g))
    np.testing.assert_allclose(g_fac, np.ones((5, 5)) / 81.0, rtol=1e-5)


def test_conv_g_factor_matches_reference_semantics() -> None:
    """g factor == cov of (rows / spatial) with rows = N*oh*ow."""
    h = Conv2dHelper(
        in_features=4,
        out_features=3,
        has_bias=False,
        kernel_size=(1, 1),
    )
    g = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 2, 3))
    out = np.asarray(h.get_g_factor(g))
    flat = np.asarray(g).reshape(-1, 3) / 4.0
    np.testing.assert_allclose(
        out,
        flat.T @ flat / flat.shape[0],
        rtol=1e-5,
    )


@pytest.mark.parametrize('strides', [(1, 1), (2, 2)])
@pytest.mark.parametrize('padding', ['SAME', 'VALID'])
def test_conv_1x1_a_factor_matches_generic_patches(strides, padding) -> None:
    """The 1x1 fast path (strided slice, no patch op) == generic path."""
    h = Conv2dHelper(
        in_features=6,
        out_features=3,
        has_bias=True,
        kernel_size=(1, 1),
        strides=strides,
        padding=padding,
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 5, 6))
    fast = np.asarray(h.get_a_factor(x))

    p4 = jax.lax.conv_general_dilated_patches(
        x, (1, 1), strides, padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    spatial = p4.shape[1] * p4.shape[2]
    p = np.asarray(p4).reshape(-1, 6)
    p = np.concatenate([p, np.ones((p.shape[0], 1), p.dtype)], axis=1)
    ref = p.T @ p / (p.shape[0] * spatial**2)
    np.testing.assert_allclose(fast, ref, rtol=1e-5, atol=1e-7)
