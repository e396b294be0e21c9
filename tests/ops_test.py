"""Unit tests for covariance ops (counterpart of reference
``tests/layers/utils_test.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.ops.covariance import append_bias_ones
from kfac_pytorch_tpu.ops.covariance import conv2d_out_shape
from kfac_pytorch_tpu.ops.covariance import extract_conv2d_patches
from kfac_pytorch_tpu.ops.covariance import get_cov
from kfac_pytorch_tpu.ops.covariance import reshape_data


def test_append_bias_ones() -> None:
    x = jnp.zeros((4, 6))
    out = append_bias_ones(x)
    assert out.shape == (4, 7)
    np.testing.assert_allclose(out[:, -1], np.ones(4))
    np.testing.assert_allclose(out[:, :-1], np.zeros((4, 6)))

    x3 = jnp.ones((2, 3, 5))
    out3 = append_bias_ones(x3)
    assert out3.shape == (2, 3, 6)
    np.testing.assert_allclose(np.asarray(out3), np.ones((2, 3, 6)))


def test_get_cov_closed_form() -> None:
    a = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    expected = np.asarray(a).T @ np.asarray(a) / 2.0
    np.testing.assert_allclose(np.asarray(get_cov(a)), expected, rtol=1e-6)

    # explicit scale
    out = get_cov(a, scale=4.0)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(a).T @ np.asarray(a) / 4.0,
        rtol=1e-6,
    )

    # two-arg form is a^T b / N, not symmetrized
    b = jnp.array([[0.0, 1.0], [1.0, 0.0]])
    out2 = get_cov(a, b)
    np.testing.assert_allclose(
        np.asarray(out2),
        np.asarray(a).T @ np.asarray(b) / 2.0,
        rtol=1e-6,
    )


def test_get_cov_symmetric() -> None:
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (16, 8))
    cov = np.asarray(get_cov(a))
    np.testing.assert_allclose(cov, cov.T, rtol=1e-6)


def test_get_cov_errors() -> None:
    with pytest.raises(ValueError):
        get_cov(jnp.zeros((2, 2, 2)))
    with pytest.raises(ValueError):
        get_cov(jnp.zeros((2, 2)), jnp.zeros((3, 2)))


def test_reshape_data() -> None:
    parts = [jnp.ones((2, 3)), jnp.zeros((2, 3))]
    out = reshape_data(parts)
    assert out.shape == (4, 3)

    out = reshape_data(parts, batch_first=False)
    assert out.shape == (2, 6)

    parts3 = [jnp.ones((2, 4, 3))]
    out = reshape_data(parts3, collapse_dims=True)
    assert out.shape == (8, 3)


@pytest.mark.parametrize('padding', ['VALID', 'SAME', 1, [(1, 2), (0, 1)]])
@pytest.mark.parametrize('strides', [(1, 1), (2, 2), (1, 2)])
def test_extract_patches_matches_conv(padding, strides) -> None:
    """Patch extraction must reproduce conv as patches @ flattened-kernel.

    This pins the (kh, kw, c) feature ordering to the flax kernel
    flattening order, the invariant the Conv2d factor math relies on.
    """
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (2, 9, 10, 3))
    kernel = jax.random.normal(k2, (3, 4, 3, 5))  # (kh, kw, in, out)

    if isinstance(padding, str):
        conv_pad = padding
    elif isinstance(padding, int):
        conv_pad = [(padding, padding), (padding, padding)]
    else:
        conv_pad = padding

    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=conv_pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    patches = extract_conv2d_patches(x, (3, 4), strides, padding)
    assert patches.shape[:3] == y.shape[:3]
    y2 = patches @ kernel.reshape(-1, kernel.shape[-1])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-4)

    out_shape = conv2d_out_shape((9, 10), (3, 4), strides, padding)
    assert y.shape[1:3] == out_shape


def test_extract_patches_bad_input() -> None:
    with pytest.raises(ValueError):
        extract_conv2d_patches(jnp.zeros((2, 3, 4)), (2, 2))
