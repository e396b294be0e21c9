"""Exactness tests for the patch-free rowgram conv A-factor.

``conv2d_a_factor_rowgram`` must match the patches path bit-for-tolerance
across every conv geometry (it is an exact reformulation, not a Toeplitz
approximation) -- including strided and asymmetric cases the fused Pallas
kernel cannot handle.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.ops.covariance import append_bias_ones
from kfac_pytorch_tpu.ops.covariance import conv2d_a_factor_rowgram
from kfac_pytorch_tpu.ops.covariance import extract_conv2d_patches
from kfac_pytorch_tpu.ops.covariance import get_cov

CASES = [
    ((4, 8, 8, 3), (3, 3), (1, 1), 'SAME', True),
    ((4, 8, 8, 5), (3, 3), (1, 1), 'SAME', False),
    ((4, 9, 7, 4), (3, 3), (2, 2), 'SAME', True),
    ((4, 8, 8, 3), (3, 3), (1, 1), 'VALID', True),
    ((4, 8, 8, 3), (2, 2), (2, 2), 'VALID', True),
    ((2, 10, 10, 3), (5, 5), (1, 1), 2, True),
    ((4, 8, 8, 3), (1, 1), (1, 1), 'SAME', True),
    ((4, 11, 8, 3), (3, 3), (2, 1), 1, False),
]


def patches_factor(x, ks, st, pad, bias):
    p4 = extract_conv2d_patches(x, ks, st, pad)
    spatial = p4.shape[1] * p4.shape[2]
    p = p4.reshape(-1, p4.shape[-1])
    if bias:
        p = append_bias_ones(p)
    return get_cov(p, scale=float(p.shape[0]) * spatial**2)


@pytest.mark.parametrize('shape,ks,st,pad,bias', CASES)
def test_rowgram_matches_patches(shape, ks, st, pad, bias) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    a = patches_factor(x, ks, st, pad, bias)
    b = conv2d_a_factor_rowgram(x, ks, st, pad, bias)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5 * scale,
    )


def test_helper_method_switch() -> None:
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
    b = mk('rowgram').get_a_factor(x)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5 * scale,
    )
