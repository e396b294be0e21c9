"""Exactness tests for the concat-of-slices conv A-factor.

``conv2d_a_factor_slices`` is the same math as the patches path with a
fusion-friendlier slab layout (see ops/covariance.py docstring); it must
match the patches factor within float tolerance on every geometry,
including strided / asymmetric / explicitly padded cases. Also pins the
'auto' dispatch rule: small-channel convs take 'slices', wide ones
'convgrad', and both resolve to the same values as 'patches'.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.ops.covariance import conv2d_a_factor_slices
from tests.ops.rowgram_test import CASES
from tests.ops.rowgram_test import patches_factor


@pytest.mark.parametrize('shape,ks,st,pad,bias', CASES)
def test_slices_matches_patches(shape, ks, st, pad, bias) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    a = patches_factor(x, ks, st, pad, bias)
    b = conv2d_a_factor_slices(x, ks, st, pad, bias)
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5 * scale,
    )


@pytest.mark.parametrize('c,expect_like', [(3, 'slices'), (32, 'convgrad')])
def test_auto_dispatch_matches_patches(c: int, expect_like: str) -> None:
    """'auto' must resolve to an exact method on both sides of the
    channel threshold (values equal to the explicit patches method)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, c)), jnp.float32)
    mk = lambda m: Conv2dHelper(  # noqa: E731
        in_features=9 * c,
        out_features=8,
        has_bias=True,
        kernel_size=(3, 3),
        strides=(1, 1),
        padding='SAME',
        a_factor_method=m,
    )
    auto = mk('auto').get_a_factor(x)
    ref = mk('patches').get_a_factor(x)
    like = mk(expect_like).get_a_factor(x)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(like), atol=1e-6)


def test_auto_1x1_uses_fast_path() -> None:
    """1x1 kernels bypass method dispatch entirely (strided-slice Gram)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 6)), jnp.float32)
    mk = lambda m: Conv2dHelper(  # noqa: E731
        in_features=6,
        out_features=8,
        has_bias=True,
        kernel_size=(1, 1),
        strides=(2, 2),
        padding='SAME',
        a_factor_method=m,
    )
    np.testing.assert_allclose(
        np.asarray(mk('auto').get_a_factor(x)),
        np.asarray(mk('patches').get_a_factor(x)),
        atol=1e-6,
    )


@pytest.mark.parametrize('pad_to', [4, 8, 16])
@pytest.mark.parametrize('bias', [True, False])
def test_pad_widths_all_exact(pad_to: int, bias: bool) -> None:
    """Every channel-pad width the HBM gate can pick (cp=4 for giant
    slabs, cp=8 default) must stay exact, with and without bias."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 8, 3)), jnp.float32)
    a = patches_factor(x, (3, 3), (2, 1), 'SAME', bias)
    b = conv2d_a_factor_slices(
        x, (3, 3), (2, 1), 'SAME', bias, pad_to=pad_to,
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
