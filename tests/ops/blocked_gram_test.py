"""Exactness tests for the lower-block-triangle Gram contraction.

``get_cov_blocked`` is an exact reformulation of the symmetric
``get_cov`` path (reference ``kfac/layers/utils.py:18-59`` of
gpauloski/kfac-pytorch): the strictly upper blocks are mirrored instead
of recomputed, saving ``(nb-1)/(2*nb)`` of the contraction FLOPs. It
must match the full Gram within rounding for every chunking, dtype, and
scale, and through every helper Gram call site (``gram_method='tri'``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.layers.helpers import LinearHelper
from kfac_pytorch_tpu.ops.covariance import get_cov
from kfac_pytorch_tpu.ops.covariance import get_cov_blocked


@pytest.mark.parametrize('rows,dim', [(64, 7), (128, 33), (256, 130), (50, 2)])
@pytest.mark.parametrize('nb', [2, 3, 4])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_blocked_matches_full(rows, dim, nb, dtype) -> None:
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((rows, dim)), dtype)
    full = get_cov(a, scale=123.0)
    blk = get_cov_blocked(a, scale=123.0, nb=nb)
    assert blk.dtype == full.dtype
    assert blk.shape == full.shape
    scale = float(jnp.max(jnp.abs(full)))
    np.testing.assert_allclose(
        np.asarray(blk), np.asarray(full), atol=3e-6 * scale,
    )
    # The blocked result is exactly symmetric by construction.
    assert bool(jnp.all(blk == blk.T))


def test_blocked_degenerate_falls_back() -> None:
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(get_cov_blocked(a, nb=8)),
        np.asarray(get_cov(a)),
        atol=1e-6,
    )


def test_blocked_rejects_non_2d() -> None:
    with pytest.raises(ValueError, match='2 dimensions'):
        get_cov_blocked(jnp.ones((2, 3, 4)))


@pytest.mark.parametrize('method', ['tri', 'auto'])
def test_linear_helper_tri(method) -> None:
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((32, 20)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((32, 12)), jnp.float32)
    mk = lambda m: LinearHelper(  # noqa: E731
        in_features=20, out_features=12, has_bias=True, gram_method=m,
    )
    ref, tri = mk('full'), mk(method)
    np.testing.assert_allclose(
        np.asarray(tri.get_a_factor(a)),
        np.asarray(ref.get_a_factor(a)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tri.get_g_factor(g)),
        np.asarray(ref.get_g_factor(g)),
        atol=1e-5,
    )


def test_conv_helper_tri() -> None:
    # 1x1 strided conv exercises the A fast path; G always uses _gram.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 24)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((4, 4, 4, 16)), jnp.float32)
    mk = lambda m: Conv2dHelper(  # noqa: E731
        in_features=24,
        out_features=16,
        has_bias=True,
        kernel_size=(1, 1),
        strides=(2, 2),
        gram_method=m,
    )
    ref, tri = mk('full'), mk('tri')
    np.testing.assert_allclose(
        np.asarray(tri.get_a_factor(x)),
        np.asarray(ref.get_a_factor(x)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tri.get_g_factor(gy)),
        np.asarray(ref.get_g_factor(gy)),
        atol=1e-5,
    )


def test_auto_threshold_uses_tri_for_wide_factors() -> None:
    # 'auto' currently resolves to 'full' (the on-chip tri-vs-full A/B
    # is erratic; see LayerHelper.gram_method) but must stay numerically
    # exact on wide factors either way.
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.standard_normal((64, 600)), jnp.float32)
    h_auto = LinearHelper(
        in_features=600, out_features=8, has_bias=False, gram_method='auto',
    )
    h_full = LinearHelper(
        in_features=600, out_features=8, has_bias=False, gram_method='full',
    )
    fa, fb = h_auto.get_a_factor(a), h_full.get_a_factor(a)
    scale = float(jnp.max(jnp.abs(fb)))
    np.testing.assert_allclose(
        np.asarray(fa), np.asarray(fb), atol=3e-6 * scale,
    )
