"""A/B correctness tests: fused Pallas conv covariance vs XLA reference path.

Runs in Pallas interpret mode on CPU (the kernel itself targets TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from kfac_pytorch_tpu.layers.helpers import Conv2dHelper
from kfac_pytorch_tpu.ops.pallas.conv_cov import conv2d_a_factor_fused


@pytest.mark.parametrize('has_bias', [True, False])
@pytest.mark.parametrize(
    'shape,ks,strides,padding',
    [
        ((8, 8, 8, 3), (3, 3), (1, 1), 'SAME'),
        ((4, 10, 10, 2), (5, 5), (1, 1), 'VALID'),
        ((8, 8, 8, 3), (1, 1), (1, 1), 'VALID'),
    ],
)
def test_fused_matches_helper(shape, ks, strides, padding, has_bias) -> None:
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    helper = Conv2dHelper(
        in_features=ks[0] * ks[1] * shape[-1],
        out_features=4,
        has_bias=has_bias,
        kernel_size=ks,
        strides=strides,
        padding=padding,
    )
    expected = helper.get_a_factor(x)
    with pltpu.force_tpu_interpret_mode():
        out = conv2d_a_factor_fused(
            x, ks, strides, padding, has_bias=has_bias, batch_tile=4,
        )
    assert out.shape == expected.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=2e-5,
    )


def test_fused_batch_tile_validation() -> None:
    x = jnp.zeros((6, 8, 8, 2))
    with pytest.raises(ValueError):
        conv2d_a_factor_fused(x, (3, 3), batch_tile=4)
    with pytest.raises(ValueError):
        conv2d_a_factor_fused(jnp.zeros((4, 4)), (3, 3))
    with pytest.raises(NotImplementedError):
        conv2d_a_factor_fused(x, (3, 3), strides=(2, 2))
