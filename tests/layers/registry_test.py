"""Unit tests for layer registration (counterpart of reference
``tests/layers/register_test.py``)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kfac_pytorch_tpu.layers.registry import any_match
from kfac_pytorch_tpu.layers.registry import register_modules
from kfac_pytorch_tpu.models import LeNet
from kfac_pytorch_tpu.models import TinyModel


def test_any_match() -> None:
    assert any_match('model/decoder/dense', ['decoder'])
    assert any_match('Dense', ['Den'])
    assert not any_match('conv', ['dense', 'linear'])
    assert not any_match('x', [])


def test_register_tiny_model() -> None:
    x = jnp.zeros((4, 8))
    specs = register_modules(TinyModel(), x)
    assert len(specs) == 2
    names = list(specs)
    assert names == ['Dense_0', 'Dense_1']
    s0 = specs['Dense_0']
    assert s0.module_type == 'linear'
    assert s0.a_shape == (9, 9)  # 8 in + bias
    assert s0.g_shape == (20, 20)
    s1 = specs['Dense_1']
    assert s1.a_shape == (21, 21)
    assert s1.g_shape == (10, 10)


def test_register_lenet() -> None:
    x = jnp.zeros((2, 32, 32, 1))
    specs = register_modules(LeNet(), x)
    types = [s.module_type for s in specs.values()]
    assert types == ['conv2d', 'conv2d', 'linear', 'linear', 'linear']
    conv0 = specs['Conv_0']
    assert conv0.a_shape == (1 * 5 * 5 + 1,) * 2
    assert conv0.g_shape == (6, 6)


def test_register_skip_by_name_and_class() -> None:
    x = jnp.zeros((4, 8))
    specs = register_modules(TinyModel(), x, skip_layers=['Dense_0'])
    assert list(specs) == ['Dense_1']
    specs = register_modules(TinyModel(), x, skip_layers=['Dense'])
    assert specs == {}


class SharedLayerModel(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = nn.Dense(8)
        x = dense(x)
        x = dense(x)  # same module applied twice
        return x


def test_register_counts_repeated_calls() -> None:
    x = jnp.zeros((4, 8))
    specs = register_modules(SharedLayerModel(), x)
    assert len(specs) == 1
    (spec,) = specs.values()
    assert spec.n_calls == 2


class UnsupportedOnly(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm()(x)


def test_register_no_supported_layers() -> None:
    specs = register_modules(UnsupportedOnly(), jnp.zeros((2, 4)))
    assert specs == {}
