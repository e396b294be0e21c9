"""Tests for the hook-free statistics capture (the tap trick)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kfac_pytorch_tpu.capture import accumulate_captures
from kfac_pytorch_tpu.capture import capture_value_and_grad
from kfac_pytorch_tpu.layers.registry import register_modules
from kfac_pytorch_tpu.models import TinyModel


def _setup(batch: int = 4, din: int = 8):
    model = TinyModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, din))
    y = jax.random.normal(jax.random.PRNGKey(1), (batch, 10))
    params = model.init(jax.random.PRNGKey(2), x)
    specs = register_modules(model, x)

    def loss_fn(p, bx, by):
        out = model.apply(p, bx)
        return jnp.mean((out - by) ** 2)

    return model, params, specs, loss_fn, x, y


def test_grads_match_plain_value_and_grad() -> None:
    model, params, specs, loss_fn, x, y = _setup()
    fn = capture_value_and_grad(loss_fn, specs)
    (loss, aux), grads, captured = fn(params, x, y)
    loss2, grads2 = jax.value_and_grad(loss_fn)(params, x, y)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
        ),
        grads,
        grads2,
    )
    assert aux is None
    assert set(captured) == set(specs)


def test_captured_g_matches_manual_output_grad() -> None:
    """The tap-captured G factor equals cov of analytically computed dL/dy."""
    model, params, specs, loss_fn, x, y = _setup()
    fn = capture_value_and_grad(loss_fn, specs)
    _, _, captured = fn(params, x, y)

    # dL/dy for the final layer of mean((out-y)^2): 2*(out-y)/out.size
    out = model.apply(params, x)
    g_manual = 2.0 * (out - y) / out.size
    spec = specs['Dense_1']
    expected_g = spec.helper.get_g_factor(g_manual)
    np.testing.assert_allclose(
        np.asarray(captured['Dense_1'].g),
        np.asarray(expected_g),
        atol=1e-7,
    )

    # A factor of the first layer is cov of the raw input (+ bias ones)
    expected_a = specs['Dense_0'].helper.get_a_factor(x)
    np.testing.assert_allclose(
        np.asarray(captured['Dense_0'].a),
        np.asarray(expected_a),
        atol=1e-6,
    )


def test_capture_under_jit() -> None:
    model, params, specs, loss_fn, x, y = _setup()
    fn = jax.jit(capture_value_and_grad(loss_fn, specs))
    (loss, _), grads, captured = fn(params, x, y)
    assert jnp.isfinite(loss)
    for name, cf in captured.items():
        assert cf.a.shape == specs[name].a_shape
        assert cf.g.shape == specs[name].g_shape


def test_capture_with_aux() -> None:
    model, params, specs, _, x, y = _setup()

    def loss_fn(p, bx, by):
        out = model.apply(p, bx)
        return jnp.mean((out - by) ** 2), {'n': out.shape[0]}

    fn = capture_value_and_grad(loss_fn, specs, has_aux=True)
    (loss, aux), _, _ = fn(params, x, y)
    assert aux == {'n': 4}


def test_capture_with_grad_scale() -> None:
    model, params, specs, loss_fn, x, y = _setup()
    base = capture_value_and_grad(loss_fn, specs)
    scaled = capture_value_and_grad(
        loss_fn,
        specs,
        grad_scale=lambda: 4.0,
    )
    _, _, c1 = base(params, x, y)
    _, _, c2 = scaled(params, x, y)
    # G covariances scale by 1/scale^2; A unchanged.
    np.testing.assert_allclose(
        np.asarray(c2['Dense_1'].g) * 16.0,
        np.asarray(c1['Dense_1'].g),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(c2['Dense_0'].a),
        np.asarray(c1['Dense_0'].a),
        rtol=1e-6,
    )


def test_capture_with_traced_grad_scale_under_jit() -> None:
    """Arg-taking grad_scale: the scale rides through a jitted step.

    The jit-correct dynamic-loss-scale pattern: a zero-arg grad_scale
    is a trace-time constant, but an arg-taking one receives loss_fn's
    post-params arguments, so a scale passed as a traced input updates
    WITHOUT retracing (capture.py `_takes_args`).
    """
    model, params, specs, _, x, y = _setup()

    def loss_fn(p, bx, by, scale):
        out = model.apply(p, bx)
        return jnp.mean((out - by) ** 2) * scale

    fn = jax.jit(
        capture_value_and_grad(
            loss_fn,
            specs,
            grad_scale=lambda bx, by, scale: scale,
        ),
    )
    _, _, c1 = fn(params, x, y, jnp.float32(1.0))
    # Same COMPILED function, new traced scale value: captured factors
    # must be fully unscaled (identical to scale=1), not divided by the
    # baked-in first value.
    _, _, c2 = fn(params, x, y, jnp.float32(8.0))
    np.testing.assert_allclose(
        np.asarray(c2['Dense_1'].g),
        np.asarray(c1['Dense_1'].g),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(c2['Dense_0'].a),
        np.asarray(c1['Dense_0'].a),
        rtol=1e-6,
    )


def test_capture_default_only_grad_scale_is_zero_arg() -> None:
    """A grad_scale whose positional params ALL have defaults keeps the
    zero-arg trace-time-constant convention (capture.py `_takes_args`):
    invoking ``def scale(s=4.0)`` with the batch args would silently
    bind the batch array as the loss scale."""
    model, params, specs, loss_fn, x, y = _setup()
    base = capture_value_and_grad(loss_fn, specs)

    def default_scale(s: float = 4.0) -> float:
        return s

    scaled = capture_value_and_grad(
        loss_fn, specs, grad_scale=default_scale,
    )
    _, _, c1 = base(params, x, y)
    _, _, c2 = scaled(params, x, y)
    np.testing.assert_allclose(
        np.asarray(c2['Dense_1'].g) * 16.0,
        np.asarray(c1['Dense_1'].g),
        rtol=1e-5,
    )
    # **kwargs-only likewise stays zero-arg (would TypeError if invoked
    # with positional batch args).
    kwonly = capture_value_and_grad(
        loss_fn, specs, grad_scale=lambda **kw: 4.0,
    )
    _, _, c3 = kwonly(params, x, y)
    np.testing.assert_allclose(
        np.asarray(c3['Dense_1'].g),
        np.asarray(c2['Dense_1'].g),
        rtol=1e-6,
    )


def test_capture_nonscalar_grad_scale_raises() -> None:
    """An arg-taking grad_scale that binds a batch array fails loudly at
    trace time instead of producing silently wrong covariances."""
    model, params, specs, loss_fn, x, y = _setup()
    fn = capture_value_and_grad(
        loss_fn, specs, grad_scale=lambda bx, by: bx,
    )
    with pytest.raises(ValueError, match='scalar loss scale'):
        fn(params, x, y)


class SharedLayerModel(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = nn.Dense(8)
        return dense(dense(x))


def test_capture_shared_module_accumulates() -> None:
    """A module called twice contributes the mean of per-call factors."""
    model = SharedLayerModel()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    params = model.init(jax.random.PRNGKey(1), x)
    specs = register_modules(model, x)
    assert next(iter(specs.values())).n_calls == 2

    def loss_fn(p, bx):
        return jnp.mean(model.apply(p, bx) ** 2)

    fn = capture_value_and_grad(loss_fn, specs)
    _, grads, captured = fn(params, x)
    (name,) = specs
    helper = specs[name].helper

    # Manual: first call input is x, second call input is dense(x).
    mid = model.apply(params, x)  # == dense(dense(x)); need first layer out
    dense_params = {'params': params['params']['Dense_0']}
    first_out = nn.Dense(8).apply(dense_params, x)
    a1 = helper.get_a_factor(x)
    a2 = helper.get_a_factor(first_out)
    np.testing.assert_allclose(
        np.asarray(captured[name].a),
        np.asarray((a1 + a2) / 2.0),
        atol=1e-6,
    )
    # grads still match plain autodiff
    grads2 = jax.grad(loss_fn)(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
        ),
        grads,
        grads2,
    )
    del mid


def test_accumulate_captures() -> None:
    model, params, specs, loss_fn, x, y = _setup()
    fn = capture_value_and_grad(loss_fn, specs)
    _, _, c1 = fn(params, x, y)
    _, _, c2 = fn(params, 2 * x, y)
    acc = accumulate_captures([c1, c2])
    np.testing.assert_allclose(
        np.asarray(acc['Dense_0'].a),
        (np.asarray(c1['Dense_0'].a) + np.asarray(c2['Dense_0'].a)) / 2.0,
        rtol=1e-6,
    )


def test_capture_remat_is_exact() -> None:
    """capture_remat (jax.checkpoint on the capture forward) changes
    memory behavior only: loss, grads, and factors are identical."""
    model, params, specs, loss_fn, x, y = _setup()
    plain = jax.jit(capture_value_and_grad(loss_fn, specs))
    remat = jax.jit(capture_value_and_grad(loss_fn, specs, remat=True))
    (l1, _), g1, c1 = plain(params, x, y)
    (l2, _), g2, c2 = remat(params, x, y)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7,
        ),
        (g1, c1),
        (g2, c2),
    )
