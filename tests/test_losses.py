"""Loss function unit tests (training.losses)."""

import numpy as np
import jax.numpy as jnp

from graph_neural_networks_tpu.training import losses as L


def test_cross_entropy_perfect_and_uniform():
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    y = jnp.asarray([0, 1])
    assert float(L.cross_entropy_loss(logits, y)) < 1e-3
    uniform = jnp.zeros((4, 3))
    np.testing.assert_allclose(
        float(L.cross_entropy_loss(uniform, jnp.zeros(4))), np.log(3),
        rtol=1e-5)


def test_regression_losses():
    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([1.5, 2.0, 2.0])
    np.testing.assert_allclose(float(L.mse_loss(a, b)),
                               np.mean([0.25, 0, 1.0]), rtol=1e-6)
    np.testing.assert_allclose(float(L.l1_loss(a, b)),
                               np.mean([0.5, 0, 1.0]), rtol=1e-6)
    # smooth L1: quadratic inside beta, linear outside
    np.testing.assert_allclose(
        float(L.smooth_l1_loss(a, b)),
        np.mean([0.5 * 0.25, 0, 0.5]), rtol=1e-6)


def test_adapt_extra_dimension():
    wrapped = L.adapt_extra_dimension_loss(L.mse_loss)
    est = jnp.asarray([[1.0], [2.0]])     # (B, 1) -> squeezed to (B,)
    tgt = jnp.asarray([1.0, 1.0])
    np.testing.assert_allclose(float(wrapped(est, tgt)), 0.5, rtol=1e-6)
    # CE passes through untouched
    ce = L.adapt_extra_dimension_loss(L.cross_entropy_loss)
    logits = jnp.zeros((2, 3))
    assert np.isfinite(float(ce(logits, jnp.zeros(2))))


def test_f1_loss_extremes():
    N = 6
    y = jnp.asarray(np.array([[0, 1, 1, 0, 0, 1]], np.float32))
    perfect = jnp.zeros((1, 2, N)).at[0, 1].set(20.0 * y[0]) \
        .at[0, 0].set(20.0 * (1 - y[0]))
    assert float(L.f1_score_loss(perfect, y)) < 0.01
    inverted = jnp.zeros((1, 2, N)).at[0, 1].set(20.0 * (1 - y[0])) \
        .at[0, 0].set(20.0 * y[0])
    assert float(L.f1_score_loss(inverted, y)) > 0.9
    # no positives anywhere + no predictions -> defined (reference NaN guard)
    y0 = jnp.zeros((1, N))
    pred0 = jnp.zeros((1, 2, N)).at[0, 0].set(20.0)
    val = float(L.f1_score_loss(pred0, y0))
    assert np.isfinite(val)


def test_f1_loss_differentiable():
    import jax
    y = jnp.asarray(np.array([[0, 1, 1, 0]], np.float32))
    g = jax.grad(lambda lo: L.f1_score_loss(lo, y))(jnp.zeros((1, 2, 4)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0
