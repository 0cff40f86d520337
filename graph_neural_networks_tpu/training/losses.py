"""Loss functions (JAX), mirroring ``alegnn/modules/loss.py``.

All losses take (estimate, target) and return a scalar.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Softmax cross entropy with integer labels; logits (B, C)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32)).mean()


def mse_loss(estimate: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((estimate - target) ** 2)


def l1_loss(estimate: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(estimate - target))


def smooth_l1_loss(estimate: jnp.ndarray, target: jnp.ndarray,
                   beta: float = 1.0) -> jnp.ndarray:
    """Huber-style smooth L1 (torch.nn.SmoothL1Loss semantics)."""
    d = jnp.abs(estimate - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta))


def adapt_extra_dimension_loss(loss_fn: Callable) -> Callable:
    """Squeeze the GNN's trailing singleton feature dim for scalar losses
    (reference loss.py:23-91: CrossEntropy keeps (B, C); MSE/L1/SmoothL1
    squeeze (B, 1) -> (B))."""
    def wrapped(estimate, target):
        if loss_fn is not cross_entropy_loss and estimate.ndim == 2 \
                and estimate.shape[1] == 1 and target.ndim == 1:
            estimate = estimate[:, 0]
        return loss_fn(estimate, target)
    return wrapped


def f1_score_loss(yHat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Differentiable 1 - F1 on the infected class from 2-class logits
    (..., 2, N); NaN-guarded like the reference (loss.py:93-125)."""
    C = yHat.shape[-2]
    N = yHat.shape[-1]
    yHat = yHat.reshape(-1, C, N)
    prob1 = jax.nn.softmax(yHat, axis=1)[:, 1, :]     # soft infected prob
    y = y.reshape(-1, N).astype(prob1.dtype)
    tp = jnp.sum(y * prob1, axis=1)
    fp = jnp.sum((1 - y) * prob1, axis=1)
    fn = jnp.sum(y * (1 - prob1), axis=1)
    eps = 1e-12
    p_raw = tp / jnp.maximum(tp + fp, eps)
    r_raw = tp / jnp.maximum(tp + fn, eps)
    # reference NaN semantics: undefined precision/recall with tp==0 -> 1
    p = jnp.where(tp + fp < eps, jnp.where(tp < eps, 1.0, 0.0), p_raw)
    r = jnp.where(tp + fn < eps, jnp.where(tp < eps, 1.0, 0.0), r_raw)
    f1 = jnp.where(p + r < eps, 0.0, 2 * p * r / jnp.maximum(p + r, eps))
    return 1 - jnp.mean(f1)


F1Score = f1_score_loss
