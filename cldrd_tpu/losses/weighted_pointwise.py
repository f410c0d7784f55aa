"""Weighted pointwise logistic loss.

``mean(log(1 + exp(-pred / T)) * weight)`` with non-negative weights
(reference ``losses/weighted_pointwise.py:3-14``).
"""
from __future__ import annotations

import jax.numpy as jnp


def weighted_pointwise_loss(
    y_pred: jnp.ndarray, y_weight: jnp.ndarray, T: float = 1.0
) -> jnp.ndarray:
    losses = jnp.logaddexp(0.0, -y_pred / T) * y_weight
    return jnp.mean(losses)
