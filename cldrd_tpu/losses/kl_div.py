"""Temperature-scaled listwise KL-divergence distillation loss.

``KL(softmax(teacher/T) || softmax(student/T))`` with batchmean reduction
(reference ``losses/kl_div.py:6-22``). Pure function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_div_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray, T: float = 1.0) -> jnp.ndarray:
    """y_pred: student scores [bz, k]; y_true: teacher scores [bz, k]."""
    assert y_pred.ndim == y_true.ndim == 2
    log_p = jax.nn.log_softmax(y_pred / T, axis=-1)
    q = jax.nn.softmax(y_true / T, axis=-1)
    log_q = jax.nn.log_softmax(y_true / T, axis=-1)
    # batchmean: sum of elementwise q * (log q - log p), divided by batch size
    return jnp.sum(q * (log_q - log_p)) / y_pred.shape[0]
