"""Margin-MSE knowledge-distillation loss.

MSE between the student's and teacher's all-pairs score-difference matrices
(reference ``losses/margin_mse.py:8-19``). Pure function instead of an
nn.Module — there is no state.
"""
from __future__ import annotations

import jax.numpy as jnp


def margin_mse_loss(m_student: jnp.ndarray, m_teacher: jnp.ndarray) -> jnp.ndarray:
    """m_student, m_teacher: [bz, k] score matrices."""
    assert m_student.ndim == m_teacher.ndim == 2
    ds = m_student[:, :, None] - m_student[:, None, :]
    dt = m_teacher[:, :, None] - m_teacher[:, None, :]
    return jnp.mean((ds - dt) ** 2)
