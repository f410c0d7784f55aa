"""RankNet pairwise logistic loss over pred-sorted items.

Same machinery as :mod:`lambda_rank` but with unit pair weights
(reference ``losses/ranknet.py:3-45``).
"""
from __future__ import annotations

import jax.numpy as jnp

from .lambda_rank import _masked_reduce, _pairwise_terms


def ranknet_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = 1e-10,
    padded_value_indicator: float = -1,
    reduction: str = "mean",
    sigma: float = 1.0,
) -> jnp.ndarray:
    del eps, sigma
    losses, pair_mask, _ = _pairwise_terms(y_pred, y_true, padded_value_indicator)
    return _masked_reduce(losses, pair_mask, reduction)
