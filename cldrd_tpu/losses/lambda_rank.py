"""LambdaRank-MRR listwise distillation loss (the primary CL-DRD training loss).

Matches the behavior of the reference ``losses/lambda_rank.py:53-96``
(``lambda_mrr_loss``) and ``:3-51`` (``bweight_lambda_mrr_loss``): a pairwise
logistic loss over items sorted by predicted score, weighted by the
reciprocal-rank delta ``|1/i - 1/j|`` of the two positions, restricted to
pairs whose true labels are ordered ``true_i > true_j``, averaged (or summed)
over the valid pairs.

TPU-first redesign: the reference reduces with boolean mask indexing
(``losses[padded_pairs_mask]``), which is shape-dynamic and un-jittable. Here
the reduction is a mask-weighted sum with a mask-count denominator, which is
algebraically identical and compiles to fused VPU ops under jit. All NaN/inf
paths that the reference produces via -inf padding arithmetic are avoided with
``jnp.where`` guards, so gradients stay finite.
"""
from __future__ import annotations

import jax.numpy as jnp


def _pairwise_terms(y_pred: jnp.ndarray, y_true: jnp.ndarray, padded_value_indicator: float):
    """Shared machinery: sort by preds, build pair mask / score diffs.

    Returns (losses_unweighted [bz,n,n], pair_mask [bz,n,n], n).
    """
    n = y_pred.shape[-1]
    padded_mask = y_true == padded_value_indicator
    neg_inf = jnp.asarray(-jnp.inf, y_pred.dtype)

    y_pred = jnp.where(padded_mask, neg_inf, y_pred)
    # keep trues at -inf for pair-mask construction, as the reference does
    y_true_m = jnp.where(padded_mask, neg_inf, y_true)

    order = jnp.argsort(-y_pred, axis=-1, stable=True)
    y_pred_sorted = jnp.take_along_axis(y_pred, order, axis=-1)
    true_sorted = jnp.take_along_axis(y_true_m, order, axis=-1)

    true_diffs = true_sorted[:, :, None] - true_sorted[:, None, :]
    pair_mask = jnp.isfinite(true_diffs) & (true_diffs > 0)

    scores_diffs = y_pred_sorted[:, :, None] - y_pred_sorted[:, None, :]
    # guard: outside the mask, diffs may be nan/inf (padding arithmetic)
    scores_diffs = jnp.where(pair_mask, scores_diffs, 0.0)
    scores_diffs = jnp.clip(scores_diffs, -1e8, 1e8)
    # log(1 + exp(-x)), stable form; identical value to the reference formula
    losses = jnp.logaddexp(0.0, -scores_diffs)
    return losses, pair_mask, n


def _masked_reduce(losses: jnp.ndarray, mask: jnp.ndarray, reduction: str):
    masked = losses * mask
    if reduction == "sum":
        return jnp.sum(masked)
    if reduction == "mean":
        return jnp.sum(masked) / jnp.maximum(jnp.sum(mask), 1)
    raise ValueError("Reduction method can be either sum or mean")


def lambda_mrr_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    eps: float = 1e-10,
    padded_value_indicator: float = -1,
    reduction: str = "mean",
    sigma: float = 1.0,
) -> jnp.ndarray:
    """y_pred, y_true: [bz, n]. Positions with y_true == padded_value_indicator
    are excluded from all pairs."""
    del eps, sigma  # kept for signature parity with the reference
    losses, pair_mask, n = _pairwise_terms(y_pred, y_true, padded_value_indicator)
    inv_pos = 1.0 / jnp.arange(1, n + 1, dtype=y_pred.dtype)
    weights = jnp.abs(inv_pos[None, :, None] - inv_pos[None, None, :])
    return _masked_reduce(losses * weights, pair_mask, reduction)


def bweight_lambda_mrr_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    batch_weight: jnp.ndarray,
    eps: float = 1e-10,
    padded_value_indicator: float = -1,
    reduction: str = "mean",
    sigma: float = 1.0,
) -> jnp.ndarray:
    """lambda_mrr_loss with a per-example weight multiplied into every pair
    term before reduction (reference lambda_rank.py:40-48)."""
    del eps, sigma
    losses, pair_mask, n = _pairwise_terms(y_pred, y_true, padded_value_indicator)
    inv_pos = 1.0 / jnp.arange(1, n + 1, dtype=y_pred.dtype)
    weights = jnp.abs(inv_pos[None, :, None] - inv_pos[None, None, :])
    weighted = losses * weights * batch_weight.reshape(-1, 1, 1)
    return _masked_reduce(weighted, pair_mask, reduction)
