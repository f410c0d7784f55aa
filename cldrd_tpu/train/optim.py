"""Optimizer: AdamW + linear warmup/decay + global-norm clipping.

Matches the reference's optimization exactly
(``nway_listwise_1.py:257-266, 355-359``):

- HF ``AdamW`` (decoupled weight decay, bias correction) -> ``optax.adamw``.
- no-decay parameter groups for biases and LayerNorm weights: the torch
  name filter ``['bias', 'LayerNorm.weight']`` becomes a pytree mask over
  leaves named ``bias`` / ``scale`` (flax LayerNorm's weight is ``scale``).
  Embedding tables *do* get weight decay, as in the reference.
- ``get_linear_schedule_with_warmup``: lr ramps 0 -> peak over
  ``warmup_steps`` then decays linearly to 0 at ``total_steps``.
- clip-then-step order: ``optax.chain(clip_by_global_norm, adamw)`` is the
  same ordering as the reference's unscale -> clip -> step (no loss scaling
  is needed on TPU: compute is bf16, grads/params fp32).
"""
from __future__ import annotations

from typing import Any

import jax
import optax


def linear_warmup_schedule(
    peak_lr: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """HF ``get_linear_schedule_with_warmup`` parity."""

    def schedule(count):
        count = jax.numpy.asarray(count, jax.numpy.float32)
        warm = count / max(1, warmup_steps)
        decay = jax.numpy.maximum(
            0.0,
            (total_steps - count) / max(1, total_steps - warmup_steps),
        )
        return peak_lr * jax.numpy.where(count < warmup_steps, warm, decay)

    return schedule


def _decay_mask(params: Any) -> Any:
    """True for leaves that receive weight decay (everything except biases
    and LayerNorm scales)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def leaf_decays(path) -> bool:
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", str(last)))
        return name not in ("bias", "scale")

    mask_flat = [leaf_decays(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def make_optimizer(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 4000,
    weight_decay: float = 0.01,
    adam_epsilon: float = 1e-8,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    schedule = linear_warmup_schedule(learning_rate, warmup_steps, total_steps)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=adam_epsilon,
            weight_decay=weight_decay,
            mask=_decay_mask,
        ),
    )
