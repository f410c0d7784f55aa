"""Optimizer: AdamW + linear warmup/decay + global-norm clipping.

Matches the reference's optimization exactly
(``nway_listwise_1.py:257-266, 355-359``):

- HF ``AdamW`` (decoupled weight decay, bias correction) -> ``optax.adamw``.
- no-decay parameter groups: the torch name filter
  ``['bias', 'LayerNorm.weight']`` (``nway_listwise_1.py:259``) matches by
  SUBSTRING, so it exempts every bias and the embedding LayerNorm
  (``embeddings.LayerNorm.weight``) — but NOT the transformer blocks'
  ``sa_layer_norm.weight`` / ``output_layer_norm.weight``, which therefore
  DO get weight decay in the reference. Our mask reproduces that exactly
  (verified step-for-step in ``tests/test_train_parity.py``); flax
  LayerNorm's weight is named ``scale``. Embedding tables also decay, as
  in the reference.
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
    """True for leaves that receive weight decay: everything except biases
    and the embedding ``LayerNorm`` scale (see module docstring — the
    reference's substring filter leaves the block layer norms decayed)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def key_name(entry) -> str:
        return getattr(entry, "key", getattr(entry, "name", str(entry)))

    def leaf_decays(path) -> bool:
        name = key_name(path[-1])
        if name == "bias":
            return False
        if name == "scale":
            parent = key_name(path[-2]) if len(path) > 1 else ""
            return parent != "LayerNorm"  # embedding LN exempt; block LNs decay
        return True

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
