"""Cross-encoder reranker — the reference's missing
``models/cross_encoder.py::CrossEncoder`` (imported at
``reranking_evaluator.py:283,293``; used as the teacher reranker, e.g.
``cross-encoder/ms-marco-MiniLM-L-6-v2``).

A single encoder over the concatenated ``[CLS] query [SEP] passage [SEP]``
sequence, with a 1-logit classification head on the CLS token (matching the
HF ``*ForSequenceClassification`` head shapes so converted teacher weights
drop in):

- ``arch='distilbert'``: pre_classifier -> ReLU -> dropout -> classifier
  (HF ``DistilBertForSequenceClassification``).
- ``arch='bert'``: tanh pooler -> dropout -> classifier (HF
  ``BertForSequenceClassification``) over a :class:`BertEncoder` with
  token-type embeddings — this is the reference teacher's actual
  architecture (MiniLM-L-6-v2). ``pairs`` may carry ``token_type_ids``
  (0 = query segment, 1 = passage segment, HF pair-encoding semantics);
  absent, segment 0 is broadcast.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bert import BertConfig, BertEncoder
from .distilbert import DistilBertConfig, DistilBertEncoder, cls_pool

Dtype = Any
Batch = Dict[str, jax.Array]


class CrossEncoder(nn.Module):
    """(query ++ passage) -> relevance score [bz]."""

    config: DistilBertConfig
    num_labels: int = 1
    dtype: Dtype = jnp.float32
    arch: str = "distilbert"  # 'distilbert' | 'bert'

    @nn.compact
    def __call__(self, pairs: Batch, deterministic: bool = True) -> jax.Array:
        """``pairs``: flat ``{input_ids, attention_mask} [bz, L]`` -> [bz].

        PACKED mode (``data/packing.py``; ``RerankingDataset.batches_packed``):
        when ``gather_pos`` is present, ``input_ids``/``attention_mask``/
        ``position_ids``/``segment_ids`` are ``[R, L]`` rows each holding
        several concatenated pairs isolated by segment-masked attention +
        per-segment position reset, and ``gather_pos [n]`` indexes each
        pair's CLS position in the flattened ``R*L`` token axis — scores
        are numerically the flat layout's at ~token-proportional FLOPs.
        Both modes create the identical parameter tree."""
        cfg = self.config
        packed = "gather_pos" in pairs
        if self.arch == "bert":
            if packed:
                raise ValueError(
                    "packed mode is not supported for arch='bert' (packing "
                    "would need per-segment token-type resets; use "
                    "batches()/batches_bucketed(), which are faster for "
                    "reranking anyway — see batches_packed docstring)"
                )
            bcfg = cfg if isinstance(cfg, BertConfig) else BertConfig(
                **{f.name: getattr(cfg, f.name)
                   for f in dataclasses.fields(cfg)}
            )
            hidden = BertEncoder(bcfg, self.dtype, name="encoder")(
                pairs["input_ids"], pairs["attention_mask"], deterministic,
                cls_only=True,
                token_type_ids=pairs.get("token_type_ids"),
            )
            pooled = cls_pool(hidden)
            # HF BertForSequenceClassification head: tanh pooler -> dropout
            # -> classifier.
            pooled = nn.tanh(nn.Dense(
                cfg.dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="pooler",
            )(pooled))
        else:
            hidden = DistilBertEncoder(cfg, self.dtype, name="encoder")(
                pairs["input_ids"], pairs["attention_mask"], deterministic,
                # flat mode: only the CLS position feeds the heads; packed
                # rows need every segment's start position instead
                cls_only=not packed,
                position_ids=pairs.get("position_ids"),
                segment_ids=pairs.get("segment_ids"),
            )
            if packed:
                dim = hidden.shape[-1]
                flat = hidden.reshape(-1, dim)
                pooled = jnp.take(flat, pairs["gather_pos"].astype(jnp.int32),
                                  axis=0)
            else:
                pooled = cls_pool(hidden)
            pooled = nn.Dense(
                cfg.dim, dtype=self.dtype, param_dtype=jnp.float32,
                name="pre_classifier",
            )(pooled)
            pooled = nn.relu(pooled)
        pooled = nn.Dropout(cfg.dropout)(pooled, deterministic=deterministic)
        logits = nn.Dense(
            self.num_labels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="classifier",
        )(pooled)
        if self.num_labels == 1:
            return logits.squeeze(-1)
        return logits
