"""Flax BERT-compatible transformer encoder, TPU-first.

The reference's teacher reranker is ``cross-encoder/ms-marco-MiniLM-L-6-v2``
(reference ``evaluation/reranking_evaluator.py:292``) — a **BERT**
architecture, not DistilBERT: it adds token-type (segment) embeddings and a
tanh pooler, and its HF checkpoint uses the ``BertModel`` key layout. This
module re-provides that model family natively so converted MiniLM (or any
BERT) teacher weights drop into the teacher-data pipeline and the
model-in-the-loop reranking evaluator.

Architecture relative to :mod:`.distilbert` (HF ``BertModel`` parity):

- embeddings = word + position + **token_type**, then LayerNorm (eps 1e-12)
  — the shared :class:`~cldrd_tpu.models.distilbert.Embeddings` module,
  which grows the segment table exactly when the config carries a nonzero
  ``type_vocab_size``.
- the transformer blocks are structurally identical to DistilBERT's
  (post-LN MHA -> residual+LN -> GELU FFN -> residual+LN), so this module
  REUSES :class:`~cldrd_tpu.models.distilbert.TransformerBlock` — same
  Pallas/XLA attention paths, same cls_only final-block shrink, same
  selective-remat policies, one implementation to keep fast.
- the optional tanh pooler lives in the consumers (``CrossEncoder``), like
  HF keeps it outside ``BertModel.encoder``.

TPU-first choices are inherited from :mod:`.distilbert`: fp32 params / bf16
compute, static shapes, no data-dependent control flow under ``jit``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .distilbert import DistilBertConfig, Embeddings, TransformerBlock

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BertConfig(DistilBertConfig):
    """Static architecture hyperparameters (HF ``BertConfig`` parity).

    Field names follow our :class:`DistilBertConfig` (``dim`` =
    ``hidden_size``, ``hidden_dim`` = ``intermediate_size``, ``n_layers`` =
    ``num_hidden_layers``); the one BERT-only field is ``type_vocab_size``.
    """

    type_vocab_size: int = 2

    @classmethod
    def minilm_l6(cls, **overrides) -> "BertConfig":
        """``cross-encoder/ms-marco-MiniLM-L-6-v2`` (the reference teacher):
        6 layers, hidden 384, 12 heads, FFN 1536, BERT vocab."""
        base = dict(
            vocab_size=30522,
            max_position_embeddings=512,
            dim=384,
            n_layers=6,
            n_heads=12,
            hidden_dim=1536,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def tiny(cls, **overrides) -> "BertConfig":
        base = dict(
            vocab_size=512,
            max_position_embeddings=64,
            dim=32,
            n_layers=2,
            n_heads=4,
            hidden_dim=64,
        )
        base.update(overrides)
        return cls(**base)


class BertEncoder(nn.Module):
    """Token ids + mask (+ token types) -> hidden states [B, L, D].

    Same call contract as :class:`DistilBertEncoder` plus
    ``token_type_ids``; ``cls_only``/``position_ids``/``segment_ids``
    (packed mode) behave identically because the blocks are shared.
    """

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
        cls_only: bool = False,
        token_type_ids: Optional[jax.Array] = None,
        position_ids: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        hidden = Embeddings(self.config, self.dtype, name="embeddings")(
            input_ids, deterministic,
            position_ids=position_ids, token_type_ids=token_type_ids,
        )
        block_cls = TransformerBlock
        if self.config.remat:
            policy = None
            if self.config.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            block_cls = nn.remat(
                TransformerBlock, static_argnums=(4, 5), policy=policy
            )
        n = self.config.n_layers
        for i in range(n):
            hidden = block_cls(self.config, self.dtype, name=f"layer_{i}")(
                hidden, attention_mask, segment_ids, deterministic,
                cls_only and i == n - 1,
            )
        return hidden
