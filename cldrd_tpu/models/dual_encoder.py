"""N-way dual encoder: query/passage towers + dot-product scoring.

Capability parity with the reference ``models/nway_dual_encoder.py`` —
``NwayDualEncoder.forward/query_embs/passage_embs/nway_passage_embs``
(``nway_dual_encoder.py:21-67``) including the in-batch-negative logit
expansion (``:30-44``) — but designed functionally for JAX:

- the module is pure; params are an explicit pytree, so the same code runs
  under ``jit``/``pjit``/``grad`` with no device/DDP wrapping.
- weight sharing is a *parameter-tree* decision, not an object-graph one:
  ``share_weights=True`` stores a single ``encoder`` subtree used by both
  towers (the torch version aliases ``self.passage_encoder =
  self.query_encoder``, ``nway_dual_encoder.py:16-17``).
- the n-way flattening trick ([bz, nway, L] -> [bz*nway, L] through one
  encoder pass, ``nway_dual_encoder.py:59-67``) is kept — it is exactly the
  right shape for the MXU: one big static-batch matmul instead of ``nway``
  small ones.
- in-batch negative gathering is a static ``jnp.take`` with precomputed index
  matrices (computable at trace time from static bz/nway), replacing the
  torch LongTensor index gymnastics (``:30-44``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .bert import BertConfig, BertEncoder
from .distilbert import DistilBertConfig, DistilBertEncoder, cls_pool

Dtype = Any
Batch = Dict[str, jax.Array]


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _in_batch_neg_indices(bz: int, nway: int, all_in_batch_neg: bool) -> np.ndarray:
    """Static negative-passage index matrix (reference ``:30-41``).

    all_in_batch_neg=True : row b lists every flat passage index not in row b
                            -> shape [bz, (bz-1)*nway]
    all_in_batch_neg=False: row b takes the *next* example's nway passages
                            (the reference's "hack" gather, ``:36-41``)
                            -> shape [bz, nway]
    """
    full = np.asarray(
        [
            list(range(b * nway)) + list(range((b + 1) * nway, bz * nway))
            for b in range(bz)
        ],
        dtype=np.int32,
    )
    if all_in_batch_neg:
        return full
    ys = np.concatenate(
        [
            np.arange(0, (bz - 1) * nway).reshape(bz - 1, nway),
            np.arange(0, nway).reshape(1, nway),
        ],
        axis=0,
    )
    xs = np.repeat(np.arange(bz).reshape(-1, 1), nway, axis=1)
    return full[xs, ys]


class NwayDualEncoder(nn.Module):
    """Dual encoder scoring a query against an n-way list of passages."""

    config: DistilBertConfig
    share_weights: bool = False
    in_batch_loss: bool = False
    all_in_batch_neg: bool = True
    # cosine scoring (the reference's missing ctof_grained trainers'
    # --apply_consine_similarity flag, SURVEY §2.4): L2-normalize both
    # embeddings so logits are cosine similarities instead of dot products
    apply_cosine_similarity: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        # The config type IS the architecture: a BertConfig stands up BERT
        # towers (token-type embeddings, HF BertModel numerics — the MiniLM
        # / bert-base retriever families), a DistilBertConfig the reference's
        # DistilBERT towers. Blocks are shared, so every downstream path
        # (packing, cls_only, remat, attention impls) works for both.
        enc_cls = (BertEncoder if isinstance(self.config, BertConfig)
                   else DistilBertEncoder)
        if self.share_weights:
            self.encoder = enc_cls(self.config, self.dtype, name="encoder")
            self._query_encoder = self.encoder
            self._passage_encoder = self.encoder
        else:
            self._query_encoder = enc_cls(
                self.config, self.dtype, name="query_encoder"
            )
            self._passage_encoder = enc_cls(
                self.config, self.dtype, name="passage_encoder"
            )

    def __call__(
        self,
        queries: Batch,
        nway_passages: Optional[Batch],
        deterministic: bool = True,
        packed_passages: Optional[Batch] = None,
    ) -> jax.Array:
        """queries: {input_ids, attention_mask} [bz, Lq];
        nway_passages: same keys, [bz, nway, Lp]. Returns logits [bz, nway']
        where nway' is nway, nway*bz, or 2*nway (reference ``:21-48``).

        ``packed_passages`` (``data/packing.py``): packed alternative to
        ``nway_passages`` — several short passages per 256-token row with
        segment-masked attention; embeddings (and therefore logits) are
        numerically the unpacked values at ~token-proportional FLOPs."""
        query_reps = self.query_embs(queries, deterministic)  # [bz, D]
        if packed_passages is not None:
            nway_reps = self.packed_nway_passage_embs(packed_passages, deterministic)
        else:
            nway_reps = self.nway_passage_embs(nway_passages, deterministic)
        # cosine models are normalized AT THE EMBEDDING BOUNDARY (inside
        # query_embs/passage_embs/packed_nway_passage_embs), not here: every
        # consumer — these training logits, the index-build encode, the
        # retrieval-time query encode — then scores in the same cosine
        # space, and an IP index over unit vectors IS the cosine index.
        bz, nway, dim = nway_reps.shape

        if self.in_batch_loss:
            neg_idx = jnp.asarray(
                _in_batch_neg_indices(bz, nway, self.all_in_batch_neg)
            )
            flat = nway_reps.reshape(bz * nway, dim)
            neg_reps = jnp.take(flat, neg_idx, axis=0)  # [bz, n_neg, D]
            nway_reps = jnp.concatenate([nway_reps, neg_reps], axis=1)

        # score = sum(q * p): one batched matvec on the MXU
        # (reference ``:47``: torch.sum(q.unsqueeze(1) * p, dim=-1)).
        logits = jnp.einsum(
            "bd,bnd->bn", query_reps, nway_reps, preferred_element_type=jnp.float32
        )
        return logits

    def query_embs(self, queries: Batch, deterministic: bool = True) -> jax.Array:
        # cls_only: every consumer CLS-pools, so the final block computes
        # only position 0 (~15% fewer encoder FLOPs at L=256, same position-0 math)
        hidden = self._query_encoder(
            queries["input_ids"], queries["attention_mask"], deterministic,
            cls_only=True,
        )
        reps = cls_pool(hidden)
        return _l2_normalize(reps) if self.apply_cosine_similarity else reps

    def passage_embs(self, passages: Batch, deterministic: bool = True) -> jax.Array:
        hidden = self._passage_encoder(
            passages["input_ids"], passages["attention_mask"], deterministic,
            cls_only=True,
        )
        reps = cls_pool(hidden)
        return _l2_normalize(reps) if self.apply_cosine_similarity else reps

    def packed_nway_passage_embs(
        self, packed: Batch, deterministic: bool = True
    ) -> jax.Array:
        """Encode per-example PACKED passages (``data/packing.py``):
        ``{input_ids, attention_mask, position_ids, segment_ids} [bz, R, L]``
        + ``gather_pos [bz, nway]`` -> [bz, nway, D].

        The packed rows flatten into one encoder batch (same MXU-shape
        reasoning as ``nway_passage_embs``, ~R/nway times smaller); each
        passage's CLS vector is then a *per-example* gather at its packed
        start position — local to the batch row, so a data-sharded SPMD
        step never gathers across devices."""
        ids = packed["input_ids"]
        bz, rows, seq_len = ids.shape
        flat = lambda x: x.reshape(bz * rows, seq_len)  # noqa: E731
        hidden = self._passage_encoder(
            flat(ids),
            flat(packed["attention_mask"]),
            deterministic,
            position_ids=flat(packed["position_ids"]),
            segment_ids=flat(packed["segment_ids"]),
        )  # [bz*rows, L, D] (cls_only is per-row; packed needs every start)
        dim = hidden.shape[-1]
        per_example = hidden.reshape(bz, rows * seq_len, dim)
        gather = packed["gather_pos"][..., None].astype(jnp.int32)
        reps = jnp.take_along_axis(per_example, gather, axis=1)  # [bz, nway, D]
        return _l2_normalize(reps) if self.apply_cosine_similarity else reps

    def nway_passage_embs(
        self, nway_passages: Batch, deterministic: bool = True
    ) -> jax.Array:
        ids = nway_passages["input_ids"]
        mask = nway_passages["attention_mask"]
        bz, nway, seq_len = ids.shape
        reps = self.passage_embs(
            {
                "input_ids": ids.reshape(bz * nway, seq_len),
                "attention_mask": mask.reshape(bz * nway, seq_len),
            },
            deterministic,
        )
        return reps.reshape(bz, nway, -1)


class DualEncoder(NwayDualEncoder):
    """Plain (non-n-way) dual encoder — the reference's missing
    ``models/dual_encoder.py::DualEncoder`` (imported at
    ``retrieve_top_queries.py:23`` and ``reranking_evaluator.py:282``).

    Scores one (query, passage) pair per row: logits [bz]."""

    def __call__(  # type: ignore[override]
        self,
        queries: Batch,
        passages: Batch,
        deterministic: bool = True,
    ) -> jax.Array:
        q = self.query_embs(queries, deterministic)
        p = self.passage_embs(passages, deterministic)
        return jnp.einsum("bd,bd->b", q, p, preferred_element_type=jnp.float32)
