"""Corpus / query sequence dataset for encoding pipelines.

Capability parity with the reference ``dataset/sequence_dataset.py`` (the
``(id, text)`` dataset + tokenizing collator, ``:1-55``), TPU-first:

- batches are padded **to the full batch size** with a validity count, so the
  encode loop runs a single static-shape executable even on the ragged final
  batch (the reference just emits a smaller last batch, which would force a
  recompile under XLA).
- batch layout is ``{"input_ids", "attention_mask"} [bz, L] + ids [bz] +
  n_valid`` — ready for ``jax.device_put`` with batch sharding.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Tuple

import numpy as np

from .loaders import load_passages, load_queries, passage_text


@dataclass
class SequenceBatch:
    tokens: Dict[str, np.ndarray]  # [bz, L] int32, padded rows after n_valid
    ids: np.ndarray                # [bz] int64, padded entries are -1
    n_valid: int


class SequenceDataset:
    """(id, text) pairs from a TSV, tokenized to fixed shapes."""

    def __init__(self, id_to_seq: Dict[int, object], tokenizer, max_length: int, is_query: bool):
        sep = getattr(tokenizer, "sep_token", "[SEP]")
        self.pairs: List[Tuple[int, str]] = [
            (sid, passage_text(seq, sep)) for sid, seq in id_to_seq.items()
        ]
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.is_query = is_query

    def __len__(self) -> int:
        return len(self.pairs)

    @classmethod
    def create_from_seqs_file(cls, seqs_file: str, tokenizer, max_length: int, is_query: bool):
        load = load_queries if is_query else load_passages
        return cls(load(seqs_file), tokenizer, max_length, is_query)

    def collate(self, items: List[Tuple[int, str]], pad_to: int) -> SequenceBatch:
        n = len(items)
        texts = [t for _, t in items]
        tokens = self.tokenizer(texts, self.max_length)
        if n < pad_to:
            pad = pad_to - n
            tokens = {
                k: np.concatenate([v, np.zeros((pad, v.shape[1]), v.dtype)])
                for k, v in tokens.items()
            }
        ids = np.full((pad_to,), -1, np.int64)
        ids[:n] = [i for i, _ in items]
        return SequenceBatch(tokens=tokens, ids=ids, n_valid=n)

    def batches(self, batch_size: int) -> Iterator[SequenceBatch]:
        for start in range(0, len(self.pairs), batch_size):
            chunk = self.pairs[start : start + batch_size]
            yield self.collate(chunk, batch_size)
