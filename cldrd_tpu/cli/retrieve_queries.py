"""Inverse retrieval: top-k *queries* per passage (teacher-data creation).

Working replacement for the reference's ``retriever/retrieve_top_queries.py``
(encode passages, search an index of queries, top-200 per passage,
``:1-86``) — which is broken in the reference (imports a module that does
not exist, ``:23``). Part of the offline TAS-B-style teacher-data pipeline
(SURVEY §2.4).
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import List, Optional

import jax.numpy as jnp

from cldrd_tpu.data.sequence_dataset import SequenceDataset
from cldrd_tpu.index import encode_dataset, load_index, make_encode_fn
from cldrd_tpu.models import NwayDualEncoder
from cldrd_tpu.search import retrieve_to_run_file

from .common import (
    add_model_args,
    build_tokenizer,
    load_dual_encoder_params,
    model_config_from_args,
    setup_logging,
)

logger = logging.getLogger("cldrd_tpu.cli.retrieve_queries")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--query-index", required=True,
                   help="index directory built over QUERY embeddings")
    p.add_argument("--passages", required=True, help="pid\\ttext TSV")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--run", required=True,
                   help="output TSV: pid\\tqid\\trank\\tscore")
    p.add_argument("--topk", type=int, default=200)
    p.add_argument("--max-length", type=int, default=256)
    p.add_argument("--encode-batch-size", type=int, default=512)
    p.add_argument("--search-batch-size", type=int, default=128)
    add_model_args(p)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    args.share_weights = bool(args.share_weights)
    cfg = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)

    model = NwayDualEncoder(
        config=cfg, share_weights=args.share_weights, dtype=jnp.bfloat16,
        apply_cosine_similarity=args.cosine,
    )
    params = load_dual_encoder_params(
        args.checkpoint, model, cfg, args.share_weights,
        max_passage_len=args.max_length,
    )
    dataset = SequenceDataset.create_from_seqs_file(
        args.passages, tokenizer, args.max_length, is_query=False
    )
    encode = make_encode_fn(model, params, "passage_embs")
    p_embs, pids = encode_dataset(encode, dataset, args.encode_batch_size)

    index = load_index(args.query_index)
    stats = retrieve_to_run_file(
        index, p_embs, pids, args.run,
        topk=args.topk, batch_size=args.search_batch_size,
    )
    print(json.dumps({"passages": len(pids), **{k: round(v, 3) for k, v in stats.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
