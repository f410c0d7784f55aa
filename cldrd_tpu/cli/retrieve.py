"""Retrieve top-k passages per query -> run file.

Replaces the reference's ``retriever/retrieve_top_passages.py`` (encode
queries at max_len 30, load the index to GPU, top-1000 search at query batch
128, write ``qid\\tpid\\trank\\tscore``, ``:47-109``). Here the persisted
shard store loads straight into (optionally mesh-sharded) TPU HBM — there is
no CPU->device "clone" step — and search is the exact bin-max MIPS kernel.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

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

logger = logging.getLogger("cldrd_tpu.cli.retrieve")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True, help="index directory (from cli.index)")
    p.add_argument("--queries", required=True, help="qid\\ttext TSV")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--run", required=True, help="output run TSV path")
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--max-length", type=int, default=30)
    p.add_argument("--encode-batch-size", type=int, default=512)
    p.add_argument("--search-batch-size", type=int, default=128)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="encoder activation dtype; float32 for bit-parity "
                        "runs against fp32 oracles")
    p.add_argument("--hbm-dtype", default="bfloat16",
                   choices=("bfloat16", "float32", "int8"),
                   help="in-HBM corpus dtype (float32 doubles HBM; int8 "
                        "halves it vs bfloat16 — per-row-scaled codes, "
                        "full 8.8M MS MARCO on ONE v5e chip; recall cost "
                        "measured in examples/quantization_study.py)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of the "
                        "search phase into this directory (TensorBoard- "
                        "loadable; SURVEY §5.1)")
    p.add_argument("--shards", type=int, default=1,
                   help="shard the corpus over this many local devices "
                        "(corpus-axis mesh: per-shard bin-max top-k + ICI "
                        "all-gather merge, the FAISS co.shard=True "
                        "replacement); 0 = all local devices")
    p.add_argument("--precision", default="default",
                   choices=("default", "high", "highest"),
                   help="score matmul precision: 'default' = MXU-native "
                        "bf16 inputs (fastest, 14.4k QPS/chip); 'highest' "
                        "with --hbm-dtype float32 = FAISS-fp32-parity "
                        "scoring (8.4k QPS/chip); see "
                        "examples/quantization_study.py")
    add_model_args(p)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    args.share_weights = bool(args.share_weights)
    cfg = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)

    compute_dtype = (
        jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16
    )
    if args.compute_dtype == "float32":
        # see cli/index.py: fp32 parity runs need true-fp32 encoder matmuls
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    model = NwayDualEncoder(
        config=cfg, share_weights=args.share_weights, dtype=compute_dtype,
        apply_cosine_similarity=args.cosine,
    )
    params = load_dual_encoder_params(
        args.checkpoint, model, cfg, args.share_weights,
        max_query_len=args.max_length,
    )
    dataset = SequenceDataset.create_from_seqs_file(
        args.queries, tokenizer, args.max_length, is_query=True
    )
    encode = make_encode_fn(model, params, "query_embs")
    q_embs, qids = encode_dataset(encode, dataset, args.encode_batch_size)

    mesh = None
    if args.shards != 1:
        from cldrd_tpu.parallel import CORPUS_AXIS, make_mesh

        mesh = make_mesh(args.shards or None, CORPUS_AXIS)
    index = load_index(
        args.index,
        mesh=mesh,
        dtype=jnp.dtype({"float32": jnp.float32, "int8": jnp.int8}
                        .get(args.hbm_dtype, jnp.bfloat16)),
        precision=args.precision,
    )
    import contextlib

    if args.profile_dir:
        from cldrd_tpu.utils.profiling import trace

        ctx = trace(args.profile_dir)
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        stats = retrieve_to_run_file(
            index, q_embs, qids, args.run,
            topk=args.topk, batch_size=args.search_batch_size,
        )
    print(json.dumps({"queries": len(qids), **{k: round(v, 3) for k, v in stats.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
