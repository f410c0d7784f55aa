"""Create curriculum training files: candidates -> teacher rerank -> buckets.

The offline teacher-data pipeline the reference consumed but never shipped
(SURVEY header; Figure 1 of the CL-DRD paper): take top-k candidates per
training query (a run file from ``cli.retrieve``), score each (query,
candidate) pair with a cross-encoder teacher, and bucket the teacher ranking
into the curriculum JSONL stages (5relT_25neg / 10relT_20neg / 20relT_10neg
/ 30relT) with teacher scores attached.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from cldrd_tpu.data import build_curriculum_files, rerank_candidates_with_teacher
from cldrd_tpu.data.loaders import load_passages, load_queries
from cldrd_tpu.evaluation import load_run_ranklists, make_cross_encoder_score_fn
from cldrd_tpu.models import CrossEncoder

from .common import add_model_args, build_tokenizer, model_config_from_args, setup_logging

logger = logging.getLogger("cldrd_tpu.cli.create_training_data")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--candidates-run", required=True,
                   help="run TSV of retrieval candidates per training query")
    p.add_argument("--queries", required=True)
    p.add_argument("--passages", required=True)
    p.add_argument("--teacher-checkpoint", default=None,
                   help="cross-encoder teacher weights (.msgpack or HF torch)")
    p.add_argument("--teacher-oracle-qrels", default=None,
                   help="ORACLE teacher: score candidates by graded qrels "
                        "relevance (+ --teacher-noise) instead of a "
                        "cross-encoder. For synthetic distillation "
                        "experiments and for building curriculum files "
                        "when complete graded judgments exist — the "
                        "reference's MiniLM teacher is a download this "
                        "hermetic environment cannot make (BASELINE.md)")
    p.add_argument("--teacher-noise", type=float, default=0.0,
                   help="stddev of Gaussian noise added to oracle grades "
                        "(models an imperfect teacher; 0 = exact oracle)")
    p.add_argument("--teacher-arch", choices=("distilbert", "bert"),
                   default="distilbert",
                   help="'bert' = the reference teacher's family "
                        "(cross-encoder/ms-marco-MiniLM-L-6-v2, a "
                        "BertForSequenceClassification with token-type "
                        "embeddings + tanh pooler); --model-size full then "
                        "means the MiniLM-L6 shape")
    p.add_argument("--out-prefix", required=True,
                   help="output path prefix for <stage>.train.jsonl files")
    p.add_argument("--max-length", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--bucket-lengths", type=int, nargs="*", default=None,
                   help="enable length-bucketed teacher scoring: pad each "
                        "(q ++ p) pair only to the smallest listed bucket "
                        "that fits it (empty = 32/64/../max ladder). "
                        "Identical scores, ~token-proportional device cost")
    p.add_argument("--pack-pairs", action="store_true",
                   help="pack several (q ++ p) pairs into each max-length "
                        "row (segment-masked attention); measured SLOWER "
                        "than --bucket-lengths on TPU (1.45x vs 1.99x over "
                        "flat) — prefer bucketing for reranking")
    p.add_argument("--seed", type=int, default=4680)
    p.add_argument("--compute-dtype", choices=("bfloat16", "float32"),
                   default="bfloat16",
                   help="teacher compute dtype (float32 for bit-stable "
                        "scores across batch shapes, e.g. differential runs)")
    # cosine=False: the teacher is a cross-encoder — there is no embedding
    # space to L2-normalize, so --cosine would be inert; reject it instead
    add_model_args(p, cosine=False)
    return p


def _teacher_params(checkpoint: Optional[str], model, cfg, arch: str = "distilbert"):
    import jax

    dummy = {
        "input_ids": jnp.zeros((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    if checkpoint:
        if checkpoint.endswith(".msgpack"):
            from flax import serialization

            restored = serialization.msgpack_restore(open(checkpoint, "rb").read())
            blob = restored.get("params", restored)
            params = serialization.from_state_dict(params, blob)
        else:
            from cldrd_tpu.models.hf_loader import (
                bert_cross_encoder_torch_to_flax,
                cross_encoder_torch_to_flax,
                load_torch_checkpoint,
            )

            convert = (bert_cross_encoder_torch_to_flax if arch == "bert"
                       else cross_encoder_torch_to_flax)
            params = convert(load_torch_checkpoint(checkpoint))
    return params


def reconcile_teacher_arch(args) -> None:
    """On the teacher CLIs the architecture switch is ``--teacher-arch``;
    the generic ``--arch`` (``add_model_args``) must not half-switch the
    config class away from the CrossEncoder's arch — reject a conflict,
    otherwise mirror so ``model_config_from_args`` agrees."""
    if (getattr(args, "arch", "distilbert") != "distilbert"
            and args.arch != args.teacher_arch):
        raise SystemExit(
            f"--arch {args.arch} conflicts with --teacher-arch "
            f"{args.teacher_arch}: the teacher model's family is selected "
            "by --teacher-arch on this command")
    args.arch = args.teacher_arch


def oracle_scored(ranklists, qrels_path: str, noise: float, seed: int):
    """Teacher scores from graded qrels: grade + N(0, noise), with a tiny
    retrieval-rank decrement so noise=0 stays deterministic (ties resolve
    in retrieval order, as a teacher that agrees with the retriever on
    indistinguishable candidates would)."""
    from cldrd_tpu.evaluation import load_qrels

    qrels = load_qrels(qrels_path)
    rng = np.random.default_rng(seed)
    out = {}
    for qid, pids in ranklists.items():
        grades = qrels.get(int(qid), {})
        scored = [
            (int(pid),
             float(grades.get(int(pid), 0.0))
             + (float(rng.normal(0.0, noise)) if noise > 0 else 0.0)
             - rank * 1e-6)
            for rank, pid in enumerate(pids)
        ]
        scored.sort(key=lambda t: -t[1])
        out[int(qid)] = scored
    return out


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    reconcile_teacher_arch(args)
    if args.teacher_oracle_qrels:
        if args.teacher_checkpoint:
            raise SystemExit("--teacher-oracle-qrels and "
                             "--teacher-checkpoint are mutually exclusive")
        ranklists = load_run_ranklists(args.candidates_run)
        logger.info("oracle-scoring %d queries from %s (noise %.3g) ...",
                    len(ranklists), args.teacher_oracle_qrels,
                    args.teacher_noise)
        qid_to_scored = oracle_scored(
            ranklists, args.teacher_oracle_qrels, args.teacher_noise,
            args.seed)
        paths = build_curriculum_files(qid_to_scored, args.out_prefix,
                                       seed=args.seed)
        print(json.dumps(paths, indent=2))
        return 0
    if args.teacher_arch == "bert":
        from cldrd_tpu.models import BertConfig

        if getattr(args, "model_config", None):
            # overrides go straight into BertConfig so BERT-only fields
            # (type_vocab_size) are accepted
            import os as _os

            spec = args.model_config
            overrides = (json.load(open(spec)) if _os.path.exists(spec)
                         else json.loads(spec))
            overrides.setdefault("attention_impl", args.attention_impl)
            cfg = BertConfig(**overrides)
        elif args.model_size == "tiny":
            cfg = BertConfig.tiny(attention_impl=args.attention_impl)
        else:
            # the reference teacher's exact shape (MiniLM-L-6-v2)
            cfg = BertConfig.minilm_l6(attention_impl=args.attention_impl)
        if args.pack_pairs:
            raise SystemExit("--pack-pairs is not supported with "
                             "--teacher-arch bert (see CrossEncoder docs); "
                             "use --bucket-lengths")
    else:
        cfg = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)

    ranklists = load_run_ranklists(args.candidates_run)
    qid_to_query = load_queries(args.queries)
    pid_to_passage = load_passages(args.passages)

    model = CrossEncoder(config=cfg, dtype=jnp.dtype(args.compute_dtype),
                         arch=args.teacher_arch)
    params = _teacher_params(args.teacher_checkpoint, model, cfg,
                             arch=args.teacher_arch)
    score_fn = make_cross_encoder_score_fn(model, params)

    logger.info("teacher-scoring %d queries x candidates ...", len(ranklists))
    qid_to_scored = rerank_candidates_with_teacher(
        ranklists, score_fn, qid_to_query, pid_to_passage, tokenizer,
        max_len=args.max_length, batch_size=args.batch_size,
        bucket_lengths=args.bucket_lengths, pack_pairs=args.pack_pairs,
        with_token_type_ids=args.teacher_arch == "bert",
    )
    paths = build_curriculum_files(qid_to_scored, args.out_prefix, seed=args.seed)
    print(json.dumps(paths, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
