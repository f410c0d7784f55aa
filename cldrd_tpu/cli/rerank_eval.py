"""Model-in-the-loop reranking evaluation over checkpoints.

The one-command equivalent of the reference's
``scripts/unity/continue_rerank_evaluator.sh`` + the missing
``evaluation/continue_rerank_evaluator.py`` (SURVEY §2.4): score a
candidates run file with a dual- or cross-encoder at one checkpoint — or
at EVERY checkpoint in a training run folder — and report the standard
metric dict per step.

Modes:

- ``--mode dual`` (default): dot(CLS_q, CLS_p) with the n-way dual
  encoder's towers (reference ``reranking_evaluator.py:72-88``).
- ``--mode cross``: a cross-encoder scores the joined ``[CLS] q [SEP] p
  [SEP]`` pairs; ``--teacher-arch bert`` selects the reference teacher's
  actual family (MiniLM-style ``BertForSequenceClassification``).
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import List, Optional

import jax.numpy as jnp

from cldrd_tpu.data.reranking_dataset import RerankingDataset
from cldrd_tpu.evaluation.reranking_evaluator import (
    ContinueRerankEvaluator,
    RerankingEvaluator,
    make_cross_encoder_score_fn,
    make_dual_encoder_score_fn,
)
from cldrd_tpu.models import CrossEncoder, NwayDualEncoder

from .common import (
    add_model_args,
    build_tokenizer,
    load_dual_encoder_params,
    model_config_from_args,
    setup_logging,
)

logger = logging.getLogger("cldrd_tpu.cli.rerank_eval")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--candidates-run", required=True,
                   help="run TSV of (qid, pid) candidates to rerank")
    p.add_argument("--queries", required=True)
    p.add_argument("--passages", required=True)
    p.add_argument("--qrels", required=True)
    p.add_argument("--trec", action="store_true",
                   help="TREC graded qrels (space-separated, binarize at 2)")
    p.add_argument("--checkpoint", default=None,
                   help="evaluate ONE checkpoint (.msgpack or torch)")
    p.add_argument("--run-folder", default=None,
                   help="evaluate EVERY checkpoint_<step>.msgpack in this "
                        "folder (the continue_rerank_evaluator workflow)")
    p.add_argument("--results", default=None,
                   help="append a step-keyed metric TSV here (folder mode)")
    p.add_argument("--mode", choices=("dual", "cross"), default="dual")
    p.add_argument("--teacher-arch", choices=("distilbert", "bert"),
                   default="distilbert", help="cross-encoder family "
                   "('bert' = the MiniLM teacher's architecture)")
    p.add_argument("--max-length", type=int, default=256,
                   help="joined-pair length (cross mode)")
    p.add_argument("--max-query-len", type=int, default=30)
    p.add_argument("--max-passage-len", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--bucket-lengths", type=int, nargs="*", default=None,
                   help="length-bucketed scoring (identical scores, "
                        "~token-proportional device cost)")
    p.add_argument("--compute-dtype", choices=("bfloat16", "float32"),
                   default="bfloat16")
    add_model_args(p)
    return p


def _cross_config(args):
    if args.teacher_arch != "bert":
        return model_config_from_args(args)
    from cldrd_tpu.models import BertConfig

    spec = getattr(args, "model_config", None)
    if spec:
        # overrides go straight into BertConfig so BERT-only fields
        # (type_vocab_size) are accepted
        import json as _json
        import os as _os

        overrides = (_json.load(open(spec)) if _os.path.exists(spec)
                     else _json.loads(spec))
        overrides.setdefault("attention_impl", args.attention_impl)
        return BertConfig(**overrides)
    return (BertConfig.tiny(attention_impl=args.attention_impl)
            if args.model_size == "tiny"
            else BertConfig.minilm_l6(attention_impl=args.attention_impl))


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    if bool(args.checkpoint) == bool(args.run_folder):
        raise SystemExit("pass exactly one of --checkpoint / --run-folder")
    args.share_weights = bool(args.share_weights)
    dtype = jnp.dtype(args.compute_dtype)

    if args.mode == "cross":
        from .create_training_data import reconcile_teacher_arch

        reconcile_teacher_arch(args)
        cfg = _cross_config(args)
        model = CrossEncoder(config=cfg, dtype=dtype, arch=args.teacher_arch)

        from .create_training_data import _teacher_params

        def params_loader(path):
            return _teacher_params(path, model, cfg, arch=args.teacher_arch)

        def score_fn_factory(params):
            return make_cross_encoder_score_fn(model, params)
    else:
        cfg = model_config_from_args(args)
        model = NwayDualEncoder(config=cfg, share_weights=args.share_weights,
                                dtype=dtype,
                                apply_cosine_similarity=args.cosine)

        def params_loader(path):
            return load_dual_encoder_params(path, model, cfg,
                                            args.share_weights)

        def score_fn_factory(params):
            return make_dual_encoder_score_fn(model, params)

    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)
    dataset = RerankingDataset(
        args.candidates_run, args.queries, args.passages, tokenizer,
        is_cross_encoder=args.mode == "cross",
        max_len=args.max_length,
        query_max_len=args.max_query_len,
        passage_max_len=args.max_passage_len,
        with_token_type_ids=(args.mode == "cross"
                             and args.teacher_arch == "bert"),
    )
    evaluator = RerankingEvaluator(args.qrels, is_trec=args.trec)

    if args.checkpoint:
        metrics = evaluator.compute_metrics(
            score_fn_factory(params_loader(args.checkpoint)), dataset,
            args.batch_size, bucket_lengths=args.bucket_lengths,
        )
        print(json.dumps(metrics, indent=2, default=float))
        return 0

    cre = ContinueRerankEvaluator(
        evaluator, dataset, score_fn_factory, params_loader,
        batch_size=args.batch_size, bucket_lengths=args.bucket_lengths,
    )
    results = cre.evaluate_folder(args.run_folder, results_path=args.results)
    print(json.dumps({str(k): v for k, v in results.items()},
                     indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
