"""Run the full multi-iteration CL-DRD curriculum as one program.

Replaces the reference's manual bash hand-off (run ``nway_listwise_1.py``,
copy its checkpoint path into ``nway_listwise_2.py``'s flags, then 3, then
index/retrieve/evaluate — SURVEY §3.5) with a single invocation:

  python -m cldrd_tpu.cli.curriculum \\
      --queries q.tsv --passages c.tsv \\
      --training-paths it1.jsonl it2.jsonl it3.jsonl \\
      --label-modes 8 9 10 --learning-rates 7e-6 3e-6 3e-6 --epochs 4 2 2

Weights hand forward in memory between iterations; each iteration still
writes resumable checkpoints under ``<run-folder>/curriculum_iterN``.

With ``--eval-queries``/``--eval-qrels``, every iteration is followed by a
full retrieval evaluation (the reference's between-stage
``continue_rerank_evaluator`` workflow, ``scripts/unity/
continue_rerank_evaluator.sh:4`` + SURVEY §3.5): the just-trained passage
tower encodes the collection straight into a device-resident flat index (no
host round-trip), the query tower encodes the eval queries, top-k retrieval
writes ``curriculum_iterN.run.tsv``, and ``RankingEvaluator`` metrics are
appended to ``<run-folder>/curriculum_eval.tsv``.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import List, Optional

from cldrd_tpu.data.nway_dataset import NwayDataset
from cldrd_tpu.train import TrainConfig, run_curriculum

from .common import add_model_args, build_tokenizer, model_config_from_args, setup_logging

logger = logging.getLogger("cldrd_tpu.cli.curriculum")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="YAML TrainConfig base (flags override)")
    p.add_argument("--queries", required=True)
    p.add_argument("--passages", required=True)
    p.add_argument("--training-paths", nargs="+", required=True)
    p.add_argument("--label-modes", nargs="+", default=["8", "9", "10"])
    p.add_argument("--learning-rates", nargs="+", type=float,
                   default=[7e-6, 3e-6, 3e-6])
    p.add_argument("--epochs", nargs="+", type=int, default=[4, 2, 2])
    p.add_argument("--train-fmt", default="relT_most_semi_hard")
    p.add_argument("--run-folder", default="./experiments")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--pack-passages", action="store_true", default=None,
                   help="pack short passages into shared rows "
                        "(token-proportional passage-tower FLOPs, "
                        "identical logits). Default 'auto': ON for TPU, "
                        "OFF for CPU")
    p.add_argument("--no-pack-passages", dest="pack_passages",
                   action="store_false",
                   help="force the flat [bz, nway, L] layout")
    p.add_argument("--model-checkpoint", default=None,
                   help="warm start for iteration 1 (e.g. converted TAS-B)")
    p.add_argument("--eval-queries", default=None,
                   help="qid\\ttext TSV: run index+retrieve+evaluate after "
                        "each iteration (requires --eval-qrels)")
    p.add_argument("--eval-qrels", default=None)
    p.add_argument("--eval-topk", type=int, default=1000)
    p.add_argument("--eval-trec", action="store_true")
    p.add_argument("--eval-batch-size", type=int, default=128,
                   help="encode + search batch size for per-iteration eval")
    p.add_argument("--eval-bucket-lengths", type=int, nargs="*", default=None,
                   help="length-bucketed passage encoding for the "
                        "per-iteration index build (empty list = default "
                        "ladder); identical embeddings, ~token-proportional "
                        "encode time")
    add_model_args(p)
    return p


def _make_eval_hook(args, base: TrainConfig, model_config, tokenizer):
    """Per-iteration index-build + retrieval + metric evaluation."""
    import numpy as np

    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.evaluation import RankingEvaluator
    from cldrd_tpu.index import (
        build_index_on_device, encode_dataset, make_encode_fn,
    )
    from cldrd_tpu.search import retrieve_to_run_file
    from cldrd_tpu.utils import MetricMonitor

    evaluator = RankingEvaluator(args.eval_qrels, is_trec=args.eval_trec)
    passages_ds = SequenceDataset.create_from_seqs_file(
        args.passages, tokenizer, base.max_passage_len, is_query=False
    )
    queries_ds = SequenceDataset.create_from_seqs_file(
        args.eval_queries, tokenizer, base.max_query_len, is_query=True
    )
    monitor = MetricMonitor()
    table_path = os.path.join(base.run_folder, "curriculum_eval.tsv")

    def hook(i, state, trainer):
        p_encode = make_encode_fn(trainer.model, state.params, "passage_embs")
        index = build_index_on_device(
            p_encode, passages_ds, args.eval_batch_size, dim=model_config.dim,
            bucket_lengths=args.eval_bucket_lengths,
        )
        q_encode = make_encode_fn(trainer.model, state.params, "query_embs")
        q_embs, qids = encode_dataset(q_encode, queries_ds, args.eval_batch_size)
        run_path = os.path.join(
            base.run_folder, f"curriculum_iter{i + 1}.run.tsv"
        )
        retrieve_to_run_file(
            index, q_embs, qids, run_path,
            topk=args.eval_topk, batch_size=args.eval_batch_size,
        )
        metrics = evaluator.compute_metrics(run_path)
        monitor.update(i + 1, **{
            k: float(v) for k, v in metrics.items()
            if isinstance(v, (int, float, np.integer, np.floating))
        })
        monitor.write(table_path)
        logger.info("iteration %d eval: %s", i + 1, metrics)

    return hook


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    # pod bring-up must precede any backend-touching JAX call
    from cldrd_tpu.parallel import initialize_multihost

    initialize_multihost()
    args = build_parser().parse_args(argv)
    n_iter = len(args.training_paths)
    assert len(args.label_modes) == len(args.learning_rates) == len(args.epochs) == n_iter

    base = TrainConfig.from_yaml(args.config) if args.config else TrainConfig()
    base = base.replace(
        queries_path=args.queries,
        passages_path=args.passages,
        train_fmt=args.train_fmt,
        run_folder=args.run_folder,
    )
    if args.share_weights is not None:
        base = base.replace(share_weights=args.share_weights)
    if args.batch_size is not None:
        base = base.replace(batch_size=args.batch_size)
    if args.pack_passages is not None:
        base = base.replace(pack_passages=args.pack_passages)
    if args.cosine:
        # cosine scoring rides the model (Trainer builds the towers from
        # this field), so the per-iteration eval hook's encode fns
        # normalize automatically and the eval index searches cosine space
        base = base.replace(apply_cosine_similarity=True)

    iterations: List[TrainConfig] = []
    for i in range(n_iter):
        cfg = base.replace(
            training_path=args.training_paths[i],
            label_mode=args.label_modes[i],
            learning_rate=args.learning_rates[i],
            num_train_epochs=args.epochs[i],
            experiment_name=f"curriculum_iter{i + 1}",
            model_checkpoint=args.model_checkpoint if i == 0 else None,
        )
        iterations.append(cfg)

    model_config = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=model_config.vocab_size)

    def dataset_factory(cfg: TrainConfig) -> NwayDataset:
        return NwayDataset.create_from_files(
            cfg.queries_path, cfg.passages_path, cfg.training_path,
            tokenizer, cfg.max_query_len, cfg.max_passage_len,
            cfg.label_mode, fmt=cfg.train_fmt,
            pack_passages=cfg.pack_passages,
        )

    hook = None
    if args.eval_queries or args.eval_qrels:
        if not (args.eval_queries and args.eval_qrels):
            raise SystemExit("--eval-queries and --eval-qrels go together")
        os.makedirs(base.run_folder, exist_ok=True)
        hook = _make_eval_hook(args, base, model_config, tokenizer)

    run_curriculum(iterations, model_config, dataset_factory,
                   after_iteration=hook)
    return 0


if __name__ == "__main__":
    sys.exit(main())
