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
"""
from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from cldrd_tpu.data.nway_dataset import NwayDataset
from cldrd_tpu.train import TrainConfig, run_curriculum

from .common import add_model_args, build_tokenizer, model_config_from_args, setup_logging


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
    p.add_argument("--model-checkpoint", default=None,
                   help="warm start for iteration 1 (e.g. converted TAS-B)")
    add_model_args(p)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
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
        )

    run_curriculum(iterations, model_config_from_args(args), dataset_factory)
    return 0


if __name__ == "__main__":
    sys.exit(main())
