"""Train one curriculum iteration.

The config-driven replacement for the reference's three training scripts
(``trainer/multistep-curriculum/nway_listwise_{1,2,3}.py``): every
hyperparameter is a ``TrainConfig`` field; a YAML config supplies defaults
and CLI flags override individual fields.
"""
from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from cldrd_tpu.data.nway_dataset import NwayDataset
from cldrd_tpu.train import TrainConfig, Trainer

from .common import add_model_args, build_tokenizer, model_config_from_args, setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="YAML TrainConfig (CLI flags override)")
    add_model_args(p)
    for field in (
        "queries_path", "passages_path", "training_path", "train_fmt",
        "label_mode", "model_checkpoint", "resume", "run_folder",
        "experiment_name", "loss", "weighing_scheme", "compute_dtype",
        "kd_mode", "neg_score_mode",
    ):
        p.add_argument(f"--{field.replace('_', '-')}", dest=field, default=None)
    for field in (
        "max_query_len", "max_passage_len", "num_train_epochs", "batch_size",
        "warmup_steps", "seed", "logging_steps", "evaluate_steps", "n_devices",
        "grad_accum_steps",
    ):
        p.add_argument(f"--{field.replace('_', '-')}", dest=field, type=int, default=None)
    for field in (
        "learning_rate", "weight_decay", "adam_epsilon", "max_grad_norm",
        "reg_lambda", "temperature", "lambda_weight",
    ):
        p.add_argument(f"--{field.replace('_', '-')}", dest=field, type=float, default=None)
    p.add_argument("--in-batch-loss", action="store_true", default=None)
    # the reference unity scripts' --apply_consine_similarity [sic]
    # (scripts/unity/cosine_nway_listwise.sh, missing ctof_grained trainers);
    # retrieval-side CLIs take the matching --cosine flag so the index is
    # built and searched in the same cosine space
    p.add_argument("--apply-cosine-similarity", dest="apply_cosine_similarity",
                   action="store_true", default=None)
    p.add_argument("--all-in-batch-neg", action="store_true", default=None)
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize transformer blocks in backward "
                        "(~1/3 more FLOPs for O(layers) less HBM; enables "
                        "large nway*batch shapes per chip)")
    p.add_argument("--pack-passages", action="store_true", default=None,
                   help="pack short passages into shared max-passage-len "
                        "rows (segment-masked attention + position reset): "
                        "~token-proportional passage-tower FLOPs, "
                        "numerically identical logits. Default 'auto': "
                        "ON for TPU (the measured-best configuration), "
                        "OFF for CPU")
    p.add_argument("--no-pack-passages", dest="pack_passages",
                   action="store_false",
                   help="force the flat [bz, nway, L] layout (overrides "
                        "the TPU 'auto' default)")
    p.add_argument("--tensorboard", action="store_true", default=None,
                   help="also write TensorBoard event files under "
                        "<run_dir>/tb (TSV/JSONL logs are always written)")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    cfg = TrainConfig.from_yaml(args.config) if args.config else TrainConfig()
    overrides = {
        k: v
        for k, v in vars(args).items()
        if v is not None and hasattr(cfg, k)
    }
    return cfg.replace(**overrides)


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    # must run before ANY backend-touching JAX call (device queries, jit):
    # on a pod this brings up the DCN cluster, single-host it no-ops
    from cldrd_tpu.parallel import host_shard, initialize_multihost

    initialize_multihost()
    rank, nranks = host_shard()
    args = build_parser().parse_args(argv)
    # --cosine (the retrieval CLIs' spelling) and --apply-cosine-similarity
    # (the reference trainers' spelling) mean the same thing here; honor both
    # so the flag is never silently inert
    if getattr(args, "cosine", False):
        args.apply_cosine_similarity = True
    cfg = config_from_args(args)
    model_config = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=model_config.vocab_size)
    dataset = NwayDataset.create_from_files(
        cfg.queries_path, cfg.passages_path, cfg.training_path,
        tokenizer, cfg.max_query_len, cfg.max_passage_len,
        cfg.label_mode, fmt=cfg.train_fmt, neg_score_mode=cfg.neg_score_mode,
        rank=rank, nranks=nranks, pack_passages=cfg.pack_passages,
    )
    trainer = Trainer(cfg, model_config)
    trainer.train(dataset)
    return 0


if __name__ == "__main__":
    sys.exit(main())
