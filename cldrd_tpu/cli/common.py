"""Shared CLI plumbing: tokenizer/model/params construction, logging.

The reference repeats this block in every script (model build + checkpoint
load with ``module.`` stripping, ``index_text.py:58-76``,
``nway_listwise_2.py:296-310``); here it lives once.
"""
from __future__ import annotations

import argparse
import logging
import sys
from typing import Any, Optional, Tuple

from cldrd_tpu.models import DistilBertConfig


def setup_logging(verbose: bool = True) -> None:
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        stream=sys.stdout,
        force=True,
    )


def model_config_from_args(args: argparse.Namespace) -> DistilBertConfig:
    # --arch selects the config CLASS; the config type drives the towers
    # (NwayDualEncoder stands up BertEncoder for a BertConfig), so every
    # CLI gains the BERT/MiniLM dual-encoder family through this one switch
    arch = getattr(args, "arch", "distilbert") or "distilbert"
    if arch == "bert":
        from cldrd_tpu.models import BertConfig as cfg_cls
    else:
        cfg_cls = DistilBertConfig
    spec = getattr(args, "model_config", None)
    if spec:
        # JSON file path or inline JSON dict of config overrides
        import json
        import os

        if os.path.exists(spec):
            with open(spec) as f:
                overrides = json.load(f)
        else:
            overrides = json.loads(spec)
        overrides.setdefault(
            "attention_impl", getattr(args, "attention_impl", "auto")
        )
        return cfg_cls(**overrides)
    if getattr(args, "model_size", "full") == "tiny":
        return cfg_cls.tiny(
            attention_impl=getattr(args, "attention_impl", "auto"))
    full_kwargs = dict(attention_impl=getattr(args, "attention_impl", "auto"))
    if arch == "bert":
        # full BERT defaults to the bert-base-uncased shape (the inherited
        # defaults describe distilbert-base: 6 layers)
        full_kwargs["n_layers"] = 12
    return cfg_cls(**full_kwargs)


def add_model_args(p: argparse.ArgumentParser, cosine: bool = True) -> None:
    p.add_argument("--arch", choices=("distilbert", "bert"),
                   default="distilbert",
                   help="encoder family: the reference's DistilBERT towers "
                        "or BERT (token-type embeddings; MiniLM/bert-base "
                        "retrievers). Checkpoint conversion auto-detects "
                        "the layout either way")
    p.add_argument("--model-size", choices=("full", "tiny"), default="full",
                   help="'tiny' is the hermetic test configuration")
    p.add_argument("--model-config", default=None,
                   help="config overrides as a JSON file path or "
                        "inline JSON (takes precedence over --model-size)")
    p.add_argument("--attention-impl", choices=("auto", "xla", "pallas"),
                   default="auto",
                   help="'auto' (default) = measured-best per backend: the "
                        "fused Pallas train kernels on TPU when dropout is "
                        "active, XLA everywhere else (inference/encode, and "
                        "CPU). Explicit 'xla'/'pallas' force that path")
    # default=None so a YAML config's share_weights survives when the flag
    # is not passed (argparse's store_true default False would clobber it)
    p.add_argument("--share-weights", action="store_true", default=None,
                   help="one tower for queries and passages (reference --share_weights)")
    p.add_argument("--tokenizer", default="hash",
                   help="'hash' (hermetic) or an HF tokenizer name/path")
    # CLIs that have no cosine-scoring code path (export, the cross-encoder
    # teacher) opt out so argparse rejects the flag instead of silently
    # accepting an inert --cosine
    if cosine:
        p.add_argument("--cosine", action="store_true", default=False,
                       help="the checkpoint was trained with cosine scoring "
                            "(--apply-cosine-similarity): L2-normalize every "
                            "embedding at encode time so the IP index/search "
                            "ranks by cosine, matching the training objective")


def build_tokenizer(name: str, vocab_size: int = 30522):
    """'hash' -> dependency-free HashTokenizer; anything else -> HF fast
    tokenizer wrapped in the fixed-shape adapter.

    ``vocab_size`` MUST be the model's embedding-table size for the hash
    tokenizer — out-of-range token ids silently corrupt training (NaN loss
    from step 1); the trainer also validates this on its first batch."""
    from cldrd_tpu.data.tokenization import HashTokenizer, HFTokenizerAdapter

    if name == "hash":
        return HashTokenizer(vocab_size=vocab_size)
    from transformers import AutoTokenizer

    return HFTokenizerAdapter(AutoTokenizer.from_pretrained(name))


def load_dual_encoder_params(
    checkpoint: Optional[str],
    model,
    cfg: DistilBertConfig,
    share_weights: bool,
    max_query_len: int = 30,
    max_passage_len: int = 256,
    seed: int = 0,
) -> Any:
    """Params from (in priority order) a checkpoint path — our ``.msgpack``
    or a reference torch ``.pth.tar`` — or fresh random init."""
    import jax
    import jax.numpy as jnp

    # dummy shapes only determine the param-tree structure, never param
    # shapes — keep them tiny and within max_position_embeddings
    del max_query_len, max_passage_len
    dummy_len = min(8, cfg.max_position_embeddings)
    dummy_q = {
        "input_ids": jnp.zeros((1, dummy_len), jnp.int32),
        "attention_mask": jnp.ones((1, dummy_len), jnp.int32),
    }
    dummy_p = {
        "input_ids": jnp.zeros((1, 1, dummy_len), jnp.int32),
        "attention_mask": jnp.ones((1, 1, dummy_len), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(seed), dummy_q, dummy_p)["params"]
    if checkpoint:
        from cldrd_tpu.train.checkpoint import load_warm_start_params

        params = load_warm_start_params(checkpoint, params, share_weights)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
    return params
