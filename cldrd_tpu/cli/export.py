"""Export a trained checkpoint back to the HF/torch ecosystem.

The inverse of the drop-in checkpoint loading: every ``--checkpoint`` here
accepts our ``.msgpack`` (or a reference ``.pth.tar``) and writes either

- ``--format reference``: a ``state_dict``-only ``.pth.tar`` in the
  reference's ``NwayDualEncoder`` layout (``query_encoder.* /
  passage_encoder.*`` keys) — loadable by the reference's own
  ``index_text.py:61-73`` / ``nway_listwise_2.py:301-310`` consumers; or
- ``--format hf``: two HF ``DistilBertModel`` ``pytorch_model.bin``
  state_dicts (``query_encoder/`` and ``passage_encoder/`` subdirs; one
  ``encoder/`` with ``--share-weights``), loadable with
  ``DistilBertModel.from_pretrained(..., state_dict=torch.load(...))``.

Conversion fidelity is the round-trip-tested ``dual_encoder_flax_to_torch``
(exact at full 66M size, ``tests/test_models.py``).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from typing import List, Optional

import jax.numpy as jnp

from cldrd_tpu.models import NwayDualEncoder, dual_encoder_flax_to_torch

from .common import (
    add_model_args,
    build_tokenizer,  # noqa: F401  (parity of import surface with peers)
    load_dual_encoder_params,
    model_config_from_args,
    setup_logging,
)

logger = logging.getLogger("cldrd_tpu.cli.export")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="our .msgpack (or a reference .pth.tar)")
    p.add_argument("--out", required=True, help="output file or directory")
    p.add_argument("--format", choices=("reference", "hf"),
                   default="reference")
    # cosine=False: export is pure weight conversion — normalization is an
    # encode-time behavior, not a stored weight; reject the inert flag
    add_model_args(p, cosine=False)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    args.share_weights = bool(args.share_weights)
    import torch

    cfg = model_config_from_args(args)
    model = NwayDualEncoder(config=cfg, share_weights=args.share_weights,
                            dtype=jnp.float32)
    params = load_dual_encoder_params(args.checkpoint, model, cfg,
                                      args.share_weights)

    sd = dual_encoder_flax_to_torch(params, share_weights=args.share_weights)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}

    if args.format == "reference":
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        torch.save({"state_dict": tensors}, args.out)
        print(json.dumps({"format": "reference", "path": args.out,
                          "n_tensors": len(tensors)}))
        return 0

    towers = (("encoder", "query_encoder"),) if args.share_weights else (
        ("query_encoder", "query_encoder"), ("passage_encoder", "passage_encoder"))
    written = {}
    for out_name, prefix in towers:
        tower_sd = {
            k[len(prefix) + 1:]: v for k, v in tensors.items()
            if k.startswith(prefix + ".")
        }
        d = os.path.join(args.out, out_name)
        os.makedirs(d, exist_ok=True)
        torch.save(tower_sd, os.path.join(d, "pytorch_model.bin"))
        written[out_name] = len(tower_sd)
    print(json.dumps({"format": "hf", "path": args.out, "towers": written}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
