"""Build the corpus embedding index.

Replaces the reference's ``retriever/index_text.py`` (encode the collection
with the trained passage tower at batch 512, build the flat-IP index, persist
it, ``:57-110``): here the encode step is a batch-sharded SPMD program, the
index is bf16 shards in HBM, and persistence is the blocked shard store of
``cldrd_tpu.index.persistence`` (JSON meta + binary shards + ids.npy, the
FAISS ``write_index`` replacement).
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import List, Optional

import jax.numpy as jnp

from cldrd_tpu.data.sequence_dataset import SequenceDataset
from cldrd_tpu.index import encode_dataset, make_encode_fn
from cldrd_tpu.index.persistence import write_embeddings
from cldrd_tpu.models import NwayDualEncoder

from .common import (
    add_model_args,
    build_tokenizer,
    load_dual_encoder_params,
    model_config_from_args,
    setup_logging,
)

logger = logging.getLogger("cldrd_tpu.cli.index")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--collection", required=True, help="pid\\ttext TSV")
    p.add_argument("--checkpoint", default=None,
                   help=".msgpack or reference .pth.tar weights")
    p.add_argument("--out", required=True, help="index output directory")
    p.add_argument("--max-length", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--store-dtype", default="float32",
                   choices=("float16", "float32", "int8"),
                   help="on-disk embedding dtype; fp32 matches the reference "
                        "store (fp16 halves disk at a measured near-tie tail "
                        "cost; int8 = per-row-scaled quantized store, 4x "
                        "smaller, loads straight into --hbm-dtype int8 — "
                        "see examples/quantization_study.py)")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="encoder activation dtype; float32 for bit-parity "
                        "runs against fp32 oracles")
    p.add_argument("--bucket-lengths", type=int, nargs="*", default=None,
                   help="enable length-bucketed encoding: pad each passage "
                        "only to the smallest listed bucket that fits it "
                        "(empty list = default 32/64/128/... ladder). "
                        "Identical embeddings, ~token-proportional encode "
                        "time; index row order becomes length-grouped "
                        "(immaterial: identity rides on the id map)")
    p.add_argument("--devices", type=int, default=1,
                   help="data-parallel encode over this many local devices "
                        "(batch rows shard over the mesh; 0 = all local "
                        "devices). The reference's 4-GPU DDP encode "
                        "equivalent, as one SPMD program")
    p.add_argument("--token-cache", default=None,
                   help="directory for the pre-tokenized corpus cache: "
                        "built on first use, then streamed at memmap speed "
                        "on every rebuild (the curriculum re-encodes the "
                        "same collection after each iteration)")
    p.add_argument("--ivf-nlist", type=int, default=None,
                   help="ALSO build an IVF index (k-means coarse quantizer "
                        "with this many cells) into <out>/ivf — the "
                        "low-latency serving companion to the exact flat "
                        "store (cldrd-serve --ivf --nprobe N)")
    p.add_argument("--ivf-slot", type=int, default=None,
                   help="rows per IVF bucket (default: mean cluster size "
                        "rounded up to 128)")
    p.add_argument("--ivf-nprobe", type=int, default=8,
                   help="default probe count stored with the IVF index")
    p.add_argument("--pq-m", type=int, default=None,
                   help="store the IVF companion as product-quantized "
                        "residual codes with this many sub-quantizers "
                        "(FAISS IndexIVFPQ): pq_m * pq_bits / 8 bytes a "
                        "row — e.g. 96x4-bit on 768-d is 48 B, the full "
                        "8.8M corpus in ~0.42 GB HBM. Requires "
                        "--ivf-nlist; dim must divide by pq_m")
    p.add_argument("--pq-bits", type=int, default=4, choices=(4, 8),
                   help="bits per PQ code (4: 16-codeword fast-scan "
                        "shape; 8: classic 256-codeword PQ)")
    p.add_argument("--opq", action="store_true",
                   help="with --pq-m: learn an orthogonal pre-rotation "
                        "(FAISS OPQMatrix) that decorrelates sub-spaces "
                        "before coding — lower distortion, same search "
                        "cost (the rotation rides the query)")
    p.add_argument("--ivf-only", action="store_true",
                   help="build ONLY the IVF companion from the flat store "
                        "already at --out (no re-encoding; --collection/"
                        "--checkpoint are ignored). Requires --ivf-nlist")
    add_model_args(p)
    return p


def _build_ivf(args, embeddings, ids) -> None:
    import os

    from cldrd_tpu.index import IVFIndex

    t0 = time.perf_counter()
    ivf = IVFIndex.build(
        embeddings, ids, nlist=args.ivf_nlist, slot=args.ivf_slot,
        nprobe=args.ivf_nprobe,
        # fp32 build for a lossless store; int8 follows the flat store's
        # quantization choice. The HBM dtype is picked at load time
        # (cldrd-serve --hbm-dtype). --pq-m overrides both: the store
        # becomes uint8 residual codes.
        dtype=jnp.int8 if args.store_dtype == "int8" else jnp.float32,
        pq_m=args.pq_m, pq_bits=args.pq_bits, opq=args.opq,
    )
    ivf_dir = os.path.join(args.out, "ivf")
    ivf.save(ivf_dir)
    logger.info(
        "IVF%s index (%d buckets x %d slot) written to %s in %.1fs",
        "PQ" if ivf.is_pq else "", ivf.n_buckets, ivf.slot, ivf_dir,
        time.perf_counter() - t0,
    )


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    if args.pq_m and not args.ivf_nlist:
        raise SystemExit("--pq-m requires --ivf-nlist (PQ is the IVF "
                         "companion's storage layer)")
    if args.opq and not args.pq_m:
        raise SystemExit("--opq requires --pq-m (it rotates the PQ "
                         "coding space)")
    if args.ivf_only:
        if not args.ivf_nlist:
            raise SystemExit("--ivf-only requires --ivf-nlist")
        from cldrd_tpu.index.persistence import index_exists, read_embeddings

        if not index_exists(args.out):
            raise SystemExit(
                f"--ivf-only: no flat store at {args.out} (run cldrd-index "
                "without --ivf-only first)")
        import json
        import os

        from cldrd_tpu.index.persistence import META_NAME

        with open(os.path.join(args.out, META_NAME)) as f:
            disk_dtype = json.load(f)["dtype"]
        if disk_dtype == "int8":
            # the IVF follows the flat store's quantization choice; the
            # dequantize -> per-row requantize round trip is bit-identical
            args.store_dtype = "int8"
        embeddings, ids = read_embeddings(args.out)
        logger.info("building IVF from the existing %d-row store at %s",
                    len(ids), args.out)
        _build_ivf(args, embeddings, ids)
        return 0
    args.share_weights = bool(args.share_weights)
    cfg = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)

    compute_dtype = (
        jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16
    )
    if args.compute_dtype == "float32":
        # XLA's DEFAULT TPU precision rounds even fp32 matmul inputs to
        # bf16; fp32 parity runs need true-fp32 (bf16x6) encoder matmuls
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    model = NwayDualEncoder(
        config=cfg, share_weights=args.share_weights, dtype=compute_dtype,
        apply_cosine_similarity=args.cosine,
    )
    params = load_dual_encoder_params(
        args.checkpoint, model, cfg, args.share_weights,
        max_passage_len=args.max_length,
    )
    if args.token_cache:
        from cldrd_tpu.data import (
            TokenCacheDataset, token_cache_exists, write_token_cache,
        )

        if not token_cache_exists(args.token_cache):
            logger.info("building token cache at %s ...", args.token_cache)
            src = SequenceDataset.create_from_seqs_file(
                args.collection, tokenizer, args.max_length, is_query=False
            )
            write_token_cache(src, args.token_cache)
        dataset = TokenCacheDataset(args.token_cache)
    else:
        dataset = SequenceDataset.create_from_seqs_file(
            args.collection, tokenizer, args.max_length, is_query=False
        )
    batch_multiple = 1
    if args.devices != 1:
        from cldrd_tpu.parallel import DATA_AXIS, make_mesh

        mesh = make_mesh(args.devices or None, DATA_AXIS)
        ndev = mesh.devices.size
        if args.batch_size % ndev:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of the "
                f"{ndev} devices (rows shard evenly)")
        batch_multiple = ndev
        encode = make_encode_fn(model, params, "passage_embs",
                                mesh=mesh, axis_name=DATA_AXIS)
    else:
        encode = make_encode_fn(model, params, "passage_embs")
    t0 = time.perf_counter()
    embeddings, ids = encode_dataset(
        encode, dataset, args.batch_size,
        bucket_lengths=args.bucket_lengths,
        batch_multiple=batch_multiple,
    )
    elapsed = time.perf_counter() - t0
    logger.info(
        "encoded %d passages in %.1fs (%.0f passages/s)",
        len(ids), elapsed, len(ids) / max(elapsed, 1e-9),
    )
    write_embeddings(args.out, embeddings, ids, dtype=args.store_dtype)
    logger.info("index written to %s", args.out)
    if args.ivf_nlist:
        _build_ivf(args, embeddings, ids)
    return 0


if __name__ == "__main__":
    sys.exit(main())
