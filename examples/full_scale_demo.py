"""Full-scale end-to-end demonstration on one TPU chip.

Replays the reference's production pipeline (``index_text.py`` +
``retrieve_top_passages.py``) at the per-chip scale of the real MS MARCO
deployment — 1.1M passages (the 1/8 shard a v4-8 holds for the 8.8M
collection) and the full 6,980-query dev set — with synthetic text and
random full-size DistilBERT weights (the arithmetic is identical to the
real workload; only the bytes differ):

  tokenize (host, prefetch-overlapped)
    -> encode 1.1M passages (bf16, batch 512)
    -> device-resident bf16 flat-IP index (no host round-trip)
    -> encode 6,980 queries
    -> exact top-1000 bin-max search (batch 512)
    -> qid\tpid\trank\tscore run file

Prints a JSON phase breakdown. Reference baseline for the index-build
phase: ~2.5 h on an RTX 8000 (reference README.md:20).

Measured on one v5e chip through the development tunnel (2026-08-16,
production path: --tokenizer wordpiece --words-per-passage 60
--token-cache): REAL WordPiece tokenization of all 1.1M 60-word passages
into the uint16 cache took 262 s (one core; amortized to zero across the
curriculum's 3 re-builds), index_build from the cache 385 s (2,892
passages/s e2e), search+run-file 21 s for all 6,980 queries x top-1000.
NOTE: in this dev environment host<->device transfers run over a ~5 MB/s
tunnel, so the e2e build/query phases are transfer-bound (1 MB of tokens
per encode batch; 56 MB of results); the marginal device rates are 4,387
passages/s (CLS-only final block) and 14,379 search QPS (see README) —
on real hosts PCIe/DMA makes the device rate the binding constraint.

Usage:  python examples/full_scale_demo.py [--n-passages 1114112]
        [--tokenizer {hash,wordpiece}] [--token-cache DIR]
        [--words-per-passage N]

--tokenizer wordpiece trains a real WordPiece vocab locally (HF tokenizers,
Rust) and tokenizes full-length passages — the honest host-cost profile.
--token-cache tokenizes once into a uint16 memmap and streams it on the
build (the production path: the CL-DRD curriculum re-encodes the SAME
collection after every iteration, so builds 2+ pay zero tokenization).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-passages", type=int, default=1_114_112)
    p.add_argument("--n-queries", type=int, default=6980)
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--encode-batch", type=int, default=512)
    p.add_argument("--search-batch", type=int, default=512)
    p.add_argument("--out", default="/tmp/full_scale_demo.run")
    p.add_argument("--tokenizer", default="hash", choices=("hash", "wordpiece"))
    p.add_argument("--words-per-passage", type=int, default=8,
                   help="use ~60 with --tokenizer wordpiece for realism")
    p.add_argument("--token-cache", default=None,
                   help="directory for a pre-tokenized cache (built if absent)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import build_index_on_device, encode_dataset, make_encode_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder
    from cldrd_tpu.search import retrieve_to_run_file
    from cldrd_tpu.utils import PhaseTimer

    timer = PhaseTimer()
    cfg = DistilBertConfig()
    rng = np.random.default_rng(0)

    with timer.phase("synthesize_text"):
        words = np.array([f"w{i}" for i in range(50_000)])
        def make_texts(n, length):
            picks = rng.integers(0, len(words), (n, length))
            return {i: " ".join(words[row]) for i, row in enumerate(picks)}
        passages = make_texts(args.n_passages, args.words_per_passage)
        queries = make_texts(args.n_queries, 5)

    if args.tokenizer == "wordpiece":
        from cldrd_tpu.data.tokenization import train_wordpiece_tokenizer

        with timer.phase("train_wordpiece_vocab"):
            sample = [passages[i] for i in range(min(len(passages), 200_000))]
            tok = train_wordpiece_tokenizer(sample, cfg.vocab_size)
    else:
        tok = HashTokenizer(cfg.vocab_size)

    model = NwayDualEncoder(config=cfg, dtype=jnp.bfloat16)
    with timer.phase("init_params"):
        params = model.init(
            jax.random.PRNGKey(0),
            {"input_ids": jnp.zeros((1, 8), jnp.int32),
             "attention_mask": jnp.ones((1, 8), jnp.int32)},
            {"input_ids": jnp.zeros((1, 1, 8), jnp.int32),
             "attention_mask": jnp.ones((1, 1, 8), jnp.int32)},
        )["params"]

    pds = SequenceDataset(passages, tok, 256, is_query=False)
    if args.token_cache:
        from cldrd_tpu.data import (
            TokenCacheDataset, token_cache_exists, write_token_cache,
        )

        if not token_cache_exists(args.token_cache):
            with timer.phase("token_cache_build"):
                write_token_cache(pds, args.token_cache,
                                  batch_size=args.encode_batch)
        pds = TokenCacheDataset(args.token_cache)

    with timer.phase("index_build"):
        enc_p = make_encode_fn(model, params, "passage_embs")
        index = build_index_on_device(
            enc_p, pds, batch_size=args.encode_batch, dim=cfg.dim,
            dtype=jnp.bfloat16,
        )
        _ = np.asarray(index.embeddings[0, 0])  # force completion

    with timer.phase("encode_queries"):
        qds = SequenceDataset(queries, tok, 32, is_query=True)
        enc_q = make_encode_fn(model, params, "query_embs")
        q_embs, qids = encode_dataset(enc_q, qds, args.encode_batch)

    with timer.phase("search_top1000"):
        stats = retrieve_to_run_file(
            index, q_embs, qids, args.out,
            topk=args.topk, batch_size=args.search_batch,
        )

    phases = timer.report()
    with open(args.out) as f:
        run_lines = sum(1 for _ in f)
    report = {
        "n_passages": args.n_passages,
        "n_queries": args.n_queries,
        "phases": phases,
        "index_passages_per_s": round(args.n_passages / phases["index_build_s"], 1),
        "search_qps": round(stats["qps"], 1),
        "run_file_lines": run_lines,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
