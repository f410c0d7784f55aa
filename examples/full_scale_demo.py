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

Measured on one v5e chip through the development tunnel (2026-08-16):
index_build 476 s (2,339 passages/s end-to-end including first compile and
host tokenization — with the lightweight hash tokenizer on short synthetic
text; real HF subword tokenization of full-length MS MARCO passages does
more host work, which the prefetch thread must hide behind the 134 ms/batch
device time), search+run-file 25 s for all 6,980 queries. NOTE: in this dev
environment host<->device transfers run over a slow tunnel, so the
query-encode and result-fetch phases here are transfer-bound; the marginal
device rates are 3,832 passages/s and 14,213 search QPS (see README).

Usage:  python examples/full_scale_demo.py [--n-passages 1114112]
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
    tok = HashTokenizer(cfg.vocab_size)
    rng = np.random.default_rng(0)

    with timer.phase("synthesize_text"):
        words = np.array([f"w{i}" for i in range(50_000)])
        def make_texts(n, length):
            picks = rng.integers(0, len(words), (n, length))
            return {i: " ".join(words[row]) for i, row in enumerate(picks)}
        passages = make_texts(args.n_passages, 8)
        queries = make_texts(args.n_queries, 5)

    model = NwayDualEncoder(config=cfg, dtype=jnp.bfloat16)
    with timer.phase("init_params"):
        params = model.init(
            jax.random.PRNGKey(0),
            {"input_ids": jnp.zeros((1, 8), jnp.int32),
             "attention_mask": jnp.ones((1, 8), jnp.int32)},
            {"input_ids": jnp.zeros((1, 1, 8), jnp.int32),
             "attention_mask": jnp.ones((1, 1, 8), jnp.int32)},
        )["params"]

    with timer.phase("index_build"):
        pds = SequenceDataset(passages, tok, 256, is_query=False)
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
