"""Quantization study: persist -> load -> search Recall@1000 tail cost.

Measures what the disk dtype (fp32 vs fp16) and the HBM dtype (fp32 vs
bf16) cost in exact-top-1000 agreement on a corpus engineered to be
quantization-hostile: clustered near-ties (many rows within ~1e-3 of each
other in score space), where rounding reorders the tail.

Pipelines compared against the true-fp32 oracle:
  T  fp32 scores at precision=HIGHEST (bf16x6 passes == fp32-exact — the
     FAISS-equivalent scoring; NOTE: a plain fp32 matmul is NOT fp32 on
     TPU, XLA's default precision rounds fp32 matmul inputs to bf16)
  A  fp32 disk -> fp32 HBM, default precision
  B  fp32 disk -> bf16 HBM      (the production default)
  C  fp16 disk -> bf16 HBM      (half-size store; double quantization)

The disk round-trip is simulated by on-device dtype casts, which is
mathematically identical to the real store (``index/persistence.py``
writes the exact fp16/fp32 values and reads them back losslessly into
fp32 — byte-level roundtrip fidelity is covered by the persistence tests)
and avoids pushing a 3 GB corpus through this dev environment's slow
host<->device tunnel. Pass ``--use-disk`` to run the real write/read path
(small corpora only).

Run:  python examples/quantization_study.py [--rows 1000000] [--queries 256]
Backs the fp32 default in ``cldrd_tpu/index/persistence.py``.

Measured on one v5e chip (2026-08-16), 1M x 768, 256 center-aimed queries,
k=1000, 512 clusters (see persistence.py docstring for the conclusion):
results recorded in the repo README / commit message of this file.
"""
import argparse
import functools
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def recall_overlap(truth_ids: np.ndarray, got_ids: np.ndarray) -> float:
    """Mean fraction of the truth top-k recovered (Recall@k overlap).

    NOTE: ties mask differences here — exactly-tied rows break by index
    order identically in every pipeline, so this can read 1.0 even when
    quantization collapsed distinct scores. The tie-aware metrics below are
    the meaningful ones."""
    hits = 0
    for t_row, g_row in zip(truth_ids, got_ids):
        hits += len(set(t_row.tolist()) & set(g_row.tolist()))
    return hits / truth_ids.size


def tie_aware_quality(corpus_dev, queries, got_ids, k):
    """(tie-aware recall, mean score regret) against true fp32 scores.

    An item counts as correct iff its TRUE score >= the true k-th score
    (any member of a tied boundary class is equally right — FAISS semantics).
    Regret = mean over queries of (sum of true top-k scores - sum of true
    scores of the returned items), i.e. the actual quality lost."""
    import jax
    import jax.numpy as jnp

    # corpus passed as an ARGUMENT: closing over a large device array turns
    # it into an embedded constant and sends XLA constant folding into a
    # multi-minute compile (same gotcha as bench.py).
    # precision=HIGHEST: TPU default precision rounds fp32 matmul inputs to
    # bf16 — HIGHEST (bf16x6) is the fp32-exact FAISS-equivalent oracle.
    @functools.partial(jax.jit, static_argnames=("k_",))
    def stats(corpus, q, ids, k_):
        true_scores = jax.lax.dot_general(
            q, corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [b, N] fp32-exact
        top = jax.lax.top_k(true_scores, k_)[0]
        kth = top[:, -1:]
        got_true = jnp.take_along_axis(true_scores, ids.astype(jnp.int32), axis=1)
        correct = jnp.sum(got_true >= kth - 1e-12, axis=1)
        regret = jnp.sum(top, axis=1) - jnp.sum(got_true, axis=1)
        return jnp.sum(correct), jnp.sum(regret)

    total_correct, total_regret = 0.0, 0.0
    bq = 32
    for start in range(0, queries.shape[0], bq):
        q = jnp.asarray(queries[start : start + bq], jnp.float32)
        ids = jnp.asarray(got_ids[start : start + bq])
        c, r = stats(corpus_dev, q, ids, k)
        total_correct += float(c)
        total_regret += float(r)
    n_q = queries.shape[0]
    return total_correct / (n_q * k), total_regret / n_q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--clusters", type=int, default=512)
    ap.add_argument("--noise", type=float, default=1e-3,
                    help="within-cluster spread: smaller = tighter near-ties")
    ap.add_argument("--use-disk", action="store_true",
                    help="run the real write/read path (small corpora only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cldrd_tpu.index import FlatIPIndex

    print(f"building clustered corpus [{args.rows} x {args.dim}] on device ...")

    @jax.jit
    def gen():
        kc, ka, kn, kq, kp = jax.random.split(jax.random.PRNGKey(0), 5)
        centers = jax.random.normal(kc, (args.clusters, args.dim), jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        assign = jax.random.randint(ka, (args.rows,), 0, args.clusters)
        corpus = centers[assign] + args.noise * jax.random.normal(
            kn, (args.rows, args.dim), jnp.float32
        )
        q_idx = jax.random.randint(kq, (args.queries,), 0, args.clusters)
        queries = centers[q_idx] + 0.1 * args.noise * jax.random.normal(
            kp, (args.queries, args.dim), jnp.float32
        )
        return corpus, queries

    corpus_dev, queries_dev = gen()
    ids = np.arange(args.rows, dtype=np.int64)
    queries = np.asarray(queries_dev)

    results = {}

    def run(tag, disk_dtype, hbm_dtype, precision="default"):
        if args.use_disk:
            from cldrd_tpu.index.persistence import (
                read_embeddings, write_embeddings,
            )

            with tempfile.TemporaryDirectory() as tmp:
                write_embeddings(tmp, np.asarray(corpus_dev), ids,
                                 dtype=disk_dtype)
                embs, rids = read_embeddings(tmp)
            index = FlatIPIndex.build(embs, rids, dtype=hbm_dtype,
                                      precision=precision)
        else:
            # disk fp16 == cast fp32->fp16->fp32 (lossless read-back)
            cast = jax.jit(
                lambda c: c.astype(jnp.dtype(disk_dtype))
                .astype(jnp.float32)
                .astype(hbm_dtype)
            )
            index = FlatIPIndex(
                embeddings=cast(corpus_dev),
                row_ids=jnp.asarray(ids.astype(np.int32)),
                precision=precision,
            )
        s, i = index.search_batched(queries, k=args.k, batch_size=128)
        del index
        results[tag] = i
        return i

    truth = run("A_fp32disk_fp32hbm", "float32", jnp.float32)
    run("B_fp32disk_bf16hbm", "float32", jnp.bfloat16)
    run("C_fp16disk_bf16hbm", "float16", jnp.bfloat16)
    # FAISS-parity mode: fp32 HBM + fp32-exact (bf16x6) score matmuls
    run("D_fp32hbm_precision_highest", "float32", jnp.float32,
        precision="highest")

    # E: int8 quantized HBM store (per-row symmetric scales; half of bf16,
    # full 8.8M MS MARCO on one v5e chip). Quantized on device with the
    # same shared quantizer the index builds use.
    from cldrd_tpu.index import quantize_rows

    codes, scales = jax.jit(lambda c: quantize_rows(c, xp=jnp))(corpus_dev)
    index = FlatIPIndex(
        embeddings=codes,
        row_ids=jnp.asarray(ids.astype(np.int32)),
        row_scales=scales,
    )
    s, i = index.search_batched(queries, k=args.k, batch_size=128)
    del index
    results["E_int8hbm_rowscaled"] = i

    report = {
        "rows": args.rows,
        "dim": args.dim,
        "queries": args.queries,
        "k": args.k,
        "clusters": args.clusters,
        "noise": args.noise,
        "recall_overlap_vs_truth": {
            tag: round(recall_overlap(truth, got), 6)
            for tag, got in results.items()
            if tag != "A_fp32disk_fp32hbm"
        },
        "tie_aware": {},
    }
    for tag, got in results.items():
        recall, regret = tie_aware_quality(corpus_dev, queries, got, args.k)
        report["tie_aware"][tag] = {
            "recall_at_k": round(recall, 6),
            "mean_score_regret": round(regret, 6),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
