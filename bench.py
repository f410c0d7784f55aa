"""Headline benchmark: exact MIPS top-1000 throughput on one TPU chip.

Measures the system's hottest path (the FAISS-GPU-search replacement,
reference ``retriever/retrieve_top_passages.py:85-88``): streaming blocked
Q x C^T top-k over a 1.1M x 768 bf16 corpus shard — exactly the per-chip
slice a v4-8 would hold for the full 8.8M MS MARCO collection (the
multi-chip path adds only an ICI all-gather of [B, k] buffers, which is
negligible next to the per-shard scan). Query batch 128, k=1000, matching
the reference's search configuration (``retrieval_utils.py:131-153``).

The driver's north-star target is >= 5,000 QPS exact top-1000 over 8.8M
rows on a v4-8 (BASELINE.md); per-chip QPS over the 1/8 shard is the
equivalent single-chip number, so ``vs_baseline`` = QPS / 5000.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 1_100_000  # 8.8M / 8 chips
DIM = 768
K = 1000
QUERY_BATCH = 128
BLOCK_ROWS = 16384
BASELINE_QPS = 5000.0
WARMUP_ITERS = 2
MEASURE_ITERS = 10


def main():
    from cldrd_tpu.index import FlatIPIndex

    rng = np.random.default_rng(0)
    # unit-norm-ish vectors so top-k is non-degenerate
    corpus = rng.standard_normal((N_ROWS, DIM), dtype=np.float32)
    ids = np.arange(N_ROWS, dtype=np.int64)
    index = FlatIPIndex.build(corpus, ids, mesh=None, dtype=jnp.bfloat16,
                              block_rows=BLOCK_ROWS)
    del corpus

    queries = rng.standard_normal((QUERY_BATCH, DIM), dtype=np.float32)
    q_dev = jax.device_put(jnp.asarray(queries, index.embeddings.dtype))

    from cldrd_tpu.search.mips import topk_jit

    # warmup / compile
    for _ in range(WARMUP_ITERS):
        s, i = topk_jit(q_dev, index.embeddings, index.row_ids, K, BLOCK_ROWS)
        jax.block_until_ready((s, i))

    t0 = time.perf_counter()
    for _ in range(MEASURE_ITERS):
        s, i = topk_jit(q_dev, index.embeddings, index.row_ids, K, BLOCK_ROWS)
    jax.block_until_ready((s, i))
    elapsed = time.perf_counter() - t0

    qps = QUERY_BATCH * MEASURE_ITERS / elapsed
    print(json.dumps({
        "metric": "exact_mips_top1000_qps_per_chip_1.1M",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
