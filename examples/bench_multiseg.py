"""Multi-segment exact search throughput on one TPU chip.

The headline bench (bench.py) covers one 1.1M-row segment — the per-chip
shard of 8.8M rows on a v4-8. This bench covers the OTHER production
configuration: few chips (or one), many rows per chip, where the corpus
exceeds ``segment_rows`` = 2,097,152 and ``topk_binmax`` streams segment
top-ks with an exact cross-segment merge (``search/mips.py``, segmented
loop). 4,194,304 rows = exactly 2 segments; the reference's single GPU held
all 8.8M rows the same way (``retriever/retrieve_top_passages.py:85-88``).

Same marginal-timing protocol as bench.py (axon tunnel: on-device data,
scalar-reduced fetch, distinct query sets per iteration).

Prints one JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 4_194_304  # 2 x 2,097,152-row segments
DIM = 768
K = 1000
QUERY_BATCH = 512
MEASURE_ITERS = 8
N_QUERY_SETS = 4
BASELINE_QPS = 5000.0


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cldrd_tpu.search.mips import topk_binmax_jit

    corpus = jax.random.normal(jax.random.PRNGKey(0), (N_ROWS, DIM), jnp.bfloat16)
    ids = jnp.arange(N_ROWS, dtype=jnp.int32)
    qs = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (QUERY_BATCH, DIM), jnp.bfloat16)
        for i in range(N_QUERY_SETS)
    ]
    _ = np.asarray(corpus[0, 0]), np.asarray(ids[0])
    for q in qs:
        _ = np.asarray(q[0, 0])

    def search(q, corpus, ids):
        s, i = topk_binmax_jit(q, corpus, ids, K, return_positions=True)
        return jnp.sum(s[:, -1]) + jnp.sum(i[:, -1].astype(jnp.float32))

    search_jit = jax.jit(search)
    float(search_jit(qs[0], corpus, ids))  # compile + first run

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = search_jit(qs[i % N_QUERY_SETS], corpus, ids)
        float(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tn = min(run(MEASURE_ITERS) for _ in range(3))
    per_batch = (tn - t1) / (MEASURE_ITERS - 1)
    qps = QUERY_BATCH / per_batch

    print(json.dumps({
        "metric": "exact_mips_top1000_qps_per_chip_4.2M_2seg",
        "value": round(qps, 1),
        "unit": "qps",
        "ms_per_batch": round(per_batch * 1e3, 1),
        "rows": N_ROWS,
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
