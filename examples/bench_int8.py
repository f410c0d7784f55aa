"""int8 quantized-store benchmark: the FULL MS MARCO corpus on ONE chip.

The reference holds all 8.8M passages in one GPU's memory as fp32
(``retrieve_top_passages.py:85-88``, ~27 GB on an RTX 8000). The bf16 HBM
store needs 13.5 GB — too big for one v5e chip next to workspace — so the
bf16 production layout shards 1.1M rows/chip on a v4-8. The int8 store
(per-row-scaled codes, exact factorized scoring) is 6.8 GB: the WHOLE
corpus fits a single v5e chip with room for the search workspace.

Measures exact top-1000 QPS at B=512 over:
  1. 8.86M x 768 int8 rows (>= the 8,841,823-passage MS MARCO collection),
     ONE chip — the single-chip-full-corpus configuration;
  2. 1.1M x 768 int8 rows — the per-chip shard size, for a direct
     comparison against the bf16 headline (bench.py).

Protocol identical to bench.py: corpus generated ON DEVICE (codes are
random int8 — throughput does not depend on code values), marginal timing
(t(N)-t(1))/(N-1), several distinct query sets, scalar-reduced fetches.
Prints one JSON line per configuration.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

DIM = 768
K = 1000
QUERY_BATCH = 512
N_FULL = 8_863_744   # 4328 x 2048: covers the 8,841,823-passage collection
N_SHARD = 1_114_112  # bench.py's per-chip shard size
MEASURE_ITERS = 8
N_QUERY_SETS = 4
BASELINE_QPS = 5000.0


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def bench(n_rows, tag, vs_baseline=False):
    from cldrd_tpu.search.mips import topk_binmax_jit

    log(f"{tag}: generating {n_rows} x {DIM} int8 corpus on device ...")
    # jax.random.randint materializes int32 BEFORE the int8 cast (27 GB at
    # 8.86M x 768); generate chunkwise under lax.map so the int32 transient
    # is one chunk (~3.4 GB) while the int8 output accumulates in place
    n_chunks = 1
    while (n_rows // n_chunks) * DIM * 4 > 4 << 30 or n_rows % n_chunks:
        n_chunks += 1
    chunk = n_rows // n_chunks

    @jax.jit
    def gen_codes():
        def one(key):
            return jax.random.randint(
                key, (chunk, DIM), -127, 128, dtype=jnp.int32
            ).astype(jnp.int8)
        keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
        return jax.lax.map(one, keys).reshape(n_rows, DIM)

    codes = gen_codes()
    scales = jax.random.uniform(
        jax.random.PRNGKey(1), (n_rows,), jnp.float32, 0.9, 1.1)
    ids = jnp.arange(n_rows, dtype=jnp.int32)
    qs = [jax.random.normal(jax.random.PRNGKey(i + 2),
                            (QUERY_BATCH, DIM), jnp.bfloat16)
          for i in range(N_QUERY_SETS)]
    _ = np.asarray(codes[0, 0]), np.asarray(scales[0]), np.asarray(ids[0])
    for q in qs:
        _ = np.asarray(q[0, 0])

    def search(q, corpus, row_ids, row_scales):
        s, i = topk_binmax_jit(q, corpus, row_ids, K, return_positions=True,
                               row_scales=row_scales)
        return jnp.sum(s[:, -1]) + jnp.sum(i[:, -1].astype(jnp.float32))

    search_jit = jax.jit(search)
    log(f"{tag}: compiling + first run ...")
    float(search_jit(qs[0], codes, ids, scales))

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = search_jit(qs[i % N_QUERY_SETS], codes, ids, scales)
        float(out)
        return time.perf_counter() - t0

    log(f"{tag}: measuring ...")
    t1 = min(run(1) for _ in range(3))
    tn = min(run(MEASURE_ITERS) for _ in range(3))
    per_batch = (tn - t1) / (MEASURE_ITERS - 1)
    qps = QUERY_BATCH / per_batch
    rec = {
        "metric": tag,
        "value": round(qps, 1),
        "unit": "qps",
        "ms_per_512q_batch": round(per_batch * 1e3, 2),
    }
    if vs_baseline:
        rec["vs_baseline"] = round(qps / BASELINE_QPS, 3)
    print(json.dumps(rec), flush=True)
    del codes, scales, ids, qs


def main():
    bench(N_FULL, "exact_mips_top1000_qps_int8_8.86M_single_chip",
          vs_baseline=True)
    bench(N_SHARD, "exact_mips_top1000_qps_int8_1.1M")


if __name__ == "__main__":
    main()
