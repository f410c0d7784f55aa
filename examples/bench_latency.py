"""Per-query latency for the exact and IVF search paths (one chip).

The reference's only printed perf metric is ms/query
(``/root/reference/retriever/retrieval_utils.py:150-152``: total search
time / #queries at its fixed batch=128). This bench produces the
comparable table for cldrd_tpu: batch in {1, 8, 32, 512} ms/query on

  (a) the bf16 1.1M-row per-chip shard (the multi-chip layout's shard),
  (b) the int8 8.86M-row FULL corpus on one chip (the north star store),
  (c) IVF at the serving operating point (nprobe=32, 2048x512 buckets).

**What "batch-1 latency" means here.** The flat path pads every query
batch up to a multiple of 128 (fused-extraction eligibility,
``flat_index.py:search``), so batches 1..128 run the SAME B=128
executable and a batch-1 request pays the full B=128 launch. That IS the
production batch-1 latency — and it is why the serving tier's coalescing
costs nothing: 1 query and 128 queries take the same wall time
(``docs/serving.md``). IVF pads to the next power of two >= 8
(``ivf_index.py:search``), so batch 1 runs the B=8 executable and batch
32 its own.

**Timing protocol** (same as bench.py): corpora are generated ON DEVICE
(the axon host<->device tunnel moves ~5-17 MB/s and must stay out of the
measurement), latency is the MARGINAL per-launch cost
(t(N iters) - t(1)) / (N-1) over distinct pre-staged query sets, with a
scalar-reduced O(1)-byte fetch. What this measures is the DEVICE portion
of ``FlatIPIndex.search`` / ``IVFIndex.search`` — the same jitted
functions the public API dispatches (positions mode + exactness
certificate for flat; ``_ivf_search`` for IVF). The API adds one
host-side resolve (certificate check + external-id ``np.take``), which
is measured separately below (``host_resolve_ms``) and is the only other
production cost: on production PCIe the [B, k] result fetch is
sub-millisecond (4 MB at >= 16 GB/s); on this tunnel it is ~400 ms and
would measure the tunnel, not the system.

Writes examples/results/latency_table.json and prints the table.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

DIM = 768
K = 1000
N_SHARD = 1_114_112   # 8.8M / 8 chips, padded (bench.py's shard)
N_FULL = 8_863_744    # covers the 8,841,823-passage MS MARCO collection
NB, SLOT = 2048, 512  # IVF: 1.05M rows in bucket layout
NPROBE = 32           # serving operating point (docs/serving.md)
MEASURE_ITERS = 8
N_QSETS = 4

if "--small" in sys.argv:  # CPU smoke of the bench plumbing
    DIM, K, N_SHARD, N_FULL, NB, SLOT, NPROBE = 64, 16, 4096, 8192, 16, 64, 4


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def query_sets(b, key0):
    qs = [jax.random.normal(jax.random.PRNGKey(key0 + i), (b, DIM),
                            jnp.bfloat16) for i in range(N_QSETS)]
    for q in qs:
        _ = np.asarray(q[0, 0])
    return qs


def measure(search_jit, qs, *operands):
    """Marginal per-launch seconds (bench.py protocol)."""
    float(search_jit(qs[0], *operands))  # compile + first run

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = search_jit(qs[i % N_QSETS], *operands)
        float(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tn = min(run(MEASURE_ITERS) for _ in range(3))
    return (tn - t1) / (MEASURE_ITERS - 1)


def flat_rows(corpus, ids, row_scales, label, key0):
    """B=128 and B=512 launch latency on one flat store (binmax path,
    positions mode + certificate — exactly ``FlatIPIndex._search_device``)."""
    from cldrd_tpu.search.mips import topk_binmax_jit

    def search(q, corpus, row_ids, scales):
        s, i, ok = topk_binmax_jit(q, corpus, row_ids, K,
                                   return_positions=True, on_miss="flag",
                                   row_scales=scales)
        return (jnp.sum(s[:, -1]) + jnp.sum(i[:, -1].astype(jnp.float32))
                + jnp.sum(ok))

    out = {}
    for b in (128, 512):
        log(f"{label}: B={b} ...")
        t = measure(jax.jit(search), query_sets(b, key0 + b), corpus, ids,
                    row_scales)
        out[f"B{b}_ms"] = round(t * 1e3, 2)
    return out


def bench_bf16_shard():
    log(f"bf16 shard: generating {N_SHARD} x {DIM} on device ...")
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N_SHARD, DIM),
                               jnp.bfloat16)
    ids = jnp.arange(N_SHARD, dtype=jnp.int32)
    _ = np.asarray(corpus[0, 0])
    return flat_rows(corpus, ids, None, "bf16 shard", 10)


def bench_int8_full():
    log(f"int8 full: generating {N_FULL} x {DIM} on device ...")
    # chunked int8 generation (the int32 transient must stay ~<4 GB)
    n_chunks = 1
    while (N_FULL // n_chunks) * DIM * 4 > 4 << 30 or N_FULL % n_chunks:
        n_chunks += 1
    chunk = N_FULL // n_chunks

    @jax.jit
    def gen_codes():
        def one(key):
            return jax.random.randint(
                key, (chunk, DIM), -127, 128, dtype=jnp.int32
            ).astype(jnp.int8)
        keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
        return jax.lax.map(one, keys).reshape(N_FULL, DIM)

    codes = gen_codes()
    scales = jax.random.uniform(jax.random.PRNGKey(1), (N_FULL,),
                                jnp.float32, 0.9, 1.1)
    ids = jnp.arange(N_FULL, dtype=jnp.int32)
    _ = np.asarray(codes[0, 0])
    return flat_rows(codes, ids, scales, "int8 full", 40)


def _ivf_rows(cents, buckets, bids, scales, nb, slot, label, key0,
              batches=(8, 32)):
    """buckets: ROW layout [nb*slot, D] (ivf_index device layout)."""
    from cldrd_tpu.index.ivf_index import _ivf_search

    out = {"nprobe": NPROBE, "rows": nb * slot}
    for k in (K, 10):  # k=1000 (the headline depth) and k=10 (serving)
        def search(q, cents, buckets, bids, scales, k=k):
            v, ids = _ivf_search(q, cents, buckets, bids, scales, k, NPROBE,
                                 slot, "default")
            return jnp.sum(v[:, -1]) + jnp.sum(ids[:, -1].astype(jnp.float32))

        for b in batches:  # B=8 serves batches 1-8; B=32 its own executable
            log(f"{label}: B={b} k={k} nprobe={NPROBE} ...")
            t = measure(jax.jit(search), query_sets(b, key0 + b), cents,
                        buckets, bids, scales)
            out[f"B{b}_k{k}_ms"] = round(t * 1e3, 2)
    return out


def bench_ivf():
    log(f"ivf bf16: generating {NB} x {SLOT} bucketed corpus on device ...")
    kc, kn = jax.random.split(jax.random.PRNGKey(7))
    cents = jax.random.normal(kc, (NB, DIM), jnp.float32) * 2.0
    noise = jax.random.normal(kn, (NB, SLOT, DIM), jnp.float32) * 0.35
    buckets = (cents[:, None, :] + noise).astype(jnp.bfloat16)
    buckets = buckets.reshape(NB * SLOT, DIM)       # row layout
    bids = jnp.arange(NB * SLOT, dtype=jnp.int32).reshape(NB, SLOT)
    no_scales = jnp.zeros((NB, 0), jnp.float32)
    _ = np.asarray(buckets[0, 0])
    return _ivf_rows(cents, buckets, bids, no_scales, NB, SLOT,
                     "ivf bf16", 70)


def bench_ivf_int8_full():
    """IVF over the FULL-corpus-scale int8 store — the regime IVF exists
    for (docs/serving.md): a batch-1 flat request pays the whole 6.8 GB
    scan (37.9 ms measured above); the probe gathers nprobe*slot rows
    instead."""
    nb, slot = NB * 2, SLOT * 4   # 4096 x 2048 = 8.4M rows, int8
    if "--small" in sys.argv:
        nb, slot = NB, SLOT
    log(f"ivf int8: generating {nb} x {slot} bucketed int8 corpus ...")
    n_chunks = 8 if "--small" not in sys.argv else 1

    @jax.jit
    def gen_codes():
        def one(key):
            return jax.random.randint(
                key, ((nb * slot) // n_chunks, DIM), -127, 128,
                dtype=jnp.int32).astype(jnp.int8)
        keys = jax.random.split(jax.random.PRNGKey(8), n_chunks)
        return jax.lax.map(one, keys).reshape(nb * slot, DIM)  # row layout

    buckets = gen_codes()
    cents = jax.random.normal(jax.random.PRNGKey(9), (nb, DIM), jnp.float32)
    bids = jnp.arange(nb * slot, dtype=jnp.int32).reshape(nb, slot)
    scales = jax.random.uniform(jax.random.PRNGKey(10), (nb, slot),
                                jnp.float32, 0.9, 1.1)
    _ = np.asarray(buckets[0, 0])
    return _ivf_rows(cents, buckets, bids, scales, nb, slot,
                     "ivf int8", 200, batches=(8,))


def bench_ivfpq_full():
    """IVFPQ at full-corpus scale (4-bit codes, 48 B/row): the capacity
    tier's device-side serving latency."""
    from cldrd_tpu.index.ivf_index import _ivf_pq_search

    nb, slot = NB * 2, SLOT * 4   # 4096 x 2048 = 8.4M rows
    m, n_codes = 96, 16           # 96 sub-quantizers, 4-bit
    if "--small" in sys.argv:
        nb, slot, m = NB, SLOT, max(4, DIM // 8)
    mb = m // 2                   # nibble-packed bytes/row
    log(f"ivfpq: generating {nb} x {slot} x {mb}B code store ...")
    codes = jax.random.randint(jax.random.PRNGKey(11), (nb, slot * mb),
                               0, 256, dtype=jnp.int32).astype(jnp.uint8)
    cents = jax.random.normal(jax.random.PRNGKey(12), (nb, DIM), jnp.float32)
    cbs = jax.random.normal(jax.random.PRNGKey(13), (m, n_codes, DIM // m),
                            jnp.float32)
    bids = jnp.arange(nb * slot, dtype=jnp.int32).reshape(nb, slot)
    _ = np.asarray(codes[0, 0])

    out = {"nprobe": NPROBE, "rows": nb * slot, "bytes_per_row": mb}
    for k in (K, 10):
        def search(q, cents, codes, bids, cbs, k=k):
            q32 = q.astype(jnp.float32)
            v, ids = _ivf_pq_search(q32, q32, cents, codes, bids, cbs,
                                    k, NPROBE, slot)
            return jnp.sum(v[:, -1]) + jnp.sum(ids[:, -1].astype(jnp.float32))

        log(f"ivfpq: B=8 k={k} nprobe={NPROBE} ...")
        t = measure(jax.jit(search), query_sets(8, 300 + k), cents, codes,
                    bids, cbs)
        out[f"B8_k{k}_ms"] = round(t * 1e3, 2)
    return out


def bench_host_resolve(n_rows):
    """The API's only host-side step beyond the fetch: certificate check +
    positions -> external-id np.take (``FlatIPIndex._recover_resolve``)."""
    b = 512 if "--small" not in sys.argv else 8
    rng = np.random.default_rng(0)
    ids = np.arange(n_rows, dtype=np.int64)
    pos = rng.integers(0, n_rows, (b, K)).astype(np.int32)
    ok = np.ones(b, bool)

    def resolve():
        bad = np.nonzero(~ok)[0]
        assert not bad.size
        return np.where(pos >= 0, ids[np.maximum(pos, 0)], -1)

    resolve()
    t0 = time.perf_counter()
    for _ in range(20):
        resolve()
    return (time.perf_counter() - t0) / 20


def main():
    shard = bench_bf16_shard()
    full = bench_int8_full()
    ivf = bench_ivf()
    ivf8 = bench_ivf_int8_full()
    ivfpq = bench_ivfpq_full()
    resolve_ms = bench_host_resolve(N_FULL) * 1e3

    def per_query(rows, b):
        launch = rows["B128_ms"] if b <= 128 else rows["B512_ms"]
        return round(launch / b, 3)

    table = {
        "protocol": "marginal device launch latency, scalar-reduced; "
                    "batches <=128 share the B=128 executable (flat) / "
                    "<=8 the B=8 executable (IVF); + host_resolve_ms "
                    "per batch on the API path. Launches under ~3 ms "
                    "carry ~2x run-to-run dispatch jitter through this "
                    "environment's tunnel (observed across repeated "
                    "runs: IVF 8.4M B8 k1000 1.19-2.27 ms, 1.05M "
                    "0.32-0.67 ms) — docs quote those rows as ranges",
        "host_resolve_ms_b512": round(resolve_ms, 2),
        "bf16_shard_1.1M": {
            **shard,
            "ms_per_query": {str(b): per_query(shard, b)
                             for b in (1, 8, 32, 512)},
        },
        "int8_full_8.86M": {
            **full,
            "ms_per_query": {str(b): per_query(full, b)
                             for b in (1, 8, 32, 512)},
        },
        "ivf_nprobe32_1.05M_bf16": {
            **ivf,
            "ms_per_query_k1000": {
                "1": ivf[f"B8_k{K}_ms"],
                "8": round(ivf[f"B8_k{K}_ms"] / 8, 3),
                "32": round(ivf[f"B32_k{K}_ms"] / 32, 3),
            },
        },
        "ivf_nprobe32_8.4M_int8": {
            **ivf8,
            "ms_per_query_k1000": {
                "1": ivf8[f"B8_k{K}_ms"],
                "8": round(ivf8[f"B8_k{K}_ms"] / 8, 3),
            },
        },
        "ivfpq_nprobe32_8.4M_4bit": {
            **ivfpq,
            "ms_per_query_k1000": {
                "1": ivfpq[f"B8_k{K}_ms"],
                "8": round(ivfpq[f"B8_k{K}_ms"] / 8, 3),
            },
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "latency_table.json")
    if "--small" not in sys.argv:
        with open(out_path, "w") as fh:
            json.dump(table, fh, indent=1)
        log(f"wrote {out_path}")
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
