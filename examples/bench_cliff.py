"""Quantify the bin-max fallback cliff on one TPU chip.

The exactness certificates in ``_binmax_segment_extract`` reduce over the
WHOLE query batch (``jnp.all``): one query whose top-k concentrates inside
a single 2048-row super-block (more than the R2-1 candidates a block emits)
fails the certificate and sends all 512 queries through the slow
``topk_streaming`` re-scan. This bench measures that cliff: a clean random
batch vs a batch with exactly ONE adversarial query whose top-1000 all live
in one super-block (2000 near-parallel planted rows), plus an exactness
check on the adversarial query itself.

Prints one JSON line.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 1_114_112
DIM = 768
K = 1000
QUERY_BATCH = 512
MEASURE_ITERS = 6
N_QUERY_SETS = 2


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cldrd_tpu.search.mips import topk_binmax_jit

    corpus = jax.random.normal(jax.random.PRNGKey(0), (N_ROWS, DIM), jnp.bfloat16)
    ids = jnp.arange(N_ROWS, dtype=jnp.int32)

    # plant 2000 near-parallel rows in the first 2048-row super-block:
    # row_j = u * 8 * (1 - j * 1e-4) -> query u scores them all far above
    # the random background, strictly decreasing
    u = jax.random.normal(jax.random.PRNGKey(99), (DIM,), jnp.float32)
    u = u / jnp.linalg.norm(u)
    scales = 8.0 * (1.0 - 1e-4 * jnp.arange(2000, dtype=jnp.float32))
    spike = (scales[:, None] * u[None, :]).astype(jnp.bfloat16)
    poisoned = corpus.at[:2000].set(spike)

    def make_batch(key, adversarial: bool):
        q = jax.random.normal(key, (QUERY_BATCH, DIM), jnp.bfloat16)
        if adversarial:
            q = q.at[0].set((u * 32.0).astype(jnp.bfloat16))
        return q

    clean_qs = [make_batch(jax.random.PRNGKey(i + 1), False)
                for i in range(N_QUERY_SETS)]
    adv_qs = [make_batch(jax.random.PRNGKey(i + 1), True)
              for i in range(N_QUERY_SETS)]
    for x in clean_qs + adv_qs + [poisoned]:
        _ = np.asarray(x.reshape(-1)[0])

    def search(q, corpus, ids):
        s, i = topk_binmax_jit(q, corpus, ids, K, return_positions=True)
        return s, i

    def scalarized(q, corpus, ids):
        s, i = search(q, corpus, ids)
        return jnp.sum(s[:, -1]) + jnp.sum(i[:, -1].astype(jnp.float32))

    search_jit = jax.jit(search)
    scalar_jit = jax.jit(scalarized)

    # exactness on the adversarial query: top-1000 must be the planted rows
    # 0..999 in order (scores strictly decreasing by construction)
    s, pos = search_jit(adv_qs[0], poisoned, ids)
    pos0 = np.asarray(pos[0])
    exact_adv = bool((pos0 == np.arange(K)).all())

    def measure(qs, corpus):
        float(scalar_jit(qs[0], corpus, ids))  # compile/warm

        def run(n):
            out = None
            t0 = time.perf_counter()
            for i in range(n):
                out = scalar_jit(qs[i % N_QUERY_SETS], corpus, ids)
            float(out)
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(3))
        tn = min(run(MEASURE_ITERS) for _ in range(3))
        return (tn - t1) / (MEASURE_ITERS - 1)

    t_clean = measure(clean_qs, corpus)
    t_adv = measure(adv_qs, poisoned)

    print(json.dumps({
        "metric": "binmax_fallback_cliff_1.1M",
        "clean_qps": round(QUERY_BATCH / t_clean, 1),
        "adversarial_qps": round(QUERY_BATCH / t_adv, 1),
        "slowdown_x": round(t_adv / t_clean, 2),
        "adversarial_exact": exact_adv,
        "rows": N_ROWS,
        "batch": QUERY_BATCH,
        "k": K,
    }), flush=True)

    # --- the production path: FlatIPIndex flag-mode + per-query rescue ---
    # on_miss='flag' returns the fast result + per-query certificates; the
    # host re-scans ONLY flagged queries in fixed 128-wide batches. So an
    # adversarial batch costs (fast path) + (one 128-wide streaming pass)
    # instead of the 512-wide in-graph re-scan measured above. Measure the
    # rescue surcharge directly (index.search end-to-end is tunnel-fetch
    # bound in this environment; the surcharge is the honest delta).
    from cldrd_tpu.index.flat_index import FlatIPIndex

    index = FlatIPIndex(embeddings=poisoned, row_ids=ids)
    # correctness: flag-mode search + rescue must return the planted rows
    # for the adversarial query embedded in a clean batch
    s_i, ids_i = index.search(np.asarray(adv_qs[0], np.float32)[:128], K)
    recovery_exact = bool((ids_i[0] == np.arange(K)).all())

    one_q = np.asarray(adv_qs[0], np.float32)[:1]
    index._rescan_exact(one_q, K)  # compile/warm the 128-wide rescue

    def run_rescue(n):
        out = None
        for _ in range(n):
            out = index._rescan_exact(one_q, K)
        return out

    t0 = time.perf_counter(); run_rescue(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_rescue(MEASURE_ITERS)
    tn = time.perf_counter() - t0
    t_rescue = (tn - t1) / (MEASURE_ITERS - 1)
    print(json.dumps({
        "metric": "per_query_rescue_surcharge_1.1M",
        "rescue_ms_per_adversarial_batch": round(t_rescue * 1e3, 2),
        "vs_in_graph_fallback_ms": round((t_adv - t_clean) * 1e3, 2),
        "recovery_exact": recovery_exact,
        "rows": N_ROWS,
        "rescue_batch": FlatIPIndex._RESCAN_BATCH,
        "k": K,
    }), flush=True)


if __name__ == "__main__":
    main()
