"""Profile the exact-search kernel pipeline on one TPU chip: where do the
milliseconds of a full-corpus top-1000 batch go?

bench.py measures the end-to-end number (83 ms / 512-query batch at
8.86M int8 rows after the Poisson-adaptive level-1 depth); this script
traces a few batches with ``jax.profiler`` and aggregates per-op device
time, attributing XLA/Mosaic ops to pipeline stages (kernel scan,
selection sorts, transposes, certificates) via the compiled HLO metadata
— the same recipe as examples/profile_train_step.py.

Usage: python examples/profile_search.py [N_ROWS] [--bf16]
Defaults to the 8.86M int8 north-star shape.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

TRACE_DIR = "/tmp/jaxtrace_search"
PROFILE_ITERS = 4
DIM = 768
K = 1000
QUERY_BATCH = 512


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cldrd_tpu.search.mips import topk_binmax_jit

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if argv else 8_863_744
    use_bf16 = "--bf16" in sys.argv

    if use_bf16:
        corpus = jax.random.normal(jax.random.PRNGKey(0), (n, DIM), jnp.bfloat16)
        scales = None
    else:
        # int8 store generated chunkwise (same trick as bench.py: the int32
        # randint transient must stay ~3 GB)
        n_chunks = 1
        while (n // n_chunks) * DIM * 4 > 4 << 30 or n % n_chunks:
            n_chunks += 1
        chunk = n // n_chunks

        @jax.jit
        def gen_codes():
            def one(key):
                return jax.random.randint(
                    key, (chunk, DIM), -127, 128, dtype=jnp.int32
                ).astype(jnp.int8)
            keys = jax.random.split(jax.random.PRNGKey(0), n_chunks)
            return jax.lax.map(one, keys).reshape(n, DIM)

        corpus = gen_codes()
        scales = jax.random.uniform(
            jax.random.PRNGKey(1), (n,), jnp.float32, 0.9, 1.1)
    ids = jnp.arange(n, dtype=jnp.int32)
    qs = [jax.random.normal(jax.random.PRNGKey(100 + i),
                            (QUERY_BATCH, DIM), jnp.bfloat16)
          for i in range(PROFILE_ITERS)]
    _ = np.asarray(corpus[0, 0]), np.asarray(qs[0][0, 0])

    def search(q, corpus, row_ids, row_scales):
        s, i = topk_binmax_jit(q, corpus, row_ids, K, return_positions=True,
                               row_scales=row_scales)
        return jnp.sum(s[:, -1]) + jnp.sum(i[:, -1].astype(jnp.float32))

    search_jit = jax.jit(search)
    float(search_jit(qs[0], corpus, ids, scales))  # compile + warm

    hlo = search_jit.lower(qs[0], corpus, ids, scales).compile().as_text()
    import re
    op_src = {}
    for mt in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\"", hlo
    ):
        op_src[mt.group(1)] = mt.group(2)

    t0 = time.perf_counter()
    jax.profiler.start_trace(TRACE_DIR)
    out = None
    for i in range(PROFILE_ITERS):
        out = search_jit(qs[i], corpus, ids, scales)
    float(out)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(json.dumps({"error": "no trace written"}))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, nme in pid_name.items()
                if "TPU" in nme or "/device" in nme.lower() or "Axon" in nme}

    def category(fusion_name: str) -> str:
        src = op_src.get(fusion_name.lstrip("%"), "")
        low = fusion_name.lower()
        if "custom-call" in low or "pallas" in low or "tpu_custom_call" in low:
            return "fused kernel (matmul + 2-level extraction)"
        if not src:
            return f"(unmapped) {fusion_name[:40]}"
        s = src.lower()
        if "sort" in s:
            return "selection (payload sorts)"
        if "transpose" in s:
            return "candidate transpose"
        if "reduce" in s and ("max" in s or "rem" in s):
            return "certificate bounds (rem1/rem2)"
        if "slice" in s or "reshape" in s or "concatenate" in s or "pad" in s:
            return "candidate staging (slice/reshape/pad)"
        if "dot" in s or "einsum" in s:
            return "score matmul (XLA side)"
        return "other: " + src.rsplit("/", 1)[-1][:48]

    by_name = defaultdict(float)
    by_raw = defaultdict(float)
    total = 0.0
    step_level = re.compile(r"^(\d+|jit_search.*)$")
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            if name.startswith(("Infeed", "Outfeed")):
                continue
            if step_level.match(name):
                continue
            by_name[category(name)] += e["dur"]
            src = op_src.get(name.lstrip("%"), "")
            by_raw[f"{name[:48]}  <-  {src[-80:]}"] += e["dur"]
            total += e["dur"]

    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    print(f"device tracks: {sorted(pid_name[p] for p in dev_pids)}",
          file=sys.stderr)
    print(f"wall/batch {wall / PROFILE_ITERS * 1e3:.1f} ms, "
          f"device-busy/batch {total / PROFILE_ITERS / 1e3:.1f} ms",
          file=sys.stderr)
    for name, dur in rows:
        print(f"{dur / PROFILE_ITERS / 1e3:9.3f} ms  {100 * dur / total:5.1f}%"
              f"  {name[:110]}", file=sys.stderr)
    print("--- raw ops (top 20) ---", file=sys.stderr)
    for name, dur in sorted(by_raw.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur / PROFILE_ITERS / 1e3:9.3f} ms  {100 * dur / total:5.1f}%"
              f"  {name[:160]}", file=sys.stderr)
    print(json.dumps({
        "metric": f"search_profile_n{n}_{'bf16' if use_bf16 else 'int8'}",
        "wall_ms_per_batch": round(wall / PROFILE_ITERS * 1e3, 2),
        "device_busy_ms_per_batch": round(total / PROFILE_ITERS / 1e3, 2),
        "top_ops": [
            {"name": nm[:80], "ms": round(d / PROFILE_ITERS / 1e3, 3),
             "pct": round(100 * d / total, 1)} for nm, d in rows[:12]
        ],
    }))


if __name__ == "__main__":
    main()
