"""Measure the sharded-search merge overhead on a virtual 8-device mesh.

``sharded_topk`` = per-shard exact top-k + all-gather of [ndev, B, k]
candidate buffers over ICI + one final [B, ndev*k] top_k. This script times
the WHOLE sharded search vs a single-device search over the SAME total rows
(identical FLOPs), so the difference is exactly the merge machinery
(all-gather + final top-k + the lost locality of 8 smaller scans).

Run on the 8-virtual-CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8): virtual devices share
one host's cores, so the all-gather is a memcpy and per-shard scans
serialize — the measured overhead is an UPPER bound on the structural cost
(real ICI overlaps with compute; real chips scan shards in parallel).

The analytic ICI model for real hardware is in docs/search.md ("Multi-chip
merge cost"); this script validates the structure, not the ICI bandwidth.

Prints one JSON line.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

N_TOTAL = 524_288
DIM = 256
B = 128
K = 1000
ITERS = 5


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / ITERS


def main():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cldrd_tpu.search.mips import sharded_topk, topk_jit

    ndev = len(jax.devices())
    assert ndev == 8, jax.devices()
    mesh = Mesh(np.array(jax.devices()), ("corpus",))

    corpus = jax.random.normal(jax.random.PRNGKey(0), (N_TOTAL, DIM), jnp.float32)
    ids = jnp.arange(N_TOTAL, dtype=jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, DIM), jnp.float32)

    sharding = NamedSharding(mesh, P("corpus"))
    corpus_sh = jax.device_put(corpus, sharding)
    ids_sh = jax.device_put(ids, sharding)

    sharded = jax.jit(
        lambda q, c, i: sharded_topk(q, c, i, K, mesh, method="stream",
                                     return_positions=True),
    )
    single = jax.jit(
        lambda q, c, i: topk_jit(q, c, i, K),
    )

    t_sharded = timeit(sharded, q, corpus_sh, ids_sh)
    t_single = timeit(single, q, corpus, ids)

    # exactness: sharded positions == single-device ids here (ids == arange)
    s_sh, i_sh = sharded(q, corpus_sh, ids_sh)
    s_si, i_si = single(q, corpus, ids)
    agree = float(np.mean(np.asarray(i_sh) == np.asarray(i_si)))

    # analytic merge bytes on real hardware (docs/search.md)
    gathered_bytes = ndev * B * K * 8  # fp32 scores + int32 positions

    print(json.dumps({
        "metric": "sharded_topk_merge_overhead_8dev_cpu",
        "t_single_ms": round(t_single * 1e3, 1),
        "t_sharded_ms": round(t_sharded * 1e3, 1),
        "overhead_pct": round(100 * (t_sharded - t_single) / t_single, 1),
        "id_agreement": agree,
        "all_gather_bytes": gathered_bytes,
        "n_total": N_TOTAL,
        "batch": B,
        "k": K,
    }))


if __name__ == "__main__":
    main()
