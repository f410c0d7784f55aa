"""Native int8 MXU matmul A/B for the search score kernel.

The int8 quantized store (docs/perf.md "int8 quantized store") currently
casts codes to bf16 inside the kernel, so the score matmul runs at the
chip's bf16 rate (197 TFLOP/s on v5e). The MXU also has a native
int8xint8->int32 path at ~394 TOPS — 2x — which the search kernel could
use IF the queries are quantized to int8 too (scores then factorize as
``(q8 . c8) * sq * sc``, exact w.r.t. the quantized operands).

This script answers the prerequisite question: does a Pallas kernel at
the production tile shape (c [1024, 768] x q [512, 768] -> [1024, 512])
actually attain ~2x when both operands are int8 and the dot accumulates
in int32?  Three variants, identical grid/blocking, in-kernel max-reduce
so output bandwidth is negligible:

  bf16      — both operands bf16, f32 accumulation (today's rate)
  int8_cast — int8 corpus cast to bf16 in-kernel (today's int8-store path)
  int8_native — int8 x int8, preferred_element_type=int32

Prints one JSON line per variant. Run on the real chip.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N = 1_114_112        # 1088 tiles of 1024 — the per-chip shard size
DIM = 768
B = 512              # query batch
T = 1024             # corpus tile rows (the fused kernel's tile)
ITERS = 12


def make_kernel(mode):
    def kernel(q_ref, c_ref, o_ref):
        c = c_ref[:]
        q = q_ref[:]
        if mode == "int8_native":
            s = jax.lax.dot_general(
                c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            if c.dtype == jnp.int8:
                c = c.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                c, q, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = jnp.max(s, axis=0, keepdims=True)  # [1, B]

    return kernel


def bench(mode):
    n_tiles = N // T
    if mode == "bf16":
        cdtype, qdtype = jnp.bfloat16, jnp.bfloat16
    elif mode == "int8_cast":
        cdtype, qdtype = jnp.int8, jnp.bfloat16
    else:
        cdtype, qdtype = jnp.int8, jnp.int8

    if cdtype == jnp.int8:
        corpus = jax.jit(lambda k: jax.random.randint(
            k, (N, DIM), -127, 128, jnp.int32).astype(jnp.int8)
        )(jax.random.PRNGKey(0))
    else:
        corpus = jax.random.normal(jax.random.PRNGKey(0), (N, DIM), cdtype)
    _ = np.asarray(corpus[0, 0])

    qs = []
    for i in range(2):
        k = jax.random.PRNGKey(100 + i)
        if qdtype == jnp.int8:
            q = jax.jit(lambda k: jax.random.randint(
                k, (B, DIM), -127, 128, jnp.int32).astype(jnp.int8))(k)
        else:
            q = jax.random.normal(k, (B, DIM), qdtype)
        _ = np.asarray(q[0, 0])
        qs.append(q)

    fn = pl.pallas_call(
        make_kernel(mode),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, DIM), lambda i: (0, 0)),
            pl.BlockSpec((T, DIM), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, B), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, B), jnp.float32),
    )

    @jax.jit
    def run_one(q, corpus):
        return jnp.sum(fn(q, corpus))

    float(run_one(qs[0], corpus))  # compile

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = run_one(qs[i % 2], corpus)
        float(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tn = min(run(ITERS) for _ in range(2))
    per = (tn - t1) / (ITERS - 1)
    flops = 2.0 * B * DIM * N
    print(json.dumps({
        "variant": mode,
        "ms": round(per * 1e3, 3),
        "tflops": round(flops / per / 1e12, 1),
        "vs_bf16_peak_197": round(flops / per / 1e12 / 197.0, 3),
    }), flush=True)
    return per


def main():
    t_bf16 = bench("bf16")
    t_cast = bench("int8_cast")
    t_nat = bench("int8_native")
    print(json.dumps({
        "summary": "int8_native speedup",
        "vs_bf16": round(t_bf16 / t_nat, 2),
        "vs_int8_cast": round(t_cast / t_nat, 2),
    }))


if __name__ == "__main__":
    main()
