"""Attainable-MXU-peak microbench for the train step's exact matmul shapes.

The train-step profile (examples/profile_train_step.py) shows the bz=8
flat step spends 77.5% of device time in encoder matmuls running at ~46%
of the chip's bf16 peak. This script answers the question that number
raises: is 46% a scheduling/fusion gap, or simply what these SHAPES
attain on the MXU in isolation?

Each row is one dot_general from the 66M DistilBERT step at the
production token count (bz=8, nway=30, L=256 -> M = 61,440 tokens),
bf16 inputs / fp32 accumulation, measured with the marginal protocol on
distinct pre-staged inputs. Forward, dgrad and wgrad orientations are all
measured — wgrad contracts over the 61k token axis, a very different MXU
tiling than the forward's 768-wide contraction.

Prints one JSON line per shape plus a summary comparing the
FLOPs-weighted attainable mix against the measured in-step efficiency.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_TFLOPS = 197.0  # TPU v5e
M_TOKENS = 61_440         # bz=8 x nway=30 x L=256
ITERS = 16


def bench_dot(name, a_shape, b_shape, dims, flops_weight):
    """Marginal-protocol time of dot_general(a, b, dims) at bf16->fp32."""
    keys = jax.random.split(jax.random.PRNGKey(hash(name) % (2**31)), 4)
    a_sets = [jax.random.normal(k, a_shape, jnp.bfloat16) for k in keys[:2]]
    b = jax.random.normal(keys[2], b_shape, jnp.bfloat16)
    _ = np.asarray(a_sets[0].ravel()[0]), np.asarray(b.ravel()[0])

    @jax.jit
    def f(a, b):
        out = jax.lax.dot_general(
            a, b, dimension_numbers=dims, preferred_element_type=jnp.float32)
        # consume EVERY output element: a sliced consumer (e.g.
        # sum(out[..., -1])) lets XLA dead-code-eliminate all other
        # columns and compute a matvec — measured 219-670% of "peak"
        # before this fix. The full reduce adds ~M*N ops, <1% of the dot.
        return jnp.sum(out)

    float(f(a_sets[0], b))  # compile

    def run(n):
        out = None
        t0 = time.perf_counter()
        for i in range(n):
            out = f(a_sets[i % 2], b)
        float(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(3))
    tn = min(run(ITERS) for _ in range(2))
    per = (tn - t1) / (ITERS - 1)

    # FLOPs: 2 * prod(batch) * M * N * K from the dims spec
    (c_lhs, c_rhs), (b_lhs, b_rhs) = dims
    a_dims, b_dims = a_shape, b_shape
    k_sz = int(np.prod([a_dims[i] for i in c_lhs]))
    batch = int(np.prod([a_dims[i] for i in b_lhs])) if b_lhs else 1
    m_sz = int(np.prod([d for i, d in enumerate(a_dims)
                        if i not in c_lhs and i not in b_lhs]))
    n_sz = int(np.prod([d for i, d in enumerate(b_dims)
                        if i not in c_rhs and i not in b_rhs]))
    flops = 2.0 * batch * m_sz * n_sz * k_sz
    tflops = flops / per / 1e12
    row = {
        "shape": name,
        "ms": round(per * 1e3, 3),
        "tflops": round(tflops, 1),
        "pct_peak": round(100 * tflops / PEAK_BF16_TFLOPS, 1),
        "flops_weight": flops_weight,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    M, D, H, L, hd, BH = M_TOKENS, 768, 3072, 256, 64, 240 * 12
    mm = (((1,), (0,)), ((), ()))        # plain [M,K]x[K,N]
    wgrad = (((0,), (0,)), ((), ()))     # contract over rows (token axis)
    batched = (((2,), (2,)), ((0,), (0,)))  # [B,q,d]x[B,k,d] -> [B,q,k]

    rows = []
    # forward weight matmuls (per layer: 4x proj, 1x ffn1, 1x ffn2)
    rows.append(bench_dot("fwd proj  [61440,768]x[768,768]",
                          (M, D), (D, D), mm, 4 * 2 * M * D * D))
    rows.append(bench_dot("fwd ffn1  [61440,768]x[768,3072]",
                          (M, D), (D, H), mm, 2 * M * D * H))
    rows.append(bench_dot("fwd ffn2  [61440,3072]x[3072,768]",
                          (M, H), (H, D), mm, 2 * M * H * D))
    # backward dgrads are the same family transposed on N/K (same sizes)
    rows.append(bench_dot("dgrad ffn2 [61440,768]x[768,3072]",
                          (M, D), (D, H), mm, 2 * M * D * H))
    # wgrads contract over the 61k token axis
    rows.append(bench_dot("wgrad proj [61440,768]T x [61440,768]",
                          (M, D), (M, D), wgrad, 4 * 2 * M * D * D))
    rows.append(bench_dot("wgrad ffn  [61440,3072]T x [61440,768]",
                          (M, H), (M, D), wgrad, 2 * 2 * M * H * D))
    # attention scores + AV (head dim 64 contractions)
    rows.append(bench_dot("attn scores [2880,256,64]x[2880,256,64]",
                          (BH, L, hd), (BH, L, hd), batched,
                          2 * BH * L * L * hd))
    rows.append(bench_dot("attn AV [2880,256,256]x[2880,256,64]",
                          (BH, L, L), (BH, L, hd),
                          (((2,), (1,)), ((0,), (0,))),
                          2 * BH * L * L * hd))

    wsum = sum(r["flops_weight"] for r in rows)
    attainable = sum(r["pct_peak"] * r["flops_weight"] for r in rows) / wsum
    print(json.dumps({
        "metric": "train_matmul_shapes_attainable_pct_peak",
        "value": round(attainable, 1),
        "unit": "% of bf16 peak (FLOPs-weighted over the step's shapes)",
        "vs_baseline": round(attainable / 100, 3),
        "note": ("isolated attainable mix for the bz=8 flat step's dot "
                 "shapes; compare against the ~46% the composed step's "
                 "matmul time achieves (docs/perf.md)"),
    }))


if __name__ == "__main__":
    main()
