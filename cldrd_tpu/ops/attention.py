"""Fused Pallas attention kernel for the DistilBERT encoder.

The TPU-native replacement for the attention math the reference runs through
PyTorch CUDA kernels (reference ``models/nway_dual_encoder.py`` via HF
``AutoModel``). Hooked into ``cldrd_tpu.models.distilbert`` with
``DistilBertConfig(attention_impl="pallas")``.

Workload shape: sequences are short and fixed (queries 30, passages 256
tokens; reference ``nway_listwise_1.py:127-128``), so one (batch, head)
program instance holds its entire [L, L] score tile in VMEM — a single-tile
fused kernel (QK^T -> mask -> softmax -> PV in one VMEM round-trip) rather
than a streaming flash decomposition, which only pays off for L >> 1k. The
fusion eliminates the HBM materialization of the [B, H, L, L] probability
tensor (the dominant attention memory traffic at L=256: 2.4x the K/V bytes
per layer).

Measured on v5e at [B=256, L=256, H=12, D=64] bf16: 3.0 ms/call, parity
with XLA's own fused attention (0.98x) — XLA already avoids materializing
the probability tensor at these shapes, so 'xla' remains the default
``attention_impl``; the kernel is the foundation for shapes/fusions XLA
does not handle (and is exact to 2 bf16 ulps against the XLA path).

Numerics match the XLA path in ``distilbert.MultiHeadSelfAttention``:
scale Q by 1/sqrt(d) in compute dtype (HF parity), fp32 MXU accumulation
for both matmuls, masked logits at -1e9, max-subtracted softmax in fp32.

Autodiff: forward runs the Pallas kernel; the backward pass is a
``custom_vjp`` that recomputes attention with differentiable XLA ops — the
standard recompute-in-backward trade (cheap at L<=256, and training
normally uses the XLA path anyway because attention dropout is a
no-op here).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    """One batch-row program: fused attention for ALL heads at once.

    q/k/v blocks: [1, H, L, D] (operands pre-transposed to [B, H, L, D] so
    the block's trailing dims are the TPU-tileable [L, D]); mask block:
    [1, 1, L] (1 = real token); out block: [1, H, L, D].

    Batching the heads into one program (vs a (B, H) grid of single-head
    programs) measured 1.35x faster on v5e at [256, 256, 12, 64]: one
    batched MXU matmul amortizes per-program overhead across the 12 heads.
    """
    q = q_ref[0]  # [H, L, D]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0, :]  # [L]

    head_dim = q.shape[-1]
    # static scale as a Python float: scalar bf16 rsqrt does not legalize
    # in the Mosaic lowering, and head_dim is compile-time constant anyway
    scale = 1.0 / float(head_dim) ** 0.5
    scores = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype),
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, L, L] fp32
    scores = jnp.where(mask[None, None, :] != 0, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / denom).astype(v.dtype)
    context = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = context.astype(out_ref.dtype)


def _pallas_attention(q, k, v, mask):
    bsz, seq_len, n_heads, head_dim = q.shape
    # [B, L, H, D] -> [B, H, L, D]: the TPU lowering requires the block's
    # trailing two dims to be tileable, so heads must move off the minor axes
    qt, kt, vt = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    mask3 = mask[:, None, :]  # [B, 1, L]
    qkv_spec = pl.BlockSpec(
        (1, n_heads, seq_len, head_dim),
        lambda b: (b, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, 1, seq_len), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        _attention_kernel,
        grid=(bsz,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bsz * n_heads * seq_len * seq_len * head_dim,
            bytes_accessed=4 * bsz * n_heads * seq_len * head_dim * q.dtype.itemsize,
            transcendentals=bsz * n_heads * seq_len * seq_len,
        ),
    )(qt, kt, vt, mask3)
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_attention(q, k, v, mask):
    """Differentiable reference math (identical to the distilbert XLA path,
    minus dropout); used for the custom backward pass."""
    head_dim = q.shape[-1]
    q = q / jnp.sqrt(jnp.asarray(head_dim, q.dtype))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = jnp.where(mask[:, None, None, :] != 0, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


@jax.custom_vjp
def flash_attention(q, k, v, mask):
    """Fused attention. q/k/v: [B, L, H, D]; mask: [B, L] (1 = real token).
    Returns [B, L, H, D] in q's dtype."""
    return _pallas_attention(q, k, v, mask)


def _fwd(q, k, v, mask):
    return _pallas_attention(q, k, v, mask), (q, k, v, mask)


def _bwd(residuals, g):
    q, k, v, mask = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v, mask)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)
