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
standard recompute-in-backward trade (cheap at L<=256; inference/encode
paths use the XLA default anyway, see the 0.98x finding above).

TRAINING path (``flash_attention_train``): the r4 per-op profile
(examples/profile_train_step.py --raw) showed the TRAIN step — unlike the
encode path — pays ~21 ms/layer for XLA attention: the backward needs the
[B, H, L, L] probability tensor, so XLA materializes it (plus the dropout
mask), and the head-dim-64 AV/dV/dprobs batched matmuls run at ~22% of
MXU peak. ``flash_attention_train`` fuses BOTH directions as Pallas
kernels — forward emits only the context; backward recomputes
scores/probs in VMEM and produces dq/dk/dv in one program per batch row —
and implements attention-probs dropout INSIDE the kernels with a
counter-based hash (murmur3 finalizer over the element index), so the
identical mask regenerates in the backward at zero residual memory. The
same hash has a pure-jnp twin (``dropout_keep_mask``) used by the XLA
reference path in tests, making fwd/bwd exactly equivalence-testable.
The hash stream differs from flax's threefry Dropout (statistically
identical Bernoulli(1-p), not bit-equal) — the same contract as the
torch-vs-JAX RNG difference the training parity suite already documents.
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


# ---------------------------------------------------------------- training
# Fused fwd+bwd attention with in-kernel counter-based dropout.


def _hash_keep(idx: jax.Array, seed: jax.Array, dropout_p: float) -> jax.Array:
    """Deterministic Bernoulli(1-p) keep mask from an element index.

    murmur3 finalizer over ``idx`` (int32, unique per (head, q, k)
    element) xor ``seed``; the top 24 bits convert exactly to f32 for the
    threshold compare (logical shift — an arithmetic shift would sign-
    extend). Pure jnp integer ops so the SAME function lowers in a Pallas
    TPU kernel, in interpret mode, and as the XLA twin used by tests."""
    x = idx ^ seed
    x = x * jnp.int32(-1028477379)          # 0xC2B2AE35 (wraps, as murmur)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(-2048144789)          # 0x85EBCA6B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(-1028477379)
    x = x ^ jax.lax.shift_right_logical(x, 16)
    u = jax.lax.shift_right_logical(x, 8).astype(jnp.float32) * (2.0 ** -24)
    return u >= dropout_p


def dropout_keep_mask(bsz: int, n_heads: int, q_len: int, k_len: int,
                      seed: jax.Array, dropout_p: float) -> jax.Array:
    """jnp twin of the in-kernel dropout mask: [B, H, Lq, Lk] bool, True =
    keep. Bit-identical to what ``flash_attention_train``'s kernels
    generate (tests apply it to the XLA reference path and require exact
    agreement of outputs and gradients)."""
    idx = (
        ((jnp.arange(bsz, dtype=jnp.int32)[:, None, None, None] * n_heads
          + jnp.arange(n_heads, dtype=jnp.int32)[None, :, None, None]) * q_len
         + jnp.arange(q_len, dtype=jnp.int32)[None, None, :, None]) * k_len
        + jnp.arange(k_len, dtype=jnp.int32)[None, None, None, :]
    )
    return _hash_keep(idx, seed.astype(jnp.int32), dropout_p)


def _train_fwd_kernel_factory(n_heads: int, seq_len: int,
                              dropout_p: float,
                              with_segments: bool = False):
    def kernel(q_ref, k_ref, v_ref, mask_ref, *rest):
        if with_segments:
            seg_ref, seed_ref, out_ref = rest
        else:
            seed_ref, out_ref = rest
        b = pl.program_id(0)
        q = q_ref[0]  # [H, L, D]
        k = k_ref[0]
        v = v_ref[0]
        mask = mask_ref[0, 0, :]  # [L]
        head_dim = q.shape[-1]
        scale = 1.0 / float(head_dim) ** 0.5
        scores = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, L, L] fp32
        allowed = mask[None, None, :] != 0
        if with_segments:
            # packed rows (data/packing.py): tokens attend only within
            # their segment — exactly the XLA path's pairwise mask
            seg = seg_ref[0, 0, :]  # [L]
            allowed = allowed & (
                seg[None, :, None] == seg[None, None, :])
        scores = jnp.where(allowed, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        if dropout_p > 0.0:
            # element index matches dropout_keep_mask's [B, H, Lq, Lk]
            hh = jax.lax.broadcasted_iota(
                jnp.int32, (n_heads, seq_len, seq_len), 0)
            qq = jax.lax.broadcasted_iota(
                jnp.int32, (n_heads, seq_len, seq_len), 1)
            kk = jax.lax.broadcasted_iota(
                jnp.int32, (n_heads, seq_len, seq_len), 2)
            idx = ((b * n_heads + hh) * seq_len + qq) * seq_len + kk
            keep = _hash_keep(idx, seed_ref[0, 0], dropout_p)
            inv = jnp.asarray(1.0 / (1.0 - dropout_p), probs.dtype)
            probs = jnp.where(keep, probs * inv, jnp.zeros_like(probs))
        context = jax.lax.dot_general(
            probs, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = context.astype(out_ref.dtype)

    return kernel


def _train_bwd_kernel_factory(n_heads: int, seq_len: int,
                              dropout_p: float, heads_per: int,
                              with_segments: bool = False):
    """``heads_per``: heads handled per program — the backward holds two
    fp32 and two bf16 [H, L, L] tensors live at once, which blows the
    16 MB scoped-VMEM limit at H=12, L=256 (measured 18.4 MB), so heads
    split across a second grid dimension. The dropout hash uses the
    GLOBAL head index so any split reproduces the forward's mask."""
    def kernel(q_ref, k_ref, v_ref, mask_ref, *rest):
        if with_segments:
            seg_ref, seed_ref, g_ref, dq_ref, dk_ref, dv_ref = rest
        else:
            seed_ref, g_ref, dq_ref, dk_ref, dv_ref = rest
        b = pl.program_id(0)
        h0 = pl.program_id(1) * heads_per  # global index of first head
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        g = g_ref[0]  # [heads_per, L, D] upstream context grad
        mask = mask_ref[0, 0, :]
        head_dim = q.shape[-1]
        scale = 1.0 / float(head_dim) ** 0.5

        # recompute probs exactly as the forward did
        scores = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        allowed = mask[None, None, :] != 0
        if with_segments:
            seg = seg_ref[0, 0, :]
            allowed = allowed & (
                seg[None, :, None] == seg[None, None, :])
        scores = jnp.where(allowed, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        if dropout_p > 0.0:
            hh = h0 + jax.lax.broadcasted_iota(
                jnp.int32, (heads_per, seq_len, seq_len), 0)
            qq = jax.lax.broadcasted_iota(
                jnp.int32, (heads_per, seq_len, seq_len), 1)
            kk = jax.lax.broadcasted_iota(
                jnp.int32, (heads_per, seq_len, seq_len), 2)
            idx = ((b * n_heads + hh) * seq_len + qq) * seq_len + kk
            keep = _hash_keep(idx, seed_ref[0, 0], dropout_p)
            inv = jnp.asarray(1.0 / (1.0 - dropout_p), probs.dtype)
            probs_d = jnp.where(keep, probs * inv, jnp.zeros_like(probs))
        else:
            probs_d = probs

        # dV = probs_d^T @ g : contract the q axis
        dv = jax.lax.dot_general(
            probs_d, g,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, Lk, D]
        # dP = g @ v^T : contract the d axis
        dp = jax.lax.dot_general(
            g, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, Lq, Lk] fp32
        if dropout_p > 0.0:
            inv32 = jnp.float32(1.0 / (1.0 - dropout_p))
            dp = jnp.where(keep, dp * inv32, jnp.zeros_like(dp))
        # softmax backward on the PRE-dropout probs (fp32)
        pf = probs.astype(jnp.float32)
        ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
        ds = ds.astype(q.dtype)  # matmul operands in compute dtype
        # dq = scale * dS @ k ; dk = scale * dS^T @ q
        dq = jax.lax.dot_general(
            ds, k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        dk = jax.lax.dot_general(
            ds, q,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * jnp.float32(scale)
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    return kernel


def _train_specs(bsz, seq_len, n_heads, head_dim):
    qkv_spec = pl.BlockSpec(
        (1, n_heads, seq_len, head_dim), lambda b: (b, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, 1, seq_len), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    # seed rides as a [1, 1] int32 VMEM block replicated to every program
    # (SMEM scalar operands have hung this environment's remote compiler
    # before — see .claude/skills/verify/SKILL.md)
    seed_spec = pl.BlockSpec((1, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    return qkv_spec, mask_spec, seed_spec


def _train_flops(bsz, n_heads, seq_len, head_dim, n_dots):
    return n_dots * 2 * bsz * n_heads * seq_len * seq_len * head_dim


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention_train(q, k, v, mask, seed, dropout_p=0.0,
                          segment_ids=None):
    """Fused attention for TRAINING: q/k/v [B, L, H, D], mask [B, L],
    ``seed`` an int32 scalar array (fold the step RNG into it), static
    ``dropout_p``, optional ``segment_ids`` [B, L] (packed rows,
    ``data/packing.py``: attention restricted to ``seg_q == seg_k``).
    Attention-probs dropout runs INSIDE the kernels via a counter-based
    hash (see ``dropout_keep_mask`` for the exact stream), so neither the
    [B,H,L,L] probability tensor nor its dropout mask ever reaches HBM —
    in either direction."""
    return _train_fwd(q, k, v, mask, seed, dropout_p, segment_ids)[0]


def _train_fwd(q, k, v, mask, seed, dropout_p, segment_ids=None):
    bsz, seq_len, n_heads, head_dim = q.shape
    qt, kt, vt = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    mask3 = mask[:, None, :]
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    qkv_spec, mask_spec, seed_spec = _train_specs(
        bsz, seq_len, n_heads, head_dim)
    operands = [qt, kt, vt, mask3]
    in_specs = [qkv_spec, qkv_spec, qkv_spec, mask_spec]
    if segment_ids is not None:
        operands.append(segment_ids[:, None, :].astype(jnp.int32))
        in_specs.append(mask_spec)
    operands.append(seed2)
    in_specs.append(seed_spec)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        _train_fwd_kernel_factory(n_heads, seq_len, dropout_p,
                                  with_segments=segment_ids is not None),
        grid=(bsz,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=_train_flops(bsz, n_heads, seq_len, head_dim, 2),
            bytes_accessed=4 * bsz * n_heads * seq_len * head_dim
            * q.dtype.itemsize,
            transcendentals=bsz * n_heads * seq_len * seq_len,
        ),
    )(*operands)
    return (jnp.transpose(out, (0, 2, 1, 3)),
            (q, k, v, mask, seed, segment_ids))


def _bwd_head_groups(n_heads: int, seq_len: int) -> int:
    """Head groups for the backward grid: the smallest divisor of H whose
    per-program live set fits scoped VMEM. Calibrated on v5e: the full
    H=12, L=256 program allocates 18.4 MB (~24 bytes per [H, L, L]
    element across the two fp32 + two bf16 score-shaped tensors and
    double-buffered blocks) against the 16 MB limit."""
    for groups in range(1, n_heads + 1):
        if n_heads % groups:
            continue
        if (n_heads // groups) * seq_len * seq_len * 24 <= 14 * 2**20:
            return groups
    return n_heads


def _train_bwd(dropout_p, residuals, g):
    q, k, v, mask, seed, segment_ids = residuals
    bsz, seq_len, n_heads, head_dim = q.shape
    qt, kt, vt, gt = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v, g))
    mask3 = mask[:, None, :]
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    groups = _bwd_head_groups(n_heads, seq_len)
    heads_per = n_heads // groups
    hblk_spec = pl.BlockSpec(
        (1, heads_per, seq_len, head_dim), lambda b, h: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, 1, seq_len), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM
    )
    seed_spec = pl.BlockSpec((1, 1), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM)
    operands = [qt, kt, vt, mask3]
    in_specs = [hblk_spec, hblk_spec, hblk_spec, mask_spec]
    if segment_ids is not None:
        operands.append(segment_ids[:, None, :].astype(jnp.int32))
        in_specs.append(mask_spec)
    operands += [seed2, gt]
    in_specs += [seed_spec, hblk_spec]
    interpret = jax.default_backend() == "cpu"
    dq, dk, dv = pl.pallas_call(
        _train_bwd_kernel_factory(n_heads, seq_len, dropout_p, heads_per,
                                  with_segments=segment_ids is not None),
        grid=(bsz, groups),
        in_specs=in_specs,
        out_specs=[hblk_spec, hblk_spec, hblk_spec],
        out_shape=[jax.ShapeDtypeStruct(qt.shape, q.dtype)] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=_train_flops(bsz, n_heads, seq_len, head_dim, 5),
            bytes_accessed=7 * bsz * n_heads * seq_len * head_dim
            * q.dtype.itemsize,
            transcendentals=bsz * n_heads * seq_len * seq_len,
        ),
    )(*operands)
    un = lambda x: jnp.transpose(x, (0, 2, 1, 3))  # noqa: E731
    return un(dq), un(dk), un(dv), None, None, None


flash_attention_train.defvjp(_train_fwd, _train_bwd)
