"""Flax DistilBERT-compatible transformer encoder, TPU-first.

Re-provides the encoder capability the reference gets from HF PyTorch
(``transformers.AutoModel`` inside ``models/nway_dual_encoder.py:13-19`` of the
reference). Architecture matches ``DistilBertModel`` exactly so that converted
TAS-B / CL-DRD checkpoints are numerically faithful:

- learned word + position embeddings, post-embedding LayerNorm (eps 1e-12)
- 6 post-LN transformer blocks: MHA -> residual+LN -> GELU FFN -> residual+LN
- CLS pooling = ``hidden[:, 0, :]`` (reference ``nway_dual_encoder.py:52,56,64``)

TPU-first design choices (NOT a port of the torch module):

- params live in fp32, compute runs in bf16 (``dtype``) — the TPU-native
  replacement for the reference's CUDA AMP fp16 + GradScaler
  (``nway_listwise_1.py:31,328-359``); bf16 needs no loss scaling.
- all shapes static: sequences are padded to fixed ``max_len`` by the host
  collator so every train/encode step hits the same XLA executable.
- attention defaults to ``attention_impl='auto'``: the fused Pallas train
  kernels (``cldrd_tpu.ops.attention``) on TPU when dropout is active, the
  fused ``einsum`` chain (XLA) everywhere else; explicit 'xla'/'pallas'
  override (see :func:`resolve_attention_impl`).
- no data-dependent Python control flow anywhere under ``jit``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Large negative for masked attention logits; safe in bf16 (min bf16 ~ -3.4e38,
# but softmax subtracts the max, so -1e9 fully suppresses masked positions
# without generating inf-inf NaNs the way float('-inf') masking can).
NEG_INF = -1e9


def resolve_attention_impl(impl: str, train_mode: bool) -> str:
    """Resolve ``attention_impl='auto'`` to the measured-best implementation
    for the current backend (a trace-time Python decision — the choice is
    static per compiled executable):

    - TPU + training (attention dropout active): the fused Pallas fwd+bwd
      train kernels (``ops/attention.py``) — 47.1% vs 37.3% MFU at the
      reference workload shape (bench_train.py, docs/perf.md).
    - everything else — TPU inference/encode (the Pallas inference kernel
      measured 0.98x XLA) and CPU (kernels would run in interpret mode) —
      the XLA einsum path.

    Explicit 'xla'/'pallas' always win (the CLI flag overrides)."""
    if impl != "auto":
        return impl
    return "pallas" if (train_mode and jax.default_backend() == "tpu") else "xla"


@dataclasses.dataclass(frozen=True)
class DistilBertConfig:
    """Static architecture hyperparameters (HF ``DistilBertConfig`` parity)."""

    vocab_size: int = 30522
    max_position_embeddings: int = 512
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    # 'auto' (default) = measured-best per backend, resolved at trace time
    # by resolve_attention_impl(): the fused Pallas TRAIN kernels on TPU
    # when attention dropout is active (47.1% vs 37.3% MFU, bench_train.py),
    # XLA everywhere else — inference/encode stays XLA even on TPU (the
    # Pallas inference kernel measured 0.98x XLA, docs/perf.md), and CPU
    # stays XLA (the kernels would only run in interpret mode there).
    # 'xla' = einsum attention (XLA fuses); 'pallas' = fused Pallas kernel.
    attention_impl: str = "auto"
    # compute q/k/v in ONE [D, 3D] matmul (the three projection kernels
    # concatenate at apply time; the param tree and per-output numerics are
    # unchanged — each output column still reduces over the same D inputs).
    # Fewer, wider MXU dispatches on the hot tower; measured in
    # bench_train.py. cls_only final blocks keep split projections (q is
    # 1 row there — fusing would compute q for all L rows).
    fused_qkv: bool = False
    # keep attention scores + softmax in the COMPUTE dtype (bf16) instead
    # of fp32: halves the [B, H, L, L] score-tensor HBM traffic. Softmax
    # subtracts the row max first, so bf16 is numerically safe (exp inputs
    # <= 0); expect ulp-level logit drift vs the HF-parity fp32 default —
    # off by default, measured in bench_train.py / docs/perf.md.
    softmax_in_compute_dtype: bool = False
    # rematerialize each transformer block in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for O(layers) less activation
    # memory — enables large nway*batch training shapes (e.g. bz=32, nway=30,
    # L=256 = 960 sequences/step) that otherwise exceed a single chip's HBM
    remat: bool = False
    # remat policy: "full" recomputes everything inside each block;
    # "dots" saves weight-matmul outputs (jax.checkpoint_policies.
    # dots_with_no_batch_dims_saveable) and recomputes only attention
    # scores/softmax and elementwise ops — less recompute, more memory
    # (selective remat, benchmarked in bench_train.py)
    remat_policy: str = "full"

    @classmethod
    def tiny(cls, **overrides) -> "DistilBertConfig":
        """A small config for tests (fast CPU compile, exercises all paths)."""
        base = dict(
            vocab_size=512,
            max_position_embeddings=64,
            dim=32,
            n_layers=2,
            n_heads=4,
            hidden_dim=64,
        )
        base.update(overrides)
        return cls(**base)


class Embeddings(nn.Module):
    """word + position (+ optional token-type) embeddings -> LN -> dropout.

    Shared by the DistilBERT and BERT families: a config carrying a nonzero
    ``type_vocab_size`` (``BertConfig``) adds the segment-embedding table;
    DistilBERT configs have no such field, so the param tree stays exactly
    HF-DistilBERT-shaped."""

    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        deterministic: bool,
        position_ids: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        word_emb = nn.Embed(
            cfg.vocab_size,
            cfg.dim,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="word_embeddings",
        )(input_ids)
        seq_len = input_ids.shape[-1]
        if seq_len > cfg.max_position_embeddings:
            raise ValueError(
                f"sequence length {seq_len} exceeds the model's "
                f"max_position_embeddings={cfg.max_position_embeddings}; "
                f"lower --max-length (the 'tiny' config supports 64)"
            )
        pos_table = self.param(
            "position_embeddings",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.dim),
            jnp.float32,
        )
        if position_ids is None:
            # Positions are static [0, L): broadcast a slice of the table.
            pos_emb = jax.lax.dynamic_slice_in_dim(pos_table, 0, seq_len, axis=0)
            pos_emb = pos_emb.astype(self.dtype)[None, :, :]
        else:
            # Packed sequences reset positions per segment (data/packing.py):
            # an explicit [B, L] gather from the learned table.
            pos_emb = jnp.take(pos_table, position_ids, axis=0).astype(self.dtype)
        hidden = word_emb + pos_emb
        tvs = getattr(cfg, "type_vocab_size", 0)
        if tvs:
            type_emb = nn.Embed(
                tvs,
                cfg.dim,
                embedding_init=nn.initializers.normal(cfg.initializer_range),
                param_dtype=jnp.float32,
                dtype=self.dtype,
                name="token_type_embeddings",
            )
            if token_type_ids is None:
                # All-zero segment ids: one embedding row broadcast — skips
                # the [B, L] gather (the common single-sequence case).
                hidden = hidden + type_emb(jnp.zeros((1, 1), jnp.int32))
            else:
                hidden = hidden + type_emb(token_type_ids)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="LayerNorm",
        )(hidden)
        hidden = nn.Dropout(cfg.dropout)(hidden, deterministic=deterministic)
        return hidden


class _ProjParams(nn.Module):
    """Parameter container with nn.Dense's exact {kernel, bias} tree, for
    projections whose matmul is fused OUTSIDE the module (fused_qkv)."""

    in_features: int
    features: int
    initializer_range: float

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.normal(self.initializer_range),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class MultiHeadSelfAttention(nn.Module):
    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: jax.Array,
        segment_ids: Optional[jax.Array],
        deterministic: bool,
        cls_only: bool = False,
    ) -> jax.Array:
        """``cls_only``: compute attention output only for position 0 (the
        CLS token) — q/out projections, scores and context shrink from L
        rows to 1 with identical position-0 math. Used by the final
        block when the consumer is CLS pooling (all CL-DRD paths).

        ``segment_ids`` (packed sequences, ``data/packing.py``): [B, L]
        ints, 0 = padding; attention is additionally masked to
        ``seg_q == seg_k`` so packed passages never attend across their
        boundaries — each segment's math is exactly the unpacked row's."""
        cfg = self.config
        bsz, seq_len, _ = hidden.shape
        head_dim = cfg.dim // cfg.n_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            name=name,
        )
        q_in = hidden[:, :1, :] if cls_only else hidden
        q_len = q_in.shape[1]
        if cfg.fused_qkv and not cls_only:
            # One [D, 3D] projection matmul. _ProjParams declares the SAME
            # q_lin/k_lin/v_lin {kernel, bias} tree nn.Dense would, so
            # checkpoints are interchangeable with the unfused path; each
            # output column's reduction is over the same D inputs at the
            # same precision, so numerics match the three-matmul form.
            kernels, biases = zip(*(
                _ProjParams(cfg.dim, cfg.dim, cfg.initializer_range,
                            name=name)()
                for name in ("q_lin", "k_lin", "v_lin")
            ))
            w = jnp.concatenate(kernels, axis=1).astype(self.dtype)
            b = jnp.concatenate(biases).astype(self.dtype)
            qkv = hidden.astype(self.dtype) @ w + b   # [B, L, 3D]
            q, k, v = (
                x.reshape(bsz, seq_len, cfg.n_heads, head_dim)
                for x in jnp.split(qkv, 3, axis=-1)
            )
        else:
            q = dense("q_lin")(q_in).reshape(bsz, q_len, cfg.n_heads, head_dim)
            k = dense("k_lin")(hidden).reshape(bsz, seq_len, cfg.n_heads, head_dim)
            v = dense("v_lin")(hidden).reshape(bsz, seq_len, cfg.n_heads, head_dim)

        # Fused Pallas attention: the inference kernel handles the
        # deterministic/no-dropout unpacked case; the TRAINING kernel
        # pair (flash_attention_train) additionally runs attention-probs
        # dropout in-kernel via a counter-based hash — statistically the
        # same Bernoulli(1-p) as flax Dropout but a different stream (the
        # same contract as torch-vs-JAX RNG in the parity suite) — and
        # supports packed segment masking. The cls_only row-slice stays
        # on the XLA path (the final block's q is 1 row).
        train_mode = not (deterministic or cfg.attention_dropout == 0.0)
        impl = resolve_attention_impl(cfg.attention_impl, train_mode)
        use_pallas = impl == "pallas" and not cls_only
        if use_pallas and train_mode:
            from cldrd_tpu.ops.attention import flash_attention_train

            seed = jax.random.bits(
                self.make_rng("dropout"), dtype=jnp.uint32
            ).astype(jnp.int32)
            context = flash_attention_train(
                q, k, v, attention_mask, seed,
                float(cfg.attention_dropout), segment_ids,
            )
        elif use_pallas and segment_ids is None:
            from cldrd_tpu.ops.attention import flash_attention

            context = flash_attention(q, k, v, attention_mask)
        else:
            # HF parity: scale Q (not the logits) before the matmul.
            q = q / jnp.sqrt(jnp.asarray(head_dim, dtype=self.dtype))
            score_dtype = (self.dtype if cfg.softmax_in_compute_dtype
                           else jnp.float32)
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=score_dtype
            )
            mask = attention_mask[:, None, None, :].astype(jnp.bool_)
            if segment_ids is not None:
                seg_q = segment_ids[:, :1] if cls_only else segment_ids
                mask = mask & (
                    seg_q[:, None, :, None] == segment_ids[:, None, None, :]
                )
            scores = jnp.where(mask, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_dropout)(
                probs, deterministic=deterministic
            )
            context = jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        context = context.reshape(bsz, q_len, cfg.dim)
        return dense("out_lin")(context)


class TransformerBlock(nn.Module):
    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: jax.Array,
        segment_ids: Optional[jax.Array],
        deterministic: bool,
        cls_only: bool = False,
    ) -> jax.Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        sa_out = MultiHeadSelfAttention(cfg, self.dtype, name="attention")(
            hidden, attention_mask, segment_ids, deterministic, cls_only=cls_only
        )
        sa_out = nn.Dropout(cfg.dropout)(sa_out, deterministic=deterministic)
        residual = hidden[:, :1, :] if cls_only else hidden
        hidden = ln("sa_layer_norm")(sa_out + residual)

        ffn = nn.Dense(
            cfg.hidden_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            name="lin1",
        )(hidden)
        # HF DistilBERT uses exact (erf) GELU.
        ffn = jax.nn.gelu(ffn, approximate=False)
        ffn = nn.Dense(
            cfg.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(cfg.initializer_range),
            name="lin2",
        )(ffn)
        ffn = nn.Dropout(cfg.dropout)(ffn, deterministic=deterministic)
        return ln("output_layer_norm")(ffn + hidden)


class DistilBertEncoder(nn.Module):
    """The full encoder: token ids + mask -> hidden states [B, L, D]."""

    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool = True,
        cls_only: bool = False,
        position_ids: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        """``cls_only``: the FINAL block computes only the CLS position —
        its attention q/out projections and the whole last FFN shrink from
        L rows to 1 (~15% fewer encoder FLOPs at L=256), with numerically identical
        position-0 math (up to op-scheduling ulps). Exact for every CL-DRD consumer, which all
        CLS-pool (reference ``nway_dual_encoder.py:52,56,64``). Returns
        [B, 1, D] instead of [B, L, D].

        ``position_ids``/``segment_ids``: packed-sequence mode
        (``data/packing.py``) — per-segment position reset + pairwise
        segment attention masking; each packed segment's hidden states are
        exactly its unpacked row's."""
        hidden = Embeddings(self.config, self.dtype, name="embeddings")(
            input_ids, deterministic, position_ids=position_ids
        )
        block_cls = TransformerBlock
        if self.config.remat:
            policy = None
            if self.config.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            # deterministic and cls_only are Python bools -> static
            # (argnum 0 is the module instance in flax lifted transforms;
            # hidden/attention_mask/segment_ids are traced args 1-3)
            block_cls = nn.remat(
                TransformerBlock, static_argnums=(4, 5), policy=policy
            )
        n = self.config.n_layers
        for i in range(n):
            hidden = block_cls(self.config, self.dtype, name=f"layer_{i}")(
                hidden, attention_mask, segment_ids, deterministic,
                cls_only and i == n - 1,
            )
        return hidden


def cls_pool(hidden: jax.Array) -> jax.Array:
    """CLS pooling: reference ``nway_dual_encoder.py:52`` (``[0][:, 0, :]``)."""
    return hidden[:, 0, :]
