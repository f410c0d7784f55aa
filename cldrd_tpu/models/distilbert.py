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
- attention is one fused ``einsum`` chain; an optional Pallas flash-attention
  kernel (``cldrd_tpu.ops.attention``) can be swapped in via ``attention_impl``.
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
    # 'xla' = einsum attention (XLA fuses); 'pallas' = fused Pallas kernel.
    attention_impl: str = "xla"

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
    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, deterministic: bool) -> jax.Array:
        cfg = self.config
        word_emb = nn.Embed(
            cfg.vocab_size,
            cfg.dim,
            embedding_init=nn.initializers.normal(cfg.initializer_range),
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="word_embeddings",
        )(input_ids)
        # Positions are static [0, L): broadcast a slice of the learned table.
        seq_len = input_ids.shape[-1]
        pos_table = self.param(
            "position_embeddings",
            nn.initializers.normal(cfg.initializer_range),
            (cfg.max_position_embeddings, cfg.dim),
            jnp.float32,
        )
        pos_emb = jax.lax.dynamic_slice_in_dim(pos_table, 0, seq_len, axis=0)
        hidden = word_emb + pos_emb.astype(self.dtype)[None, :, :]
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="LayerNorm",
        )(hidden)
        hidden = nn.Dropout(cfg.dropout)(hidden, deterministic=deterministic)
        return hidden


class MultiHeadSelfAttention(nn.Module):
    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool,
    ) -> jax.Array:
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
        q = dense("q_lin")(hidden).reshape(bsz, seq_len, cfg.n_heads, head_dim)
        k = dense("k_lin")(hidden).reshape(bsz, seq_len, cfg.n_heads, head_dim)
        v = dense("v_lin")(hidden).reshape(bsz, seq_len, cfg.n_heads, head_dim)

        # The fused Pallas kernel does not implement attention-probs dropout;
        # use it only when dropout is a no-op (inference / encode paths, or
        # attention_dropout == 0) so train/eval numerics stay faithful.
        use_pallas = cfg.attention_impl == "pallas" and (
            deterministic or cfg.attention_dropout == 0.0
        )
        if use_pallas:
            from cldrd_tpu.ops.attention import flash_attention

            context = flash_attention(q, k, v, attention_mask)
        else:
            # HF parity: scale Q (not the logits) before the matmul.
            q = q / jnp.sqrt(jnp.asarray(head_dim, dtype=self.dtype))
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            mask = attention_mask[:, None, None, :].astype(jnp.bool_)
            scores = jnp.where(mask, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            probs = nn.Dropout(cfg.attention_dropout)(
                probs, deterministic=deterministic
            )
            context = jnp.einsum("bhqk,bkhd->bqhd", probs, v)

        context = context.reshape(bsz, seq_len, cfg.dim)
        return dense("out_lin")(context)


class TransformerBlock(nn.Module):
    config: DistilBertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,
        attention_mask: jax.Array,
        deterministic: bool,
    ) -> jax.Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        sa_out = MultiHeadSelfAttention(cfg, self.dtype, name="attention")(
            hidden, attention_mask, deterministic
        )
        sa_out = nn.Dropout(cfg.dropout)(sa_out, deterministic=deterministic)
        hidden = ln("sa_layer_norm")(sa_out + hidden)

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
    ) -> jax.Array:
        hidden = Embeddings(self.config, self.dtype, name="embeddings")(
            input_ids, deterministic
        )
        for i in range(self.config.n_layers):
            hidden = TransformerBlock(self.config, self.dtype, name=f"layer_{i}")(
                hidden, attention_mask, deterministic
            )
        return hidden


def cls_pool(hidden: jax.Array) -> jax.Array:
    """CLS pooling: reference ``nway_dual_encoder.py:52`` (``[0][:, 0, :]``)."""
    return hidden[:, 0, :]
