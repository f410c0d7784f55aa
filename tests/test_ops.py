"""Pallas fused attention: numerics vs the XLA path, masking, gradients,
and end-to-end encoder equivalence with attention_impl='pallas'."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cldrd_tpu.models import DistilBertConfig, DistilBertEncoder
from cldrd_tpu.ops.attention import _xla_attention, flash_attention


def _random_qkv(key, bsz=2, seq=16, heads=4, dim=8, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (bsz, seq, heads, dim), dtype)
    k = jax.random.normal(ks[1], (bsz, seq, heads, dim), dtype)
    v = jax.random.normal(ks[2], (bsz, seq, heads, dim), dtype)
    mask = np.ones((bsz, seq), np.int32)
    mask[0, seq // 2:] = 0  # first row half-padded
    return q, k, v, jnp.asarray(mask)


def test_flash_matches_xla():
    q, k, v, mask = _random_qkv(jax.random.PRNGKey(0))
    out_pallas = flash_attention(q, k, v, mask)
    out_xla = _xla_attention(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


def test_flash_under_jit_and_shapes():
    q, k, v, mask = _random_qkv(jax.random.PRNGKey(1), bsz=3, seq=32, heads=2, dim=16)
    out = jax.jit(flash_attention)(q, k, v, mask)
    assert out.shape == q.shape and out.dtype == q.dtype
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_attention(q, k, v, mask)),
        atol=1e-5, rtol=1e-5,
    )


def test_flash_mask_blocks_padded_keys():
    """Output must be identical whether padded key/value positions hold
    zeros or garbage."""
    q, k, v, mask = _random_qkv(jax.random.PRNGKey(2))
    k_garbage = k.at[0, 8:].set(1e4)
    v_garbage = v.at[0, 8:].set(-1e4)
    out_clean = flash_attention(q, k, v, mask)
    out_garbage = flash_attention(q, k_garbage, v_garbage, mask)
    np.testing.assert_allclose(
        np.asarray(out_clean[0, :8]), np.asarray(out_garbage[0, :8]),
        atol=1e-5, rtol=1e-5,
    )


def test_flash_gradients_match_xla():
    q, k, v, mask = _random_qkv(jax.random.PRNGKey(3))

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, mask) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_encoder_pallas_impl_matches_xla():
    """Full DistilBERT encoder forward with attention_impl='pallas' equals
    the XLA implementation (deterministic mode)."""
    cfg_x = DistilBertConfig.tiny()
    cfg_p = DistilBertConfig.tiny(attention_impl="pallas")
    enc_x = DistilBertEncoder(cfg_x, jnp.float32)
    enc_p = DistilBertEncoder(cfg_p, jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 24), 0, cfg_x.vocab_size)
    mask = np.ones((2, 24), np.int32)
    mask[1, 12:] = 0
    mask = jnp.asarray(mask)
    params = enc_x.init(jax.random.PRNGKey(5), ids, mask)["params"]
    out_x = enc_x.apply({"params": params}, ids, mask, True)
    out_p = enc_p.apply({"params": params}, ids, mask, True)
    np.testing.assert_allclose(
        np.asarray(out_x), np.asarray(out_p), atol=1e-4, rtol=1e-4
    )
