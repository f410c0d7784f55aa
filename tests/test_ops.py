"""Pallas fused attention: numerics vs the XLA path, masking, gradients,
and end-to-end encoder equivalence with attention_impl='pallas'."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cldrd_tpu.models import DistilBertConfig, DistilBertEncoder
from cldrd_tpu.ops.attention import (
    _xla_attention,
    dropout_keep_mask,
    flash_attention,
    flash_attention_train,
)


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


def _xla_attention_with_keep(q, k, v, mask, keep, p, seg=None):
    """XLA reference applying the EXACT keep mask the train kernel's
    counter-based hash generates (dropout_keep_mask) — the ops mirror the
    kernel's (explicit max-subtracted softmax, probs cast to compute
    dtype, where-masked inverse scaling); ``seg`` adds the packed-row
    pairwise segment mask."""
    head_dim = q.shape[-1]
    qs = q / jnp.sqrt(jnp.asarray(head_dim, q.dtype))
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qs, k, preferred_element_type=jnp.float32)
    allowed = mask[:, None, None, :] != 0
    if seg is not None:
        allowed = allowed & (
            seg[:, None, :, None] == seg[:, None, None, :])
    scores = jnp.where(allowed, scores, -1e9)
    m = jnp.max(scores, axis=-1, keepdims=True)
    pr = jnp.exp(scores - m)
    probs = (pr / jnp.sum(pr, axis=-1, keepdims=True)).astype(q.dtype)
    inv = jnp.asarray(1.0 / (1.0 - p), probs.dtype)
    probs = jnp.where(keep, probs * inv, jnp.zeros_like(probs))
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


class TestFlashAttentionTrain:
    """The fused TRAIN kernels (forward + custom backward, in-kernel
    counter-based dropout), run in interpret mode on CPU."""

    def test_no_dropout_matches_xla_fwd_and_grads(self):
        q, k, v, mask = _random_qkv(jax.random.PRNGKey(7))
        seed = jnp.int32(0)
        out = flash_attention_train(q, k, v, mask, seed, 0.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_xla_attention(q, k, v, mask)),
            atol=1e-5, rtol=1e-5)

        def loss_t(q, k, v):
            return jnp.sum(flash_attention_train(q, k, v, mask, seed, 0.0) ** 2)

        def loss_x(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, mask) ** 2)

        g1 = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_dropout_exactly_matches_masked_reference(self):
        """The kernel's in-kernel dropout must equal the XLA path with the
        hash twin's keep mask applied — outputs AND gradients."""
        p = 0.25
        q, k, v, mask = _random_qkv(jax.random.PRNGKey(8))
        bsz, seq, heads, _ = q.shape
        seed = jnp.int32(12345)
        keep = dropout_keep_mask(bsz, heads, seq, seq, seed, p)
        out = flash_attention_train(q, k, v, mask, seed, p)
        ref = _xla_attention_with_keep(q, k, v, mask, keep, p)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

        def loss_t(q, k, v):
            return jnp.sum(flash_attention_train(q, k, v, mask, seed, p) ** 2)

        def loss_r(q, k, v):
            return jnp.sum(_xla_attention_with_keep(q, k, v, mask, keep, p) ** 2)

        g1 = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_dropout_deterministic_seeded_and_calibrated(self):
        p = 0.1
        q, k, v, mask = _random_qkv(jax.random.PRNGKey(9), bsz=2, seq=32,
                                    heads=4, dim=8)
        s1, s2 = jnp.int32(7), jnp.int32(8)
        o1a = flash_attention_train(q, k, v, mask, s1, p)
        o1b = flash_attention_train(q, k, v, mask, s1, p)
        o2 = flash_attention_train(q, k, v, mask, s2, p)
        np.testing.assert_array_equal(np.asarray(o1a), np.asarray(o1b))
        assert not np.allclose(np.asarray(o1a), np.asarray(o2))
        keep = dropout_keep_mask(8, 12, 64, 64, jnp.int32(3), p)
        frac = float(np.asarray(keep).mean())
        assert abs(frac - (1 - p)) < 0.01, frac

    def test_segment_masked_dropout_matches_reference(self):
        """Packed rows: the kernel's pairwise segment mask + in-kernel
        dropout must match the XLA reference with the hash twin's keep
        mask — outputs and gradients."""
        p = 0.2
        q, k, v, _ = _random_qkv(jax.random.PRNGKey(13), bsz=2, seq=32,
                                 heads=4, dim=8)
        seg = np.zeros((2, 32), np.int32)
        seg[:, :12] = 1
        seg[:, 12:28] = 2  # two segments + 4 padding tokens (segment 0)
        mask = jnp.asarray((seg > 0).astype(np.int32))
        seg = jnp.asarray(seg)
        seed = jnp.int32(99)
        keep = dropout_keep_mask(2, 4, 32, 32, seed, p)
        out = flash_attention_train(q, k, v, mask, seed, p, seg)
        ref = _xla_attention_with_keep(q, k, v, mask, keep, p, seg)
        real = np.asarray(mask, bool)  # padded q rows are don't-care
        np.testing.assert_allclose(
            np.asarray(out)[real], np.asarray(ref)[real],
            atol=1e-5, rtol=1e-5)

        def loss_t(q, k, v):
            o = flash_attention_train(q, k, v, mask, seed, p, seg)
            return jnp.sum(jnp.where(mask[:, :, None, None] != 0, o, 0.0) ** 2)

        def loss_r(q, k, v):
            o = _xla_attention_with_keep(q, k, v, mask, keep, p, seg)
            return jnp.sum(jnp.where(mask[:, :, None, None] != 0, o, 0.0) ** 2)

        g1 = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_encoder_train_mode_pallas_dropout(self):
        """Encoder forward in TRAIN mode (deterministic=False) with
        attention_impl='pallas' routes through flash_attention_train:
        finite outputs, differs from the deterministic pass, and the
        gradient is finite."""
        cfg = DistilBertConfig.tiny(attention_impl="pallas")
        enc = DistilBertEncoder(cfg, jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(10), (2, 24), 0,
                                 cfg.vocab_size)
        mask = jnp.ones((2, 24), jnp.int32)
        params = enc.init(jax.random.PRNGKey(11), ids, mask)["params"]
        det = enc.apply({"params": params}, ids, mask, True)
        rngs = {"dropout": jax.random.PRNGKey(12)}
        trn = enc.apply({"params": params}, ids, mask, False, rngs=rngs)
        assert np.isfinite(np.asarray(trn)).all()
        assert not np.allclose(np.asarray(det), np.asarray(trn))

        def loss(params):
            out = enc.apply({"params": params}, ids, mask, False, rngs=rngs)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        flat, _ = jax.tree_util.tree_flatten(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)


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


class TestIVFProbeKernel:
    """The fused IVF probe-and-score kernel (ops/ivf_probe.py) vs its XLA
    twin — interpret mode on CPU runs the TPU kernel's exact math.
    Replaces: FAISS InvertedListScanner.scan_codes over probed lists."""

    def _mk(self, store, scaled, nb=16, slot=64, d=128, b=4, p=5, seed=0):
        rng = np.random.default_rng(seed)
        if store == "int8":
            rows = jnp.asarray(rng.integers(-127, 128, (nb * slot, d)),
                               jnp.int8)
        else:
            rows = jnp.asarray(rng.normal(size=(nb * slot, d)), jnp.bfloat16)
        q = jnp.asarray(rng.normal(size=(b, d)), jnp.bfloat16)
        probe = jnp.asarray(rng.integers(0, nb, (b, p)), jnp.int32)
        scales = (jnp.asarray(rng.uniform(0.9, 1.1, (nb, slot)), jnp.float32)
                  if scaled else None)
        return q, rows, probe, scales, slot

    def test_matches_xla_twin(self):
        from cldrd_tpu.ops.ivf_probe import (probe_scores,
                                             probe_scores_reference)

        for store, scaled in (("bf16", False), ("bf16", True),
                              ("int8", True)):
            q, rows, probe, scales, slot = self._mk(store, scaled)
            got = probe_scores(q, rows, probe, scales, slot=slot)
            want = probe_scores_reference(q, rows, probe, scales, slot=slot)
            scale = float(jnp.max(jnp.abs(want))) + 1.0
            assert float(jnp.max(jnp.abs(got - want))) < 1e-2 * scale, (
                store, scaled)

    def test_duplicate_probes_and_shapes(self):
        from cldrd_tpu.ops.ivf_probe import (probe_scores,
                                             probe_scores_reference)

        q, rows, _, scales, slot = self._mk("int8", True)
        probe = jnp.asarray([[0, 0, 3, 3, 15]] * 4, jnp.int32)  # repeats
        got = probe_scores(q, rows, probe, scales, slot=slot)
        want = probe_scores_reference(q, rows, probe, scales, slot=slot)
        assert got.shape == (4, 5 * slot)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-2, rtol=1e-2)

    def test_gating_is_xla_on_cpu(self):
        from cldrd_tpu.index.ivf_index import _probe_kernel_eligible

        assert not _probe_kernel_eligible(jnp.int8, "default")  # cpu suite
        assert not _probe_kernel_eligible(jnp.float32, "highest")


def test_topk_with_payload_chunked_equals_single_sort():
    """Chunked wide-row selection == one whole-row payload sort, including
    the smaller-payload tie-break, on a tie-heavy input."""
    from cldrd_tpu.search.mips import (_topk_with_payload,
                                       topk_with_payload_chunked)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(0, 300, (4, 40000)).astype(np.float32))
    p = jnp.asarray(np.tile(np.arange(40000, dtype=np.int32), (4, 1)))
    cv, cp = topk_with_payload_chunked(v, p, 137)
    sv, sp = _topk_with_payload(v, p, 137)
    assert (np.asarray(cv) == np.asarray(sv)).all()
    assert (np.asarray(cp) == np.asarray(sp)).all()
    # k > width and narrow-row passthrough
    nv, npay = topk_with_payload_chunked(v[:, :50], p[:, :50], 137)
    assert nv.shape == (4, 50)
