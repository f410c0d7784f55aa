"""Model tests: HF-torch numerical parity of the Flax DistilBERT encoder,
dual-encoder scoring semantics (incl. in-batch-negative expansion vs the
reference's torch index construction), and cross-encoder head shape."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cldrd_tpu.models import (
    CrossEncoder,
    DistilBertConfig,
    DistilBertEncoder,
    DualEncoder,
    NwayDualEncoder,
    cls_pool,
    distilbert_torch_to_flax,
    dual_encoder_torch_to_flax,
)
from cldrd_tpu.models.dual_encoder import _in_batch_neg_indices

TINY = DistilBertConfig.tiny()


def _rand_batch(rng, bz, seq_len, vocab, min_len=3):
    ids = rng.integers(0, vocab, size=(bz, seq_len)).astype(np.int32)
    lens = rng.integers(min_len, seq_len + 1, size=(bz,))
    mask = (np.arange(seq_len)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask  # zero out padding like a real tokenizer would
    return ids, mask


# ---------------------------------------------------------------- HF parity


@pytest.fixture(scope="module")
def torch_tiny():
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.DistilBertConfig(
        vocab_size=TINY.vocab_size,
        max_position_embeddings=TINY.max_position_embeddings,
        dim=TINY.dim,
        n_layers=TINY.n_layers,
        n_heads=TINY.n_heads,
        hidden_dim=TINY.hidden_dim,
        dropout=TINY.dropout,
        attention_dropout=TINY.attention_dropout,
    )
    torch.manual_seed(0)
    model = transformers.DistilBertModel(hf_cfg).eval()
    return model


def test_encoder_matches_hf_torch(torch_tiny):
    """Converted random-init HF weights must reproduce HF outputs (fp32)."""
    import torch

    rng = np.random.default_rng(0)
    ids, mask = _rand_batch(rng, bz=4, seq_len=12, vocab=TINY.vocab_size)

    with torch.no_grad():
        ref = torch_tiny(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    params = distilbert_torch_to_flax(torch_tiny.state_dict())
    enc = DistilBertEncoder(TINY, dtype=jnp.float32)
    out = enc.apply({"params": params}, jnp.array(ids), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_encoder_bf16_close_to_fp32(torch_tiny):
    params = distilbert_torch_to_flax(torch_tiny.state_dict())
    rng = np.random.default_rng(1)
    ids, mask = _rand_batch(rng, bz=2, seq_len=10, vocab=TINY.vocab_size)
    f32 = DistilBertEncoder(TINY, dtype=jnp.float32).apply(
        {"params": params}, jnp.array(ids), jnp.array(mask)
    )
    bf16 = DistilBertEncoder(TINY, dtype=jnp.bfloat16).apply(
        {"params": params}, jnp.array(ids), jnp.array(mask)
    )
    # bf16 has ~3 decimal digits; CLS reps should still correlate tightly
    np.testing.assert_allclose(
        np.asarray(bf16, np.float32), np.asarray(f32), atol=0.1, rtol=0.1
    )


# ----------------------------------------------------- dual encoder semantics


def _init_nway(model, bz=2, nway=3, lq=6, lp=8):
    rng = np.random.default_rng(2)
    q_ids, q_mask = _rand_batch(rng, bz, lq, TINY.vocab_size)
    p_ids, p_mask = _rand_batch(rng, bz * nway, lp, TINY.vocab_size)
    queries = {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)}
    passages = {
        "input_ids": jnp.array(p_ids).reshape(bz, nway, lp),
        "attention_mask": jnp.array(p_mask).reshape(bz, nway, lp),
    }
    params = model.init(jax.random.PRNGKey(0), queries, passages)["params"]
    return params, queries, passages


def test_nway_forward_equals_manual_dot():
    model = NwayDualEncoder(TINY, share_weights=False)
    params, queries, passages = _init_nway(model)
    logits = model.apply({"params": params}, queries, passages)
    q = model.apply({"params": params}, queries, method=model.query_embs)
    p = model.apply({"params": params}, passages, method=model.nway_passage_embs)
    manual = np.einsum("bd,bnd->bn", np.asarray(q), np.asarray(p))
    np.testing.assert_allclose(np.asarray(logits), manual, rtol=1e-5, atol=1e-5)
    assert logits.shape == (2, 3)


def test_share_weights_single_tower():
    model = NwayDualEncoder(TINY, share_weights=True)
    params, queries, passages = _init_nway(model)
    assert set(params.keys()) == {"encoder"}
    # query tower and passage tower produce identical embeddings on same input
    flat = {
        "input_ids": passages["input_ids"][:, 0, :],
        "attention_mask": passages["attention_mask"][:, 0, :],
    }
    q = model.apply({"params": params}, flat, method=model.query_embs)
    p = model.apply({"params": params}, flat, method=model.passage_embs)
    np.testing.assert_allclose(np.asarray(q), np.asarray(p))


@pytest.mark.parametrize("all_neg", [True, False])
def test_in_batch_neg_indices_match_reference_construction(all_neg):
    """Reproduce the torch index gymnastics (nway_dual_encoder.py:30-41)
    in plain numpy and compare."""
    bz, nway = 4, 3
    full = np.asarray(
        [
            list(range(b * nway)) + list(range((b + 1) * nway, bz * nway))
            for b in range(bz)
        ]
    )
    if all_neg:
        expected = full
    else:
        xs = np.repeat(np.arange(bz).reshape(-1, 1), nway, axis=1)
        ys = np.concatenate(
            [
                np.arange(0, (bz - 1) * nway).reshape(bz - 1, nway),
                np.arange(0, nway).reshape(1, nway),
            ],
            axis=0,
        )
        expected = full[xs, ys]
    got = _in_batch_neg_indices(bz, nway, all_neg)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("all_neg,extra", [(True, 3 * 2), (False, 3)])
def test_in_batch_loss_logit_shapes(all_neg, extra):
    model = NwayDualEncoder(
        TINY, in_batch_loss=True, all_in_batch_neg=all_neg
    )
    params, queries, passages = _init_nway(model, bz=3, nway=3)
    logits = model.apply({"params": params}, queries, passages)
    assert logits.shape == (3, 3 + extra)


def test_plain_dual_encoder():
    model = DualEncoder(TINY, share_weights=True)
    rng = np.random.default_rng(3)
    q_ids, q_mask = _rand_batch(rng, 4, 6, TINY.vocab_size)
    p_ids, p_mask = _rand_batch(rng, 4, 8, TINY.vocab_size)
    queries = {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)}
    passages = {"input_ids": jnp.array(p_ids), "attention_mask": jnp.array(p_mask)}
    params = model.init(jax.random.PRNGKey(0), queries, passages)["params"]
    scores = model.apply({"params": params}, queries, passages)
    assert scores.shape == (4,)
    q = model.apply({"params": params}, queries, method=model.query_embs)
    p = model.apply({"params": params}, passages, method=model.passage_embs)
    np.testing.assert_allclose(
        np.asarray(scores), (np.asarray(q) * np.asarray(p)).sum(-1), rtol=1e-5
    )


def test_dual_encoder_checkpoint_roundtrip(torch_tiny):
    """module.query_encoder./passage_encoder. prefixed torch state_dict
    converts into our dual tower tree and matches single-tower conversion."""
    sd = {}
    for k, v in torch_tiny.state_dict().items():
        sd[f"module.query_encoder.{k}"] = v
        sd[f"module.passage_encoder.{k}"] = v
    params = dual_encoder_torch_to_flax(sd, share_weights=False)
    assert set(params.keys()) == {"query_encoder", "passage_encoder"}
    single = distilbert_torch_to_flax(torch_tiny.state_dict())
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        params["query_encoder"],
        single,
    )
    shared = dual_encoder_torch_to_flax(sd, share_weights=True)
    assert set(shared.keys()) == {"encoder"}


def test_cross_encoder_shapes():
    model = CrossEncoder(TINY)
    rng = np.random.default_rng(4)
    ids, mask = _rand_batch(rng, 5, 16, TINY.vocab_size)
    pairs = {"input_ids": jnp.array(ids), "attention_mask": jnp.array(mask)}
    params = model.init(jax.random.PRNGKey(0), pairs)["params"]
    scores = model.apply({"params": params}, pairs)
    assert scores.shape == (5,)


def test_padding_invariance():
    """CLS representation must not depend on values in padded positions."""
    model = DistilBertEncoder(TINY)
    rng = np.random.default_rng(5)
    ids, mask = _rand_batch(rng, 3, 10, TINY.vocab_size, min_len=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask)
    )["params"]
    out1 = cls_pool(model.apply({"params": params}, jnp.array(ids), jnp.array(mask)))
    ids2 = np.where(mask == 0, 7, ids)  # scribble over padding
    out2 = cls_pool(model.apply({"params": params}, jnp.array(ids2), jnp.array(mask)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_flax_to_torch_roundtrip():
    """torch->flax->torch must be the identity on a real HF DistilBertModel
    state_dict (random-initialized locally; no network)."""
    torch = pytest.importorskip("torch")
    from transformers import DistilBertConfig as HFConfig, DistilBertModel

    from cldrd_tpu.models import distilbert_flax_to_torch, distilbert_torch_to_flax

    hf = DistilBertModel(HFConfig(n_layers=2, dim=32, n_heads=4, hidden_dim=64,
                                  vocab_size=128, max_position_embeddings=64))
    sd = {k: v for k, v in hf.state_dict().items()}
    flax_params = distilbert_torch_to_flax(sd)
    back = distilbert_flax_to_torch(flax_params)
    orig = {k: v.numpy() for k, v in sd.items()}
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_allclose(back[k], orig[k], rtol=1e-6, atol=1e-6)


def test_dual_encoder_flax_to_torch_layout():
    from cldrd_tpu.models import (
        DistilBertConfig,
        NwayDualEncoder,
        dual_encoder_flax_to_torch,
        dual_encoder_torch_to_flax,
    )

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    dummy_q = {"input_ids": jnp.zeros((1, 4), jnp.int32),
               "attention_mask": jnp.ones((1, 4), jnp.int32)}
    dummy_p = {"input_ids": jnp.zeros((1, 1, 4), jnp.int32),
               "attention_mask": jnp.ones((1, 1, 4), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), dummy_q, dummy_p)["params"]
    sd = dual_encoder_flax_to_torch(params)
    assert any(k.startswith("query_encoder.transformer.layer.0.attention.q_lin")
               for k in sd)
    # and the exported dict loads back losslessly
    back = dual_encoder_torch_to_flax(sd)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_cosine_similarity_scoring():
    """apply_cosine_similarity=True bounds logits to [-1, 1] and equals the
    normalized dot product of the towers' embeddings."""
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model_dot = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    model_cos = NwayDualEncoder(config=cfg, apply_cosine_similarity=True,
                                dtype=jnp.float32)
    q = {"input_ids": jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0, cfg.vocab_size),
         "attention_mask": jnp.ones((2, 6), jnp.int32)}
    p = {"input_ids": jax.random.randint(jax.random.PRNGKey(1), (2, 3, 8), 0, cfg.vocab_size),
         "attention_mask": jnp.ones((2, 3, 8), jnp.int32)}
    params = model_dot.init(jax.random.PRNGKey(2), q, p)["params"]
    cos = model_cos.apply({"params": params}, q, p)
    assert np.all(np.abs(np.asarray(cos)) <= 1.0 + 1e-6)
    # equals dot of normalized embeddings
    qe = model_dot.apply({"params": params}, q, method=model_dot.query_embs)
    pe = model_dot.apply({"params": params}, p, method=model_dot.nway_passage_embs)
    qn = np.asarray(qe) / np.linalg.norm(np.asarray(qe), axis=-1, keepdims=True)
    pn = np.asarray(pe) / np.linalg.norm(np.asarray(pe), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(cos), np.einsum("bd,bnd->bn", qn, pn),
                               atol=1e-5)


# ------------------------------------------------------ full-size fidelity


@pytest.mark.slow
def test_full_size_hf_fidelity():
    """SURVEY §7 'HF weight fidelity' hard part: per-layer conversion error
    must not compound over the REAL architecture — 6 layers, dim 768, 12
    heads, 30522 vocab (66M params, random-init locally; the published
    TAS-B checkpoint is the same graph with different numbers, so exact
    parity here is exact parity there)."""
    torch = pytest.importorskip("torch")
    import transformers

    from cldrd_tpu.models import distilbert_flax_to_torch

    full = DistilBertConfig()  # the real thing
    hf_cfg = transformers.DistilBertConfig()  # defaults match exactly
    torch.manual_seed(0)
    hf = transformers.DistilBertModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids, mask = _rand_batch(rng, bz=3, seq_len=30, vocab=full.vocab_size)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    params = distilbert_torch_to_flax(hf.state_dict())
    enc = DistilBertEncoder(full, dtype=jnp.float32)
    out = np.asarray(enc.apply({"params": params}, jnp.array(ids), jnp.array(mask)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    # and the inverse conversion round-trips losslessly at full size
    back = distilbert_flax_to_torch(params)
    orig = {k: v.numpy() for k, v in hf.state_dict().items()}
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k], orig[k])


@pytest.mark.slow
def test_full_size_pth_tar_checkpoint_load(tmp_path):
    """A reference-layout dual-encoder checkpoint_<step>.pth.tar (full-size
    towers, module. prefixes, bundled args Namespace — exactly what
    nway_listwise_1.py:61-65,418-426 writes) must load through
    load_torch_checkpoint (safe weights_only path) + conversion and
    reproduce the torch towers' CLS embeddings."""
    import argparse

    torch = pytest.importorskip("torch")
    import transformers

    from cldrd_tpu.models import load_torch_checkpoint

    full = DistilBertConfig()
    torch.manual_seed(1)
    q_tower = transformers.DistilBertModel(transformers.DistilBertConfig()).eval()
    torch.manual_seed(2)
    p_tower = transformers.DistilBertModel(transformers.DistilBertConfig()).eval()

    sd = {}
    for k, v in q_tower.state_dict().items():
        sd[f"module.query_encoder.{k}"] = v
    for k, v in p_tower.state_dict().items():
        sd[f"module.passage_encoder.{k}"] = v
    path = str(tmp_path / "checkpoint_300000.pth.tar")
    torch.save(
        {
            "epoch": 3,
            "global_step": 300000,
            "state_dict": sd,
            "args": argparse.Namespace(seed=4680),
        },
        path,
    )

    loaded = load_torch_checkpoint(path)
    params = dual_encoder_torch_to_flax(loaded, share_weights=False)

    rng = np.random.default_rng(3)
    ids, mask = _rand_batch(rng, bz=2, seq_len=30, vocab=full.vocab_size)
    with torch.no_grad():
        ref_q = q_tower(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state[:, 0, :].numpy()
        ref_p = p_tower(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state[:, 0, :].numpy()

    enc = DistilBertEncoder(full, dtype=jnp.float32)
    out_q = np.asarray(cls_pool(enc.apply(
        {"params": params["query_encoder"]}, jnp.array(ids), jnp.array(mask))))
    out_p = np.asarray(cls_pool(enc.apply(
        {"params": params["passage_encoder"]}, jnp.array(ids), jnp.array(mask))))
    np.testing.assert_allclose(out_q, ref_q, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out_p, ref_p, atol=1e-5, rtol=1e-5)


def test_cls_only_last_block_exact():
    """cls_only=True must reproduce the full forward's CLS representation
    (position-0 math is identical; only rows 1..L-1 are skipped — up to
    last-ulp op-scheduling differences between the two compiled shapes) on
    the encoder and through the dual-encoder pooling paths."""
    model = DistilBertEncoder(TINY, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    ids, mask = _rand_batch(rng, 5, 14, TINY.vocab_size, min_len=4)
    params = model.init(jax.random.PRNGKey(0), jnp.array(ids), jnp.array(mask))["params"]
    full = model.apply({"params": params}, jnp.array(ids), jnp.array(mask))
    cls = model.apply({"params": params}, jnp.array(ids), jnp.array(mask),
                      cls_only=True)
    assert cls.shape == (5, 1, TINY.dim)
    np.testing.assert_allclose(np.asarray(cls[:, 0, :]),
                               np.asarray(full[:, 0, :]), rtol=2e-6, atol=2e-6)


def test_dual_encoder_forward_unchanged_by_cls_only():
    """The n-way forward (which uses cls_only internally) must match
    manually CLS-pooled full encoder outputs."""
    model = NwayDualEncoder(config=TINY, dtype=jnp.float32)
    rng = np.random.default_rng(12)
    q_ids, q_mask = _rand_batch(rng, 3, 8, TINY.vocab_size)
    p_ids = rng.integers(0, TINY.vocab_size, (3, 4, 10)).astype(np.int32)
    p_mask = np.ones((3, 4, 10), np.int32)
    queries = {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)}
    passages = {"input_ids": jnp.array(p_ids), "attention_mask": jnp.array(p_mask)}
    params = model.init(jax.random.PRNGKey(1), queries, passages)["params"]
    logits = model.apply({"params": params}, queries, passages)

    enc = DistilBertEncoder(TINY, dtype=jnp.float32)
    q_full = enc.apply({"params": params["query_encoder"]},
                       queries["input_ids"], queries["attention_mask"])[:, 0, :]
    p_flat = enc.apply({"params": params["passage_encoder"]},
                       jnp.array(p_ids.reshape(12, 10)),
                       jnp.array(p_mask.reshape(12, 10)))[:, 0, :]
    expected = np.einsum("bd,bnd->bn", np.asarray(q_full),
                         np.asarray(p_flat).reshape(3, 4, -1))
    np.testing.assert_allclose(np.asarray(logits), expected, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------- packing


def test_packed_passage_embs_exact():
    """Packed passages (segment-masked attention + per-segment position
    reset, data/packing.py) must reproduce the flat n-way embeddings and
    logits to fp32 ulps — masked attention weights underflow to exactly 0
    after the softmax max-subtraction, so packing is not an approximation."""
    from cldrd_tpu.data.packing import pack_nway_batch

    rng = np.random.default_rng(7)
    bz, nway, L = 3, 6, 16
    lens = rng.integers(2, L // 2, size=(bz, nway))  # short rows -> real packing
    p_ids = rng.integers(1, TINY.vocab_size, size=(bz, nway, L)).astype(np.int32)
    p_mask = (np.arange(L)[None, None, :] < lens[:, :, None]).astype(np.int32)
    p_ids = p_ids * p_mask
    packed = pack_nway_batch(p_ids, p_mask)
    assert packed.input_ids.shape[1] < nway  # actually packed something

    model = NwayDualEncoder(config=TINY, share_weights=True, dtype=jnp.float32)
    q_ids, q_mask = _rand_batch(rng, bz, 8, TINY.vocab_size)
    queries = {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)}
    flat = {"input_ids": jnp.array(p_ids), "attention_mask": jnp.array(p_mask)}
    params = model.init(jax.random.PRNGKey(0), queries, flat)["params"]

    flat_reps = model.apply({"params": params}, flat,
                            method=model.nway_passage_embs)
    pk = {k: jnp.asarray(v) for k, v in packed.as_dict().items()}
    packed_reps = model.apply({"params": params}, pk,
                              method=model.packed_nway_passage_embs)
    np.testing.assert_allclose(np.asarray(packed_reps), np.asarray(flat_reps),
                               rtol=1e-5, atol=1e-6)

    lo_flat = model.apply({"params": params}, queries, flat)
    lo_pack = model.apply({"params": params}, queries, None, packed_passages=pk)
    np.testing.assert_allclose(np.asarray(lo_pack), np.asarray(lo_flat),
                               rtol=1e-5, atol=1e-5)


def test_packed_gradients_match_flat():
    """d loss / d params must agree between the packed and flat passage
    towers (deterministic, fp32) — packing only removes padding FLOPs."""
    from cldrd_tpu.data.packing import pack_nway_batch

    rng = np.random.default_rng(11)
    bz, nway, L = 2, 5, 16
    lens = rng.integers(2, L // 2, size=(bz, nway))
    p_ids = rng.integers(1, TINY.vocab_size, size=(bz, nway, L)).astype(np.int32)
    p_mask = (np.arange(L)[None, None, :] < lens[:, :, None]).astype(np.int32)
    p_ids = p_ids * p_mask
    packed = pack_nway_batch(p_ids, p_mask)

    model = NwayDualEncoder(config=TINY, dtype=jnp.float32)
    q_ids, q_mask = _rand_batch(rng, bz, 8, TINY.vocab_size)
    queries = {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)}
    flat = {"input_ids": jnp.array(p_ids), "attention_mask": jnp.array(p_mask)}
    params = model.init(jax.random.PRNGKey(3), queries, flat)["params"]
    labels = jnp.asarray(rng.normal(size=(bz, nway)), jnp.float32)

    def loss_flat(p):
        return jnp.sum((model.apply({"params": p}, queries, flat) - labels) ** 2)

    pk = {k: jnp.asarray(v) for k, v in packed.as_dict().items()}

    def loss_packed(p):
        logits = model.apply({"params": p}, queries, None, packed_passages=pk)
        return jnp.sum((logits - labels) ** 2)

    g_flat = jax.grad(loss_flat)(params)
    g_pack = jax.grad(loss_packed)(params)
    flat_leaves = jax.tree_util.tree_leaves_with_path(g_flat)
    pack_leaves = dict(jax.tree_util.tree_leaves_with_path(g_pack))
    for path, leaf in flat_leaves:
        other = pack_leaves[path]
        np.testing.assert_allclose(
            np.asarray(other), np.asarray(leaf), rtol=1e-4, atol=1e-5,
            err_msg=str(path),
        )


# ------------------------------------------------------ BERT family (MiniLM)


from cldrd_tpu.models import (  # noqa: E402
    BertConfig,
    BertEncoder,
    bert_cross_encoder_torch_to_flax,
    bert_flax_to_torch,
    bert_torch_to_flax,
)

BERT_TINY = BertConfig.tiny()


def _hf_bert_config(cfg, transformers):
    return transformers.BertConfig(
        vocab_size=cfg.vocab_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_size=cfg.dim,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.hidden_dim,
        type_vocab_size=cfg.type_vocab_size,
        hidden_dropout_prob=cfg.dropout,
        attention_probs_dropout_prob=cfg.attention_dropout,
    )


def _rand_pair_batch(rng, bz, seq_len, vocab, min_len=4):
    """ids/mask plus HF-style token types: a split point inside each row's
    valid span flips segment 0 -> 1 (like [CLS] q [SEP] | p [SEP])."""
    ids, mask = _rand_batch(rng, bz, seq_len, vocab, min_len=min_len)
    lens = mask.sum(axis=1)
    splits = np.array([rng.integers(2, l) for l in lens])
    types = ((np.arange(seq_len)[None, :] >= splits[:, None]) & (mask == 1))
    return ids, mask, types.astype(np.int32)


def test_bert_encoder_matches_hf_torch():
    """Converted random-init HF BertModel weights must reproduce HF outputs
    (fp32), including the token-type embedding path the reference teacher
    (MiniLM, reranking_evaluator.py:292) depends on."""
    torch = pytest.importorskip("torch")
    import transformers

    torch.manual_seed(3)
    hf = transformers.BertModel(_hf_bert_config(BERT_TINY, transformers)).eval()

    rng = np.random.default_rng(3)
    ids, mask, types = _rand_pair_batch(rng, 4, 14, BERT_TINY.vocab_size)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).last_hidden_state.numpy()

    params = bert_torch_to_flax(hf.state_dict())
    enc = BertEncoder(BERT_TINY, dtype=jnp.float32)
    out = enc.apply(
        {"params": params}, jnp.array(ids), jnp.array(mask),
        token_type_ids=jnp.array(types),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)

    # token types MUST matter (all-zeros gives a different encoding), so the
    # parity above genuinely exercises the segment-embedding path
    out0 = enc.apply({"params": params}, jnp.array(ids), jnp.array(mask))
    assert np.abs(np.asarray(out0) - ref).max() > 1e-3


def test_bert_cross_encoder_matches_hf_torch():
    """CrossEncoder(arch='bert') + converted BertForSequenceClassification
    weights = HF logits (the full teacher graph: encoder + tanh pooler +
    classifier)."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = _hf_bert_config(BERT_TINY, transformers)
    hf_cfg.num_labels = 1
    torch.manual_seed(4)
    hf = transformers.BertForSequenceClassification(hf_cfg).eval()

    rng = np.random.default_rng(4)
    ids, mask, types = _rand_pair_batch(rng, 3, 12, BERT_TINY.vocab_size)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).logits.numpy().squeeze(-1)

    params = bert_cross_encoder_torch_to_flax(hf.state_dict())
    model = CrossEncoder(config=BERT_TINY, arch="bert", dtype=jnp.float32)
    out = model.apply({"params": params}, {
        "input_ids": jnp.array(ids),
        "attention_mask": jnp.array(mask),
        "token_type_ids": jnp.array(types),
    })
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_bert_flax_to_torch_roundtrip():
    torch = pytest.importorskip("torch")
    import transformers

    torch.manual_seed(5)
    hf = transformers.BertModel(_hf_bert_config(BERT_TINY, transformers)).eval()
    params = bert_torch_to_flax(hf.state_dict())
    back = bert_flax_to_torch(params)
    orig = {k: v.numpy() for k, v in hf.state_dict().items()
            if not k.startswith("pooler.") and k != "embeddings.position_ids"}
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k], orig[k])


@pytest.mark.slow
def test_minilm_l6_full_size_fidelity():
    """The reference teacher's EXACT architecture
    (cross-encoder/ms-marco-MiniLM-L-6-v2: 6 layers, hidden 384, 12 heads,
    FFN 1536, 1 label — random-init locally; the published checkpoint is the
    same graph, so parity here is parity there)."""
    torch = pytest.importorskip("torch")
    import transformers

    cfg = BertConfig.minilm_l6()
    hf_cfg = _hf_bert_config(cfg, transformers)
    hf_cfg.num_labels = 1
    torch.manual_seed(6)
    hf = transformers.BertForSequenceClassification(hf_cfg).eval()

    rng = np.random.default_rng(6)
    ids, mask, types = _rand_pair_batch(rng, 2, 96, cfg.vocab_size, min_len=16)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).logits.numpy().squeeze(-1)

    params = bert_cross_encoder_torch_to_flax(hf.state_dict())
    model = CrossEncoder(config=cfg, arch="bert", dtype=jnp.float32)
    out = model.apply({"params": params}, {
        "input_ids": jnp.array(ids),
        "attention_mask": jnp.array(mask),
        "token_type_ids": jnp.array(types),
    })
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_bert_dual_encoder_matches_hf_torch():
    """NwayDualEncoder with a BertConfig stands up BERT towers: converted
    random-init HF BertModel tower weights must reproduce HF CLS embeddings
    (fp32) through query_embs/passage_embs and the n-way logits — the
    MiniLM/bert-base retriever families, beyond the reference's DistilBERT."""
    torch = pytest.importorskip("torch")
    import transformers

    from cldrd_tpu.models import NwayDualEncoder
    from cldrd_tpu.models.hf_loader import dual_encoder_torch_to_flax

    torch.manual_seed(7)
    q_hf = transformers.BertModel(_hf_bert_config(BERT_TINY, transformers)).eval()
    torch.manual_seed(8)
    p_hf = transformers.BertModel(_hf_bert_config(BERT_TINY, transformers)).eval()
    sd = {f"query_encoder.{k}": v for k, v in q_hf.state_dict().items()}
    sd.update({f"passage_encoder.{k}": v for k, v in p_hf.state_dict().items()})
    params = dual_encoder_torch_to_flax(sd)  # layout auto-detected as BERT
    assert "token_type_embeddings" in params["query_encoder"]["embeddings"]

    model = NwayDualEncoder(config=BERT_TINY, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    q_ids, q_mask = _rand_batch(rng, 4, 10, BERT_TINY.vocab_size)
    p_ids, p_mask = _rand_batch(rng, 4 * 3, 16, BERT_TINY.vocab_size)

    with torch.no_grad():
        q_ref = q_hf(
            input_ids=torch.tensor(q_ids, dtype=torch.long),
            attention_mask=torch.tensor(q_mask, dtype=torch.long),
        ).last_hidden_state[:, 0, :].numpy()
        p_ref = p_hf(
            input_ids=torch.tensor(p_ids, dtype=torch.long),
            attention_mask=torch.tensor(p_mask, dtype=torch.long),
        ).last_hidden_state[:, 0, :].numpy()

    q_ours = model.apply(
        {"params": params},
        {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)},
        method=NwayDualEncoder.query_embs,
    )
    p_ours = model.apply(
        {"params": params},
        {"input_ids": jnp.array(p_ids), "attention_mask": jnp.array(p_mask)},
        method=NwayDualEncoder.passage_embs,
    )
    np.testing.assert_allclose(np.asarray(q_ours), q_ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p_ours), p_ref, atol=2e-5, rtol=2e-5)

    # full n-way forward: logits equal the oracle dot products
    logits = model.apply(
        {"params": params},
        {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)},
        {"input_ids": jnp.array(p_ids.reshape(4, 3, 16)),
         "attention_mask": jnp.array(p_mask.reshape(4, 3, 16))},
    )
    want = np.einsum("bd,bnd->bn", q_ref, p_ref.reshape(4, 3, -1))
    np.testing.assert_allclose(np.asarray(logits), want, atol=2e-4, rtol=2e-4)


def test_bert_dual_encoder_export_roundtrip():
    """dual_encoder_flax_to_torch detects BERT towers and exports HF
    BertModel key layout; torch->flax->torch is the identity."""
    torch = pytest.importorskip("torch")
    import transformers

    from cldrd_tpu.models.hf_loader import (
        dual_encoder_flax_to_torch,
        dual_encoder_torch_to_flax,
    )

    torch.manual_seed(11)
    hf = transformers.BertModel(_hf_bert_config(BERT_TINY, transformers)).eval()
    sd = {f"{t}.{k}": v for t in ("query_encoder", "passage_encoder")
          for k, v in hf.state_dict().items()}
    params = dual_encoder_torch_to_flax(sd)
    back = dual_encoder_flax_to_torch(params)
    assert "query_encoder.embeddings.token_type_embeddings.weight" in back
    for key, val in back.items():
        orig = sd[key]
        np.testing.assert_array_equal(val, orig.numpy(), err_msg=key)


def test_bert_packed_passage_embs_exact():
    """Sequence packing works identically for BERT towers (shared blocks:
    segment-masked attention + per-segment position reset carry over; the
    token-type-0 row broadcast is position-independent so packing cannot
    disturb it)."""
    from cldrd_tpu.data.packing import pack_nway_batch
    from cldrd_tpu.models import NwayDualEncoder

    rng = np.random.default_rng(13)
    bz, nway, L = 2, 5, 16
    lens = rng.integers(2, L // 2, size=(bz, nway))
    p_ids = rng.integers(1, BERT_TINY.vocab_size, size=(bz, nway, L)).astype(np.int32)
    p_mask = (np.arange(L)[None, None, :] < lens[:, :, None]).astype(np.int32)
    p_ids = p_ids * p_mask
    packed = pack_nway_batch(p_ids, p_mask)
    assert packed.input_ids.shape[1] < nway

    model = NwayDualEncoder(config=BERT_TINY, share_weights=True,
                            dtype=jnp.float32)
    q_ids, q_mask = _rand_batch(rng, bz, 8, BERT_TINY.vocab_size)
    queries = {"input_ids": jnp.array(q_ids), "attention_mask": jnp.array(q_mask)}
    flat = {"input_ids": jnp.array(p_ids), "attention_mask": jnp.array(p_mask)}
    params = model.init(jax.random.PRNGKey(1), queries, flat)["params"]
    assert "token_type_embeddings" in params["encoder"]["embeddings"]

    flat_reps = model.apply({"params": params}, flat,
                            method=model.nway_passage_embs)
    pk = {k: jnp.asarray(v) for k, v in packed.as_dict().items()}
    packed_reps = model.apply({"params": params}, pk,
                              method=model.packed_nway_passage_embs)
    np.testing.assert_allclose(np.asarray(packed_reps), np.asarray(flat_reps),
                               rtol=1e-5, atol=1e-6)


def test_bert_dual_encoder_pth_tar_warm_start():
    """A reference-layout .pth.tar (module.-prefixed query_encoder./
    passage_encoder. keys) holding BERT towers warm-starts through the
    same load path DistilBERT checkpoints use — layout auto-detected."""
    torch = pytest.importorskip("torch")
    import transformers

    from cldrd_tpu.models import NwayDualEncoder
    from cldrd_tpu.train.checkpoint import load_warm_start_params

    torch.manual_seed(21)
    hf = transformers.BertModel(_hf_bert_config(BERT_TINY, transformers)).eval()
    sd = {f"module.{t}.{k}": v for t in ("query_encoder", "passage_encoder")
          for k, v in hf.state_dict().items()}

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/checkpoint_100.pth.tar"
        torch.save({"epoch": 1, "global_step": 100, "state_dict": sd}, path)

        model = NwayDualEncoder(config=BERT_TINY, dtype=jnp.float32)
        dummy_q = {"input_ids": jnp.zeros((1, 8), jnp.int32),
                   "attention_mask": jnp.ones((1, 8), jnp.int32)}
        dummy_p = {"input_ids": jnp.zeros((1, 1, 8), jnp.int32),
                   "attention_mask": jnp.ones((1, 1, 8), jnp.int32)}
        init = model.init(jax.random.PRNGKey(0), dummy_q, dummy_p)["params"]
        params = load_warm_start_params(path, init)

    rng = np.random.default_rng(22)
    ids, mask = _rand_batch(rng, 3, 10, BERT_TINY.vocab_size)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state[:, 0, :].numpy()
    ours = model.apply(
        {"params": params},
        {"input_ids": jnp.array(ids), "attention_mask": jnp.array(mask)},
        method=NwayDualEncoder.query_embs,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=2e-5)


def test_cosine_normalizes_at_embedding_boundary():
    """Cosine-trained models must L2-normalize in query_embs/passage_embs
    (and the packed path) — NOT only inside __call__ — so the index-build
    and retrieval encode paths score in the same cosine space the model
    was trained in (an IP index over unit vectors IS the cosine index)."""
    from cldrd_tpu.models import DistilBertConfig, DualEncoder, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, apply_cosine_similarity=True,
                            dtype=jnp.float32)
    q = {"input_ids": jax.random.randint(jax.random.PRNGKey(0), (4, 6), 0,
                                         cfg.vocab_size),
         "attention_mask": jnp.ones((4, 6), jnp.int32)}
    p = {"input_ids": jax.random.randint(jax.random.PRNGKey(1), (4, 3, 8), 0,
                                         cfg.vocab_size),
         "attention_mask": jnp.ones((4, 3, 8), jnp.int32)}
    params = model.init(jax.random.PRNGKey(2), q, p)["params"]
    qe = model.apply({"params": params}, q, method=model.query_embs)
    pe = model.apply({"params": params}, p, method=model.nway_passage_embs)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(qe), axis=-1),
                               1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pe), axis=-1),
                               1.0, atol=1e-5)
    # DualEncoder (plain pair scorer) inherits cosine through the boundary
    pair = DualEncoder(config=cfg, apply_cosine_similarity=True,
                       dtype=jnp.float32)
    flat_p = {"input_ids": p["input_ids"][:, 0], 
              "attention_mask": p["attention_mask"][:, 0]}
    scores = pair.apply({"params": params}, q, flat_p)
    assert np.all(np.abs(np.asarray(scores)) <= 1.0 + 1e-5)


def test_cosine_packed_matches_flat():
    """Packed passage encoding normalizes identically to the flat layout
    under apply_cosine_similarity."""
    from cldrd_tpu.data.packing import pack_nway_batch
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, apply_cosine_similarity=True,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    bz, nway, L = 2, 3, 12
    lens = rng.integers(3, 7, (bz, nway))
    ids = np.zeros((bz, nway, L), np.int32)
    mask = np.zeros((bz, nway, L), np.int32)
    for b in range(bz):
        for n in range(nway):
            ids[b, n, :lens[b, n]] = rng.integers(1, cfg.vocab_size,
                                                  lens[b, n])
            mask[b, n, :lens[b, n]] = 1
    ids = ids * mask
    p = {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}
    q = {"input_ids": jax.random.randint(jax.random.PRNGKey(0), (bz, 6), 0,
                                         cfg.vocab_size),
         "attention_mask": jnp.ones((bz, 6), jnp.int32)}
    params = model.init(jax.random.PRNGKey(1), q, p)["params"]
    flat = model.apply({"params": params}, p,
                       method=model.nway_passage_embs)
    packed = pack_nway_batch(ids, mask)
    pk_dict = {k: jnp.asarray(v) for k, v in packed.as_dict().items()}
    pk = model.apply({"params": params}, pk_dict,
                     method=model.packed_nway_passage_embs)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(flat), atol=2e-5)


def test_cosine_encode_index_search_consistent():
    """End-to-end cosine retrieval: encode fns (the index/retrieve CLI
    path) produce unit vectors, and IP search over them ranks by cosine."""
    from cldrd_tpu.index import FlatIPIndex, encode_dataset, make_encode_fn
    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, apply_cosine_similarity=True,
                            dtype=jnp.float32)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    texts = {i: f"passage body {i} words {i*7%13}" for i in range(32)}
    ds = SequenceDataset(texts, tok, max_length=10, is_query=False)
    q = {"input_ids": jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0,
                                         cfg.vocab_size),
         "attention_mask": jnp.ones((2, 6), jnp.int32)}
    p_init = {"input_ids": jnp.zeros((2, 2, 10), jnp.int32),
              "attention_mask": jnp.ones((2, 2, 10), jnp.int32)}
    params = model.init(jax.random.PRNGKey(1), q, p_init)["params"]

    encode = make_encode_fn(model, params, "passage_embs",
                            dtype=jnp.float32)
    embs, ids = encode_dataset(encode, ds, batch_size=8)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-5)

    q_encode = make_encode_fn(model, params, "query_embs", dtype=jnp.float32)
    qb = next(SequenceDataset({0: "query words", 1: "other query"}, tok,
                              max_length=6, is_query=True).batches(2))
    import jax.numpy as jnp2
    q_embs = np.asarray(q_encode(qb.tokens))
    index = FlatIPIndex.build(embs, ids, dtype=jnp2.float32, block_rows=32,
                              precision="highest")
    _, got = index.search(q_embs, k=5)
    # oracle: cosine ranking of the raw (already unit) embeddings
    cos = q_embs @ embs.T / (
        np.linalg.norm(q_embs, axis=1, keepdims=True)
        * np.linalg.norm(embs, axis=1)[None, :])
    want = ids[np.argsort(-cos, axis=1, kind="stable")[:, :5]]
    np.testing.assert_array_equal(got, want)


def test_fused_qkv_param_tree_and_numerics_match():
    """fused_qkv computes q/k/v in one [D, 3D] matmul; the param tree and
    outputs must match the unfused path exactly (checkpoints
    interchangeable; docs/perf.md records the measured A/B)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from cldrd_tpu.models import DistilBertConfig
    from cldrd_tpu.models.distilbert import DistilBertEncoder

    cfg = DistilBertConfig.tiny()
    enc = DistilBertEncoder(cfg, dtype=jnp.float32)
    encf = DistilBertEncoder(
        dataclasses.replace(cfg, fused_qkv=True), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (4, 16), 0, cfg.vocab_size, jnp.int32)
    mask = (jax.random.uniform(rng, (4, 16)) > 0.2).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    p = enc.init(rng, ids, mask)["params"]
    pf = encf.init(rng, ids, mask)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pf)):
        assert a.shape == b.shape and a.dtype == b.dtype
    for cls_only in (False, True):
        o1 = enc.apply({"params": p}, ids, mask, deterministic=True,
                       cls_only=cls_only)
        o2 = encf.apply({"params": p}, ids, mask, deterministic=True,
                        cls_only=cls_only)
        assert jnp.allclose(o1, o2, atol=1e-5), cls_only


def test_softmax_in_compute_dtype_close_to_fp32():
    """softmax_in_compute_dtype keeps attention scores + softmax in the
    compute dtype (bf16) instead of fp32 — halves the [B,H,L,L] score
    HBM traffic (+1.5 MFU points measured, docs/perf.md). It must stay
    numerically a rounding-level perturbation of the fp32-softmax path:
    same params, bf16 compute both sides, embeddings near-identical."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cldrd_tpu.models import DistilBertConfig
    from cldrd_tpu.models.distilbert import DistilBertEncoder

    cfg = DistilBertConfig.tiny()
    assert not cfg.softmax_in_compute_dtype  # HF-parity fp32 is the default
    enc = DistilBertEncoder(cfg, dtype=jnp.bfloat16)
    encs = DistilBertEncoder(
        dataclasses.replace(cfg, softmax_in_compute_dtype=True),
        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (4, 16), 0, cfg.vocab_size, jnp.int32)
    mask = (jax.random.uniform(rng, (4, 16)) > 0.2).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    p = enc.init(rng, ids, mask)["params"]
    for cls_only in (False, True):
        o1 = np.asarray(enc.apply({"params": p}, ids, mask,
                                  deterministic=True, cls_only=cls_only),
                        dtype=np.float32)
        o2 = np.asarray(encs.apply({"params": p}, ids, mask,
                                   deterministic=True, cls_only=cls_only),
                        dtype=np.float32)
        # bf16 has ~3 decimal digits; embeddings are O(1) post-LayerNorm
        np.testing.assert_allclose(o1, o2, atol=0.05, rtol=0.05)
        cos = (o1 * o2).sum(-1) / (
            np.linalg.norm(o1, axis=-1) * np.linalg.norm(o2, axis=-1))
        assert float(cos.min()) > 0.999, cls_only
