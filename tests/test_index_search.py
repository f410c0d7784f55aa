"""Index + MIPS search tests: streaming-vs-dense oracle equality, sharded
8-device merge correctness, persistence roundtrip, run-file writing, and an
end-to-end encode->index->search slice with the tiny model."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cldrd_tpu.index import (
    FlatIPIndex,
    build_index_from_dataset,
    encode_dataset,
    load_index,
    make_encode_fn,
    read_embeddings,
    write_embeddings,
)
from cldrd_tpu.parallel import CORPUS_AXIS, make_mesh
from cldrd_tpu.search import (
    topk_dense,
    topk_streaming,
    write_run_file,
    retrieve_to_run_file,
)


def _numpy_topk(q, c, ids, k):
    scores = q.astype(np.float64) @ c.astype(np.float64).T
    order = np.argsort(-scores, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(scores, order, -1), ids[order]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    n, d = 4096, 64
    c = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64) + 1000
    q = rng.standard_normal((8, d)).astype(np.float32)
    return q, c, ids


def test_streaming_equals_dense(corpus):
    q, c, ids = corpus
    k = 50
    s1, i1 = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    s2, i2 = topk_streaming(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k, block_rows=512
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_dense_matches_numpy_oracle(corpus):
    q, c, ids = corpus
    k = 20
    s, i = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    es, ei = _numpy_topk(q, c, ids, k)
    np.testing.assert_allclose(np.asarray(s), es, rtol=1e-4, atol=1e-4)
    # ids may differ on exact ties; scores must match
    matches = (np.asarray(i) == ei).mean()
    assert matches > 0.99


def test_flat_index_unsharded(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32, block_rows=512)
    s, i = index.search(q, 10)
    es, ei = _numpy_topk(q, c, ids, 10)
    np.testing.assert_array_equal(i, ei)
    assert index.n_vectors == len(ids)


def test_flat_index_sharded_8dev(corpus):
    q, c, ids = corpus
    mesh = make_mesh(8, CORPUS_AXIS)
    index = FlatIPIndex.build(c, ids, mesh=mesh, dtype=jnp.float32, block_rows=128)
    s, i = index.search(q, 25)
    es, ei = _numpy_topk(q, c, ids, 25)
    np.testing.assert_allclose(s, es, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(i, ei)


def test_sharded_padding_never_retrieved(corpus):
    q, c, ids = corpus
    # 4096 rows over 8 devices with block_rows=512 -> exact fit; use an odd
    # count to force padding
    c_odd, ids_odd = c[:3000], ids[:3000]
    mesh = make_mesh(8, CORPUS_AXIS)
    index = FlatIPIndex.build(c_odd, ids_odd, mesh=mesh, dtype=jnp.float32, block_rows=128)
    s, i = index.search(q, 50)
    assert (i >= 1000).all()  # no -1 padding ids surface
    es, ei = _numpy_topk(q, c_odd, ids_odd, 50)
    np.testing.assert_array_equal(i, ei)


def test_topk_beyond_corpus_size():
    rng = np.random.default_rng(1)
    c = rng.standard_normal((10, 8)).astype(np.float32)
    ids = np.arange(10)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    index = FlatIPIndex.build(c, ids, dtype=jnp.float32, block_rows=128)
    s, i = index.search(q, 20)
    assert (i[:, 10:] == -1).all()
    assert np.isneginf(s[:, 10:]).all()


def test_bf16_index_recall(corpus):
    """bf16 corpus storage must preserve top-k membership (small corpus)."""
    q, c, ids = corpus
    f32 = FlatIPIndex.build(c, ids, dtype=jnp.float32, block_rows=512)
    bf16 = FlatIPIndex.build(c, ids, dtype=jnp.bfloat16, block_rows=512)
    _, i32 = f32.search(q, 100)
    _, i16 = bf16.search(q, 100)
    overlap = np.mean([
        len(set(i32[r]) & set(i16[r])) / 100 for r in range(len(q))
    ])
    assert overlap > 0.95


def test_persistence_roundtrip(tmp_path, corpus):
    q, c, ids = corpus
    write_embeddings(str(tmp_path / "idx"), c, ids, rows_per_shard=1500)
    embs, rids = read_embeddings(str(tmp_path / "idx"))
    np.testing.assert_array_equal(rids, ids)
    np.testing.assert_allclose(embs, c, atol=2e-3)  # fp16 disk storage
    index = load_index(str(tmp_path / "idx"), dtype=jnp.float32, block_rows=512)
    s, i = index.search(q, 10)
    es, ei = _numpy_topk(q, c, ids, 10)
    assert (i == ei).mean() > 0.95  # fp16 storage may flip near-ties


def test_run_file_format(tmp_path):
    path = str(tmp_path / "run.tsv")
    qids = np.array([5, 7])
    ids = np.array([[11, 12, -1], [13, -1, -1]])
    scores = np.array([[0.9, 0.8, -np.inf], [0.7, -np.inf, -np.inf]])
    write_run_file(path, qids, ids, scores)
    lines = open(path).read().splitlines()
    assert lines[0].split("\t") == ["5", "11", "1", "0.9"]
    assert lines[1].split("\t") == ["5", "12", "2", "0.8"]
    assert lines[2].split("\t")[:3] == ["7", "13", "1"]
    assert len(lines) == 3


# ------------------------------------------------------- e2e encode slice


def test_encode_index_search_e2e(tmp_path):
    from cldrd_tpu.data import HashTokenizer, SequenceDataset
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    tok = HashTokenizer(vocab_size=cfg.vocab_size)

    ppath = tmp_path / "collection.tsv"
    with open(ppath, "w") as f:
        for pid in range(100):
            f.write(f"{pid}\tpassage about topic {pid % 7} number {pid}\n")
    qpath = tmp_path / "queries.tsv"
    with open(qpath, "w") as f:
        for qid in range(10):
            f.write(f"{qid}\tquery topic {qid % 7}\n")

    model = NwayDualEncoder(cfg, share_weights=True)
    sample = tok(["x"], 16)
    params = model.init(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in sample.items()},
        method=model.passage_embs,
    )["params"]

    mesh = make_mesh(8, "data")
    p_fn = make_encode_fn(model, params, "passage_embs", mesh=mesh, dtype=jnp.float32)
    q_fn = make_encode_fn(model, params, "query_embs", mesh=mesh, dtype=jnp.float32)

    corpus_ds = SequenceDataset.create_from_seqs_file(str(ppath), tok, 24, is_query=False)
    query_ds = SequenceDataset.create_from_seqs_file(str(qpath), tok, 12, is_query=True)

    index = build_index_from_dataset(
        p_fn, corpus_ds, batch_size=16, mesh=None,
        out_dir=str(tmp_path / "store"), dtype=jnp.float32, block_rows=64,
    )
    assert index.n_vectors == 100

    q_embs, qids = encode_dataset(q_fn, query_ds, batch_size=16)
    assert q_embs.shape == (10, cfg.dim)

    stats = retrieve_to_run_file(
        index, q_embs, qids, str(tmp_path / "run.tsv"), topk=10, batch_size=8
    )
    lines = open(tmp_path / "run.tsv").read().splitlines()
    assert len(lines) == 100  # 10 queries x top-10
    assert stats["qps"] > 0


# ------------------------------------------------------------ bin-max exact


def test_binmax_equals_dense(corpus):
    from cldrd_tpu.search import topk_binmax

    q, c, ids = corpus
    k = 50
    s1, i1 = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    s2, i2 = jax.jit(
        lambda q, c, i: topk_binmax(q, c, i, k, bin_rows=16, extract=4)
    )(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_binmax_adversarial_clustered_fallback():
    """All high-scoring items packed into ONE bin: the extract-m narrowing
    cannot cover them, so the tau check must trigger the slow path and the
    result must still be exact."""
    from cldrd_tpu.search import topk_binmax

    rng = np.random.default_rng(1)
    n, d, k, L = 1024, 32, 24, 16
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    q = rng.standard_normal((2, d)).astype(np.float32)
    # rows 64..79 (exactly one bin of 16) strongly aligned with both queries
    boost = (q[0] + q[1]) / np.linalg.norm(q[0] + q[1])
    c[64:80] = boost[None, :] * np.linspace(5.0, 6.0, 16)[:, None]
    ids = np.arange(n, dtype=np.int64)
    s1, i1 = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    s2, i2 = jax.jit(
        lambda q, c, i: topk_binmax(q, c, i, k, bin_rows=L, extract=2)
    )(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_binmax_segmented_matches_dense(corpus):
    from cldrd_tpu.search import topk_binmax

    q, c, ids = corpus
    k = 30
    s1, i1 = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    # segment_rows=1024 forces 4 segments + merge
    s2, i2 = jax.jit(
        lambda q, c, i: topk_binmax(q, c, i, k, bin_rows=16, extract=4, segment_rows=1024)
    )(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_binmax_padding_rows_ignored():
    from cldrd_tpu.search import topk_binmax

    rng = np.random.default_rng(2)
    n, d, k = 512, 16, 10
    c = np.zeros((n, d), np.float32)
    c[:100] = rng.standard_normal((100, d))
    # padded rows have huge values but id -1: must never be returned
    c[100:] = 100.0
    ids = np.full((n,), -1, np.int64)
    ids[:100] = np.arange(100)
    q = rng.standard_normal((4, d)).astype(np.float32)
    s, i = jax.jit(
        lambda q, c, ii: topk_binmax(q, c, ii, k, bin_rows=16, extract=4)
    )(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32))
    assert np.all(np.asarray(i) < 100)
    assert np.all(np.asarray(i) >= 0)


def test_sharded_binmax_matches_dense(corpus):
    from cldrd_tpu.search import sharded_topk

    q, c, ids = corpus
    k = 40
    mesh = make_mesh(8, CORPUS_AXIS)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(CORPUS_AXIS))
    c_d = jax.device_put(jnp.asarray(c), sh)
    ids_d = jax.device_put(jnp.asarray(ids, jnp.int32), sh)
    s1, i1 = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    s2, i2 = sharded_topk(jnp.asarray(q), c_d, ids_d, k, mesh, method="binmax")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_flat_index_binmax_default(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32, block_rows=512)
    assert index.method == "binmax"
    s, i = index.search(q, k=20)
    s_ref, i_ref = _numpy_topk(q, c, ids, 20)
    np.testing.assert_array_equal(i[:, :10], i_ref[:, :10])


def test_build_index_on_device_matches_host_path():
    """Device-side index build (no host round-trip) must produce the same
    search results as the host-path build, including ragged-tail handling."""
    import jax.numpy as jnp

    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import build_index_on_device, encode_dataset, make_encode_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 4), jnp.int32), "attention_mask": jnp.ones((1, 4), jnp.int32)},
        {"input_ids": jnp.zeros((1, 1, 4), jnp.int32), "attention_mask": jnp.ones((1, 1, 4), jnp.int32)},
    )["params"]
    # 101 passages: ragged final batch with batch_size 16
    id_to_seq = {i + 50: f"text number {i} body" for i in range(101)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(cfg.vocab_size), 8, is_query=False)
    encode = make_encode_fn(model, params, "passage_embs", dtype=jnp.float32)

    dev_index = build_index_on_device(encode, ds, batch_size=16, dim=cfg.dim,
                                      dtype=jnp.float32, block_rows=64)
    embs, ids = encode_dataset(encode, ds, 16)
    host_index = FlatIPIndex.build(embs, ids, dtype=jnp.float32, block_rows=64)

    q = embs[:5]
    s_d, i_d = dev_index.search(q, k=10)
    s_h, i_h = host_index.search(q, k=10)
    np.testing.assert_allclose(s_d, s_h, rtol=1e-5)
    np.testing.assert_array_equal(i_d, i_h)
    assert i_d[0, 0] == ids[0]  # self-retrieval


def test_build_index_on_device_sharded_matches_host_path():
    """The SPMD device-resident build (8-device mesh, zero host staging)
    must return the same search results as the host-path sharded build —
    row placement interleaves across devices but identity rides row_ids."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import build_index_on_device, encode_dataset, make_encode_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder
    from cldrd_tpu.parallel import CORPUS_AXIS

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 4), jnp.int32), "attention_mask": jnp.ones((1, 4), jnp.int32)},
        {"input_ids": jnp.zeros((1, 1, 4), jnp.int32), "attention_mask": jnp.ones((1, 1, 4), jnp.int32)},
    )["params"]
    mesh = Mesh(np.asarray(jax.devices()[:8]), (CORPUS_AXIS,))

    # 101 passages: ragged final batch with batch_size 16 (2 rows/device)
    id_to_seq = {i + 50: f"text number {i} body" for i in range(101)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(cfg.vocab_size), 8, is_query=False)
    encode_sharded = make_encode_fn(
        model, params, "passage_embs", mesh=mesh, axis_name=CORPUS_AXIS,
        dtype=jnp.float32,
    )
    encode = make_encode_fn(model, params, "passage_embs", dtype=jnp.float32)

    dev_index = build_index_on_device(
        encode_sharded, ds, batch_size=16, dim=cfg.dim,
        dtype=jnp.float32, block_rows=16, mesh=mesh, axis_name=CORPUS_AXIS,
    )
    assert dev_index.mesh is mesh
    assert dev_index.n_vectors == 101
    embs, ids = encode_dataset(encode, ds, 16)
    host_index = FlatIPIndex.build(
        embs, ids, mesh=mesh, dtype=jnp.float32, block_rows=16
    )

    q = embs[:7]
    s_d, i_d = dev_index.search(q, k=10)
    s_h, i_h = host_index.search(q, k=10)
    np.testing.assert_allclose(s_d, s_h, rtol=1e-5)
    # the sharded and unsharded encode programs compile differently, so
    # embeddings (and hence scores) differ at the ~1e-6 fp32 level, which
    # can reorder near-ties; validate membership above a tolerance band and
    # per-id scores against the oracle score map instead of exact id order
    oracle = {int(i): row for i, row in zip(ids, (q @ embs.T).T)}
    for b in range(q.shape[0]):
        boundary = s_h[b, -1]
        # every clearly-above-boundary id must agree between the builds
        assert set(i_d[b][s_d[b] > boundary + 1e-4]) == set(
            i_h[b][s_h[b] > boundary + 1e-4]
        ), b
        # and every returned id really scores what the search reported
        for rank in range(10):
            true = oracle[int(i_d[b, rank])][b]
            np.testing.assert_allclose(s_d[b, rank], true, rtol=1e-4, atol=1e-5)
    assert i_d[0, 0] == ids[0]  # self-retrieval


def test_binmax_nbins_less_than_k_adversarial():
    """When the corpus has fewer bins than k, the tau narrowing is unsound
    and must be bypassed (review finding): a one-bin cluster of near-ties
    must fully appear in the top-k."""
    from cldrd_tpu.search import topk_binmax

    rng = np.random.default_rng(0)
    n, d, k = 50_000, 32, 1000  # 391 bins of 128 < k
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    q = rng.standard_normal((2, d)).astype(np.float32)
    boost = q.mean(0) / np.linalg.norm(q.mean(0))
    c[256:384] = boost[None, :] * np.linspace(5, 6, 128)[:, None]
    ids = np.arange(n, dtype=np.int64)
    # pad to a bin multiple like FlatIPIndex does
    pad = (-n) % 128
    c = np.concatenate([c, np.zeros((pad, d), np.float32)])
    ids_p = np.concatenate([ids, np.full(pad, -1)]).astype(np.int32)
    s, i = jax.jit(lambda q, c, ii: topk_binmax(q, c, ii, k))(
        jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids_p)
    )
    ref = ids[np.argsort(-(q @ c[:n].T), axis=-1)[:, :k]]
    # sets equal per row (tie order may differ)
    for b in range(2):
        assert set(np.asarray(i)[b]) == set(ref[b]), b


def test_search_k_larger_than_corpus():
    """k > N returns -1-padded results instead of crashing (review finding)."""
    rng = np.random.default_rng(1)
    c = rng.standard_normal((100, 16)).astype(np.float32)
    ids = np.arange(100, dtype=np.int64)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32, block_rows=512)
    s, i = index.search(q, k=300)
    assert i.shape == (3, 300)
    assert np.all(i[:, 100:] == -1)
    ref = ids[np.argsort(-(q @ c.T), axis=-1)]
    np.testing.assert_array_equal(i[:, :100], ref)


def test_binmax_block_rows_not_multiple_of_bin_rows():
    """block_rows=64 pads N to a non-128 multiple; bin_rows must adapt
    instead of tripping the divisibility assert (review finding)."""
    rng = np.random.default_rng(2)
    n, d, k = 2048, 16, 50
    c = rng.standard_normal((n, d)).astype(np.float32)
    ids = rng.permutation(n).astype(np.int64)
    q = rng.standard_normal((4, d)).astype(np.float32)
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32, block_rows=64)
    s, i = index.search(q, k)
    ref = ids[np.argsort(-(q @ c.T), axis=-1)[:, :k]]
    np.testing.assert_array_equal(i, ref)


def test_sharded_stream_method_matches_dense(corpus):
    """The memory-lean 'stream' sharded path stays exact (the default is
    'binmax'; this guards the alternative)."""
    from cldrd_tpu.search import sharded_topk

    q, c, ids = corpus
    k = 40
    mesh = make_mesh(8, CORPUS_AXIS)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(CORPUS_AXIS))
    c_d = jax.device_put(jnp.asarray(c), sh)
    ids_d = jax.device_put(jnp.asarray(ids, jnp.int32), sh)
    s1, i1 = topk_dense(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ids, jnp.int32), k)
    s2, i2 = sharded_topk(jnp.asarray(q), c_d, ids_d, k, mesh,
                          block_rows=512, method="stream")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_precision_highest_resolves_sub_bf16_gaps():
    """precision='highest' (bf16x6 == fp32-exact, the FAISS-parity mode)
    must rank items separated by ~3e-4 relative — above fp32 resolution
    but below bf16's ~4e-3 input rounding, where DEFAULT precision
    collapses them into ties."""
    rng = np.random.default_rng(3)
    d, n, k = 128, 4096, 50
    base = rng.standard_normal(d).astype(np.float32)
    base /= np.linalg.norm(base)
    # row i is base scaled by (1 + i*3e-4): true scores strictly increase
    scales = (1.0 + np.arange(n, dtype=np.float64) * 3e-4).astype(np.float32)
    c = base[None, :] * scales[:, None]
    q = base[None, :].astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    expected = ids[::-1][:k]  # descending by scale

    index = FlatIPIndex.build(c, ids, dtype=jnp.float32, block_rows=512,
                              precision="highest")
    _, i = index.search(q, k=k)
    np.testing.assert_array_equal(i[0], expected)
    # (No assertion that DEFAULT fails here: per-element bf16 rounding is
    # monotone in the row scale, so this construction can survive it. The
    # evidence that DEFAULT's bf16 input rounding loses tail items on
    # randomly-clustered near-ties is examples/quantization_study.py —
    # 3.2% of the top-1000 at noise 1e-3 vs the precision='highest' oracle.)


class TestFusedExtractPath:
    """The fused scores+extraction Pallas kernel path (``mips._binmax_segment_
    extract``): [B, N] scores never reach HBM; per-bin top-(R-1) values and
    positions are extracted in VMEM and the final selection is one
    variadic payload sort (``_topk_with_payload``) — no gather anywhere.
    Run here in interpret mode (the eligibility gate requires a real TPU
    otherwise)."""

    @pytest.fixture(autouse=True)
    def _interpret(self, monkeypatch):
        from cldrd_tpu.search import mips
        monkeypatch.setattr(mips, "_INTERPRET", True)

    def _oracle(self, q, c, k):
        s = q @ c.T
        idx = np.argsort(-s, axis=1)[:, :k]
        return np.take_along_axis(s, idx, axis=1), idx

    def test_exact_vs_numpy(self):
        from cldrd_tpu.search import mips
        rng = np.random.default_rng(0)
        bz, n, d, k = 128, 4096, 64, 50
        q = rng.standard_normal((bz, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        ids = jnp.arange(n, dtype=jnp.int32)
        assert mips._extract_eligible(bz, n, 128)
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_padding_rows_masked(self):
        from cldrd_tpu.search import mips
        rng = np.random.default_rng(1)
        bz, n, d, k = 128, 2048, 32, 20
        q = rng.standard_normal((bz, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        ids = jnp.arange(n, dtype=jnp.int32).at[n // 2:].set(-1)
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)
        ref_v, ref_i = self._oracle(q, c[: n // 2], k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_int8_scales_exact_vs_dequantized_oracle(self):
        """int8 codes + per-row scales through the fused kernel: the
        in-kernel (q . c8) * s must equal the numpy oracle over the
        dequantized corpus exactly (fp32 queries in interpret mode)."""
        from cldrd_tpu.search import mips
        rng = np.random.default_rng(5)
        bz, n, d, k = 128, 4096, 64, 50
        q = rng.standard_normal((bz, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        sc = np.abs(c).max(axis=1).astype(np.float32) / 127.0
        codes = np.rint(c / sc[:, None]).astype(np.int8)
        deq = codes.astype(np.float32) * sc[:, None]
        ids = jnp.arange(n, dtype=jnp.int32)
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(codes), ids, k, 128,
            seg_scales=jnp.asarray(sc))
        ref_v, ref_i = self._oracle(q, deq, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_clustered_ties_fall_back_exactly(self):
        from cldrd_tpu.search import mips
        bz, n, d, k = 128, 2048, 32, 20
        # >R-1 top-k items in one 128-row bin: the remainder bound cannot
        # certify the narrowing, so the streaming fallback must run
        c = np.zeros((n, d), np.float32)
        c[:, 0] = 0.001
        c[256:276, 0] = np.linspace(5.0, 6.0, 20)  # one bin holds all of top-20
        q = np.zeros((bz, d), np.float32)
        q[:, 0] = 1.0
        ids = jnp.arange(n, dtype=jnp.int32)
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_dispatched_from_topk_binmax(self):
        from cldrd_tpu.search import mips
        rng = np.random.default_rng(2)
        bz, n, d, k = 128, 2048, 32, 30
        q = rng.standard_normal((bz, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        ids = jnp.arange(n, dtype=jnp.int32)
        v, i = jax.jit(
            lambda q, c, i: mips.topk_binmax(q, c, i, k)
        )(jnp.asarray(q), jnp.asarray(c), ids)
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_chunked_selection_exact(self, monkeypatch):
        """Corpora wider than the variadic-sort sweet spot select in
        chunks (batched per-chunk payload sort + one merge sort). Force
        the chunked branch at test scale by shrinking _SELECT_WIDTH and
        require exact oracle equality, including the ragged final chunk
        (nsup not a multiple of sel_sup -> padded candidates)."""
        from cldrd_tpu.search import mips
        monkeypatch.setattr(mips, "_SELECT_WIDTH", 30)
        rng = np.random.default_rng(7)
        bz, n, d, k = 128, 3 * mips._SUPER_ROWS, 32, 20
        q = rng.standard_normal((bz, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        ids = jnp.arange(n, dtype=jnp.int32)
        m2 = mips._SUPER_ROUNDS - 1
        m_sel = mips._select_rounds(n, n // mips._SUPER_ROWS, bz, k, m2)
        sel_sup = max(30 // m_sel, -(-k // m_sel), 1)
        assert n // mips._SUPER_ROWS > sel_sup, "chunked branch not hit"
        assert (n // mips._SUPER_ROWS) % sel_sup, "want a ragged tail"
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_super_rounds_properties(self):
        """The level-2 emission model (`mips._super_rounds`): full 16
        rounds at shard sizes (selection trimming handles depth there),
        8 at full-corpus sizes, always a multiple of 8, always covering
        k, monotone non-increasing in n."""
        from cldrd_tpu.search import mips
        k, bz = 1000, 512

        def rounds(n):
            return mips._super_rounds(n, n // mips._SUPER_ROWS, bz, k)

        assert rounds(1_114_112) == mips._SUPER_ROUNDS
        assert rounds(8_863_744) == 8
        prev = mips._SUPER_ROUNDS
        for n in (1_114_112, 2_228_224, 4_456_448, 8_863_744, 17_727_488):
            r2 = rounds(n)
            assert r2 % 8 == 0 and 8 <= r2 <= mips._SUPER_ROUNDS
            assert r2 * (n // mips._SUPER_ROWS) >= k
            assert r2 <= prev
            prev = r2

    def test_select_rounds_properties(self):
        """The Poisson depth model: full depth at per-chip-shard size,
        reduced at full-corpus size, never below k coverage, monotone
        non-increasing in n (larger corpora -> thinner blocks)."""
        from cldrd_tpu.search import mips
        m2 = mips._SUPER_ROUNDS - 1
        k, bz = 1000, 512

        def depth(n):
            return mips._select_rounds(n, n // mips._SUPER_ROWS, bz, k, m2)

        assert depth(1_114_112) == m2          # bench-headline shape
        assert depth(8_863_744) < m2           # full corpus trims depth
        prev = m2
        for n in (1_114_112, 2_228_224, 4_456_448, 8_863_744, 17_727_488):
            m = depth(n)
            assert 1 <= m <= m2
            assert m * (n // mips._SUPER_ROWS) >= k  # coverage floor
            assert m <= prev
            prev = m

    def test_reduced_emission_chunked_selection_exact(self, monkeypatch):
        """Reduced level-2 EMISSION (``_super_rounds`` < 16: the kernel
        emits 8 rounds, all selection candidates, the last doubling as
        the rem2 bound — no post-kernel slice) combined with chunked
        selection: the chunk layout arithmetic must partition the
        8-round layout and still return oracle-exact results, including
        a ragged last chunk."""
        from cldrd_tpu.search import mips
        monkeypatch.setattr(mips, "_super_rounds",
                            lambda n, nsup, bz, k: 8)
        monkeypatch.setattr(mips, "_SELECT_WIDTH", 30)
        rng = np.random.default_rng(23)
        bz, n, d, k = 128, 5 * mips._SUPER_ROWS, 32, 12
        q = rng.standard_normal((bz, d)).astype(np.float32)
        c = rng.standard_normal((n, d)).astype(np.float32)
        ids = jnp.arange(n, dtype=jnp.int32)
        sel_sup = max(30 // 8, -(-k // 8), 1)
        assert n // mips._SUPER_ROWS > sel_sup, "chunked branch not hit"
        assert (n // mips._SUPER_ROWS) % sel_sup, "want a ragged tail"
        v, i, okq = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128, on_miss="flag")
        ref_v, ref_i = self._oracle(q, c, k)
        okq = np.asarray(okq)
        # at the forced shallow depth a FEW queries may legitimately flag
        # (lambda = k*2048/n = 2.4 here); certified rows must be exact
        assert okq.mean() > 0.9, "most queries should certify"
        np.testing.assert_array_equal(np.asarray(i)[okq], ref_i[okq])
        np.testing.assert_allclose(np.asarray(v)[okq], ref_v[okq], rtol=1e-5)
        # and the in-graph fallback restores full-batch oracle equality
        v2, i2 = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)  # on_miss=fallback
        np.testing.assert_array_equal(np.asarray(i2), ref_i)
        np.testing.assert_allclose(np.asarray(v2), ref_v, rtol=1e-5)

    def test_extract_rounds_properties(self):
        """The level-1 Poisson depth model (`mips._extract_rounds`): full
        depth at per-chip-shard size and below, reduced at full-corpus
        size, never outside [2, _EXTRACT_ROUNDS], monotone non-increasing
        in n (larger corpora -> emptier bins)."""
        from cldrd_tpu.search import mips
        k, bz, L = 1000, 512, 128

        def depth(n):
            return mips._extract_rounds(n, bz, k, L)

        assert depth(4096) == mips._EXTRACT_ROUNDS      # test-scale corpora
        assert depth(1_114_112) == mips._EXTRACT_ROUNDS  # bench headline
        assert depth(8_863_744) < mips._EXTRACT_ROUNDS   # full corpus trims
        prev = mips._EXTRACT_ROUNDS
        for n in (1_114_112, 2_228_224, 4_456_448, 8_863_744, 17_727_488):
            r = depth(n)
            assert 2 <= r <= mips._EXTRACT_ROUNDS
            assert r <= prev
            prev = r

    def test_reduced_l1_depth_flags_and_recovers(self, monkeypatch):
        """A BIN holding more top-k items than the level-1 depth must fail
        that query's certificate via the bin remainder bound rem1 (the
        (m+1)-th value of the overfull bin lands above vk), and the
        in-graph fallback must restore oracle exactness. Forces a tiny
        level-1 depth to make the trip at test scale."""
        from cldrd_tpu.search import mips
        monkeypatch.setattr(mips, "_extract_rounds",
                            lambda n, bz, k, bin_rows: 3)  # 2 cands + rem
        # n = 2 super-blocks so the block-candidate width (2 * 15) covers
        # k and the certificate path (not the width<k streaming branch) runs
        bz, n, d, k = 128, 4096, 32, 20
        rng = np.random.default_rng(13)
        c = rng.standard_normal((n, d)).astype(np.float32) * 0.01
        # 4 > depth-2 top-20 items for query 0 inside ONE 128-row bin
        c[256:260, 0] = np.linspace(5.0, 6.0, 4)
        q = rng.standard_normal((bz, d)).astype(np.float32) * 0.01
        q[0] = 0.0
        q[0, 0] = 1.0
        ids = jnp.arange(n, dtype=jnp.int32)
        _, _, okq = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128, on_miss="flag")
        okq = np.asarray(okq)
        assert not okq[0], "overfull bin must flag its query"
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)  # on_miss=fallback
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_reduced_l1_depth_exact_when_spread(self, monkeypatch):
        """With top-k items spread across bins (the Poisson-typical case),
        a reduced level-1 depth must certify and return oracle-exact
        results on the fast path (okq all True)."""
        from cldrd_tpu.search import mips
        monkeypatch.setattr(mips, "_extract_rounds",
                            lambda n, bz, k, bin_rows: 3)
        bz, n, d, k = 128, 4096, 32, 16
        # one clear winner per chosen bin, tiny noise elsewhere: <= 1 top-k
        # item per bin (depth-2 covers each bin) AND 8 per super-block
        # (within the level-2 depth), so every certificate holds
        rng = np.random.default_rng(17)
        c = rng.standard_normal((n, d)).astype(np.float32) * 1e-4
        winners = np.arange(16) * 256 + 5
        c[winners, 0] = np.linspace(2.0, 3.0, 16)
        q = np.zeros((bz, d), np.float32)
        q[:, 0] = 1.0
        ids = jnp.arange(n, dtype=jnp.int32)
        v, i, okq = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128, on_miss="flag")
        assert np.asarray(okq).all(), "spread top-k must certify"
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)

    def test_reduced_depth_flags_and_recovers(self, monkeypatch):
        """A block holding more top-k items than the selection depth must
        fail that query's certificate (its (m+1)-th candidate bounds the
        dropped items), and the in-graph fallback must restore oracle
        exactness. Forces a tiny depth to make the trip at test scale."""
        from cldrd_tpu.search import mips
        # depth 5 respects the coverage-floor contract (m * nsup >= k:
        # 5 * 4 = 20) that the real _select_rounds always guarantees
        monkeypatch.setattr(mips, "_select_rounds",
                            lambda n, nsup, bz, k, m2: 5)
        bz, n, d, k = 128, 8192, 32, 20
        rng = np.random.default_rng(11)
        c = rng.standard_normal((n, d)).astype(np.float32) * 0.01
        # 7 > depth-5 top-20 items for query 0 inside super-block 1
        c[2048:2055, 0] = np.linspace(5.0, 6.0, 7)
        q = rng.standard_normal((bz, d)).astype(np.float32) * 0.01
        q[0] = 0.0
        q[0, 0] = 1.0
        ids = jnp.arange(n, dtype=jnp.int32)
        _, _, okq = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128, on_miss="flag")
        okq = np.asarray(okq)
        assert not okq[0], "overfull block must flag its query"
        v, i = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), ids, k, 128)  # on_miss=fallback
        ref_v, ref_i = self._oracle(q, c, k)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(v), ref_v, rtol=1e-5)


def test_return_positions_and_host_id_mapping(corpus):
    """``return_positions=True`` must return corpus ROW POSITIONS (skipping
    the slow device id-gather); FlatIPIndex maps them to external ids on
    host. Verified with scrambled, non-contiguous external ids."""
    from cldrd_tpu.search import topk_binmax

    q, c, _ = corpus
    n = c.shape[0]
    k = 40
    rng = np.random.default_rng(7)
    ext_ids = rng.permutation(np.arange(10_000, 10_000 + n)).astype(np.int64)

    s_ref = np.asarray(q @ c.T)
    ref_pos = np.argsort(-s_ref, axis=1)[:, :k]

    s, p = jax.jit(
        lambda q, c, i: topk_binmax(q, c, i, k, bin_rows=16, extract=4,
                                    return_positions=True)
    )(jnp.asarray(q), jnp.asarray(c),
      jnp.asarray(ext_ids, jnp.int32))
    np.testing.assert_array_equal(np.asarray(p), ref_pos)

    index = FlatIPIndex.build(c, ext_ids, dtype=jnp.float32)
    s2, i2 = index.search(q, k=k)
    np.testing.assert_array_equal(i2, ext_ids[ref_pos])


def test_sharded_return_positions_ids(corpus):
    """Sharded search in positions mode: per-shard positions offset by the
    shard base, merged over the mesh, host-mapped to external ids."""
    q, c, _ = corpus
    n = c.shape[0]
    k = 25
    rng = np.random.default_rng(8)
    ext_ids = rng.permutation(np.arange(5_000, 5_000 + n)).astype(np.int64)
    mesh = make_mesh(8, CORPUS_AXIS)
    index = FlatIPIndex.build(c, ext_ids, mesh=mesh, dtype=jnp.float32,
                              block_rows=16)
    s, i = index.search(q, k=k)
    s_ref = np.asarray(q @ c.T)
    ref_pos = np.argsort(-s_ref, axis=1)[:, :k]
    np.testing.assert_array_equal(i, ext_ids[ref_pos])
    np.testing.assert_allclose(s, np.take_along_axis(s_ref, ref_pos, 1),
                               rtol=1e-5)


def test_search_odd_batch_padding(corpus):
    """search()/search_batched() pad query batches to a multiple of 128 so
    the fused kernel's eligibility always holds; padded rows never leak."""
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, dtype=jnp.float32)
    s_all, i_all = index.search(q, 10)
    s_odd, i_odd = index.search(q[:5], 10)
    np.testing.assert_array_equal(i_odd, i_all[:5])
    np.testing.assert_allclose(s_odd, s_all[:5], rtol=1e-6)
    s_b, i_b = index.search_batched(q, 10, batch_size=3)
    np.testing.assert_array_equal(i_b, i_all)


def test_build_index_on_device_bucketed_matches_flat():
    """Length-bucketed device-resident builds (single-device AND the SPMD
    sharded path) must search identically to the flat build — row order
    changes, ids don't; persistent pad rows stay masked."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import build_index_on_device, encode_dataset, make_encode_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder
    from cldrd_tpu.parallel import CORPUS_AXIS

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 4), jnp.int32),
         "attention_mask": jnp.ones((1, 4), jnp.int32)},
        {"input_ids": jnp.zeros((1, 1, 4), jnp.int32),
         "attention_mask": jnp.ones((1, 1, 4), jnp.int32)},
    )["params"]
    # variable word counts -> variable lengths, ragged tail at bz=16
    id_to_seq = {i + 50: " ".join(f"w{j}" for j in range(1 + i % 11))
                 for i in range(101)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(cfg.vocab_size), 16,
                         is_query=False)
    encode = make_encode_fn(model, params, "passage_embs", dtype=jnp.float32)
    embs, ids = encode_dataset(encode, ds, 16)
    host_index = FlatIPIndex.build(embs, ids, dtype=jnp.float32, block_rows=64)
    q = embs[:5]
    s_h, i_h = host_index.search(q, k=10)

    dev_index = build_index_on_device(
        encode, ds, batch_size=16, dim=cfg.dim, dtype=jnp.float32,
        block_rows=64, bucket_lengths=(4, 8, 16),
    )
    assert dev_index.n_vectors == 101
    s_d, i_d = dev_index.search(q, k=10)
    np.testing.assert_allclose(s_d, s_h, rtol=1e-5)
    np.testing.assert_array_equal(i_d, i_h)

    mesh = Mesh(np.asarray(jax.devices()[:8]), (CORPUS_AXIS,))
    encode_sharded = make_encode_fn(
        model, params, "passage_embs", mesh=mesh, axis_name=CORPUS_AXIS,
        dtype=jnp.float32,
    )
    shard_index = build_index_on_device(
        encode_sharded, ds, batch_size=16, dim=cfg.dim, dtype=jnp.float32,
        block_rows=16, mesh=mesh, axis_name=CORPUS_AXIS,
        bucket_lengths=(4, 8, 16),
    )
    assert shard_index.n_vectors == 101
    s_s, i_s = shard_index.search(q, k=10)
    np.testing.assert_allclose(s_s, s_h, rtol=1e-5)
    # sharded encode compiles differently (1e-6-level fp32 jitter can swap
    # near-ties): compare id SETS per query like the unbucketed sharded test
    for r in range(len(q)):
        assert set(map(int, i_s[r])) == set(map(int, i_h[r]))


class TestPerQueryCertificates:
    """``on_miss='flag'`` returns a per-query exactness certificate and
    never runs the in-graph whole-batch fallback; FlatIPIndex recovers
    flagged queries individually (the cliff fix, VERDICT r2 #5)."""

    def _oracle(self, q, c, k):
        s = q @ c.T
        idx = np.argsort(-s, axis=1)[:, :k]
        return np.take_along_axis(s, idx, axis=1), idx

    def _adversarial_corpus(self, n, d, n_planted, rng):
        """Random corpus with ``n_planted`` near-parallel rows packed at
        the start: a query along ``u`` has its whole top-k inside one
        bin/super-block, defeating the extraction-depth certificate."""
        c = rng.standard_normal((n, d)).astype(np.float32) * 0.01
        u = rng.standard_normal(d).astype(np.float32)
        u /= np.linalg.norm(u)
        scales = 5.0 + np.linspace(1.0, 0.0, n_planted, dtype=np.float32)
        c[:n_planted] = scales[:, None] * u[None, :]
        return c, u

    def test_portable_path_flags_only_adversarial_query(self):
        from cldrd_tpu.search import mips

        rng = np.random.default_rng(0)
        n, d, k = 4096, 32, 20
        c, u = self._adversarial_corpus(n, d, n_planted=k, rng=rng)
        q = rng.standard_normal((4, d)).astype(np.float32) * 0.01
        q[1] = u  # the adversarial one

        v, p, ok = jax.jit(
            lambda q, c, i: mips.topk_binmax(
                q, c, i, k, bin_rows=128, extract=6, on_miss="flag")
        )(jnp.asarray(q), jnp.asarray(c), jnp.arange(n, dtype=jnp.int32))
        ok = np.asarray(ok)
        assert not ok[1], "adversarial query must fail the certificate"
        # certified rows are exact, unconditionally
        ref_v, ref_p = self._oracle(q, c, k)
        for r in np.nonzero(ok)[0]:
            np.testing.assert_array_equal(np.asarray(p)[r], ref_p[r])
            np.testing.assert_allclose(np.asarray(v)[r], ref_v[r], rtol=1e-5)

    def test_extract_path_flags_only_adversarial_query(self, monkeypatch):
        from cldrd_tpu.search import mips

        monkeypatch.setattr(mips, "_INTERPRET", True)
        rng = np.random.default_rng(1)
        bz, n, d, k = 128, 4096, 32, 20
        # > super-block extraction depth (15) top-k items in ONE 2048-row
        # super-block -> rem2 >= vk for that query
        c, u = self._adversarial_corpus(n, d, n_planted=k, rng=rng)
        q = rng.standard_normal((bz, d)).astype(np.float32) * 0.01
        q[3] = u
        assert mips._extract_eligible(bz, n, 128)
        v, p, ok = mips._binmax_segment_extract(
            jnp.asarray(q), jnp.asarray(c), jnp.arange(n, dtype=jnp.int32),
            k, 128, on_miss="flag")
        ok = np.asarray(ok)
        assert not ok[3]
        ref_v, ref_p = self._oracle(q, c, k)
        for r in np.nonzero(ok)[0]:
            np.testing.assert_array_equal(np.asarray(p)[r], ref_p[r])
            np.testing.assert_allclose(np.asarray(v)[r], ref_v[r], rtol=1e-5)

    def test_flat_index_recovers_per_query(self, monkeypatch):
        """search() must return exact results for EVERY query even when one
        fails the certificate — and must re-scan only the failing ones."""
        from cldrd_tpu.index import flat_index as fi

        rng = np.random.default_rng(2)
        n, d, k = 4096, 32, 20
        c, u = self._adversarial_corpus(n, d, n_planted=k, rng=rng)
        ext_ids = rng.permutation(np.arange(7_000, 7_000 + n)).astype(np.int64)
        q = rng.standard_normal((8, d)).astype(np.float32) * 0.01
        # project the benign queries orthogonal to the planted direction so
        # the high-norm planted rows cannot reach THEIR top-k (otherwise
        # any query with a u-component concentrates in the planted bin too)
        q -= (q @ u)[:, None] * u[None, :]
        q[5] = u

        index = FlatIPIndex.build(c, ext_ids, dtype=jnp.float32,
                                  block_rows=512)
        calls = []
        orig = FlatIPIndex._rescan_exact

        def spy(self, qs, kk):
            calls.append(len(qs))
            return orig(self, qs, kk)

        monkeypatch.setattr(FlatIPIndex, "_rescan_exact", spy)
        s, i = index.search(q, k=k)
        ref_v, ref_p = self._oracle(q, c, k)
        np.testing.assert_array_equal(i, ext_ids[ref_p])
        np.testing.assert_allclose(s, ref_v, rtol=1e-5)
        # exactly one rescue pass over exactly the flagged query — pad
        # rows (which replicate q[0]) must NOT be rescued
        assert calls == [1]
        # a clean batch must not rescue at all
        calls.clear()
        s2, i2 = index.search(np.delete(q, 5, axis=0), k=k)
        assert calls == []

    def test_flag_mode_multi_segment_ok_is_anded(self):
        """With >1 segment, a query is certified only if every segment
        certified it."""
        from cldrd_tpu.search import mips

        rng = np.random.default_rng(3)
        # segments must keep kb = min(k, nbins) >= k, else the portable
        # path's exact slow branch runs and certifies everything
        n, d, k = 8192, 32, 20
        c, u = self._adversarial_corpus(n, d, n_planted=k, rng=rng)
        q = np.stack([u, rng.standard_normal(d).astype(np.float32) * 0.01])
        q[1] -= (q[1] @ u) * u
        v, p, ok = jax.jit(
            lambda q, c, i: mips.topk_binmax(
                q, c, i, k, bin_rows=128, extract=6, segment_rows=4096,
                on_miss="flag")
        )(jnp.asarray(q), jnp.asarray(c), jnp.arange(n, dtype=jnp.int32))
        ok = np.asarray(ok)
        assert not ok[0]
        assert ok[1]


def test_extract_width_lt_k_returns_positions(monkeypatch):
    """Regression: the fused path's width<k streaming fallback must return
    SEGMENT-LOCAL POSITIONS (its contract), not external ids — with
    scrambled ids the old code returned ids that downstream re-mapped as
    if they were positions."""
    from cldrd_tpu.search import mips

    monkeypatch.setattr(mips, "_INTERPRET", True)
    rng = np.random.default_rng(4)
    bz, n, d = 128, 4096, 32
    k = 40  # nsup * (R2-1) = 2 * 15 = 30 < k -> width<k early return
    q = rng.standard_normal((bz, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    ext_ids = rng.permutation(np.arange(3_000, 3_000 + n)).astype(np.int32)
    assert mips._extract_eligible(bz, n, 128)

    s_ref = q @ c.T
    ref_pos = np.argsort(-s_ref, axis=1)[:, :k]

    v, i = jax.jit(
        lambda q, c, i: mips.topk_binmax(q, c, i, k)
    )(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ext_ids))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ext_ids)[ref_pos])

    v2, p2 = jax.jit(
        lambda q, c, i: mips.topk_binmax(q, c, i, k, return_positions=True)
    )(jnp.asarray(q), jnp.asarray(c), jnp.asarray(ext_ids))
    np.testing.assert_array_equal(np.asarray(p2), ref_pos)


def test_sharded_flat_index_recovers_per_query(monkeypatch):
    """Sharded binmax search also runs flag-mode: per-shard certificates
    AND-reduce over the mesh, and FlatIPIndex rescues flagged queries
    through the corpus-sharded streaming scan."""
    rng = np.random.default_rng(5)
    # 20480 rows/shard -> 160 bins/shard >> k: benign queries certify
    # (at nbins ~= k, tau is the SMALLEST bin max and rem_max beats it
    # on plain random data — the certificate needs headroom)
    n, d, k = 163_840, 32, 20
    c = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    u = rng.standard_normal(d).astype(np.float32)
    u /= np.linalg.norm(u)
    scales = 5.0 + np.linspace(1.0, 0.0, k, dtype=np.float32)
    c[:k] = scales[:, None] * u[None, :]  # all inside shard 0, bin 0
    ext_ids = rng.permutation(np.arange(9_000, 9_000 + n)).astype(np.int64)
    q = rng.standard_normal((6, d)).astype(np.float32) * 0.01
    q -= (q @ u)[:, None] * u[None, :]
    q[2] = u

    mesh = make_mesh(8, CORPUS_AXIS)
    index = FlatIPIndex.build(c, ext_ids, mesh=mesh, dtype=jnp.float32,
                              block_rows=16)
    calls = []
    orig = FlatIPIndex._rescan_exact

    def spy(self, qs, kk):
        calls.append(len(qs))
        return orig(self, qs, kk)

    monkeypatch.setattr(FlatIPIndex, "_rescan_exact", spy)
    s, i = index.search(q, k=k)
    sc = q @ c.T
    ref_p = np.argsort(-sc, axis=1)[:, :k]
    np.testing.assert_array_equal(i, ext_ids[ref_p])
    np.testing.assert_allclose(s, np.take_along_axis(sc, ref_p, 1), rtol=1e-5)
    assert calls == [1]


# ---------------------------------------------------------- int8 store mode


def _quantize_rows(c):
    """Reference per-row symmetric int8 quantization (mirrors build)."""
    s = np.abs(c).max(axis=1).astype(np.float32) / 127.0
    s[s == 0.0] = 1.0
    codes = np.rint(c / s[:, None]).astype(np.int8)
    return codes, s


def test_int8_search_exact_wrt_quantized_corpus(corpus):
    """The factorized int8 search ((q . c8) * s inside every kernel) must
    return EXACTLY the numpy oracle's top-k over the dequantized corpus —
    the machinery adds no error beyond quantization itself. Covers dense,
    streaming, and the segmented binmax path."""
    from cldrd_tpu.search import topk_binmax

    q, c, ids = corpus
    k = 25
    codes, s = _quantize_rows(c)
    deq = codes.astype(np.float32) * s[:, None]
    es, ei = _numpy_topk(q, deq, ids, k)

    qd = jnp.asarray(q)
    ids32 = jnp.asarray(ids, jnp.int32)
    sj = jnp.asarray(s)
    cj = jnp.asarray(codes)

    s1, i1 = topk_dense(qd, cj, ids32, k, row_scales=sj)
    np.testing.assert_allclose(np.asarray(s1), es, rtol=1e-4, atol=1e-4)
    assert (np.asarray(i1) == ei).mean() > 0.99  # ties may reorder

    s2, i2 = topk_streaming(qd, cj, ids32, k, block_rows=512, row_scales=sj)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

    # segmented binmax (2 segments of 2048), positions mode like production
    s3, i3 = topk_binmax(qd, cj, ids32, k, segment_rows=2048, row_scales=sj)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i1))


def test_flat_index_int8(corpus):
    """FlatIPIndex.build(dtype=int8): search equals the dequantized oracle;
    recall vs the fp32 corpus stays high on random data."""
    q, c, ids = corpus
    k = 20
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.int8,
                              block_rows=512)
    assert index.embeddings.dtype == jnp.int8
    assert index.row_scales is not None
    s, i = index.search(q, k)

    codes, sc = _quantize_rows(c)
    deq = codes.astype(np.float32) * sc[:, None]
    # the index casts queries to bf16 (codes are exact in bf16; queries are
    # rounded like every bf16-store search) — the oracle must match that
    q_bf = np.asarray(jnp.asarray(q, jnp.bfloat16).astype(jnp.float32))
    es, ei = _numpy_topk(q_bf, deq, ids, k)
    np.testing.assert_allclose(s, es, rtol=1e-3, atol=1e-3)
    assert (i == ei).mean() > 0.95

    # quantization recall vs the true fp32 corpus (random-normal rows are
    # a mild case; the adversarial study lives in quantization_study.py)
    _, fi = _numpy_topk(q, c, ids, k)
    overlap = np.mean([
        len(set(i[r]) & set(fi[r])) / k for r in range(len(q))
    ])
    assert overlap >= 0.9


def test_flat_index_int8_sharded_8dev(corpus):
    q, c, ids = corpus
    mesh = make_mesh(8, CORPUS_AXIS)
    index = FlatIPIndex.build(c, ids, mesh=mesh, dtype=jnp.int8,
                              block_rows=128)
    s, i = index.search(q, 25)
    codes, sc = _quantize_rows(c)
    deq = codes.astype(np.float32) * sc[:, None]
    q_bf = np.asarray(jnp.asarray(q, jnp.bfloat16).astype(jnp.float32))
    es, ei = _numpy_topk(q_bf, deq, ids, 25)
    np.testing.assert_allclose(s, es, rtol=1e-3, atol=1e-3)
    assert (i == ei).mean() > 0.95
    # stream-method shard path with scales
    import dataclasses as _dc
    idx2 = _dc.replace(index, method="stream")
    s2, i2 = idx2.search(q, 25)
    np.testing.assert_allclose(s2, s, rtol=1e-5)


def test_build_index_on_device_int8(corpus):
    """Device-resident int8 build: per-batch quantization on device must
    match the host-path int8 build's search results (same quantizer), both
    unsharded and on the 8-device mesh."""
    import jax.numpy as jnp

    from cldrd_tpu.data.sequence_dataset import SequenceDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import build_index_on_device, encode_dataset, make_encode_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 4), jnp.int32),
         "attention_mask": jnp.ones((1, 4), jnp.int32)},
        {"input_ids": jnp.zeros((1, 1, 4), jnp.int32),
         "attention_mask": jnp.ones((1, 1, 4), jnp.int32)},
    )["params"]
    id_to_seq = {i + 50: f"text number {i} body" for i in range(101)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(cfg.vocab_size), 8,
                         is_query=False)
    encode = make_encode_fn(model, params, "passage_embs", dtype=jnp.float32)

    dev_index = build_index_on_device(encode, ds, batch_size=16, dim=cfg.dim,
                                      dtype=jnp.int8, block_rows=64)
    assert dev_index.embeddings.dtype == jnp.int8
    assert dev_index.row_scales is not None
    embs, ids = encode_dataset(encode, ds, 16)
    host_index = FlatIPIndex.build(embs, ids, dtype=jnp.int8, block_rows=64)

    q = embs[:5]
    s_d, i_d = dev_index.search(q, k=10)
    s_h, i_h = host_index.search(q, k=10)
    np.testing.assert_allclose(s_d, s_h, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(i_d, i_h)

    # sharded SPMD int8 build agrees too
    mesh = make_mesh(8, CORPUS_AXIS)
    encode_sh = make_encode_fn(model, params, "passage_embs", mesh=mesh,
                               axis_name=CORPUS_AXIS, dtype=jnp.float32)
    dev_sh = build_index_on_device(
        encode_sh, ds, batch_size=16, dim=cfg.dim,
        dtype=jnp.int8, block_rows=16, mesh=mesh, axis_name=CORPUS_AXIS,
    )
    assert dev_sh.embeddings.dtype == jnp.int8
    s_s, i_s = dev_sh.search(q, k=10)
    np.testing.assert_allclose(s_s, s_h, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(i_s, i_h)


def test_int8_precision_highest_fp32_exact(corpus):
    """--hbm-dtype int8 --precision highest: queries stay fp32, so the
    factorized (q . c8) * s scores are fp32-exact against the numpy oracle
    over the dequantized corpus (codes <= 127 are exact in fp32)."""
    from cldrd_tpu.index.flat_index import quantize_rows

    q, c, ids = corpus
    k = 20
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.int8,
                              block_rows=512, precision="highest")
    s, i = index.search(q, k)

    codes, sc = quantize_rows(c)
    deq = codes.astype(np.float32) * sc[:, None]
    es, ei = _numpy_topk(q, deq, ids, k)  # fp32 queries, NOT bf16-rounded
    np.testing.assert_allclose(s, es, rtol=1e-6, atol=1e-6)
    assert (i == ei).mean() > 0.99


def test_int8_disk_store_roundtrip(tmp_path, corpus):
    """--store-dtype int8: the quantized disk store (codes shards +
    scales.npy) loads straight into the int8 HBM index with results
    identical to quantizing the fp32 store at load time; read_embeddings
    dequantizes losslessly w.r.t. the stored codes."""
    from cldrd_tpu.index.flat_index import quantize_rows
    from cldrd_tpu.index.persistence import (
        load_index, read_embeddings, write_embeddings,
    )

    q, c, ids = corpus
    out = str(tmp_path / "int8_store")
    write_embeddings(out, c, ids, rows_per_shard=1500, dtype="int8")

    # dequantized read-back re-quantizes to the same codes (lossless)
    embs, rids = read_embeddings(out)
    codes, sc = quantize_rows(c)
    codes2, sc2 = quantize_rows(embs)
    np.testing.assert_array_equal(codes2, codes)
    np.testing.assert_allclose(sc2, sc, rtol=1e-6)
    np.testing.assert_array_equal(rids, ids)

    # direct codes->HBM load == quantize-from-fp32-store load
    idx_direct = load_index(out, dtype=jnp.int8, block_rows=512)
    assert idx_direct.embeddings.dtype == jnp.int8
    ref_idx = FlatIPIndex.build(c, ids, dtype=jnp.int8, block_rows=512)
    s1, i1 = idx_direct.search(q, 15)
    s2, i2 = ref_idx.search(q, 15)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)

    # and an int8 store still serves a bf16 HBM request (dequantized)
    idx_bf16 = load_index(out, dtype=jnp.bfloat16, block_rows=512)
    assert idx_bf16.embeddings.dtype == jnp.bfloat16
    s3, _ = idx_bf16.search(q, 15)
    assert np.isfinite(s3).all()



def test_randomized_invariant_sweep():
    """Seeded randomized sweep over the whole search stack: random shapes,
    k, padding patterns, dtypes (fp32/bf16-store/int8-store), segmenting,
    and ragged query batches — every configuration must agree with the
    numpy oracle over the (de)quantized corpus it actually stores.
    Catches shape-edge regressions the targeted tests don't enumerate."""
    from cldrd_tpu.index.flat_index import quantize_rows
    from cldrd_tpu.search import topk_binmax

    rng = np.random.default_rng(123)
    for case in range(12):
        n = int(rng.choice([48, 257, 1024, 2048, 4096, 5120]))
        d = int(rng.choice([16, 32, 64]))
        bz = int(rng.choice([1, 3, 8, 17]))
        k = int(rng.choice([1, 5, 37, min(128, n)]))
        n_valid = int(rng.integers(max(1, n // 2), n + 1))
        dtype = rng.choice(["float32", "int8"])
        seg = int(rng.choice([512, 2048, 1 << 21]))

        c = rng.standard_normal((n_valid, d)).astype(np.float32)
        ids_ext = rng.permutation(n_valid).astype(np.int64) + 7
        q = rng.standard_normal((bz, d)).astype(np.float32)

        idx = FlatIPIndex.build(
            c, ids_ext, dtype=jnp.dtype(dtype), block_rows=512,
        )
        s, i = idx.search(q, k)

        if dtype == "int8":
            codes, sc = quantize_rows(c)
            stored = codes.astype(np.float32) * sc[:, None]
        else:
            stored = c
        # the oracle scores with the queries as the index actually casts
        # them (bf16 for the int8 store)
        q_used = np.asarray(jnp.asarray(q, idx._query_dtype)
                            .astype(jnp.float32))
        es, ei = _numpy_topk(q_used, stored, ids_ext, min(k, n_valid))

        k_eff = min(k, n_valid)
        # ranks beyond the corpus: -1 ids, -inf scores
        assert (i[:, k_eff:] == -1).all(), case
        # scores agree with the oracle (fp32 on CPU; ties may reorder ids)
        np.testing.assert_allclose(
            s[:, :k_eff], es, rtol=1e-4, atol=1e-4, err_msg=str(case))
        assert (i[:, :k_eff] == ei).mean() > 0.95, case
        # padding never surfaces
        assert ((i == -1) | (i >= 7)).all(), case

        # raw topk_binmax with explicit segmenting agrees too
        n_pad = idx.embeddings.shape[0]
        v2, p2 = topk_binmax(
            jnp.asarray(q, idx._query_dtype), idx.embeddings, idx.row_ids,
            k, segment_rows=seg, return_positions=True,
            row_scales=idx.row_scales,
        )
        ids_host = np.asarray(idx.row_ids)
        i2 = np.where(np.asarray(p2) >= 0,
                      ids_host[np.maximum(np.asarray(p2), 0)], -1)
        np.testing.assert_allclose(
            np.asarray(v2)[:, :k_eff], s[:, :k_eff], rtol=1e-4, atol=1e-4,
            err_msg=f"case {case} seg {seg}")
        assert (i2[:, :k_eff] == i[:, :k_eff]).mean() > 0.95, case


# ------------------------------------------------------- live index updates


def test_index_add_remove_save(tmp_path, corpus):
    """FAISS add_with_ids / remove_ids equivalence on the resident index:
    added docs are retrievable exactly, tombstoned docs never surface, and
    save() -> load_index round-trips the live state (fp32 and int8)."""
    from cldrd_tpu.index.persistence import load_index

    q, c, ids = corpus
    rng = np.random.default_rng(42)
    new_c = rng.standard_normal((300, c.shape[1])).astype(np.float32)
    new_ids = np.arange(10_000, 10_300, dtype=np.int64)

    for dtype in (jnp.float32, jnp.int8):
        idx = FlatIPIndex.build(c, ids, dtype=dtype, block_rows=512)
        idx2 = idx.add(new_c, new_ids)
        assert idx2.n_vectors == idx.n_vectors + 300

        # a query aimed straight at a new doc retrieves it at rank 1
        probe = new_c[:4] * 10.0
        s, i = idx2.search(probe, 5)
        assert list(i[:, 0]) == [10_000, 10_001, 10_002, 10_003]

        # old content still retrieved as before (same oracle winners)
        s_old, i_old = idx.search(q, 10)
        s_new, i_new = idx2.search(q, 10)
        # new random rows can enter the top-10, but old winners keep order
        # when filtered to old ids
        for r in range(len(q)):
            kept = [x for x in i_new[r] if x < 10_000]
            assert kept == list(i_old[r])[: len(kept)]

        # remove the first 2 new docs: they never surface again
        idx3 = idx2.remove([10_000, 10_001])
        assert idx3.n_vectors == idx2.n_vectors - 2
        s, i = idx3.search(probe, 5)
        assert 10_000 not in i and 10_001 not in i
        assert list(i[:2, 0]) != [10_000, 10_001]

        # save -> load round trip preserves the live state
        out = str(tmp_path / f"live_{np.dtype(dtype).name}")
        idx3.save(out)
        back = load_index(out, dtype=dtype, block_rows=512)
        assert back.n_vectors == idx3.n_vectors
        sb, ib = back.search(probe, 5)
        np.testing.assert_array_equal(ib, i)
        np.testing.assert_allclose(sb, s, rtol=1e-5, atol=1e-5)


def test_index_add_in_place_and_id_validation(corpus):
    """Small adds fill the existing padding tail IN PLACE: the corpus shape
    (and therefore the compiled search executable) is unchanged. Out-of-
    range ids are rejected loudly instead of wrapping through int32."""
    q, c, ids = corpus
    for dtype in (jnp.float32, jnp.int8):
        # 3000 rows pad to 3072 -> 72 free tail rows
        idx = FlatIPIndex.build(c[:3000], ids[:3000], dtype=dtype,
                                block_rows=512)
        shape0 = idx.embeddings.shape
        rng = np.random.default_rng(7)
        new_c = rng.standard_normal((50, c.shape[1])).astype(np.float32)
        new_ids = np.arange(20_000, 20_050, dtype=np.int64)
        idx2 = idx.add(new_c, new_ids)  # consumes idx (donated buffer)
        assert idx2.embeddings.shape == shape0  # in place: no growth
        assert idx2.n_vectors == 3050
        s, i = idx2.search(new_c[:3] * 10.0, 3)
        assert list(i[:, 0]) == [20_000, 20_001, 20_002]

        # beyond capacity: grows by a block-aligned slab
        big = rng.standard_normal((100, c.shape[1])).astype(np.float32)
        idx3 = idx2.add(big, np.arange(30_000, 30_100, dtype=np.int64))
        assert idx3.embeddings.shape[0] > shape0[0]
        assert idx3.n_vectors == 3150

        # id range validation (int32 map, -1 reserved)
        with pytest.raises(ValueError, match="2\\*\\*31"):
            idx3.add(new_c[:1], np.asarray([2**31], np.int64))
        with pytest.raises(ValueError, match="2\\*\\*31"):
            FlatIPIndex.build(c[:10], np.asarray([-5] + [0] * 9, np.int64),
                              dtype=dtype, block_rows=512)


def test_remove_then_add_reuses_tail_capacity(corpus):
    """Tombstoning trailing docs turns them back into add() capacity: the
    corpus shape stays constant through a remove -> add cycle."""
    q, c, ids = corpus
    idx = FlatIPIndex.build(c[:3072], np.arange(3072, dtype=np.int64),
                            dtype=jnp.float32, block_rows=512)
    shape0 = idx.embeddings.shape
    assert idx._free_tail() == 0
    idx = idx.remove(list(range(3000, 3072)))  # tail tombstones
    assert idx._free_tail() == 72
    rng = np.random.default_rng(3)
    add_c = rng.standard_normal((72, c.shape[1])).astype(np.float32)
    idx = idx.add(add_c, np.arange(50_000, 50_072, dtype=np.int64))
    assert idx.embeddings.shape == shape0  # reused, no growth
    assert idx.n_vectors == 3072
    s, i = idx.search(add_c[:2] * 10.0, 2)
    assert list(i[:, 0]) == [50_000, 50_001]


# ----------------------------------------------- FAISS read surface


def test_reconstruct_returns_stored_vectors(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32,
                              block_rows=512)
    pick = np.asarray([ids[5], ids[0], ids[4000]])
    got = index.reconstruct(pick)
    np.testing.assert_allclose(got, c[[5, 0, 4000]], rtol=1e-6)
    # scalar id -> [D]
    one = index.reconstruct(int(ids[7]))
    assert one.shape == (c.shape[1],)
    np.testing.assert_allclose(one, c[7], rtol=1e-6)
    with pytest.raises(KeyError):
        index.reconstruct([999_999_999])


def test_reconstruct_int8_dequantizes(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.int8,
                              block_rows=512)
    codes, scales = _quantize_rows(c)
    got = index.reconstruct(np.asarray([ids[3], ids[100]]))
    want = codes[[3, 100]].astype(np.float32) * scales[[3, 100]][:, None]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_reconstruct_after_remove_raises(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32,
                              block_rows=512)
    index2 = index.remove([int(ids[5])])
    with pytest.raises(KeyError):
        index2.reconstruct([int(ids[5])])
    # untouched ids still reconstruct
    np.testing.assert_allclose(index2.reconstruct(int(ids[6])), c[6],
                               rtol=1e-6)


def _numpy_range_search(q, c, ids, radius):
    scores = q.astype(np.float64) @ c.astype(np.float64).T
    out = []
    for row in scores:
        hit = np.flatnonzero(row > radius)
        order = hit[np.argsort(-row[hit], kind="stable")]
        out.append((row[order], ids[order]))
    return out


def test_range_search_matches_numpy_oracle(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32,
                              block_rows=512, precision="highest")
    # radius chosen so queries have O(10) hits each
    radius = float(np.quantile(q @ c.T, 0.998))
    lims, scores, got_ids = index.range_search(q, radius, k_start=8)
    want = _numpy_range_search(q, c, ids, radius)
    assert lims[0] == 0 and lims[-1] == len(got_ids) == len(scores)
    for qi, (ws, wi) in enumerate(want):
        s = scores[lims[qi]:lims[qi + 1]]
        i = got_ids[lims[qi]:lims[qi + 1]]
        assert set(i.tolist()) == set(wi.tolist()), qi
        np.testing.assert_allclose(np.sort(s)[::-1], np.sort(ws)[::-1],
                                   rtol=1e-5)
        assert np.all(np.diff(s) <= 1e-6)  # score-descending within query


def test_range_search_deepens_past_k_start(corpus):
    """A radius below every score forces the doubling loop to the full
    corpus: every valid row must come back for every query (max_passes=None
    opts into the FAISS-exhaustive behavior)."""
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32,
                              block_rows=512, precision="highest")
    lims, scores, got_ids = index.range_search(q[:2], -1e9, k_start=16,
                                               max_passes=None)
    assert lims[-1] == 2 * len(ids)
    for qi in range(2):
        assert set(got_ids[lims[qi]:lims[qi + 1]].tolist()) == set(
            ids.tolist())


def test_range_search_bounded_worst_case(corpus):
    """A pathological radius costs a BOUNDED number of passes by default:
    after max_passes doublings the search raises loudly instead of silently
    re-searching the corpus log2(N/k_start) times."""
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32,
                              block_rows=512, precision="highest")
    with pytest.raises(RuntimeError, match="unsaturated after 3 passes"):
        index.range_search(q[:2], -1e9, k_start=16, max_passes=3)
    # a sane radius under the same cap still completes in one pass
    radius = float(np.quantile(q @ c.T, 0.999))
    lims, scores, got_ids = index.range_search(q, radius, k_start=64,
                                               max_passes=3)
    want = _numpy_range_search(q, c, ids, radius)
    for qi, (ws, wi) in enumerate(want):
        assert set(got_ids[lims[qi]:lims[qi + 1]].tolist()) == set(
            wi.tolist())


def test_range_search_no_hits(corpus):
    q, c, ids = corpus
    index = FlatIPIndex.build(c, ids, mesh=None, dtype=jnp.float32,
                              block_rows=512)
    lims, scores, got_ids = index.range_search(q, 1e9)
    assert lims.tolist() == [0] * (len(q) + 1)
    assert scores.size == 0 and got_ids.size == 0
