"""Data-pipeline tests: label modes (vs reference table), TSV/JSONL loaders,
fixed-shape collation, rank sharding, and reranking/sequence batching."""
import json
import os

import numpy as np
import pytest

from cldrd_tpu.data import (
    EXPECTED_COUNTS,
    HashTokenizer,
    NwayDataset,
    RerankingDataset,
    SequenceDataset,
    labels_for,
    load_passages,
    load_queries,
    load_train_examples,
    nway_for,
    passage_text,
)


# ------------------------------------------------------------- label modes


def test_label_modes_match_reference_table():
    """Hand-transcribed expectations from reference nway_dataset.py:41-72."""
    inv = lambda n: list(1.0 / np.arange(1, n + 1))  # noqa: E731
    expected = {
        "1": [1.0] + [0.0] * 5,
        "2": [1.0] * 10 + [0.5] * 10 + [0.0] * 10,
        "3": inv(10) + [0.0] * 20,
        "4": [1.0] + [0.9] * 9 + [0.5] * 10 + [0.0] * 10,
        "5": inv(20) + [0.0] * 10,
        "6": inv(30),
        "7": inv(5) + [0.0] * 25,
        "8": inv(5) + [-0.25] * 12 + [-0.5] * 13,
        "9": inv(10) + [-0.25] * 10 + [-0.5] * 10,
        "10": inv(20) + [-0.25] * 5 + [-0.5] * 5,
    }
    for mode, exp in expected.items():
        r, n = EXPECTED_COUNTS[mode]
        got = labels_for(mode, r, n)
        np.testing.assert_allclose(got, np.asarray(exp, np.float32), rtol=1e-6)
        assert nway_for(mode) == len(exp)


def test_label_mode_count_validation():
    with pytest.raises(ValueError):
        labels_for("8", 4, 26)
    with pytest.raises(ValueError):
        labels_for("11", 5, 25)


# ------------------------------------------------------- synthetic fixtures


@pytest.fixture()
def tiny_corpus(tmp_path):
    queries = {i: f"query number {i} about topic {i % 3}" for i in range(8)}
    passages = {
        100 + i: f"passage text {i} discussing topic {i % 3} in depth" for i in range(40)
    }
    qpath = tmp_path / "queries.tsv"
    ppath = tmp_path / "collection.tsv"
    qpath.write_text("".join(f"{k}\t{v}\n" for k, v in queries.items()))
    ppath.write_text("".join(f"{k}\t{v}\n" for k, v in passages.items()))

    # label mode "1": 1 relT + 5 neg
    tpath = tmp_path / "train.jsonl"
    with open(tpath, "w") as f:
        for qid in range(8):
            ex = {
                "qid": qid,
                "relT_pids": [100 + qid],
                "most_hard_pids": [100 + ((qid + j) % 40) for j in range(1, 4)],
                "semi_hard_pids": [100 + ((qid + j) % 40) for j in range(4, 6)],
            }
            f.write(json.dumps(ex) + "\n")
    return str(qpath), str(ppath), str(tpath)


def test_loaders_roundtrip(tiny_corpus, tmp_path):
    qpath, ppath, tpath = tiny_corpus
    queries = load_queries(qpath)
    passages = load_passages(ppath)
    assert len(queries) == 8 and len(passages) == 40
    assert queries[0].startswith("query number 0")

    # 3-column titled passages
    titled = tmp_path / "titled.tsv"
    titled.write_text("7\tSome Title\tbody text here\n")
    loaded = load_passages(str(titled))
    assert loaded[7] == {"title": "Some Title", "para": "body text here"}
    assert passage_text(loaded[7]) == "Some Title [SEP] body text here"

    examples = load_train_examples(tpath, fmt="relT_most_semi_hard")
    assert len(examples) == 8
    assert examples[0]["neg_pids"] == [101, 102, 103, 104, 105]


def test_rank_sharding(tiny_corpus):
    _, _, tpath = tiny_corpus
    shards = [
        load_train_examples(tpath, fmt="relT_most_semi_hard", rank=r, nranks=4)
        for r in range(4)
    ]
    all_qids = sorted(ex["qid"] for shard in shards for ex in shard)
    assert all_qids == list(range(8))
    assert all(len(s) == 2 for s in shards)


def test_rel_pid_format(tmp_path):
    path = tmp_path / "t.jsonl"
    path.write_text(json.dumps({"qid": 1, "rel_pid": 9, "neg_pids": [4, 5]}) + "\n")
    ex = load_train_examples(str(path), fmt="rel_pid")[0]
    assert ex["relT_pids"] == [9] and ex["neg_pids"] == [4, 5]


# ------------------------------------------------------------- collation


def test_nway_collate_shapes(tiny_corpus):
    qpath, ppath, tpath = tiny_corpus
    tok = HashTokenizer(vocab_size=1000)
    ds = NwayDataset.create_from_files(
        qpath, ppath, tpath, tok, max_query_len=12, max_passage_len=24,
        label_mode="1",
    )
    batches = list(ds.batches(batch_size=4, shuffle=True, seed=7))
    assert len(batches) == 2
    b = batches[0]
    assert b.query["input_ids"].shape == (4, 12)
    assert b.nway_passages["input_ids"].shape == (4, 6, 24)
    assert b.labels.shape == (4, 6)
    np.testing.assert_allclose(b.labels[0], [1, 0, 0, 0, 0, 0])
    assert b.nway_pids.shape == (4, 6)
    # passage tokens at [b, n] must correspond to pid nway_pids[b, n]
    assert (b.nway_passages["attention_mask"].sum(-1) > 0).all()


def test_nway_epoch_determinism(tiny_corpus):
    qpath, ppath, tpath = tiny_corpus
    tok = HashTokenizer(vocab_size=1000)
    ds = NwayDataset.create_from_files(
        qpath, ppath, tpath, tok, 12, 24, label_mode="1"
    )
    a = [b.qid.tolist() for b in ds.batches(4, shuffle=True, seed=3)]
    b = [b.qid.tolist() for b in ds.batches(4, shuffle=True, seed=3)]
    c = [b.qid.tolist() for b in ds.batches(4, shuffle=True, seed=4)]
    assert a == b and a != c


def test_sequence_dataset_padding(tiny_corpus):
    qpath, ppath, _ = tiny_corpus
    tok = HashTokenizer(vocab_size=1000)
    ds = SequenceDataset.create_from_seqs_file(ppath, tok, max_length=16, is_query=False)
    batches = list(ds.batches(batch_size=16))
    assert len(batches) == 3  # 40 passages -> 16,16,8(padded to 16)
    last = batches[-1]
    assert last.n_valid == 8
    assert last.tokens["input_ids"].shape == (16, 16)
    assert (last.ids[8:] == -1).all()
    assert (last.tokens["attention_mask"][8:] == 0).all()


def test_reranking_dataset_modes(tiny_corpus, tmp_path):
    qpath, ppath, _ = tiny_corpus
    run = tmp_path / "run.tsv"
    with open(run, "w") as f:
        for qid in range(3):
            for rank, pid in enumerate([100 + qid, 110 + qid, 120 + qid]):
                f.write(f"{qid}\t{pid}\t{rank+1}\t{9.0-rank}\n")
    tok = HashTokenizer(vocab_size=1000)
    dual = RerankingDataset(
        str(run), qpath, ppath, tok, is_cross_encoder=False,
        query_max_len=12, passage_max_len=24,
    )
    b = next(dual.batches(4))
    assert b.query["input_ids"].shape == (4, 12)
    assert b.passage["input_ids"].shape == (4, 24)
    assert b.n_valid == 4

    cross = RerankingDataset(
        str(run), qpath, ppath, tok, is_cross_encoder=True, max_len=32
    )
    b = next(cross.batches(4))
    assert b.query_passage["input_ids"].shape == (4, 32)
    # pair encoding: two SEP tokens present in each valid row
    assert (b.query_passage["input_ids"][0] == 2).sum() == 2


def test_teacher_scores_loaded_and_collated(tmp_path):
    """*_score.train.json files carry teacher scores into NwayBatch."""
    import json as _json

    import numpy as _np

    from cldrd_tpu.data import NwayDataset
    from cldrd_tpu.data.tokenization import HashTokenizer

    queries = tmp_path / "q.tsv"
    queries.write_text("0\tquery zero\n1\tquery one\n")
    passages = tmp_path / "p.tsv"
    passages.write_text("".join(f"{p}\tpassage {p}\n" for p in range(12)))
    train = tmp_path / "t.jsonl"
    rows = []
    for q in range(2):
        rows.append(_json.dumps({
            "qid": q,
            "relT_pids": [q * 6],
            "relT_scores": [9.5 - q],
            "most_hard_pids": [q * 6 + 1, q * 6 + 2, q * 6 + 3],
            "most_hard_scores": [3.0, 2.0, 1.0],
            "semi_hard_pids": [q * 6 + 4, q * 6 + 5],
            "semi_hard_scores": [0.5, 0.1],
        }) + "\n")
    train.write_text("".join(rows))

    ds = NwayDataset.create_from_files(
        str(queries), str(passages), str(train), HashTokenizer(64),
        max_query_len=6, max_passage_len=6, label_mode="1",
    )
    batch = ds.collate([ds[0], ds[1]])
    assert batch.teacher_scores is not None
    _np.testing.assert_allclose(
        batch.teacher_scores,
        [[9.5, 3.0, 2.0, 1.0, 0.5, 0.1], [8.5, 3.0, 2.0, 1.0, 0.5, 0.1]],
    )
    # labels still follow the label mode, independent of scores
    _np.testing.assert_allclose(batch.labels[:, 0], [1.0, 1.0])


def test_teacher_scores_neg_fill_modes(tmp_path):
    import json as _json

    from cldrd_tpu.data import NwayDataset
    from cldrd_tpu.data.tokenization import HashTokenizer

    queries = tmp_path / "q.tsv"
    queries.write_text("0\tquery zero\n")
    passages = tmp_path / "p.tsv"
    passages.write_text("".join(f"{p}\tpassage {p}\n" for p in range(6)))
    train = tmp_path / "t.jsonl"
    train.write_text(_json.dumps({
        "qid": 0, "relT_pids": [0], "relT_scores": [4.0],
        "most_hard_pids": [1, 2, 3], "semi_hard_pids": [4, 5],
    }) + "\n")

    for mode, fill in (("original", 0.0), ("mean", 3.0)):
        ds = NwayDataset.create_from_files(
            str(queries), str(passages), str(train), HashTokenizer(64),
            max_query_len=6, max_passage_len=6, label_mode="1",
            neg_score_mode=mode,
        )
        item = ds[0]
        assert list(item["teacher_scores"]) == [4.0] + [fill] * 5


def test_host_shard_single_process():
    from cldrd_tpu.parallel import host_shard, is_first_host

    rank, nranks = host_shard()
    assert rank == -1 and nranks is None  # single-process: no sharding
    assert is_first_host()


def test_prefetch_preserves_order_and_raises():
    from cldrd_tpu.data.prefetch import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))
    assert list(prefetch(iter([]), depth=1)) == []

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer failed")

    import pytest as _pytest

    it = prefetch(boom(), depth=2)
    assert next(it) == 1 and next(it) == 2
    with _pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_prefetch_releases_producer_on_early_exit():
    import threading
    import time as _time

    from cldrd_tpu.data.prefetch import prefetch

    produced = []

    def slow_gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch(slow_gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer abandons
    _time.sleep(0.5)
    # the producer must have stopped (bounded queue + stop event), not
    # raced through all 1000 items nor be stuck forever
    n_threads = sum(t.name == "cldrd-prefetch" and t.is_alive()
                    for t in threading.enumerate())
    assert n_threads == 0, "prefetch producer thread leaked"
    assert len(produced) < 10


# ------------------------------------------------------------- token cache


def test_token_cache_roundtrip(tmp_path):
    """TokenCacheDataset must reproduce SequenceDataset's batches exactly
    (ids, input_ids, attention_mask, ragged-tail padding)."""
    from cldrd_tpu.data import (
        SequenceDataset, TokenCacheDataset, token_cache_exists,
        write_token_cache,
    )
    from cldrd_tpu.data.tokenization import HashTokenizer

    id_to_seq = {i + 10: f"text number {i} body words {i % 7}" for i in range(53)}
    tok = HashTokenizer(500)
    ds = SequenceDataset(id_to_seq, tok, max_length=12, is_query=False)

    cache_dir = str(tmp_path / "cache")
    assert not token_cache_exists(cache_dir)
    write_token_cache(ds, cache_dir, batch_size=16)
    assert token_cache_exists(cache_dir)

    cds = TokenCacheDataset(cache_dir)
    assert len(cds) == len(ds)
    for direct, cached in zip(ds.batches(16), cds.batches(16)):
        assert direct.n_valid == cached.n_valid
        np.testing.assert_array_equal(direct.ids, cached.ids)
        np.testing.assert_array_equal(
            direct.tokens["input_ids"], cached.tokens["input_ids"]
        )
        np.testing.assert_array_equal(
            direct.tokens["attention_mask"], cached.tokens["attention_mask"]
        )


def test_token_cache_feeds_encoder(tmp_path):
    """The cached dataset is a drop-in for encode_dataset."""
    import jax
    import jax.numpy as jnp

    from cldrd_tpu.data import SequenceDataset, TokenCacheDataset, write_token_cache
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import encode_dataset, make_encode_fn
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
    id_to_seq = {i: f"passage {i} stuff" for i in range(21)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(cfg.vocab_size), 8, is_query=False)
    cache_dir = str(tmp_path / "cache")
    write_token_cache(ds, cache_dir, batch_size=8)

    enc = make_encode_fn(model, params, "passage_embs", dtype=jnp.float32)
    e1, i1 = encode_dataset(enc, ds, 8)
    e2, i2 = encode_dataset(enc, TokenCacheDataset(cache_dir), 8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


# --------------------------------------------------------------- bucketing


def _toy_batches(lengths, batch_size, max_length, start_id=100):
    """Build a SequenceBatch stream with prescribed per-row valid lengths."""
    from cldrd_tpu.data import SequenceBatch

    rows = len(lengths)
    for s in range(0, rows, batch_size):
        chunk = lengths[s : s + batch_size]
        nv = len(chunk)
        ids = np.full((batch_size,), -1, np.int64)
        ids[:nv] = np.arange(s, s + nv) + start_id
        toks = np.zeros((batch_size, max_length), np.int32)
        mask = np.zeros((batch_size, max_length), np.int32)
        for r, ln in enumerate(chunk):
            toks[r, :ln] = (s + r) * 1000 + np.arange(ln) + 1
            mask[r, :ln] = 1
        yield SequenceBatch(
            tokens={"input_ids": toks, "attention_mask": mask},
            ids=ids, n_valid=nv,
        )


def test_bucket_specs_ladder_and_scaling():
    from cldrd_tpu.data import bucket_specs

    specs = bucket_specs(256, 512)  # default ladder
    assert [s.length for s in specs] == [32, 64, 128, 256]
    assert [s.batch_size for s in specs] == [4096, 2048, 1024, 512]
    # batch_multiple rounds down and never hits zero
    specs = bucket_specs(256, 512, (100, 256), batch_multiple=8)
    assert [s.length for s in specs] == [100, 256]
    assert all(s.batch_size % 8 == 0 and s.batch_size >= 8 for s in specs)
    # explicit ladder missing max_length gets it appended
    specs = bucket_specs(64, 16, (16,))
    assert [s.length for s in specs] == [16, 64]


def test_bucketize_preserves_every_row():
    """Each valid input row appears in exactly one bucketed batch, sliced
    to its bucket length with nothing but masked padding lost."""
    from cldrd_tpu.data import bucket_specs, bucketize

    rng = np.random.default_rng(0)
    lengths = rng.integers(1, 17, size=203).tolist()
    specs = bucket_specs(16, 8, (4, 8, 16))
    out = list(bucketize(_toy_batches(lengths, 10, 16), specs))

    by_len = {s.length: s.batch_size for s in specs}
    seen = {}
    for b in out:
        L = b.tokens["input_ids"].shape[1]
        assert b.tokens["input_ids"].shape == (by_len[L], L)
        assert b.tokens["attention_mask"].shape == (by_len[L], L)
        # valid rows first, pads (-1) after
        assert (b.ids[: b.n_valid] >= 0).all()
        assert (b.ids[b.n_valid :] == -1).all()
        for r in range(b.n_valid):
            rid = int(b.ids[r])
            assert rid not in seen
            ln = lengths[rid - 100]
            assert ln <= L  # row landed in a big-enough bucket
            row = b.tokens["input_ids"][r]
            np.testing.assert_array_equal(
                row[:ln], (rid - 100) * 1000 + np.arange(ln) + 1
            )
            assert (row[ln:] == 0).all()
            assert b.tokens["attention_mask"][r].sum() == ln
            seen[rid] = L
    assert len(seen) == len(lengths)
    # rows land in the SMALLEST covering bucket
    for rid, L in seen.items():
        ln = lengths[rid - 100]
        assert L == min(s for s in (4, 8, 16) if s >= ln)


def test_bucketize_rejects_oversized_rows():
    from cldrd_tpu.data import BucketSpec, bucketize

    with pytest.raises(ValueError, match="exceeds largest bucket"):
        list(bucketize(_toy_batches([10], 4, 16), [BucketSpec(8, 4)]))


def test_token_cache_bucketed_minimal_padding(tmp_path):
    """The sort-based cache path emits every row once, in length-grouped
    order, with at most one partial batch per bucket."""
    from cldrd_tpu.data import (
        SequenceDataset, TokenCacheDataset, bucket_specs, write_token_cache,
    )
    from cldrd_tpu.data.tokenization import HashTokenizer

    # word counts 1..12 -> varying token lengths (cls + words + sep)
    id_to_seq = {i: " ".join(f"w{j}" for j in range(1 + i % 12))
                 for i in range(57)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(500), 16, is_query=False)
    cache_dir = str(tmp_path / "cache")
    write_token_cache(ds, cache_dir, batch_size=16)
    cds = TokenCacheDataset(cache_dir)

    specs = bucket_specs(16, 8, (4, 8, 16))
    batches = list(cds.batches_bucketed(specs))
    # at most one ragged batch per bucket
    per_bucket_partials = {}
    seen = set()
    for b in batches:
        L = b.tokens["input_ids"].shape[1]
        if b.n_valid < b.tokens["input_ids"].shape[0]:
            per_bucket_partials[L] = per_bucket_partials.get(L, 0) + 1
        for r in range(b.n_valid):
            rid = int(b.ids[r])
            assert rid not in seen
            seen.add(rid)
            ln = int(cds.lengths[list(cds.ids).index(rid)])
            assert ln <= L
        # every row's tokens match the cache slice
        sel = [list(cds.ids).index(int(b.ids[r])) for r in range(b.n_valid)]
        np.testing.assert_array_equal(
            b.tokens["input_ids"][: b.n_valid],
            cds.tokens[sel, :L].astype(np.int32),
        )
    assert seen == set(int(i) for i in cds.ids)
    assert all(v == 1 for v in per_bucket_partials.values())


def test_bucketed_encode_identical_embeddings(tmp_path):
    """Bucketed encoding (both the greedy wrapper and the sorted cache
    path) produces the same per-id embedding as flat max_length encoding:
    padding is masked out of attention, so padded length is immaterial."""
    import jax
    import jax.numpy as jnp

    from cldrd_tpu.data import (
        SequenceDataset, TokenCacheDataset, write_token_cache,
    )
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index import encode_dataset, make_encode_fn
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
    id_to_seq = {i: " ".join(f"tok{j}" for j in range(1 + i % 13))
                 for i in range(43)}
    ds = SequenceDataset(id_to_seq, HashTokenizer(cfg.vocab_size), 16,
                         is_query=False)
    enc = make_encode_fn(model, params, "passage_embs", dtype=jnp.float32)

    e_flat, i_flat = encode_dataset(enc, ds, 8)
    ref = {int(i): e for i, e in zip(i_flat, e_flat)}

    # greedy wrapper over the raw dataset
    e_b, i_b = encode_dataset(enc, ds, 8, bucket_lengths=(4, 8, 16))
    assert sorted(int(x) for x in i_b) == sorted(ref)
    for i, e in zip(i_b, e_b):
        np.testing.assert_allclose(e, ref[int(i)], rtol=1e-6, atol=1e-7)

    # sorted cache path, default ladder
    cache_dir = str(tmp_path / "cache")
    write_token_cache(ds, cache_dir, batch_size=16)
    e_c, i_c = encode_dataset(enc, TokenCacheDataset(cache_dir), 8,
                              bucket_lengths=())
    assert sorted(int(x) for x in i_c) == sorted(ref)
    for i, e in zip(i_c, e_c):
        np.testing.assert_allclose(e, ref[int(i)], rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------- packing


def test_pack_nway_batch_integrity():
    """Every valid token survives packing exactly once, with per-segment
    position reset and the right gather positions; rows round up the
    static ladder and honor a pinned floor (executable reuse)."""
    import numpy as np

    from cldrd_tpu.data.packing import pack_nway_batch, rows_ladder

    rng = np.random.default_rng(0)
    bz, nway, L = 4, 8, 32
    lens = rng.integers(1, 14, size=(bz, nway))
    ids = rng.integers(1, 1000, size=(bz, nway, L)).astype(np.int32)
    mask = (np.arange(L)[None, None, :] < lens[:, :, None]).astype(np.int32)
    ids = ids * mask

    pb = pack_nway_batch(ids, mask)
    rows = pb.input_ids.shape[1]
    assert rows in rows_ladder(nway)
    assert rows < nway  # short rows must actually share bins

    for b in range(bz):
        flat_ids = pb.input_ids[b].reshape(-1)
        flat_pos = pb.position_ids[b].reshape(-1)
        flat_seg = pb.segment_ids[b].reshape(-1)
        for i in range(nway):
            n = int(lens[b, i])
            start = int(pb.gather_pos[b, i])
            np.testing.assert_array_equal(
                flat_ids[start:start + n], ids[b, i, :n])
            np.testing.assert_array_equal(
                flat_pos[start:start + n], np.arange(n))
            assert (flat_seg[start:start + n] == i + 1).all()
        # each token of the packed rows belongs to exactly one segment and
        # padding carries segment 0 everywhere
        assert ((flat_seg == 0) == (pb.attention_mask[b].reshape(-1) == 0)).all()
        counts = np.bincount(flat_seg, minlength=nway + 1)
        np.testing.assert_array_equal(counts[1:nway + 1], lens[b])

    # pinned floor: same batch packed with min_rows=nway stays at nway rows
    pb_floor = pack_nway_batch(ids, mask, min_rows=nway)
    assert pb_floor.input_ids.shape[1] == nway


# ------------------------------------------------- bucketed reranking


def test_reranking_bucketed_coverage_and_tokens(tmp_path):
    """``batches_bucketed`` scores every pair exactly once, in the
    smallest covering bucket, with tokens equal to the flat collation
    sliced to the bucket length (both modes)."""
    qpath = tmp_path / "q.tsv"
    ppath = tmp_path / "p.tsv"
    # word counts 1..20 -> varied joined lengths across the ladder
    qpath.write_text("".join(
        f"{q}\t{' '.join(f'qw{q}x{j}' for j in range(1 + q % 4))}\n"
        for q in range(6)))
    ppath.write_text("".join(
        f"{p}\t{' '.join(f'pw{p}x{j}' for j in range(1 + p % 20))}\n"
        for p in range(30)))
    run = tmp_path / "run.tsv"
    pairs = [(q, p) for q in range(6) for p in range(q * 5, q * 5 + 5)]
    run.write_text("".join(f"{q}\t{p}\t1\t0.0\n" for q, p in pairs))
    tok = HashTokenizer(vocab_size=512)

    for cross in (True, False):
        kw = (dict(is_cross_encoder=True, max_len=32) if cross else
              dict(is_cross_encoder=False, query_max_len=8, passage_max_len=32))
        ds = RerankingDataset(str(run), str(qpath), str(ppath), tok, **kw)
        flat = {}
        for b in ds.batches(8):
            toks = b.query_passage if cross else b.passage
            for r in range(b.n_valid):
                flat[(int(b.qids[r]), int(b.pids[r]))] = (
                    toks["input_ids"][r], toks["attention_mask"][r])
        seen = {}
        for b in ds.batches_bucketed(8, [8, 16, 32]):
            toks = b.query_passage if cross else b.passage
            L = toks["input_ids"].shape[1]
            assert L in (8, 16, 32)
            # token-balanced batch sizes: shorter buckets carry more rows
            assert toks["input_ids"].shape[0] == 8 * 32 // L
            for r in range(b.n_valid):
                key = (int(b.qids[r]), int(b.pids[r]))
                assert key not in seen
                seen[key] = L
                ids_flat, mask_flat = flat[key]
                np.testing.assert_array_equal(
                    toks["input_ids"][r], ids_flat[:L])
                np.testing.assert_array_equal(
                    toks["attention_mask"][r], mask_flat[:L])
                assert mask_flat[L:].sum() == 0  # smallest covering bucket
            # padding rows are fully zero / id -1
            assert (b.qids[b.n_valid:] == -1).all()
            assert (toks["input_ids"][b.n_valid:] == 0).all()
        assert set(seen) == set(pairs)
        # smallest covering bucket: the next ladder step down cannot fit
        for key, L in seen.items():
            need = int(
                ((flat[key][1] != 0)
                 * (np.arange(flat[key][1].shape[0]) + 1)).max())
            assert L == min(s for s in (8, 16, 32) if s >= need)


def test_token_type_ids_hash_and_hf_agree_on_contract():
    """token_type_ids (BERT segment ids): 0 over [CLS] q [SEP], 1 over
    p [SEP], 0 on padding — on both the hermetic HashTokenizer and a real
    trained-WordPiece HF adapter (fast Rust path and slow path)."""
    from cldrd_tpu.data.tokenization import (
        HashTokenizer,
        train_wordpiece_tokenizer,
    )

    queries = ["alpha beta", "gamma"]
    passages = ["delta epsilon zeta", "eta theta"]

    def check(out):
        ids, mask, types = (
            out["input_ids"], out["attention_mask"], out["token_type_ids"])
        assert types.shape == ids.shape
        for r in range(len(queries)):
            n = int(mask[r].sum())
            # padding carries type 0
            assert (types[r, n:] == 0).all()
            valid = types[r, :n]
            # starts at 0 (CLS+query), ends at 1 (passage side), one flip
            assert valid[0] == 0 and valid[-1] == 1
            assert int(np.abs(np.diff(valid)).sum()) == 1

    check(HashTokenizer(256)(queries, 16, pairs=passages,
                             return_token_type_ids=True))

    adapter = train_wordpiece_tokenizer(
        ["alpha beta gamma delta epsilon zeta eta theta"], vocab_size=64)
    fast = adapter(queries, 16, pairs=passages, return_token_type_ids=True)
    check(fast)
    # slow (non-Rust) path agrees exactly with the fast path
    adapter._backend = None
    slow = adapter(queries, 16, pairs=passages, return_token_type_ids=True)
    for k in fast:
        np.testing.assert_array_equal(fast[k], slow[k])
    # and omitting the flag keeps the legacy two-key contract
    assert set(HashTokenizer(256)(queries, 16, pairs=passages)) == {
        "input_ids", "attention_mask"}
