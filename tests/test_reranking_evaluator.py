"""Reranking-evaluator tests: dual/cross scoring paths, ranklist grouping,
direct metrics, rankdata writing, and checkpoint-folder evaluation."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cldrd_tpu.data.reranking_dataset import RerankingDataset
from cldrd_tpu.data.tokenization import HashTokenizer
from cldrd_tpu.evaluation import (
    ContinueRerankEvaluator,
    RerankingEvaluator,
    make_cross_encoder_score_fn,
    make_dual_encoder_score_fn,
    write_rankdata,
)
from cldrd_tpu.models import CrossEncoder, DistilBertConfig, NwayDualEncoder


@pytest.fixture()
def files(tmp_path):
    """Tiny corpus: 3 queries x 4 candidate passages, qrels marking one
    relevant passage each."""
    queries = tmp_path / "queries.tsv"
    queries.write_text("".join(f"{q}\tquery text {q}\n" for q in range(3)))
    passages = tmp_path / "passages.tsv"
    passages.write_text("".join(f"{p}\tpassage body {p}\n" for p in range(12)))
    run = tmp_path / "run.tsv"
    lines = []
    for q in range(3):
        for rank, p in enumerate(range(q * 4, q * 4 + 4), start=1):
            lines.append(f"{q}\t{p}\t{rank}\t{1.0/rank}\n")
    run.write_text("".join(lines))
    qrels = tmp_path / "qrels.tsv"
    # relevant pid per query: the *last* candidate (so identity scoring ranks it 4th)
    qrels.write_text("".join(f"{q}\t0\t{q*4+3}\t1\n" for q in range(3)))
    return dict(queries=str(queries), passages=str(passages), run=str(run),
                qrels=str(qrels), tmp=tmp_path)


def _dataset(files, cross):
    tok = HashTokenizer(vocab_size=512)
    if cross:
        return RerankingDataset(files["run"], files["queries"], files["passages"],
                                tok, is_cross_encoder=True, max_len=24)
    return RerankingDataset(files["run"], files["queries"], files["passages"],
                            tok, is_cross_encoder=False,
                            query_max_len=8, passage_max_len=12)


def test_direct_compute_metric(files):
    ev = RerankingEvaluator(files["qrels"], mrr_at_k=(1, 4), recall_at_k=(4,),
                            ndcg_at_k=(4,), map_at_k=4)
    # perfect ranklists: relevant pid first
    ranklists = {q: [q * 4 + 3] + list(range(q * 4, q * 4 + 3)) for q in range(3)}
    m = ev.direct_compute_metric(ranklists)
    assert m["MRR@1"] == pytest.approx(1.0)
    assert m["Recall@4"] == pytest.approx(1.0)
    assert m["QueriesRanked"] == 3


def test_oracle_score_fn_gets_perfect_metrics(files):
    """A score function that knows the qrels must reach MRR@1 == 1."""
    ev = RerankingEvaluator(files["qrels"], mrr_at_k=(1,), recall_at_k=(4,),
                            ndcg_at_k=(4,), map_at_k=4)
    ds = _dataset(files, cross=False)

    def oracle(batch):
        return np.asarray(
            [1.0 if p == (q * 4 + 3) else 0.0
             for q, p in zip(batch.qids, batch.pids)],
            np.float32,
        )

    m = ev.compute_metrics(oracle, ds, batch_size=5,
                           rankdata_path=str(files["tmp"] / "rank.tsv"))
    assert m["MRR@1"] == pytest.approx(1.0)
    # rankdata file is a valid 4-col run TSV with relevant pid first per query
    lines = open(files["tmp"] / "rank.tsv").read().splitlines()
    assert len(lines) == 12
    first = lines[0].split("\t")
    assert first[2] == "1" and int(first[1]) == int(first[0]) * 4 + 3


def test_dual_encoder_score_fn_runs(files):
    ds = _dataset(files, cross=False)
    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    batch = next(ds.batches(4))
    import jax

    params = model.init(jax.random.PRNGKey(0),
                        {k: jnp.asarray(v) for k, v in batch.query.items()},
                        {k: jnp.asarray(v)[:, None, :] for k, v in batch.passage.items()})["params"]
    fn = make_dual_encoder_score_fn(model, params)
    ev = RerankingEvaluator(files["qrels"], mrr_at_k=(4,), recall_at_k=(4,),
                            ndcg_at_k=(4,), map_at_k=4)
    m = ev.compute_metrics(fn, ds, batch_size=4)
    assert m["QueriesRanked"] == 3
    assert 0.0 <= m["MRR@4"] <= 1.0


def test_cross_encoder_score_fn_runs(files):
    ds = _dataset(files, cross=True)
    cfg = DistilBertConfig.tiny()
    model = CrossEncoder(config=cfg, dtype=jnp.float32)
    batch = next(ds.batches(4))
    import jax

    params = model.init(jax.random.PRNGKey(0),
                        {k: jnp.asarray(v) for k, v in batch.query_passage.items()})["params"]
    fn = make_cross_encoder_score_fn(model, params)
    ev = RerankingEvaluator(files["qrels"], mrr_at_k=(4,), recall_at_k=(4,),
                            ndcg_at_k=(4,), map_at_k=4)
    m = ev.compute_metrics(fn, ds, batch_size=4)
    assert m["QueriesRanked"] == 3


def test_continue_rerank_evaluator_folder(files, tmp_path):
    """Write two fake 'checkpoints'; the folder evaluator must produce a
    step-keyed results table."""
    folder = tmp_path / "ckpts"
    folder.mkdir()
    from flax import serialization

    for step, bias in ((10, 0.0), (20, 1.0)):
        blob = serialization.to_bytes({"bias": np.float32(bias)})
        (folder / f"checkpoint_{step}.msgpack").write_bytes(blob)

    ds = _dataset(files, cross=False)
    ev = RerankingEvaluator(files["qrels"], mrr_at_k=(1, 4), recall_at_k=(4,),
                            ndcg_at_k=(4,), map_at_k=4)

    def loader(path):
        from flax import serialization

        return serialization.msgpack_restore(open(path, "rb").read())

    def factory(params):
        # params['bias']==1.0 -> oracle; 0.0 -> anti-oracle
        def fn(batch):
            good = params["bias"] > 0.5
            return np.asarray(
                [(1.0 if (p == q * 4 + 3) == good else 0.0)
                 for q, p in zip(batch.qids, batch.pids)],
                np.float32,
            )
        return fn

    cre = ContinueRerankEvaluator(ev, ds, factory, loader, batch_size=4)
    results = cre.evaluate_folder(str(folder), results_path=str(tmp_path / "res.tsv"))
    assert set(results) == {10, 20}
    assert results[20]["MRR@1"] == pytest.approx(1.0)
    assert results[10]["MRR@1"] == pytest.approx(0.0)
    table = open(tmp_path / "res.tsv").read().splitlines()
    assert table[0].startswith("step\t")
    assert len(table) == 3


def test_bucketed_scoring_identical_to_flat(tmp_path):
    """``score_pairs(bucket_lengths=...)`` reproduces the flat layout's
    scores for every pair (padding is attention-masked) in both modes, so
    the bucketed teacher rerank and bucketed evaluation are pure speed."""
    import jax

    # varied text lengths so pairs actually spread across buckets
    qpath = tmp_path / "q.tsv"
    ppath = tmp_path / "p.tsv"
    qpath.write_text("".join(
        f"{q}\t{' '.join(f'qq{q}w{j}' for j in range(1 + q % 3))}\n"
        for q in range(4)))
    ppath.write_text("".join(
        f"{p}\t{' '.join(f'pp{p}w{j}' for j in range(1 + p % 16))}\n"
        for p in range(20)))
    run = tmp_path / "run.tsv"
    run.write_text("".join(
        f"{q}\t{p}\t1\t0.0\n" for q in range(4)
        for p in range(q * 5, q * 5 + 5)))
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("".join(f"{q}\t0\t{q*5}\t1\n" for q in range(4)))
    tok = HashTokenizer(vocab_size=512)
    cfg = DistilBertConfig.tiny()
    ev = RerankingEvaluator(str(qrels), mrr_at_k=(5,), recall_at_k=(5,),
                            ndcg_at_k=(5,), map_at_k=5)

    # cross-encoder mode
    ds = RerankingDataset(str(run), str(qpath), str(ppath), tok,
                          is_cross_encoder=True, max_len=32)
    model = CrossEncoder(config=cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 8), jnp.int32),
         "attention_mask": jnp.ones((1, 8), jnp.int32)})["params"]
    fn = make_cross_encoder_score_fn(model, params)
    flat = ev.score_pairs(fn, ds, batch_size=8)
    buck = ev.score_pairs(fn, ds, batch_size=8, bucket_lengths=[8, 16, 32])
    assert set(flat) == set(buck)
    for qid in flat:
        f = dict(flat[qid])
        b = dict(buck[qid])
        assert set(f) == set(b)
        for pid in f:
            np.testing.assert_allclose(b[pid], f[pid], rtol=1e-6, atol=1e-6)

    # dual-encoder mode (buckets the passage tower only)
    ds2 = RerankingDataset(str(run), str(qpath), str(ppath), tok,
                           is_cross_encoder=False,
                           query_max_len=8, passage_max_len=32)
    model2 = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    params2 = model2.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 8), jnp.int32),
         "attention_mask": jnp.ones((1, 8), jnp.int32)},
        {"input_ids": jnp.zeros((1, 1, 8), jnp.int32),
         "attention_mask": jnp.ones((1, 1, 8), jnp.int32)})["params"]
    fn2 = make_dual_encoder_score_fn(model2, params2)
    flat2 = ev.score_pairs(fn2, ds2, batch_size=8)
    buck2 = ev.score_pairs(fn2, ds2, batch_size=8, bucket_lengths=[])
    for qid in flat2:
        f = dict(flat2[qid])
        b = dict(buck2[qid])
        assert set(f) == set(b)
        for pid in f:
            np.testing.assert_allclose(b[pid], f[pid], rtol=1e-6, atol=1e-6)

    # the teacher path plumbs the same knob end-to-end
    from cldrd_tpu.data.loaders import load_passages, load_queries
    from cldrd_tpu.data.teacher import rerank_candidates_with_teacher

    ranklists = {q: list(range(q * 5, q * 5 + 5)) for q in range(4)}
    scored_flat = rerank_candidates_with_teacher(
        ranklists, fn, load_queries(str(qpath)), load_passages(str(ppath)),
        tok, max_len=32, batch_size=8)
    scored_buck = rerank_candidates_with_teacher(
        ranklists, fn, load_queries(str(qpath)), load_passages(str(ppath)),
        tok, max_len=32, batch_size=8, bucket_lengths=[8, 16, 32])
    for q in ranklists:
        assert [p for p, _ in scored_flat[q]] == [p for p, _ in scored_buck[q]]
        np.testing.assert_allclose(
            [s for _, s in scored_flat[q]], [s for _, s in scored_buck[q]],
            rtol=1e-6, atol=1e-6)


def test_packed_pair_scoring_identical_to_flat(tmp_path):
    """``batches_packed`` + CrossEncoder's packed path reproduce the flat
    per-pair scores exactly in fp32 (segment isolation + position reset),
    through score_pairs, the teacher rerank, and with ragged tails."""
    import jax

    qpath = tmp_path / "q.tsv"
    ppath = tmp_path / "p.tsv"
    qpath.write_text("".join(
        f"{q}\t{' '.join(f'qq{q}w{j}' for j in range(1 + q % 3))}\n"
        for q in range(4)))
    ppath.write_text("".join(
        f"{p}\t{' '.join(f'pp{p}w{j}' for j in range(1 + p % 16))}\n"
        for p in range(20)))
    run = tmp_path / "run.tsv"
    run.write_text("".join(
        f"{q}\t{p}\t1\t0.0\n" for q in range(4)
        for p in range(q * 5, q * 5 + 5)))
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("".join(f"{q}\t0\t{q*5}\t1\n" for q in range(4)))
    tok = HashTokenizer(vocab_size=512)
    cfg = DistilBertConfig.tiny()
    ev = RerankingEvaluator(str(qrels), mrr_at_k=(5,), recall_at_k=(5,),
                            ndcg_at_k=(5,), map_at_k=5)

    ds = RerankingDataset(str(run), str(qpath), str(ppath), tok,
                          is_cross_encoder=True, max_len=32)
    model = CrossEncoder(config=cfg, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 8), jnp.int32),
         "attention_mask": jnp.ones((1, 8), jnp.int32)})["params"]
    fn = make_cross_encoder_score_fn(model, params)

    # packed batches actually share rows and carry the full contract
    b0 = next(ds.batches_packed(8, row_multiple=2))
    assert b0.query_passage["input_ids"].shape[0] < 8  # rows < pairs
    assert set(b0.query_passage) == {
        "input_ids", "attention_mask", "position_ids", "segment_ids",
        "gather_pos"}

    flat = ev.score_pairs(fn, ds, batch_size=8)
    packed = ev.score_pairs(fn, ds, batch_size=8, pack_pairs=True)
    assert set(flat) == set(packed)
    for qid in flat:
        f, b = dict(flat[qid]), dict(packed[qid])
        assert set(f) == set(b)
        for pid in f:
            np.testing.assert_allclose(b[pid], f[pid], rtol=1e-6, atol=1e-6)

    # ragged tail: 20 pairs in batches of 16 -> final batch 4 valid pairs
    packed_ragged = ev.score_pairs(fn, ds, batch_size=16, pack_pairs=True)
    for qid in flat:
        f, b = dict(flat[qid]), dict(packed_ragged[qid])
        for pid in f:
            np.testing.assert_allclose(b[pid], f[pid], rtol=1e-6, atol=1e-6)

    # teacher path end-to-end
    from cldrd_tpu.data.loaders import load_passages, load_queries
    from cldrd_tpu.data.teacher import rerank_candidates_with_teacher

    ranklists = {q: list(range(q * 5, q * 5 + 5)) for q in range(4)}
    s_flat = rerank_candidates_with_teacher(
        ranklists, fn, load_queries(str(qpath)), load_passages(str(ppath)),
        tok, max_len=32, batch_size=8)
    s_pack = rerank_candidates_with_teacher(
        ranklists, fn, load_queries(str(qpath)), load_passages(str(ppath)),
        tok, max_len=32, batch_size=8, pack_pairs=True)
    for q in ranklists:
        assert [p for p, _ in s_flat[q]] == [p for p, _ in s_pack[q]]

    # dual mode refuses
    ds2 = RerankingDataset(str(run), str(qpath), str(ppath), tok,
                           is_cross_encoder=False,
                           query_max_len=8, passage_max_len=32)
    with pytest.raises(ValueError, match="cross-encoder"):
        next(ds2.batches_packed(8))
