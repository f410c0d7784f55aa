"""Teacher-data creation: bucketing semantics, curriculum file output,
teacher reranking, and the full create->train round trip."""
import json

import numpy as np
import pytest

from cldrd_tpu.data import (
    CURRICULUM_BUCKETS,
    NwayDataset,
    bucket_example,
    build_curriculum_files,
    rerank_candidates_with_teacher,
)
from cldrd_tpu.data.tokenization import HashTokenizer


def _scored(n, start=100.0):
    return [(pid, start - pid) for pid in range(n)]


def test_bucket_example_layout():
    rng = np.random.default_rng(0)
    ex = bucket_example(7, _scored(60), 5, 12, 13, rng)
    assert ex["qid"] == 7
    assert ex["relT_pids"] == list(range(5))            # top-5 by score
    assert ex["most_hard_pids"] == list(range(5, 17))   # next 12
    assert len(ex["semi_hard_pids"]) == 13
    assert set(ex["semi_hard_pids"]) <= set(range(17, 60))  # from the tail
    assert ex["relT_scores"] == [100.0 - p for p in range(5)]
    # deterministic under the same rng seed
    ex2 = bucket_example(7, _scored(60), 5, 12, 13, np.random.default_rng(0))
    assert ex2 == ex


def test_bucket_example_too_short():
    rng = np.random.default_rng(0)
    assert bucket_example(0, _scored(20), 20, 5, 5, rng) is None


def test_build_curriculum_files_roundtrip(tmp_path):
    qid_to_scored = {q: _scored(60) for q in range(4)}
    paths = build_curriculum_files(qid_to_scored, str(tmp_path) + "/")
    assert set(paths) == set(CURRICULUM_BUCKETS)
    # every stage file parses through the standard loader and into a dataset
    queries = tmp_path / "q.tsv"
    queries.write_text("".join(f"{q}\tquery {q}\n" for q in range(4)))
    passages = tmp_path / "p.tsv"
    passages.write_text("".join(f"{p}\tpassage {p}\n" for p in range(60)))

    stage_to_mode = {"5relT_25neg": "8", "10relT_20neg": "9",
                     "20relT_10neg": "10", "30relT": "6"}
    for stage, mode in stage_to_mode.items():
        ds = NwayDataset.create_from_files(
            str(queries), str(passages), paths[stage], HashTokenizer(64),
            max_query_len=6, max_passage_len=6, label_mode=mode,
        )
        assert len(ds) == 4
        batch = ds.collate([ds[0]])
        assert batch.labels.shape == (1, ds.nway)
        assert batch.teacher_scores.shape == (1, ds.nway)
        # teacher scores are sorted descending within the relT block
        rel_scores = batch.teacher_scores[0, : len(ds[0]["relT_pids"])]
        assert list(rel_scores) == sorted(rel_scores, reverse=True)


def test_rerank_candidates_with_teacher():
    qid_to_query = {0: "alpha query", 1: "beta query"}
    pid_to_passage = {p: f"passage {p}" for p in range(8)}
    ranklists = {0: [0, 1, 2, 3], 1: [4, 5, 6, 7]}

    def score_fn(batch):
        # teacher prefers high pids
        return batch.pids.astype(np.float32)

    out = rerank_candidates_with_teacher(
        ranklists, score_fn, qid_to_query, pid_to_passage,
        HashTokenizer(64), max_len=8, batch_size=3,  # forces ragged batches
    )
    assert [p for p, _ in out[0]] == [3, 2, 1, 0]
    assert [p for p, _ in out[1]] == [7, 6, 5, 4]
    assert out[1][0][1] == 7.0


def test_rerank_with_bert_teacher_bucketed_equals_flat():
    """A real (tiny, random-init) BERT cross-encoder teacher: token_type_ids
    flow through flat AND bucketed collation, and bucketing must not change
    any score (fp32). Covers the reference teacher's architecture
    (MiniLM-family, reference reranking_evaluator.py:292)."""
    import jax
    import jax.numpy as jnp

    from cldrd_tpu.evaluation import make_cross_encoder_score_fn
    from cldrd_tpu.models import BertConfig, CrossEncoder

    cfg = BertConfig.tiny()
    model = CrossEncoder(config=cfg, arch="bert", dtype=jnp.float32)
    dummy = {
        "input_ids": jnp.zeros((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
        "token_type_ids": jnp.zeros((1, 8), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(7), dummy)["params"]
    score_fn = make_cross_encoder_score_fn(model, params)

    rng = np.random.default_rng(7)
    qid_to_query = {q: f"query about topic{q}" for q in range(4)}
    pid_to_passage = {
        p: "passage " + " ".join(
            f"w{rng.integers(100)}" for _ in range(int(rng.integers(2, 20)))
        )
        for p in range(16)
    }
    ranklists = {q: list(range(q * 4, q * 4 + 4)) for q in range(4)}
    tok = HashTokenizer(cfg.vocab_size)

    flat = rerank_candidates_with_teacher(
        ranklists, score_fn, qid_to_query, pid_to_passage, tok,
        max_len=32, batch_size=4, with_token_type_ids=True,
    )
    bucketed = rerank_candidates_with_teacher(
        ranklists, score_fn, qid_to_query, pid_to_passage, tok,
        max_len=32, batch_size=4, bucket_lengths=[],
        with_token_type_ids=True,
    )
    assert set(flat) == set(bucketed)
    for q in flat:
        assert [p for p, _ in flat[q]] == [p for p, _ in bucketed[q]]
        np.testing.assert_allclose(
            [s for _, s in flat[q]], [s for _, s in bucketed[q]],
            rtol=1e-6, atol=1e-6,
        )

    # token types genuinely reach the model: zeroing them changes scores
    no_types = rerank_candidates_with_teacher(
        ranklists, score_fn, qid_to_query, pid_to_passage, tok,
        max_len=32, batch_size=4, with_token_type_ids=False,
    )
    diffs = [
        abs(dict(flat[q])[p] - dict(no_types[q])[p])
        for q in flat for p in dict(flat[q])
    ]
    assert max(diffs) > 1e-4
