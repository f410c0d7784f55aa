"""RankingEvaluator parity tests.

Hand-computed cases plus (when /root/reference is mounted) a randomized
differential test against the reference implementation's metric core.
"""
import os
import sys

import numpy as np
import pytest

from cldrd_tpu.evaluation import RankingEvaluator, recall_from_files
from cldrd_tpu.evaluation.ms_marco_eval import compute_metrics_from_files

from conftest import REFERENCE_ROOT, reference_available


def write_qrels(path, rows, sep="\t"):
    with open(path, "w") as f:
        for qid, pid, grade in rows:
            f.write(f"{qid}{sep}0{sep}{pid}{sep}{grade}\n")


def write_run(path, rows):
    with open(path, "w") as f:
        for qid, pid, rank, score in rows:
            f.write(f"{qid}\t{pid}\t{rank}\t{score}\n")


def test_hand_computed_metrics(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    run = tmp_path / "run.tsv"
    # q1: relevant pid 11 at rank 2; q2: relevant pids 21 (rank 1) and 22 (rank 3)
    write_qrels(qrels, [(1, 11, 1), (2, 21, 1), (2, 22, 1)])
    write_run(
        run,
        [
            (1, 10, 1, 9.0),
            (1, 11, 2, 8.0),
            (1, 12, 3, 7.0),
            (2, 21, 1, 9.0),
            (2, 23, 2, 8.0),
            (2, 22, 3, 7.0),
        ],
    )
    ev = RankingEvaluator(str(qrels), mrr_at_k=[10], ndcg_at_k=[10], recall_at_k=[2, 10], map_at_k=10)
    m = ev.compute_metrics(str(run))

    assert m["QueriesRanked"] == 2
    # MRR@10: (1/2 + 1/1) / 2
    assert m["MRR@10"] == pytest.approx(0.75)
    assert m["QueriesWithRelevant@10"] == 2
    # Recall@2: q1: 1/1; q2: 1/2 -> 0.75 ; Recall@10: 1.0
    assert m["Recall@2"] == pytest.approx(0.75)
    assert m["Recall@10"] == pytest.approx(1.0)
    # MAP@10: q1: (1/2)/1 = .5 ; q2: (1/1 + 2/3)/2 = 5/6
    assert m["MAP@10"] == pytest.approx((0.5 + 5 / 6) / 2)
    # nDCG@10: q1: (1/log2(3)) / (1/log2(2)) ; q2: (1/log2(2)+1/log2(4)) / (1/log2(2)+1/log2(3))
    ndcg_q1 = (1 / np.log2(3)) / 1.0
    ndcg_q2 = (1 + 0.5) / (1 + 1 / np.log2(3))
    assert m["nDCG@10"] == pytest.approx((ndcg_q1 + ndcg_q2) / 2)


def test_graded_trec_binarization(tmp_path):
    qrels = tmp_path / "qrels.txt"
    run = tmp_path / "run.tsv"
    # TREC: grade 1 counts for nDCG but not for MRR/recall (binarization 2.0)
    write_qrels(qrels, [(1, 11, 1), (1, 12, 3)], sep=" ")
    write_run(run, [(1, 11, 1, 9.0), (1, 12, 2, 8.0)])
    ev = RankingEvaluator(str(qrels), mrr_at_k=[10], ndcg_at_k=[10], recall_at_k=[10], is_trec=True)
    m = ev.compute_metrics(str(run))
    # first binary-relevant (grade>=2) is pid 12 at rank 2
    assert m["MRR@10"] == pytest.approx(0.5)
    assert m["Recall@10"] == pytest.approx(1.0)  # 1 of 1 binary-relevant found
    # nDCG graded: dcg = 1/log2(2) + 3/log2(3); idcg = 3/log2(2) + 1/log2(3)
    dcg = 1 / np.log2(2) + 3 / np.log2(3)
    idcg = 3 / np.log2(2) + 1 / np.log2(3)
    assert m["nDCG@10"] == pytest.approx(dcg / idcg)


def test_query_not_in_qrels_skipped(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    run = tmp_path / "run.tsv"
    write_qrels(qrels, [(1, 11, 1)])
    write_run(run, [(1, 11, 1, 9.0), (99, 5, 1, 9.0)])
    ev = RankingEvaluator(str(qrels))
    m = ev.compute_metrics(str(run))
    assert m["QueriesRanked"] == 1
    assert m["MRR@10"] == pytest.approx(1.0)


def test_zero_grade_qrels_dropped(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    run = tmp_path / "run.tsv"
    write_qrels(qrels, [(1, 11, 0), (1, 12, 1)])
    write_run(run, [(1, 11, 1, 9.0), (1, 12, 2, 8.0)])
    ev = RankingEvaluator(str(qrels))
    m = ev.compute_metrics(str(run))
    assert m["MRR@10"] == pytest.approx(0.5)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_differential_vs_reference(tmp_path):
    """Randomized differential test against the reference evaluator."""
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "evaluation"))
    try:
        from retrieval_evaluator import RankingEvaluator as RefEvaluator
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(0)
    n_queries, corpus = 40, 500
    qrel_rows, run_rows = [], []
    for qid in range(n_queries):
        n_rel = rng.integers(1, 6)
        rel_pids = rng.choice(corpus, size=n_rel, replace=False)
        for pid in rel_pids:
            qrel_rows.append((qid, int(pid), int(rng.integers(1, 4))))
        ranked = rng.permutation(corpus)[:100]
        for rank, pid in enumerate(ranked, 1):
            run_rows.append((qid, int(pid), rank, float(100 - rank)))

    qrels = tmp_path / "qrels.tsv"
    run = tmp_path / "run.tsv"
    write_qrels(qrels, qrel_rows)
    write_run(run, run_rows)

    ours = RankingEvaluator(str(qrels)).compute_metrics(str(run))
    ref = RefEvaluator(str(qrels), is_trec=False).compute_metrics(str(run))
    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-12), k


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_differential_vs_reference_trec_graded(tmp_path):
    """TREC branch differential: space-separated graded qrels (0-3),
    binarization point 2.0 — reference ``retrieval_evaluator.py:20-27,68,75``."""
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "evaluation"))
    try:
        from retrieval_evaluator import RankingEvaluator as RefEvaluator
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(7)
    n_queries, corpus = 30, 400
    qrel_rows, run_rows = [], []
    for qid in range(n_queries):
        judged = rng.choice(corpus, size=rng.integers(4, 12), replace=False)
        for pid in judged:
            qrel_rows.append((qid, int(pid), int(rng.integers(0, 4))))
        ranked = rng.permutation(corpus)[:100]
        for rank, pid in enumerate(ranked, 1):
            run_rows.append((qid, int(pid), rank, float(100 - rank)))

    qrels = tmp_path / "qrels.trec.txt"
    run = tmp_path / "run.tsv"
    write_qrels(qrels, qrel_rows, sep=" ")  # TREC qrels are space-separated
    write_run(run, run_rows)

    ours = RankingEvaluator(str(qrels), is_trec=True).compute_metrics(str(run))
    ref = RefEvaluator(str(qrels), is_trec=True).compute_metrics(str(run))
    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-12), k


def test_ms_marco_eval_and_recall(tmp_path):
    qrels = tmp_path / "qrels.tsv"
    run = tmp_path / "run.tsv"
    write_qrels(qrels, [(1, 11, 1), (2, 21, 1), (3, 31, 1)])
    write_run(
        run,
        [(1, 11, 1, 9.0), (2, 5, 1, 9.0), (2, 21, 2, 8.0), (3, 7, 1, 3.0)],
    )
    m = compute_metrics_from_files(str(qrels), str(run))
    # q1: 1/1, q2: 1/2, q3: 0 -> /3 queries in qrels
    assert m["MRR @10"] == pytest.approx((1.0 + 0.5) / 3)
    assert m["QueriesRanked"] == 3

    r = recall_from_files(str(run), str(qrels), cutoff=1000)
    assert r == pytest.approx(2 / 3)
