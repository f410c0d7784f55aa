"""Full-pipeline quality differential (small scale, hermetic).

Drives ``examples/pipeline_differential.py``: torch HF towers + numpy fp32
exact search as the oracle vs our REAL CLI path (pth.tar conversion ->
cli.index -> cli.retrieve -> run file -> metrics) from identical weights,
scored by both our evaluator and the reference's own evaluator
(``/root/reference/evaluation/retrieval_evaluator.py:42-76``).

Stage 1 (shared embeddings) must match the oracle metric dict EXACTLY;
stage 2 (full CLI incl. encoder) must agree up to measured cross-framework
fp32 encoder jitter. The production-shaped verdict (20k passages, top-1000,
run on TPU) is recorded in PIPELINE_DIFF.json at the repo root.
"""
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "examples"))


def test_pipeline_differential_small(tmp_path):
    from pipeline_differential import main

    verdict = main([
        "--n-passages", "1536", "--n-queries", "96", "--topk", "100",
        "--layers", "2", "--dim", "64", "--heads", "2", "--hidden", "128",
        "--vocab-size", "2000", "--seq-len", "32", "--query-len", "16",
        "--workdir", str(tmp_path),
        "--json-out", str(tmp_path / "verdict.json"),
    ])
    s1 = verdict["stage1_shared_embeddings"]
    s2 = verdict["stage2_full_cli"]
    # stage 1: identical embeddings -> identical run files and metric
    # dicts, except order inside fp32-LSB score ties (numpy vs XLA
    # accumulation differ in the last bits — the FAISS equal-score caveat)
    assert s1["overlap_mean"] >= 0.9995, s1
    assert s1["disagreements_confined_to_score_ties"], s1
    assert s1["score_max_rel_diff"] <= 2e-5, s1
    assert s1["metric_max_abs_diff"] <= 1e-4, s1
    if s1["reference_evaluator_metric_max_abs_diff"] is not None:
        assert s1["reference_evaluator_metric_max_abs_diff"] <= 1e-4, s1
    # stage 2: full CLI including the encoder
    assert s2["overlap_mean"] >= 0.999, s2
    assert s2["disagreements_confined_to_score_ties"], s2
    assert s2["relevant_rank_agreement"] >= 0.99, s2
    assert s2["metric_max_abs_diff"] <= 5e-4, s2
    assert verdict["pass"], verdict
    assert json.load(open(tmp_path / "verdict.json"))["pass"]
