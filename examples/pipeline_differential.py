"""Full-pipeline quality differential: torch + numpy-fp32 oracle vs the real CLI path.

The strongest achievable substitute for reproducing the reference's published
MS MARCO numbers (``/root/reference/README.md:35``) in this no-network
environment: prove that, starting from IDENTICAL weights, our entire
inference pipeline — weight conversion -> corpus encode -> index build ->
top-k search -> run file -> metrics — produces the same metric dict as an
independent oracle built from torch (HF ``DistilBertModel``) and numpy fp32
brute-force search, evaluated by the REFERENCE's own evaluator
(``/root/reference/evaluation/retrieval_evaluator.py:42-76``).

Oracle path (mirrors ``/root/reference/retriever/retrieve_top_passages.py:88-109``):
  HF torch towers -> CLS fp32 embeddings -> numpy fp32 exact top-k ->
  ``qid\\tpid\\trank\\tscore`` run file.
Our path (the production CLI, nothing mocked):
  same torch weights saved as a reference-layout ``checkpoint_*.pth.tar`` ->
  ``cli.index --store-dtype float32 --compute-dtype float32`` ->
  ``cli.retrieve --hbm-dtype float32 --precision highest`` -> run file.

Verdict (one JSON line): metric dicts from BOTH evaluators (ours and the
reference's) on BOTH run files, per-query top-k id overlap, and agreement of
every relevant document's rank. Pass = metric dicts equal AND mean overlap
>= 0.999.

Corpus construction note: each query is a prefix of its relevant passage, so
even a randomly initialized encoder separates the relevant document from the
~N random-text distractors by a wide margin (near-identical token sequences
=> near-identical CLS embeddings). Rank-1 margins are then far larger than
the ~1e-6 cross-framework fp32 encoder jitter, which makes exact metric
equality a sound requirement; only the deep tail (ties among random
distractors) may reorder, which the 0.999 overlap threshold absorbs.

Run (small, CPU, ~2 min):
  python examples/pipeline_differential.py --n-passages 1536 --n-queries 128 \
      --topk 100 --layers 2 --dim 64 --heads 2 --hidden 128 --workdir /tmp/pd
Run (production-shaped, TPU for our side):
  python examples/pipeline_differential.py --n-passages 20480 --n-queries 512 \
      --topk 1000 --layers 4 --dim 256 --heads 4 --hidden 1024
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_EVALUATOR = "/root/reference/evaluation/retrieval_evaluator.py"


# --------------------------------------------------------------- corpus


def synth_corpus(workdir: str, n_passages: int, n_queries: int, seed: int):
    """MS MARCO-shaped synthetic data: TSV collection + queries.

    Passage texts are random words from a closed vocabulary; each query is
    the leading words of one passage (queries resemble documents, as in
    real retrieval). Qrels are derived LATER from the oracle ranking (see
    ``qrels_from_oracle``) so metric values are nonzero and rank-sensitive
    at several depths even under a randomly initialized encoder."""
    rng = np.random.default_rng(seed)
    vocab = [f"word{w:04d}" for w in range(2000)]
    q_path = os.path.join(workdir, "queries.tsv")
    c_path = os.path.join(workdir, "collection.tsv")
    with open(c_path, "w") as fc, open(q_path, "w") as fq:
        for pid in range(n_passages):
            words = [vocab[i] for i in rng.integers(0, len(vocab), 24)]
            text = " ".join(words)
            fc.write(f"{pid}\t{text}\n")
            if pid < n_queries:
                fq.write(f"{pid}\t{' '.join(words[:8])}\n")
    return q_path, c_path


QREL_DEPTHS = (1, 3, 7, 15, 40)


def qrels_from_oracle(oracle_run: str, r_path: str, topk: int):
    """Relevance labels at the oracle's ranks ``QREL_DEPTHS`` per query.

    This makes every metric in the dict depend on EXACT rank agreement
    between the two pipelines at shallow and mid depths (MRR@10 sees depth
    1-7, Recall@50 sees depth 40, MAP/nDCG see all of them) — a much
    stronger differential than labels a random encoder would never rank."""
    by_qid = load_run(oracle_run)
    qrels = {}
    with open(r_path, "w") as fr:
        for qid, rows in by_qid.items():
            pids = [pid for _, pid, _ in rows]
            rels = [pids[d - 1] for d in QREL_DEPTHS if d <= len(pids)]
            for pid in rels:
                fr.write(f"{qid}\t0\t{pid}\t1\n")
            qrels[qid] = rels
    return qrels


# --------------------------------------------------------------- oracle


def build_torch_towers(args, seed: int):
    import torch
    from transformers import DistilBertConfig as HFConfig
    from transformers import DistilBertModel

    cfg = HFConfig(
        vocab_size=args.vocab_size,
        max_position_embeddings=128,
        n_layers=args.layers,
        n_heads=args.heads,
        dim=args.dim,
        hidden_dim=args.hidden,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(seed)
    query_tower = DistilBertModel(cfg).eval()
    passage_tower = DistilBertModel(cfg).eval()
    return query_tower, passage_tower


def save_reference_checkpoint(path: str, query_tower, passage_tower) -> None:
    """Reference-layout ``checkpoint_<step>.pth.tar``: DDP ``module.``
    prefixes + ``query_encoder``/``passage_encoder`` towers + training
    bookkeeping (``nway_listwise_1.py:61-65,418-426``)."""
    import torch

    sd = {}
    for k, v in query_tower.state_dict().items():
        sd[f"module.query_encoder.{k}"] = v
    for k, v in passage_tower.state_dict().items():
        sd[f"module.passage_encoder.{k}"] = v
    torch.save({"epoch": 0, "global_step": 100, "state_dict": sd}, path)


def torch_encode(tower, adapter, texts, max_length: int, batch_size: int = 64):
    import torch

    out = []
    with torch.no_grad():
        for s in range(0, len(texts), batch_size):
            tb = adapter(texts[s : s + batch_size], max_length)
            res = tower(
                input_ids=torch.from_numpy(tb["input_ids"]).long(),
                attention_mask=torch.from_numpy(tb["attention_mask"]).long(),
            )
            out.append(res.last_hidden_state[:, 0, :].numpy().astype(np.float32))
    return np.concatenate(out)


def numpy_topk_run_file(path, q_embs, p_embs, qids, pids, k, block=4096):
    """Exact fp32 brute-force MIPS -> reference-format run file."""
    nq = len(qids)
    k = min(k, len(pids))
    with open(path, "w") as f:
        for s in range(0, nq, block):
            scores = q_embs[s : s + block] @ p_embs.T  # fp32
            idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
            part = np.take_along_axis(scores, idx, axis=1)
            order = np.argsort(-part, axis=1, kind="stable")
            top = np.take_along_axis(idx, order, axis=1)
            top_s = np.take_along_axis(part, order, axis=1)
            for row in range(top.shape[0]):
                qid = int(qids[s + row])
                for rank in range(k):
                    f.write(
                        f"{qid}\t{int(pids[top[row, rank]])}\t{rank + 1}\t"
                        f"{float(top_s[row, rank])}\n"
                    )


# --------------------------------------------------------------- compare


def load_run(path):
    by_qid = {}
    for line in open(path):
        qid, pid, rank, score = line.rstrip("\n").split("\t")
        by_qid.setdefault(int(qid), []).append((int(rank), int(pid), float(score)))
    for v in by_qid.values():
        v.sort()
    return by_qid


def _ties_confined(ids_a, s_a, ids_b, s_b, eps):
    """True iff every disagreement between the two rankings is a
    floating-point tie: order differences sit inside contiguous blocks
    whose id membership matches and whose score spread is <= eps in BOTH
    rankings, and membership differences (an id present in only one list)
    occur only at the top-k boundary among scores within eps of the k-th
    score. Tie order across backends is undefined (numpy SIMD vs MXU
    accumulation differ in the LSBs — the same caveat FAISS documents for
    equal-score results)."""
    only_a = set(ids_a) - set(ids_b)
    only_b = set(ids_b) - set(ids_a)
    if only_a or only_b:
        sa = dict(zip(ids_a, s_a))
        sb = dict(zip(ids_b, s_b))
        for pid in only_a:  # must be a tie with the other list's boundary
            if abs(sa[pid] - s_b[-1]) > eps:
                return False
        for pid in only_b:
            if abs(sb[pid] - s_a[-1]) > eps:
                return False
        kept_a = [(i, s) for i, s in zip(ids_a, s_a) if i not in only_a]
        kept_b = [(i, s) for i, s in zip(ids_b, s_b) if i not in only_b]
        ids_a = [i for i, _ in kept_a]
        s_a = [s for _, s in kept_a]
        ids_b = [i for i, _ in kept_b]
        s_b = [s for _, s in kept_b]
        if len(ids_a) != len(ids_b):
            return False
    n = len(ids_a)
    i = 0
    while i < n:
        if ids_a[i] == ids_b[i]:
            i += 1
            continue
        j = i
        while j < n and set(ids_a[i : j + 1]) != set(ids_b[i : j + 1]):
            j += 1
        if j >= n:
            return False
        if max(s_a[i : j + 1]) - min(s_a[i : j + 1]) > eps:
            return False
        if max(s_b[i : j + 1]) - min(s_b[i : j + 1]) > eps:
            return False
        i = j + 1
    return True


def compare_runs(oracle_path, ours_path, qrels, tie_eps_rel=2e-5):
    a, b = load_run(oracle_path), load_run(ours_path)
    assert set(a) == set(b), "query sets differ"
    overlaps, order_equal, rel_agree, rel_total = [], 0, 0, 0
    ties_ok, score_diffs = True, []
    for qid in a:
        ids_a = [pid for _, pid, _ in a[qid]]
        ids_b = [pid for _, pid, _ in b[qid]]
        s_a = [s for _, _, s in a[qid]]
        s_b = [s for _, _, s in b[qid]]
        overlaps.append(len(set(ids_a) & set(ids_b)) / max(len(ids_a), 1))
        order_equal += ids_a == ids_b
        scale = max(abs(s_a[0]), abs(s_a[-1]), 1.0)
        if ids_a != ids_b:
            ties_ok &= _ties_confined(ids_a, s_a, ids_b, s_b,
                                      tie_eps_rel * scale)
        # same-rank score agreement (well-defined even when tie order
        # flips, since tied scores agree to eps by definition)
        score_diffs.append(
            max(abs(x - y) for x, y in zip(s_a, s_b)) / scale
            if len(s_a) == len(s_b) else float("inf")
        )
        for rel in qrels.get(qid, ()):
            rank_a = ids_a.index(rel) + 1 if rel in ids_a else None
            rank_b = ids_b.index(rel) + 1 if rel in ids_b else None
            rel_agree += rank_a == rank_b
            rel_total += 1
    return {
        "overlap_mean": float(np.mean(overlaps)),
        "overlap_min": float(np.min(overlaps)),
        "exact_order_agreement": order_equal / len(a),
        "disagreements_confined_to_score_ties": bool(ties_ok),
        "score_max_rel_diff": float(np.max(score_diffs)),
        "relevant_rank_agreement": rel_agree / max(rel_total, 1),
    }


def reference_metrics(qrels_path, run_path):
    """Evaluate with the REFERENCE's own RankingEvaluator (imported from
    /root/reference — public untrusted content, used read-only as a test
    oracle)."""
    if not os.path.exists(REFERENCE_EVALUATOR):
        return None
    spec = importlib.util.spec_from_file_location(
        "_ref_retrieval_evaluator", REFERENCE_EVALUATOR
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    evaluator = mod.RankingEvaluator(qrels_path)
    metrics = evaluator.compute_metrics(run_path)
    if isinstance(metrics, tuple):
        metrics = metrics[0]
    return {k: float(v) for k, v in metrics.items()}


def dict_max_diff(a, b):
    keys = sorted(set(a) & set(b))
    assert keys, "no shared metric keys"
    return max(abs(a[k] - b[k]) for k in keys)


# ----------------------------------------------------------------- main


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None)
    p.add_argument("--n-passages", type=int, default=20480)
    p.add_argument("--n-queries", type=int, default=512)
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--vocab-size", type=int, default=5000)
    p.add_argument("--seq-len", type=int, default=48)
    p.add_argument("--query-len", type=int, default=24)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    workdir = args.workdir or tempfile.mkdtemp(prefix="pipeline_diff_")
    os.makedirs(workdir, exist_ok=True)
    print(f"workdir: {workdir}")

    t0 = time.perf_counter()
    q_path, c_path = synth_corpus(
        workdir, args.n_passages, args.n_queries, args.seed
    )

    # one REAL WordPiece tokenizer, shared verbatim by both pipelines
    from cldrd_tpu.data.tokenization import train_wordpiece_tokenizer

    corpus_texts = [l.split("\t", 1)[1].strip() for l in open(c_path)]
    adapter = train_wordpiece_tokenizer(corpus_texts, vocab_size=args.vocab_size)
    tok_dir = os.path.join(workdir, "tokenizer")
    adapter.tokenizer.save_pretrained(tok_dir)

    # identical weights for both pipelines, via the reference checkpoint
    # format (the same artifact a real CL-DRD training run would hand over)
    query_tower, passage_tower = build_torch_towers(args, args.seed)
    ckpt = os.path.join(workdir, "checkpoint_100.pth.tar")
    save_reference_checkpoint(ckpt, query_tower, passage_tower)

    # ---------------- oracle: torch encode + numpy fp32 exact search
    t1 = time.perf_counter()
    query_texts = [l.split("\t", 1)[1].strip() for l in open(q_path)]
    p_embs = torch_encode(passage_tower, adapter, corpus_texts, args.seq_len)
    q_embs = torch_encode(query_tower, adapter, query_texts, args.query_len)
    oracle_run = os.path.join(workdir, "oracle.run.tsv")
    numpy_topk_run_file(
        oracle_run, q_embs, p_embs,
        np.arange(args.n_queries), np.arange(args.n_passages), args.topk,
    )
    t_oracle = time.perf_counter() - t1
    print(f"oracle done in {t_oracle:.1f}s")

    # relevance labels at the oracle's own ranks (depths 1/3/7/15/40):
    # every metric now measures exact rank agreement between pipelines
    qrels_path = os.path.join(workdir, "qrels.tsv")
    qrels = qrels_from_oracle(oracle_run, qrels_path, args.topk)

    # ---------------- stage 1: SHARED embeddings -> our index/search/run/
    # metrics vs the numpy oracle. From identical inputs the device path
    # must reproduce the oracle metric dict exactly — this isolates
    # index build + top-k search + run-file writing + metric core from
    # cross-framework encoder jitter (stage 2 measures that separately).
    import jax.numpy as jnp

    from cldrd_tpu.index import FlatIPIndex
    from cldrd_tpu.search import retrieve_to_run_file

    stage1_index = FlatIPIndex.build(
        p_embs, np.arange(args.n_passages), dtype=jnp.float32,
        precision="highest",
    )
    stage1_run = os.path.join(workdir, "stage1.run.tsv")
    retrieve_to_run_file(
        stage1_index, q_embs, np.arange(args.n_queries), stage1_run,
        topk=args.topk, batch_size=128,
    )

    # ---------------- ours: the real CLI path, nothing mocked
    t2 = time.perf_counter()
    from cldrd_tpu.cli import index as cli_index
    from cldrd_tpu.cli import retrieve as cli_retrieve

    model_cfg = json.dumps({
        "vocab_size": args.vocab_size, "max_position_embeddings": 128,
        "n_layers": args.layers, "n_heads": args.heads, "dim": args.dim,
        "hidden_dim": args.hidden,
    })
    index_dir = os.path.join(workdir, "index")
    rc = cli_index.main([
        "--collection", c_path, "--checkpoint", ckpt, "--out", index_dir,
        "--model-config", model_cfg, "--tokenizer", tok_dir,
        "--max-length", str(args.seq_len), "--batch-size", "256",
        "--store-dtype", "float32", "--compute-dtype", "float32",
    ])
    assert rc == 0
    ours_run = os.path.join(workdir, "ours.run.tsv")
    rc = cli_retrieve.main([
        "--index", index_dir, "--queries", q_path, "--checkpoint", ckpt,
        "--run", ours_run, "--model-config", model_cfg, "--tokenizer", tok_dir,
        "--max-length", str(args.query_len), "--topk", str(args.topk),
        "--encode-batch-size", "256", "--search-batch-size", "128",
        "--hbm-dtype", "float32", "--precision", "highest",
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    t_ours = time.perf_counter() - t2
    print(f"our pipeline done in {t_ours:.1f}s")

    # ---------------- compare
    from cldrd_tpu.evaluation import RankingEvaluator

    our_eval = RankingEvaluator(qrels_path)

    def our_metrics(run_path):
        return {k: float(v) for k, v in our_eval.compute_metrics(run_path).items()}

    m_oracle_oursEval = our_metrics(oracle_run)
    m_oracle_refEval = reference_metrics(qrels_path, oracle_run)

    # stage 1: shared embeddings -> device pipeline must match exactly
    # modulo fp32-LSB score ties (tie eps 2e-5 relative)
    s1_cmp = compare_runs(oracle_run, stage1_run, qrels, tie_eps_rel=2e-5)
    s1_metric_diff = dict_max_diff(m_oracle_oursEval, our_metrics(stage1_run))
    s1_ref = reference_metrics(qrels_path, stage1_run)
    s1_ref_diff = (
        dict_max_diff(m_oracle_refEval, s1_ref) if s1_ref is not None else None
    )

    # stage 2: full CLI path incl. the encoder. Residual disagreement is
    # cross-framework fp32 encoder jitter (torch/oneDNN vs XLA, ~1e-6 per
    # activation) flipping near-tied distractor pairs; the measured
    # embedding delta is reported so the tolerance is accounted for.
    from cldrd_tpu.index import read_embeddings

    our_p_embs, our_pids = read_embeddings(index_dir)
    order = np.argsort(our_pids)
    emb_jitter = float(np.max(np.abs(our_p_embs[order] - p_embs)))
    emb_scale = float(np.max(np.abs(p_embs)))

    s2_cmp = compare_runs(oracle_run, ours_run, qrels, tie_eps_rel=1e-3)
    s2_metric_diff = dict_max_diff(m_oracle_oursEval, our_metrics(ours_run))
    s2_ref = reference_metrics(qrels_path, ours_run)
    s2_ref_diff = (
        dict_max_diff(m_oracle_refEval, s2_ref) if s2_ref is not None else None
    )

    verdict = {
        "n_passages": args.n_passages,
        "n_queries": args.n_queries,
        "topk": args.topk,
        "stage1_shared_embeddings": {
            **s1_cmp,
            "metric_max_abs_diff": s1_metric_diff,
            "reference_evaluator_metric_max_abs_diff": s1_ref_diff,
        },
        "stage2_full_cli": {
            **s2_cmp,
            "metric_max_abs_diff": s2_metric_diff,
            "reference_evaluator_metric_max_abs_diff": s2_ref_diff,
            "encoder_embedding_max_abs_delta": emb_jitter,
            "embedding_scale": emb_scale,
        },
        "mrr_at_10": m_oracle_oursEval.get("MRR@10"),
        "oracle_seconds": round(t_oracle, 1),
        "ours_seconds": round(t_ours, 1),
        "total_seconds": round(time.perf_counter() - t0, 1),
        "pass": bool(
            # stage 1: identical embeddings -> identical run files and
            # metric dicts, except order inside fp32-LSB score ties
            s1_cmp["overlap_mean"] >= 0.9995
            and s1_cmp["disagreements_confined_to_score_ties"]
            and s1_cmp["score_max_rel_diff"] <= 2e-5
            and s1_metric_diff <= 1e-4
            and (s1_ref_diff is None or s1_ref_diff <= 1e-4)
            # stage 2: near-tie flips from fp32 encoder jitter only
            and s2_cmp["overlap_mean"] >= 0.999
            and s2_cmp["disagreements_confined_to_score_ties"]
            and s2_cmp["relevant_rank_agreement"] >= 0.99
            and s2_metric_diff <= 5e-4
            and emb_jitter <= 1e-4 * max(emb_scale, 1.0)
        ),
    }
    line = json.dumps(verdict)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    return verdict


if __name__ == "__main__":
    v = main()
    sys.exit(0 if v["pass"] else 1)
