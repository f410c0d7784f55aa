"""CLI end-to-end: train -> index -> retrieve -> evaluate on a tiny synthetic
MS MARCO-style corpus, entirely through the command-line entrypoints
(in-process mains, tiny model, hermetic hash tokenizer)."""
import json
import os

import numpy as np
import pytest

from cldrd_tpu.cli import curriculum as cli_curriculum
from cldrd_tpu.cli import evaluate as cli_evaluate
from cldrd_tpu.cli import index as cli_index
from cldrd_tpu.cli import retrieve as cli_retrieve
from cldrd_tpu.cli import retrieve_queries as cli_retrieve_queries
from cldrd_tpu.cli import train as cli_train


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    """16 queries; each query's relevant passage shares its exact wording."""
    tmp = tmp_path_factory.mktemp("cli_corpus")
    n_q = 16
    queries, passages, train_lines, qrels = [], [], [], []
    pid = 0
    rng = np.random.default_rng(0)
    for q in range(n_q):
        # query and its relevant passage share a unique token (subject{q}),
        # so full-corpus retrieval is learnable from per-query candidates
        queries.append(f"{q}\tfind subject{q} info\n")
        rel = pid
        passages.append(f"{pid}\tdocument with subject{q} info inside\n")
        pid += 1
        negs = []
        for _ in range(5):
            passages.append(f"{pid}\tnoise {rng.integers(10**6)} text {rng.integers(10**6)}\n")
            negs.append(pid)
            pid += 1
        train_lines.append(json.dumps({
            "qid": q, "relT_pids": [rel],
            "most_hard_pids": negs[:3], "semi_hard_pids": negs[3:],
        }) + "\n")
        qrels.append(f"{q}\t0\t{rel}\t1\n")
    paths = {
        "queries": str(tmp / "queries.tsv"),
        "passages": str(tmp / "collection.tsv"),
        "train": str(tmp / "train.jsonl"),
        "qrels": str(tmp / "qrels.tsv"),
        "tmp": tmp,
    }
    open(paths["queries"], "w").write("".join(queries))
    open(paths["passages"], "w").write("".join(passages))
    open(paths["train"], "w").write("".join(train_lines))
    open(paths["qrels"], "w").write("".join(qrels))
    return paths


def test_cli_pipeline(corpus_files, tmp_path):
    f = corpus_files
    run_folder = str(tmp_path / "runs")

    # 1. train one iteration (tiny model, label mode 1: 1 relT + 5 neg)
    rc = cli_train.main([
        "--queries-path", f["queries"], "--passages-path", f["passages"],
        "--training-path", f["train"], "--label-mode", "1",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--batch-size", "8", "--num-train-epochs", "8",
        "--learning-rate", "2e-3", "--warmup-steps", "2",
        "--max-query-len", "12", "--max-passage-len", "16",
        "--compute-dtype", "float32",
        "--run-folder", run_folder, "--experiment-name", "it1",
        "--logging-steps", "4", "--evaluate-steps", "100",
    ])
    assert rc == 0
    ckpts = [p for p in os.listdir(os.path.join(run_folder, "it1"))
             if p.endswith(".msgpack")]
    assert ckpts, "training wrote no checkpoint"
    ckpt = os.path.join(run_folder, "it1", sorted(ckpts)[-1])

    # 2. build the index from the trained checkpoint
    index_dir = str(tmp_path / "index")
    rc = cli_index.main([
        "--collection", f["passages"], "--checkpoint", ckpt,
        "--out", index_dir, "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "32",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(index_dir, "meta.json"))

    # 3. retrieve top-5 per query
    run_path = str(tmp_path / "dev.run.tsv")
    rc = cli_retrieve.main([
        "--index", index_dir, "--queries", f["queries"],
        "--checkpoint", ckpt, "--run", run_path,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--topk", "5",
        "--encode-batch-size", "32", "--search-batch-size", "8",
    ])
    assert rc == 0

    # 4a. run-file structure: 16 queries x 5 candidates, scores descending
    rows = [l.split("\t") for l in open(run_path).read().splitlines()]
    assert len(rows) == 16 * 5
    by_qid = {}
    for qid, pid, rank, score in rows:
        by_qid.setdefault(int(qid), []).append((int(rank), float(score)))
    assert set(by_qid) == set(range(16))
    for ranked in by_qid.values():
        assert [r for r, _ in ranked] == [1, 2, 3, 4, 5]
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)

    # 3b. the int8 quantized HBM store retrieves the same ranking on this
    #     well-separated corpus (per-row-scaled codes; half the HBM)
    run_int8 = str(tmp_path / "dev.int8.run.tsv")
    rc = cli_retrieve.main([
        "--index", index_dir, "--queries", f["queries"],
        "--checkpoint", ckpt, "--run", run_int8,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--topk", "5", "--hbm-dtype", "int8",
        "--encode-batch-size", "32", "--search-batch-size", "8",
    ])
    assert rc == 0

    def ranked_by_qid(path):
        out = {}
        for l in open(path).read().splitlines():
            qid, pid = l.split("\t")[:2]
            out.setdefault(qid, []).append(pid)
        return out

    a, b = ranked_by_qid(run_path), ranked_by_qid(run_int8)
    assert set(a) == set(b)
    for qid in a:
        # the clear winner survives quantization; the noise tail may
        # reorder/swap on near-ties (scores within int8 resolution)
        assert a[qid][0] == b[qid][0], qid
        assert len(set(a[qid]) & set(b[qid])) >= 4, qid

    # 2b. SPMD multi-device encode (--devices 0 = all 8 virtual devices):
    #     identical persisted embeddings, bucketed batches forced to
    #     device-divisible sizes
    idx_dp = str(tmp_path / "index_dp")
    rc = cli_index.main([
        "--collection", f["passages"], "--checkpoint", ckpt,
        "--out", idx_dp, "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "32", "--devices", "0",
        "--bucket-lengths",
    ])
    assert rc == 0
    from cldrd_tpu.index.persistence import read_embeddings

    e1, i1 = read_embeddings(index_dir)
    e2, i2 = read_embeddings(idx_dp)
    # bucketed order may group by length: compare per-id embeddings
    m1 = {int(i): e1[r] for r, i in enumerate(i1)}
    m2 = {int(i): e2[r] for r, i in enumerate(i2)}
    assert set(m1) == set(m2)
    for pid in m1:
        np.testing.assert_allclose(m2[pid], m1[pid], rtol=1e-5, atol=1e-6)

    # 3b'. int8 DISK store -> int8 HBM (codes load directly): same
    #      top-1 winners as the fp32-store int8 run
    idx8 = str(tmp_path / "index_int8")
    rc = cli_index.main([
        "--collection", f["passages"], "--checkpoint", ckpt,
        "--out", idx8, "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "32",
        "--store-dtype", "int8",
    ])
    assert rc == 0
    run_int8d = str(tmp_path / "dev.int8disk.run.tsv")
    rc = cli_retrieve.main([
        "--index", idx8, "--queries", f["queries"],
        "--checkpoint", ckpt, "--run", run_int8d,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--topk", "5", "--hbm-dtype", "int8",
        "--encode-batch-size", "32", "--search-batch-size", "8",
    ])
    assert rc == 0
    c_ = ranked_by_qid(run_int8d)
    for qid in a:
        assert c_[qid][0] == b[qid][0], qid

    # 3c. corpus-sharded retrieval (8 virtual devices, per-shard top-k +
    #     all-gather merge) returns the identical run file
    run_sh = str(tmp_path / "dev.sharded.run.tsv")
    rc = cli_retrieve.main([
        "--index", index_dir, "--queries", f["queries"],
        "--checkpoint", ckpt, "--run", run_sh,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--topk", "5", "--shards", "0",
        "--encode-batch-size", "32", "--search-batch-size", "8",
    ])
    assert rc == 0
    assert open(run_sh).read() == open(run_path).read()

    # 4b. file-based evaluation runs over the run file (a 2-layer dim-32
    #     hash-token model cannot win *full-corpus* retrieval in 16 steps,
    #     so only structural properties are asserted here; quality is
    #     asserted on the in-candidate reranking path below)
    from cldrd_tpu.evaluation import RankingEvaluator

    ev = RankingEvaluator(f["qrels"], mrr_at_k=(5,), recall_at_k=(5,),
                          ndcg_at_k=(5,), map_at_k=5)
    metrics = ev.compute_metrics(run_path)
    assert metrics["QueriesRanked"] == 16

    # ... and the evaluate CLI prints the same numbers as JSON
    rc = cli_evaluate.main(["--qrels", f["qrels"], "--run", run_path])
    assert rc == 0

    # 4b'. TREC graded path end-to-end: space-separated graded qrels
    #      (0-3, binarization at 2.0) through the same run file via --trec,
    #      with per-query CSV export
    trec_qrels = str(tmp_path / "qrels.trec.txt")
    with open(trec_qrels, "w") as fh:
        for q in range(16):
            fh.write(f"{q} 0 {q * 6} 3\n")      # highly relevant
            fh.write(f"{q} 0 {q * 6 + 1} 1\n")  # below binarization point
    per_query = str(tmp_path / "per_query.csv")
    rc = cli_evaluate.main([
        "--qrels", trec_qrels, "--run", run_path, "--trec",
        "--per-query", per_query,
    ])
    assert rc == 0
    assert os.path.getsize(per_query) > 0

    # 4c. quality: rerank each query's 6 training candidates with the
    #     trained checkpoint — the fitted objective — expect near-perfect MRR
    import jax.numpy as jnp

    from cldrd_tpu.data.reranking_dataset import RerankingDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.evaluation import RerankingEvaluator, make_dual_encoder_score_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder
    from cldrd_tpu.cli.common import load_dual_encoder_params

    cand_run = str(tmp_path / "cands.tsv")
    with open(cand_run, "w") as fh:
        for q in range(16):
            for p in range(q * 6, q * 6 + 6):
                fh.write(f"{q}\t{p}\n")
    model_cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=model_cfg, dtype=jnp.float32)
    params = load_dual_encoder_params(ckpt, model, model_cfg, False)
    rds = RerankingDataset(cand_run, f["queries"], f["passages"],
                           HashTokenizer(model_cfg.vocab_size),
                           is_cross_encoder=False,
                           query_max_len=12, passage_max_len=16)
    rev = RerankingEvaluator(f["qrels"], mrr_at_k=(5,), recall_at_k=(5,),
                             ndcg_at_k=(5,), map_at_k=5)
    rmetrics = rev.compute_metrics(make_dual_encoder_score_fn(model, params),
                                   rds, batch_size=16)
    assert rmetrics["MRR@5"] >= 0.9, rmetrics

    # 5. inverse retrieval (teacher-data fragment): passages -> top queries.
    #    Build a query index, then search it with passages.
    q_index_dir = str(tmp_path / "qindex")
    rc = cli_index.main([
        "--collection", f["queries"], "--checkpoint", ckpt,
        "--out", q_index_dir, "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--batch-size", "32",
    ])
    assert rc == 0
    p2q_run = str(tmp_path / "p2q.run.tsv")
    rc = cli_retrieve_queries.main([
        "--query-index", q_index_dir, "--passages", f["passages"],
        "--checkpoint", ckpt, "--run", p2q_run,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--topk", "3",
        "--encode-batch-size", "32", "--search-batch-size", "8",
    ])
    assert rc == 0
    assert os.path.getsize(p2q_run) > 0


def test_cli_curriculum(corpus_files, tmp_path):
    """3 curriculum iterations with per-iteration retrieval evaluation (the
    reference's between-stage ``continue_rerank_evaluator`` workflow,
    ``scripts/unity/continue_rerank_evaluator.sh:4`` + SURVEY §3.5): each
    iteration must produce a run file and a metrics row."""
    f = corpus_files
    cur = tmp_path / "cur"
    rc = cli_curriculum.main([
        "--queries", f["queries"], "--passages", f["passages"],
        "--training-paths", f["train"], f["train"], f["train"],
        "--label-modes", "1", "1", "1",
        "--learning-rates", "2e-3", "1e-3", "1e-3",
        "--epochs", "2", "1", "1",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--batch-size", "8",
        "--run-folder", str(cur),
        "--config", _tiny_yaml(tmp_path),
        "--eval-queries", f["queries"], "--eval-qrels", f["qrels"],
        "--eval-topk", "5", "--eval-batch-size", "16",
    ])
    assert rc == 0
    for name in ("curriculum_iter1", "curriculum_iter2", "curriculum_iter3"):
        assert os.path.exists(cur / name / "train_logs.log")
        assert os.path.getsize(cur / f"{name}.run.tsv") > 0
    # metrics table: header + one row per iteration, with an MRR column
    rows = open(cur / "curriculum_eval.tsv").read().splitlines()
    assert len(rows) == 1 + 3, rows
    header = rows[0].split("\t")
    assert any("MRR" in c for c in header), header
    steps = [r.split("\t")[0] for r in rows[1:]]
    assert steps == ["1", "2", "3"], steps


def _tiny_yaml(tmp_path):
    from cldrd_tpu.train import TrainConfig

    cfg = TrainConfig(max_query_len=12, max_passage_len=16,
                      compute_dtype="float32", warmup_steps=2,
                      logging_steps=2, evaluate_steps=100)
    path = str(tmp_path / "base.yaml")
    cfg.save_yaml(path)
    return path


def test_cli_serve(corpus_files, tmp_path):
    """The serving daemon: index + query tower resident, JSON-over-HTTP
    search answers must match a direct retrieve over the same artifacts."""
    import threading
    import urllib.request

    from cldrd_tpu.cli import serve as cli_serve

    f = corpus_files
    idx_dir = str(tmp_path / "serve_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
    ])
    assert rc == 0

    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
    ])
    httpd = cli_serve.serve(args)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["n_vectors"] == 96

        queries = ["find subject3 info", "find subject7 info"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"queries": queries, "k": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            payload = json.loads(r.read())
        results = payload["results"]
        assert len(results) == 2
        for ranked in results:
            assert len(ranked) == 5
            scores = [h["score"] for h in ranked]
            assert scores == sorted(scores, reverse=True)
            assert all(isinstance(h["id"], int) for h in ranked)

        # must agree with the service's own components called directly
        svc = httpd.RequestHandlerClass.service
        direct = svc.search(queries, 5)
        assert direct == results

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"queries": "not-a-list"}).encode(),
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # dynamic micro-batching: a concurrent burst of 1-query requests
        # coalesces into fewer device passes, with per-request results
        # identical to the sequential answers (different k per request
        # shares the pass at max(k) and slices)
        svc.max_batch_wait_ms = 250.0
        base = {f"find subject{q} info": svc.search([f"find subject{q} info"], 5)[0]
                for q in range(8)}
        before = dict(svc.stats)
        burst_out = {}
        def one(q):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps({"queries": [f"find subject{q} info"],
                                 "k": 3 if q % 2 else 5}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                burst_out[q] = json.loads(r.read())["results"][0]
        threads = [threading.Thread(target=one, args=(q,)) for q in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for q in range(8):
            want = base[f"find subject{q} info"][: 3 if q % 2 else 5]
            assert burst_out[q] == want, q
        extra_batches = svc.stats["device_batches"] - before["device_batches"]
        extra_requests = svc.stats["requests"] - before["requests"]
        assert extra_requests == 8
        assert extra_batches < 8  # the burst actually coalesced

        # /healthz reports latency percentiles alongside the counters
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["latency_p50_ms"] > 0
        assert health["latency_p99_ms"] >= health["latency_p50_ms"]

        # live updates: /add makes new docs retrievable, /remove tombstones
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        # the daemon's tiny model is random-init, so assertions are
        # structural/deterministic rather than semantic:
        n0 = svc.index.n_vectors
        out = post("/add", {"ids": [9000, 9001], "texts":
                            ["find zebra info inside", "find yak info inside"]})
        assert out["ok"] and out["n_vectors"] == n0 + 2
        assert {9000, 9001} <= set(svc.index._host_ids().tolist())

        # tombstoning the current top-1 of a query removes it from results
        top1 = post("/search", {"queries": ["find subject3 info"],
                                "k": 5})["results"][0][0]["id"]
        out = post("/remove", {"ids": [top1]})
        assert out["n_vectors"] == n0 + 1
        hits = post("/search", {"queries": ["find subject3 info"], "k": 5})
        assert all(h["id"] != top1 for h in hits["results"][0])
        # malformed add -> 400
        try:
            post("/add", {"ids": [1], "texts": []})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # per-request exclusion: top hits drop out, k results survive
        # (over-fetch from the same top-topk pass), other requests in a
        # coalesced group are unaffected
        base5 = post("/search", {"queries": [queries[0]], "k": 5})
        top2 = [h["id"] for h in base5["results"][0][:2]]
        ex = post("/search", {"queries": [queries[0]], "k": 3,
                              "exclude_ids": top2})
        got_ids = [h["id"] for h in ex["results"][0]]
        assert len(got_ids) == 3 and not (set(got_ids) & set(top2))
        assert got_ids == [h["id"] for h in base5["results"][0][2:5]]
        # k + exclusions beyond the ceiling -> 400
        try:
            post("/search", {"queries": [queries[0]], "k": 5,
                             "exclude_ids": [1, 2]})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # /save persists the LIVE state (adds + tombstones survive reload)
        from cldrd_tpu.index import load_index

        snap = str(tmp_path / "live_snapshot")
        out = post("/save", {"dir": snap})
        assert out["ok"] and out["n_vectors"] == n0 + 1
        reloaded = load_index(snap)
        assert reloaded.n_vectors == n0 + 1
        host = reloaded._host_ids()
        assert {9000, 9001} <= set(host.tolist())
        assert top1 not in set(host.tolist())

        # /reload: mutate further, then blue/green back to the snapshot
        post("/remove", {"ids": [9000]})
        assert svc.index.n_vectors == n0
        out = post("/reload", {"dir": snap})
        assert out["ok"] and out["n_vectors"] == n0 + 1
        assert 9000 in set(svc.index._host_ids().tolist())
        hits = post("/search", {"queries": ["find subject5 info"], "k": 5})
        assert len(hits["results"][0]) == 5
        # unknown dir -> 400, service keeps the old index
        try:
            post("/reload", {"dir": str(tmp_path / "nope")})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert svc.index.n_vectors == n0 + 1
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_pipeline_arch_bert(corpus_files, tmp_path):
    """--arch bert drives BERT towers through train -> index -> retrieve:
    the model-family switch is one flag on every CLI (conversion and the
    trainer need no arch plumbing; the config class carries it)."""
    f = corpus_files
    run_folder = str(tmp_path / "bert_runs")
    rc = cli_train.main([
        "--queries-path", f["queries"], "--passages-path", f["passages"],
        "--training-path", f["train"], "--label-mode", "1",
        "--arch", "bert", "--model-size", "tiny", "--tokenizer", "hash",
        "--batch-size", "8", "--num-train-epochs", "2",
        "--learning-rate", "2e-3", "--warmup-steps", "2",
        "--max-query-len", "12", "--max-passage-len", "16",
        "--compute-dtype", "float32",
        "--run-folder", run_folder, "--experiment-name", "bert1",
        "--logging-steps", "4", "--evaluate-steps", "100",
    ])
    assert rc == 0
    ckpts = [p for p in os.listdir(os.path.join(run_folder, "bert1"))
             if p.endswith(".msgpack")]
    assert ckpts
    ckpt = os.path.join(run_folder, "bert1", sorted(ckpts)[-1])

    index_dir = str(tmp_path / "bert_index")
    rc = cli_index.main([
        "--collection", f["passages"], "--checkpoint", ckpt,
        "--out", index_dir, "--arch", "bert", "--model-size", "tiny",
        "--tokenizer", "hash", "--max-length", "16", "--batch-size", "32",
    ])
    assert rc == 0

    run_path = str(tmp_path / "bert.run.tsv")
    rc = cli_retrieve.main([
        "--index", index_dir, "--queries", f["queries"],
        "--checkpoint", ckpt, "--run", run_path,
        "--arch", "bert", "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--topk", "5",
        "--encode-batch-size", "32", "--search-batch-size", "8",
    ])
    assert rc == 0
    rows = [l.split("\t") for l in open(run_path).read().splitlines()]
    assert len(rows) == 16 * 5


def test_cli_index_ivf_only(corpus_files, tmp_path):
    """--ivf-only builds the IVF companion from an EXISTING flat store
    without re-encoding the corpus; full probe matches the flat index."""
    import jax.numpy as jnp

    from cldrd_tpu.index import IVFIndex, load_index

    f = corpus_files
    idx_dir = str(tmp_path / "flat_only")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    assert not os.path.isdir(os.path.join(idx_dir, "ivf"))

    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--ivf-only", "--ivf-nlist", "4", "--ivf-slot", "128",
    ])
    assert rc == 0
    ivf = IVFIndex.load(os.path.join(idx_dir, "ivf"),
                        dtype=jnp.float32, precision="highest")
    flat = load_index(idx_dir, dtype=jnp.float32, precision="highest")
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, ivf.dim)).astype(np.float32)
    _, ii = ivf.search(q, 5, nprobe=ivf.n_buckets)
    _, fi = flat.search(q, 5)
    np.testing.assert_array_equal(ii, fi.astype(np.int32))

    # without a flat store it refuses cleanly
    with pytest.raises(SystemExit):
        cli_index.main([
            "--collection", f["passages"],
            "--out", str(tmp_path / "missing"),
            "--ivf-only", "--ivf-nlist", "4",
        ])


def test_cli_serve_ivf(corpus_files, tmp_path):
    """cldrd-index --ivf-nlist builds the IVF companion store; cldrd-serve
    --ivf serves it. At full probe the answers must match the exact flat
    index loaded from the same artifacts; /add and /remove keep working."""
    import threading
    import urllib.request

    from cldrd_tpu.cli import serve as cli_serve
    from cldrd_tpu.index import IVFIndex, load_index

    f = corpus_files
    idx_dir = str(tmp_path / "ivf_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
        "--ivf-nlist", "4", "--ivf-slot", "128", "--ivf-nprobe", "2",
    ])
    assert rc == 0
    assert os.path.isfile(os.path.join(idx_dir, "ivf", "ivf_meta.json"))

    import jax.numpy as jnp

    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
        "--ivf", "--nprobe", "100",  # clamps to n_buckets -> exact
        "--hbm-dtype", "float32", "--precision", "highest",
    ])
    httpd = cli_serve.serve(args)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    svc = httpd.RequestHandlerClass.service

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["n_vectors"] == 96

        queries = ["find subject3 info", "find subject7 info"]
        got = post("/search", {"queries": queries, "k": 5})["results"]

        # exact-parity oracle: the FLAT index over the same artifacts,
        # queried with the service's own encoder
        flat = load_index(idx_dir, dtype=jnp.float32, precision="highest")
        tokens = svc._pad(svc.tokenizer(queries, svc.max_length),
                          svc.encode_batch)
        embs = np.asarray(svc.encode_fn(tokens))[: len(queries)]
        _, flat_ids = flat.search(embs, 5)
        for r in range(len(queries)):
            assert [h["id"] for h in got[r]] == flat_ids[r].tolist()

        # live updates ride the IVF add/remove paths
        n0 = svc.index.n_vectors
        out = post("/add", {"ids": [9100, 9101], "texts":
                            ["find walrus info inside", "find emu info inside"]})
        assert out["ok"] and out["n_vectors"] == n0 + 2
        top1 = post("/search", {"queries": [queries[0]],
                                "k": 5})["results"][0][0]["id"]
        out = post("/remove", {"ids": [top1]})
        assert out["n_vectors"] == n0 + 1
        hits = post("/search", {"queries": [queries[0]], "k": 5})
        assert all(h["id"] != top1 for h in hits["results"][0])

        # /save snapshots the live IVF state; reload round-trips
        snap = str(tmp_path / "ivf_snapshot")
        out = post("/save", {"dir": snap})
        assert out["ok"] and out["n_vectors"] == n0 + 1
        back = IVFIndex.load(snap, dtype=jnp.float32, precision="highest")
        assert back.n_vectors == n0 + 1
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_index_and_serve_ivfpq(corpus_files, tmp_path):
    """--pq-m builds the IVFPQ companion (uint8 residual codes); cldrd-serve
    --ivf auto-detects the PQ store (--hbm-dtype does not apply to it) and
    serves searches + live adds/removes from the codes."""
    import threading
    import urllib.request

    from cldrd_tpu.cli import serve as cli_serve
    from cldrd_tpu.index import IVFIndex

    f = corpus_files
    idx_dir = str(tmp_path / "pq_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
        "--ivf-nlist", "4", "--ivf-slot", "128",
        "--pq-m", "8", "--pq-bits", "4",
    ])
    assert rc == 0
    ivf = IVFIndex.load(os.path.join(idx_dir, "ivf"))
    assert ivf.is_pq and ivf.codebooks.shape == (8, 16, 4)

    # --pq-m without --ivf-nlist refuses cleanly
    with pytest.raises(SystemExit):
        cli_index.main([
            "--collection", f["passages"],
            "--out", str(tmp_path / "nope"), "--pq-m", "8",
        ])

    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
        "--ivf", "--nprobe", "100",  # clamps to n_buckets (full probe)
    ])
    httpd = cli_serve.serve(args)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    svc = httpd.RequestHandlerClass.service

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["n_vectors"] == 96

        # parity oracle: the SAME PQ artifacts searched directly at full
        # probe with the service's own encoder must agree with the daemon
        queries = ["find subject3 info", "find subject7 info"]
        got = post("/search", {"queries": queries, "k": 5})["results"]
        direct = IVFIndex.load(os.path.join(idx_dir, "ivf"))
        tokens = svc._pad(svc.tokenizer(queries, svc.max_length),
                          svc.encode_batch)
        embs = np.asarray(svc.encode_fn(tokens))[: len(queries)]
        _, want = direct.search(embs, 5, nprobe=direct.n_buckets)
        for r in range(len(queries)):
            assert [h["id"] for h in got[r]] == want[r].tolist()

        n0 = svc.index.n_vectors
        out = post("/add", {"ids": [9100], "texts": ["find yak info inside"]})
        assert out["ok"] and out["n_vectors"] == n0 + 1
        out = post("/remove", {"ids": [9100]})
        assert out["n_vectors"] == n0
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_serve_ivfpq_refine(corpus_files, tmp_path):
    """--refine-factor over the IVFPQ tier: served results must equal a
    direct RefinedIndex over the same artifacts (exact disk re-scoring),
    and the flag is rejected without --ivf."""
    import threading
    import urllib.request

    from cldrd_tpu.cli import serve as cli_serve
    from cldrd_tpu.index import DiskRefiner, IVFIndex, RefinedIndex

    f = corpus_files
    idx_dir = str(tmp_path / "pqr_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
        "--ivf-nlist", "4", "--ivf-slot", "128", "--pq-m", "8",
    ])
    assert rc == 0

    with pytest.raises(SystemExit):  # refine without --ivf
        cli_serve.serve(cli_serve.build_parser().parse_args([
            "--index", idx_dir, "--port", "0",
            "--model-size", "tiny", "--tokenizer", "hash",
            "--refine-factor", "4",
        ]))

    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
        "--ivf", "--nprobe", "2", "--refine-factor", "4",
    ])
    httpd = cli_serve.serve(args)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    svc = httpd.RequestHandlerClass.service

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["refine_factor"] == 4
        assert health["nprobe"] == 2

        queries = ["find subject2 info", "find subject9 info"]
        got = post("/search", {"queries": queries, "k": 5})["results"]

        direct = RefinedIndex(
            IVFIndex.load(os.path.join(idx_dir, "ivf")),
            DiskRefiner(idx_dir), factor=4)
        tokens = svc._pad(svc.tokenizer(queries, svc.max_length),
                          svc.encode_batch)
        embs = np.asarray(svc.encode_fn(tokens))[: len(queries)]
        _, want = direct.search(embs, 5, nprobe=2)
        for r in range(len(queries)):
            assert [h["id"] for h in got[r]] == want[r].tolist()
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_create_training_data_both_teacher_arches(corpus_files, tmp_path):
    """cldrd-create-training-data end-to-end: candidates run -> teacher
    rerank -> 4 curriculum JSONL stages, with BOTH teacher families
    (DistilBERT head and the reference's actual BERT/MiniLM-style head,
    reference reranking_evaluator.py:292)."""
    from cldrd_tpu.cli import create_training_data as cli_ctd

    f = corpus_files
    # 4 train queries x 32 candidates (any pids; teacher defines the order)
    run_path = str(tmp_path / "candidates.run.tsv")
    rng = np.random.default_rng(11)
    with open(run_path, "w") as fh:
        for q in range(4):
            for rank, p in enumerate(
                rng.permutation(96)[:32], start=1
            ):
                fh.write(f"{q}\t{p}\t{rank}\t{1.0 / rank:.4f}\n")

    for arch in ("distilbert", "bert"):
        prefix = str(tmp_path / f"{arch}_")
        rc = cli_ctd.main([
            "--candidates-run", run_path,
            "--queries", f["queries"], "--passages", f["passages"],
            "--out-prefix", prefix,
            "--teacher-arch", arch,
            "--model-size", "tiny", "--tokenizer", "hash",
            "--max-length", "32", "--batch-size", "16",
            "--compute-dtype", "float32",
        ])
        assert rc == 0
        for stage, (n_rel, n_most, n_semi) in (
            ("5relT_25neg", (5, 12, 13)),
            ("30relT", (30, 0, 0)),
        ):
            lines = open(f"{prefix}{stage}.train.jsonl").read().splitlines()
            assert len(lines) == 4
            ex = json.loads(lines[0])
            assert len(ex["relT_pids"]) == n_rel
            assert len(ex["most_hard_pids"]) == n_most
            assert len(ex["semi_hard_pids"]) == n_semi
            # teacher scores attached, sorted descending within relT
            assert ex["relT_scores"] == sorted(ex["relT_scores"],
                                               reverse=True)

    # the two teachers are different models: rankings must differ somewhere
    a = open(str(tmp_path / "distilbert_") + "30relT.train.jsonl").read()
    b = open(str(tmp_path / "bert_") + "30relT.train.jsonl").read()
    assert a != b


def test_cli_serve_sharded(corpus_files, tmp_path):
    """cldrd-serve --shards 0: the daemon stands the index up sharded over
    the 8 virtual devices and answers identically to direct search."""
    import threading
    import urllib.request

    from cldrd_tpu.cli import serve as cli_serve

    f = corpus_files
    idx_dir = str(tmp_path / "serve_sh_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0", "--shards", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
    ])
    httpd = cli_serve.serve(args)
    svc = httpd.RequestHandlerClass.service
    try:
        assert svc.index.mesh is not None
        assert svc.index.mesh.devices.size == 8
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"queries": ["find subject5 info"], "k": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            results = json.loads(r.read())["results"]
        assert len(results) == 1 and len(results[0]) == 5
        direct = svc.search(["find subject5 info"], 5)
        assert direct == results
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_serve_ivf_sharded(corpus_files, tmp_path):
    """cldrd-serve --ivf --shards 0: the IVF tier serves mesh-sharded
    (FAISS shards any index type, reference retrieval_utils.py:164-182).
    Served answers must equal the single-device IVF load of the same
    artifacts at the same nprobe; live /add refuses cleanly (400 with the
    library's message) instead of corrupting shards."""
    import threading
    import urllib.error
    import urllib.request

    import jax.numpy as jnp

    from cldrd_tpu.cli import serve as cli_serve
    from cldrd_tpu.index import IVFIndex

    f = corpus_files
    idx_dir = str(tmp_path / "ivf_sh_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
        "--ivf-nlist", "4", "--ivf-slot", "128", "--ivf-nprobe", "2",
    ])
    assert rc == 0
    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0", "--shards", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
        "--ivf", "--nprobe", "2",
        "--hbm-dtype", "float32", "--precision", "highest",
    ])
    httpd = cli_serve.serve(args)
    svc = httpd.RequestHandlerClass.service
    try:
        assert svc.index.mesh is not None
        assert svc.index.mesh.devices.size == 8
        assert svc.index.n_buckets % 8 == 0  # padded to the mesh
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        queries = ["find subject3 info", "find subject7 info"]
        got = post("/search", {"queries": queries, "k": 5})["results"]

        # oracle: the single-device IVF over the same artifacts at the
        # same partial nprobe, queried with the service's own encoder —
        # the sharded probe + ICI merge must answer identically
        single = IVFIndex.load(os.path.join(idx_dir, "ivf"),
                               dtype=jnp.float32, precision="highest")
        tokens = svc._pad(svc.tokenizer(queries, svc.max_length),
                          svc.encode_batch)
        embs = np.asarray(svc.encode_fn(tokens))[: len(queries)]
        _, want = single.search(embs, 5, nprobe=2)
        for r in range(len(queries)):
            assert [h["id"] for h in got[r]] == want[r].tolist()

        # live mutation refuses cleanly on a sharded IVF deployment
        try:
            post("/add", {"ids": [9100], "texts": ["find walrus info"]})
            raise AssertionError("expected HTTP 400 for sharded /add")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "sharded" in json.loads(e.read())["error"]
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_serve_ivfpq_sharded(corpus_files, tmp_path):
    """cldrd-serve --ivf --shards 0 over a PQ store: the sharded LUT
    probe + merge answers exactly like the single-device PQ load at full
    probe."""
    import threading
    import urllib.request

    from cldrd_tpu.cli import serve as cli_serve
    from cldrd_tpu.index import IVFIndex

    f = corpus_files
    idx_dir = str(tmp_path / "pq_sh_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
        "--ivf-nlist", "4", "--ivf-slot", "128",
        "--pq-m", "8", "--pq-bits", "4",
    ])
    assert rc == 0
    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0", "--shards", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "5",
        "--ivf", "--nprobe", "100",  # clamps -> full probe
    ])
    httpd = cli_serve.serve(args)
    svc = httpd.RequestHandlerClass.service
    try:
        assert svc.index.mesh is not None and svc.index.is_pq
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        queries = ["find subject3 info", "find subject7 info"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/search",
            data=json.dumps({"queries": queries, "k": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            got = json.loads(r.read())["results"]
        single = IVFIndex.load(os.path.join(idx_dir, "ivf"))
        tokens = svc._pad(svc.tokenizer(queries, svc.max_length),
                          svc.encode_batch)
        embs = np.asarray(svc.encode_fn(tokens))[: len(queries)]
        _, want = single.search(embs, 5, nprobe=single.n_buckets)
        for r in range(len(queries)):
            assert [h["id"] for h in got[r]] == want[r].tolist()
    finally:
        svc.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_rerank_eval(corpus_files, tmp_path):
    """cldrd-rerank-eval: the continue_rerank_evaluator workflow — every
    checkpoint in a run folder scored over candidate pairs (dual mode),
    plus single-checkpoint cross mode with the BERT teacher family."""
    from cldrd_tpu.cli import rerank_eval as cli_rerank_eval

    f = corpus_files
    run_folder = str(tmp_path / "runs")
    rc = cli_train.main([
        "--queries-path", f["queries"], "--passages-path", f["passages"],
        "--training-path", f["train"], "--label-mode", "1",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--batch-size", "8", "--num-train-epochs", "4",
        "--learning-rate", "2e-3", "--warmup-steps", "2",
        "--max-query-len", "12", "--max-passage-len", "16",
        "--compute-dtype", "float32",
        "--run-folder", run_folder, "--experiment-name", "re",
        "--logging-steps", "4", "--evaluate-steps", "4",
    ])
    assert rc == 0
    folder = os.path.join(run_folder, "re")
    n_ckpts = len([p for p in os.listdir(folder) if p.endswith(".msgpack")])
    assert n_ckpts >= 2, "need multiple checkpoints for folder mode"

    # candidates: each query's 6 candidate pids (rel + 5 noise)
    cand = str(tmp_path / "cands.run.tsv")
    with open(cand, "w") as fh:
        for q in range(16):
            for rank, p in enumerate(range(q * 6, q * 6 + 6), start=1):
                fh.write(f"{q}\t{p}\t{rank}\t{1.0/rank:.4f}\n")

    # folder mode (dual): one metric row per checkpoint, quality improves
    # (or at least is perfect at the end on this separable task)
    results_tsv = str(tmp_path / "rerank_results.tsv")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_rerank_eval.main([
            "--candidates-run", cand, "--queries", f["queries"],
            "--passages", f["passages"], "--qrels", f["qrels"],
            "--run-folder", folder, "--results", results_tsv,
            "--mode", "dual", "--model-size", "tiny", "--tokenizer", "hash",
            "--max-query-len", "12", "--max-passage-len", "16",
            "--batch-size", "16", "--compute-dtype", "float32",
        ])
    assert rc == 0
    per_step = json.loads(buf.getvalue())
    assert len(per_step) == n_ckpts
    last = per_step[max(per_step, key=int)]
    assert last["MRR@10"] > 0.9  # in-candidate reranking is learnable
    assert os.path.exists(results_tsv)

    # single checkpoint, cross mode, bert teacher family: write a real
    # (random-init) teacher msgpack and evaluate with it (structure only)
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from cldrd_tpu.models import BertConfig, CrossEncoder

    teacher = CrossEncoder(config=BertConfig.tiny(), arch="bert",
                           dtype=jnp.float32)
    tparams = teacher.init(jax.random.PRNGKey(0), {
        "input_ids": jnp.zeros((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
        "token_type_ids": jnp.zeros((1, 8), jnp.int32),
    })["params"]
    teacher_ckpt = str(tmp_path / "teacher.msgpack")
    with open(teacher_ckpt, "wb") as fh:
        fh.write(serialization.msgpack_serialize(
            {"params": serialization.to_state_dict(tparams)}))

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_rerank_eval.main([
            "--candidates-run", cand, "--queries", f["queries"],
            "--passages", f["passages"], "--qrels", f["qrels"],
            "--checkpoint", teacher_ckpt,
            "--mode", "cross", "--teacher-arch", "bert",
            "--model-size", "tiny", "--tokenizer", "hash",
            "--max-length", "32", "--batch-size", "16",
            "--compute-dtype", "float32",
        ])
    assert rc == 0
    metrics = json.loads(buf.getvalue())
    assert metrics["QueriesRanked"] == 16


def test_cli_export_roundtrip(corpus_files, tmp_path):
    """cldrd-export: a trained msgpack checkpoint exports to (a) the
    reference's .pth.tar layout, reloadable by our own reference-format
    loader with identical embeddings, and (b) per-tower HF state_dicts
    that load into transformers DistilBertModel."""
    from cldrd_tpu.cli import export as cli_export

    f = corpus_files
    run_folder = str(tmp_path / "runs")
    rc = cli_train.main([
        "--queries-path", f["queries"], "--passages-path", f["passages"],
        "--training-path", f["train"], "--label-mode", "1",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--batch-size", "8", "--num-train-epochs", "1",
        "--learning-rate", "2e-3", "--warmup-steps", "2",
        "--max-query-len", "12", "--max-passage-len", "16",
        "--compute-dtype", "float32",
        "--run-folder", run_folder, "--experiment-name", "ex",
        "--logging-steps", "4", "--evaluate-steps", "100",
    ])
    assert rc == 0
    folder = os.path.join(run_folder, "ex")
    ckpt = os.path.join(folder, sorted(
        p for p in os.listdir(folder) if p.endswith(".msgpack"))[-1])

    # (a) reference layout round trip through our own torch loader
    ref_path = str(tmp_path / "export" / "ckpt.pth.tar")
    rc = cli_export.main([
        "--checkpoint", ckpt, "--out", ref_path,
        "--model-size", "tiny", "--tokenizer", "hash",
    ])
    assert rc == 0

    import jax
    import jax.numpy as jnp

    from cldrd_tpu.cli.common import load_dual_encoder_params
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig.tiny()
    model = NwayDualEncoder(config=cfg, dtype=jnp.float32)
    p_orig = load_dual_encoder_params(ckpt, model, cfg, False)
    p_back = load_dual_encoder_params(ref_path, model, cfg, False)
    for a, b in zip(jax.tree_util.tree_leaves(p_orig),
                    jax.tree_util.tree_leaves(p_back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # (b) HF per-tower state_dicts load into transformers
    torch = pytest.importorskip("torch")
    import transformers

    hf_dir = str(tmp_path / "export_hf")
    rc = cli_export.main([
        "--checkpoint", ckpt, "--out", hf_dir, "--format", "hf",
        "--model-size", "tiny", "--tokenizer", "hash",
    ])
    assert rc == 0
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=cfg.vocab_size, max_position_embeddings=cfg.max_position_embeddings,
        dim=cfg.dim, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        hidden_dim=cfg.hidden_dim,
    )
    for tower in ("query_encoder", "passage_encoder"):
        sd = torch.load(os.path.join(hf_dir, tower, "pytorch_model.bin"),
                        weights_only=True)
        hf = transformers.DistilBertModel(hf_cfg)
        missing, unexpected = hf.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        assert not [m for m in missing if "position_ids" not in m], missing


def test_cli_retrieve_profile_dir(corpus_files, tmp_path):
    """--profile-dir captures a TensorBoard-loadable jax.profiler trace of
    the search phase."""
    f = corpus_files
    idx_dir = str(tmp_path / "prof_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "32",
    ])
    assert rc == 0
    prof = str(tmp_path / "trace")
    rc = cli_retrieve.main([
        "--index", idx_dir, "--queries", f["queries"],
        "--run", str(tmp_path / "p.run.tsv"),
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--topk", "5",
        "--encode-batch-size", "32", "--search-batch-size", "8",
        "--profile-dir", prof,
    ])
    assert rc == 0
    traces = [p for _, _, files in os.walk(prof) for p in files
              if p.endswith((".trace.json.gz", ".xplane.pb"))]
    assert traces, list(os.walk(prof))


def test_serve_close_never_abandons_requests():
    """Hammer close() against a burst of in-flight searches: every request
    must either return results or raise — no waiter may hang (the
    sentinel-last invariant under the state lock)."""
    import threading
    import time as _time

    from cldrd_tpu.cli.serve import SearchService

    class FakeIndex:
        n_vectors, dim = 8, 4

        def search(self, embs, k):
            _time.sleep(0.002)  # emulate a device pass
            n = np.asarray(embs).shape[0]
            ids = np.tile(np.arange(k), (n, 1))
            return np.zeros((n, k), np.float32), ids

    def fake_tokenizer(texts, max_length, **kw):
        n = len(texts)
        return {"input_ids": np.ones((n, max_length), np.int32),
                "attention_mask": np.ones((n, max_length), np.int32)}

    fake_encode = lambda tokens: np.zeros(  # noqa: E731
        (tokens["input_ids"].shape[0], 4), np.float32)

    for trial in range(5):
        svc = SearchService(fake_tokenizer, fake_encode, FakeIndex(), 8, 16,
                            5, dynamic_batching=True, max_batch_wait_ms=1.0)
        outcomes = []

        def one(i):
            try:
                r = svc.search([f"q{i}"], 5)
                outcomes.append(("ok", len(r)))
            except Exception as e:  # noqa: BLE001
                outcomes.append(("err", type(e).__name__))

        threads = [threading.Thread(target=one, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        _time.sleep(0.001 * trial)  # vary the race window
        svc.close()
        for t in threads:
            t.join(timeout=30)
        assert not any(t.is_alive() for t in threads), "a request hung"
        assert len(outcomes) == 16
        # post-close searches run direct (worker is None) and still answer
        assert len(svc.search(["late"], 5)) == 1


def test_cli_serve_rerank(corpus_files, tmp_path):
    """Two-stage serving: /rerank over explicit texts must equal the
    offline cross-encoder path (same model via the public APIs), and
    /search rerank_k must reorder the first stage's candidates by teacher
    score with both scores reported."""
    import threading
    import urllib.error
    import urllib.request

    import jax.numpy as jnp

    from cldrd_tpu.cli import serve as cli_serve
    from cldrd_tpu.cli.create_training_data import _teacher_params
    from cldrd_tpu.data import TsvDocStore, load_passages, passage_text
    from cldrd_tpu.data.reranking_dataset import RerankingDataset
    from cldrd_tpu.evaluation.reranking_evaluator import (
        make_cross_encoder_score_fn,
    )
    from cldrd_tpu.models import CrossEncoder, DistilBertConfig

    f = corpus_files
    idx_dir = str(tmp_path / "serve_rr_idx")
    rc = cli_index.main([
        "--collection", f["passages"], "--out", idx_dir,
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "16", "--batch-size", "8",
        "--compute-dtype", "float32",
    ])
    assert rc == 0

    args = cli_serve.build_parser().parse_args([
        "--index", idx_dir, "--port", "0",
        "--model-size", "tiny", "--tokenizer", "hash",
        "--max-length", "12", "--passage-max-length", "16",
        "--encode-batch-size", "8", "--topk", "8",
        "--reranker", "distilbert", "--reranker-size", "tiny",
        "--rerank-max-length", "24", "--rerank-batch-size", "4",
        "--passages", f["passages"],
    ])
    httpd = cli_serve.serve(args)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def post(path, payload, timeout=120):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    def post_expect_400(path, payload):
        try:
            post(path, payload)
            assert False, f"expected HTTP 400 for {payload}"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            return json.loads(e.read())["error"]

    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["reranker"] == "distilbert"

        # ---- /rerank over explicit texts == the offline tested path.
        # The daemon's reranker is random-init from PRNGKey(0); rebuild the
        # identical model through the public APIs and compare scores.
        texts = [passage_text(p) for p in
                 list(load_passages(f["passages"]).values())[:6]]
        query = "find subject3 info"
        got = post("/rerank", {"query": query, "passages": texts})
        assert [h["index"] for h in got["results"]] != []
        scores_by_index = {h["index"]: h["score"] for h in got["results"]}
        assert len(scores_by_index) == len(texts)
        srv_scores = [h["score"] for h in got["results"]]
        assert srv_scores == sorted(srv_scores, reverse=True)

        cfg = DistilBertConfig.tiny()
        model = CrossEncoder(config=cfg, dtype=jnp.bfloat16,
                             arch="distilbert")
        params = _teacher_params(None, model, cfg, arch="distilbert")
        score_fn = make_cross_encoder_score_fn(model, params)
        svc = httpd.RequestHandlerClass.service
        ds = RerankingDataset.from_pairs(
            [(0, i) for i in range(len(texts))], {0: query},
            dict(enumerate(texts)), svc.reranker.tokenizer,
            is_cross_encoder=True, max_len=24,
        )
        offline = np.zeros(len(texts), np.float32)
        for batch in ds.batches(4):
            s = score_fn(batch)
            for i in range(batch.n_valid):
                offline[int(batch.pids[i])] = float(s[i])
        for i in range(len(texts)):
            assert scores_by_index[i] == pytest.approx(offline[i], abs=1e-5)

        # k slices the teacher-sorted list
        top2 = post("/rerank", {"query": query, "passages": texts, "k": 2})
        assert top2["results"] == got["results"][:2]

        # ---- /search with rerank_k: candidates come from the first
        # stage's top-rerank_k; order + "score" are the teacher's;
        # "retrieval_score" is the first stage's dot product.
        first = post("/search", {"queries": [query], "k": 6})["results"][0]
        two_stage = post("/search", {"queries": [query], "k": 4,
                                     "rerank_k": 6})["results"][0]
        assert len(two_stage) == 4
        first_ids = [h["id"] for h in first]
        assert set(h["id"] for h in two_stage) <= set(first_ids)
        ce = [h["score"] for h in two_stage]
        assert ce == sorted(ce, reverse=True)
        retrieval = {h["id"]: h["score"] for h in first}
        docs = TsvDocStore(f["passages"])
        pool = [passage_text(p) for p in docs.get_many(first_ids)]
        oracle = post("/rerank", {"query": query, "passages": pool})
        oracle_rank = [first_ids[h["index"]] for h in oracle["results"]]
        assert [h["id"] for h in two_stage] == oracle_rank[:4]
        for h in two_stage:
            assert h["retrieval_score"] == pytest.approx(retrieval[h["id"]])

        # rerank interacts with exclude_ids: excluded ids never reach the
        # second stage
        excl = [first_ids[0]]
        out = post("/search", {"queries": [query], "k": 3, "rerank_k": 5,
                               "exclude_ids": excl})["results"][0]
        assert excl[0] not in [h["id"] for h in out]

        # ---- live adds stay rerankable through the overlay (their text
        # is NOT in the docstore TSV)
        post("/add", {"ids": [9100], "texts": ["zebra stripes document"]})
        assert svc._passages_for_ids([9100]) == ["zebra stripes document"]
        post("/remove", {"ids": [9100]})
        assert 9100 not in svc._live_texts

        # ---- validation surfaces
        post_expect_400("/search", {"queries": [query], "k": 7,
                                    "rerank_k": 6})  # k > rerank_k
        post_expect_400("/search", {"queries": [query], "k": 2,
                                    "rerank_k": 99})  # rerank_k > --topk
        post_expect_400("/rerank", {"query": query, "passages": []})
        post_expect_400("/rerank", {"query": query, "passages": texts,
                                    "k": 0})
        post_expect_400("/rerank", {"query": 5, "passages": texts})
        # stats observable
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["reranked_queries"] >= 4

        # without a docstore, unresolvable ids are a client error that
        # names the remedy
        svc.docstore = None
        err = post_expect_400("/search", {"queries": [query], "k": 2,
                                          "rerank_k": 4})
        assert "--passages" in err
    finally:
        httpd.RequestHandlerClass.service.close()
        httpd.shutdown()
        httpd.server_close()


def test_cli_serve_rejects_rerank_without_reranker(corpus_files, tmp_path):
    """A daemon started without --reranker 400s rerank_k and /rerank
    (unit-level: the service object's own validation)."""
    from cldrd_tpu.cli import serve as cli_serve

    svc = cli_serve.SearchService(
        tokenizer=None, encode_fn=None, index=None, max_length=8,
        encode_batch=8, default_k=5, dynamic_batching=False,
    )
    with pytest.raises(ValueError, match="--reranker"):
        svc.search(["q"], 2, rerank_k=4)
    with pytest.raises(ValueError, match="--reranker"):
        svc.rerank("q", ["p"], 1)


def test_serve_backpressure_rejects_burst():
    """Once max_pending requests are queued for the device worker, further
    searches fail fast with ServiceOverloaded (mapped to 503 + Retry-After
    by the HTTP layer) instead of growing the queue without bound — and
    the queued requests all still complete."""
    import threading
    import time as _time

    from cldrd_tpu.cli.serve import SearchService, ServiceOverloaded

    release = threading.Event()

    class SlowIndex:
        n_vectors, dim = 8, 4

        def search(self, embs, k):
            release.wait(timeout=30)  # hold the device "busy" until told
            n = np.asarray(embs).shape[0]
            ids = np.tile(np.arange(k), (n, 1))
            return np.zeros((n, k), np.float32), ids

    def fake_tokenizer(texts, max_length, **kw):
        n = len(texts)
        return {"input_ids": np.ones((n, max_length), np.int32),
                "attention_mask": np.ones((n, max_length), np.int32)}

    fake_encode = lambda tokens: np.zeros(  # noqa: E731
        (tokens["input_ids"].shape[0], 4), np.float32)

    svc = SearchService(fake_tokenizer, fake_encode, SlowIndex(), 8,
                        encode_batch=1, default_k=5, dynamic_batching=True,
                        max_batch_wait_ms=0.0, max_pending=4)
    outcomes = []

    def one(i):
        try:
            r = svc.search([f"q{i}"], 5)
            outcomes.append(("ok", len(r)))
        except ServiceOverloaded:
            outcomes.append(("overloaded", None))
        except Exception as e:  # noqa: BLE001
            outcomes.append(("err", type(e).__name__))

    try:
        # burst 12 requests at a stalled device: the worker takes 1, up to
        # max_pending=4 queue, the rest must be rejected immediately
        threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        deadline = _time.time() + 10
        while (sum(1 for o in outcomes if o[0] == "overloaded") < 12 - 4 - 1
               and _time.time() < deadline):
            _time.sleep(0.01)
        release.set()
        for t in threads:
            t.join(timeout=30)
        assert not any(t.is_alive() for t in threads), "a request hung"
    finally:
        release.set()
        svc.close()
    ok = sum(1 for o in outcomes if o[0] == "ok")
    overloaded = sum(1 for o in outcomes if o[0] == "overloaded")
    assert not any(o[0] == "err" for o in outcomes), outcomes
    assert overloaded >= 12 - 4 - 2, outcomes  # most of the burst rejected
    assert ok + overloaded == 12
    assert ok >= 1  # accepted requests all completed
    assert svc.stats["rejected_overload"] == overloaded
