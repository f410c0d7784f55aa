"""Serving-daemon benchmark: end-to-end HTTP request throughput on one chip.

Measures `cldrd-serve`'s full request path — HTTP + JSON + host tokenize +
fixed-shape query encode (full-size DistilBERT, L=30) + exact top-k over a
1.1M x 768 bf16 corpus — under three client loads:

1. sequential single-query requests (the latency floor, no coalescing)
2. concurrent single-query requests with dynamic micro-batching OFF
   (requests serialize through the device lock: ~the sequential rate)
3. concurrent single-query requests with dynamic micro-batching ON
   (concurrent requests coalesce into shared device passes)

The corpus and the query-tower params are generated ON DEVICE (the axon
tunnel's ~5 MB/s host->device link must stay out of the measurement); the
HTTP loop runs on localhost. k is a serving-realistic 10 (the retrieval
CLI's k=1000 batch path is bench.py's subject, not this one).

Prints one JSON line per load with requests/s plus the measured
coalescing ratio (requests per device batch).
"""
import json
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N_ROWS = 1_114_112
DIM = 768
K = 10
MAX_QUERY_LEN = 30
ENCODE_BATCH = 128
N_SEQ = 48            # sequential requests
N_CLIENTS = 16        # concurrent client threads
N_PER_CLIENT = 16     # requests per client


def build_service(dynamic: bool, wait_ms: float):
    from cldrd_tpu.cli.serve import SearchService
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.index.builder import make_encode_fn
    from cldrd_tpu.index.flat_index import FlatIPIndex
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    cfg = DistilBertConfig()
    model = NwayDualEncoder(config=cfg, dtype=jnp.bfloat16)
    dummy_q = {"input_ids": jnp.zeros((1, 8), jnp.int32),
               "attention_mask": jnp.ones((1, 8), jnp.int32)}
    dummy_p = {"input_ids": jnp.zeros((1, 1, 8), jnp.int32),
               "attention_mask": jnp.ones((1, 1, 8), jnp.int32)}
    _log("  init query tower params ...")
    params = model.init(jax.random.PRNGKey(0), dummy_q, dummy_p)["params"]
    encode = make_encode_fn(model, params, "query_embs")

    _log("  generating device corpus ...")
    corpus = jax.random.normal(jax.random.PRNGKey(1), (N_ROWS, DIM), jnp.bfloat16)
    ids = jnp.arange(N_ROWS, dtype=jnp.int32)
    _ = np.asarray(corpus[0, 0])  # force onto device (no block_until_ready)
    index = FlatIPIndex(embeddings=corpus, row_ids=ids, mesh=None)

    tokenizer = HashTokenizer(cfg.vocab_size)
    svc = SearchService(
        tokenizer, encode, index, MAX_QUERY_LEN, ENCODE_BATCH, K,
        dynamic_batching=dynamic, max_batch_wait_ms=wait_ms,
    )
    _log("  warmup (compiles encode + search executables) ...")
    svc.warmup()
    _log("  warmup done")
    return svc


def start_http(svc):
    from cldrd_tpu.cli.serve import _Handler

    handler = type("H", (_Handler,), {"service": svc})
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, httpd.server_address[1]


def one_request(port: int, q: str) -> None:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/search",
        data=json.dumps({"queries": [q], "k": K}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        payload = json.loads(r.read())
    assert len(payload["results"][0]) == K


def run_load(port, svc, concurrent: bool):
    before = dict(svc.stats)
    t0 = time.perf_counter()
    if not concurrent:
        for i in range(N_SEQ):
            one_request(port, f"query about topic {i} details")
        n = N_SEQ
    else:
        def client(c):
            for i in range(N_PER_CLIENT):
                one_request(port, f"query about client {c} topic {i}")
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(N_CLIENTS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        n = N_CLIENTS * N_PER_CLIENT
    dt = time.perf_counter() - t0
    batches = svc.stats["device_batches"] - before["device_batches"]
    return {
        "requests": n,
        "req_per_s": round(n / dt, 1),
        "mean_latency_ms": round(dt / n * 1e3, 2),
        "coalescing": round(n / max(batches, 1), 2),
    }


def _log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def main():
    _log("building service (device corpus + query tower + warmup) ...")
    svc = build_service(dynamic=True, wait_ms=3.0)
    httpd, port = start_http(svc)
    _log("sequential load ...")
    seq = run_load(port, svc, concurrent=False)
    _log(f"  {seq}")
    _log("concurrent load, micro-batching ON ...")
    con = run_load(port, svc, concurrent=True)
    _log(f"  {con}")
    # same service/executables, micro-batching OFF: close() stops the
    # worker, after which search() runs one device pass per request
    svc.close()
    _log("concurrent load, micro-batching OFF ...")
    con0 = run_load(port, svc, concurrent=True)
    _log(f"  {con0}")
    httpd.shutdown(); httpd.server_close()

    print(json.dumps({"load": "sequential_1q", **seq}))
    print(json.dumps({"load": f"concurrent_{N_CLIENTS}x_nobatch", **con0}))
    print(json.dumps({"load": f"concurrent_{N_CLIENTS}x_batched", **con}))
    print(json.dumps({
        "metric": "serve_coalescing_speedup",
        "value": round(con["req_per_s"] / con0["req_per_s"], 2),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
