"""Serve the index: a resident query daemon over HTTP.

The reference stops at batch retrieval-to-file
(``retriever/retrieve_top_passages.py``); every invocation re-loads the
checkpoint and re-clones the FAISS index to GPU (~27 GB). This entrypoint
completes the production-serving story the framework is built for: load
the query tower and the corpus index into TPU HBM ONCE, pre-compile the
encode and search executables, then answer queries until stopped.

API (stdlib ``http.server``, JSON over POST — zero extra dependencies):

- ``POST /search``  {"queries": ["text", ...], "k": 10,
  "exclude_ids": [int, ...]?, "rerank_k": 50?}
  -> {"results": [[{"id": int, "score": float}, ...], ...],
      "elapsed_ms": float}   (``exclude_ids``: per-request result
  exclusion via over-fetch; requires k + len(exclude_ids) <= --topk.
  ``rerank_k``: two-stage mode — retrieve the top rerank_k, rescore
  them with the resident cross-encoder (--reranker) against texts from
  the --passages docstore, return the top k by teacher score; hits
  carry both "score" (cross-encoder) and "retrieval_score" (dot))
- ``POST /rerank``  {"query": "text", "passages": ["doc", ...], "k": 5?}
  -> {"results": [{"index": int, "score": float}, ...]}   (standalone
  second stage over EXPLICIT texts, sorted by score descending)
- ``POST /add``     {"ids": [int, ...], "texts": ["doc", ...]}
  -> {"ok": true, "n_vectors": N}   (passage-tower encode ->
  ``FlatIPIndex.add``: FAISS add_with_ids on the LIVE index)
- ``POST /remove``  {"ids": [int, ...]} -> {"ok": true, "n_vectors": N}
- ``POST /save``    {"dir": "/path"} -> {"ok": true, ...}   (persist the
  LIVE index state — FAISS ``write_index`` of the mutated resident index)
- ``POST /reload``  {"dir": "/path"} -> {"ok": true, ...}   (blue/green
  swap to a rebuilt/snapshotted store, same mode as startup; the new
  index compiles OUTSIDE the lock while traffic keeps answering)
- ``GET /healthz``  -> {"ok": true, "n_vectors": N, "dim": D,
      requests/queries/device_batches counters, latency p50/p99/mean;
      + nprobe/n_buckets in IVF mode}

Queries tokenize host-side, encode on device (batch padded to a fixed
shape so the steady state reuses one executable), and search through
``FlatIPIndex.search`` (positions-mode exact MIPS + per-query certificate
recovery). Device access serializes through a lock — one TPU program at a
time; HTTP handling itself is threaded.

**Dynamic micro-batching** (on by default): concurrent requests coalesce
into one device pass — a TPU earns its throughput on batched work (the
search kernel answers 512 queries in ~14 ms; a 1-query request costs
almost the same as a 128-query one because the encode batch pads to a
fixed shape). Request threads enqueue; a single device worker drains the
queue for up to ``--max-batch-wait-ms`` (default 2 ms, ~the device time
of one small pass) or until the encode batch fills, runs ONE
encode+search over the union, and scatters per-request slices back.
Every pass computes top-``--topk`` and slices each request's ``k`` from
it (requests with ``k > topk`` are rejected up front): one compiled
executable forever, and no request can couple strangers to a bigger k
or a fresh XLA compile. ``/healthz`` reports ``requests`` vs
``device_batches`` so the coalescing ratio is observable.
"""
from __future__ import annotations

import argparse
import collections
import json
import logging
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from cldrd_tpu.index import load_index, make_encode_fn
from cldrd_tpu.models import NwayDualEncoder

from .common import (
    add_model_args,
    build_tokenizer,
    load_dual_encoder_params,
    model_config_from_args,
    setup_logging,
)

logger = logging.getLogger("cldrd_tpu.cli.serve")


class ServiceOverloaded(RuntimeError):
    """The micro-batcher's pending queue is full: the caller should back
    off and retry (mapped to HTTP 503 + Retry-After by the handler).
    Bounds memory under burst — without a cap, a burst of slow rerank_k
    requests can grow the pending-group queue without limit."""

    def __init__(self, depth: int, retry_after_s: int = 1):
        super().__init__(
            f"service overloaded: {depth} requests already pending "
            f"(--max-pending); retry after {retry_after_s}s")
        self.retry_after_s = retry_after_s


class _Pending:
    """One enqueued request awaiting the batching worker."""

    __slots__ = ("texts", "k", "exclude", "event", "results", "error")

    def __init__(self, texts: List[str], k: int, exclude=frozenset()):
        self.texts = texts
        self.k = k
        self.exclude = exclude
        self.event = threading.Event()
        self.results = None
        self.error: Optional[Exception] = None


_SHUTDOWN = object()


def _filter_ranked(ranked, exclude, k):
    """Top-k after dropping excluded ids (the over-fetch is validated in
    search(): every pass computes default_k >= k + |exclude| hits)."""
    if not exclude:
        return ranked[:k]
    return [h for h in ranked if h["id"] not in exclude][:k]


class Reranker:
    """Cross-encoder second stage resident next to the index.

    The reference runs its teacher offline (``reranking_evaluator.py``
    batch jobs); here the same model lives in HBM and rescores retrieved
    candidates per request. Collation goes through
    ``RerankingDataset.from_pairs`` — the exact tested contract of the
    offline rerank path — so serving scores equal ``cldrd-rerank-eval``'s
    by construction. ``batches()`` pads to a fixed ``batch_size`` shape:
    one compiled executable forever."""

    def __init__(self, score_fn, tokenizer, max_len: int, batch_size: int,
                 with_token_type_ids: bool, arch: str):
        self.score_fn = score_fn
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.batch_size = batch_size
        self.with_token_type_ids = with_token_type_ids
        self.arch = arch

    def score_texts(self, query: str, passages: List[object]) -> np.ndarray:
        """Cross-encoder scores for (query, passage) pairs, in input
        order. ``passages`` are ``Passage`` values (plain text or titled
        dicts — the docstore/load_passages contract). Caller holds the
        device lock."""
        from cldrd_tpu.data.reranking_dataset import RerankingDataset

        ds = RerankingDataset.from_pairs(
            [(0, i) for i in range(len(passages))],
            {0: query}, dict(enumerate(passages)), self.tokenizer,
            is_cross_encoder=True, max_len=self.max_len,
            with_token_type_ids=self.with_token_type_ids,
        )
        out = np.zeros(len(passages), np.float32)
        for batch in ds.batches(self.batch_size):
            scores = self.score_fn(batch)
            for i in range(batch.n_valid):
                out[int(batch.pids[i])] = float(scores[i])
        return out


class SearchService:
    """Tokenize -> encode -> exact top-k, behind one device lock."""

    def __init__(self, tokenizer, encode_fn, index, max_length: int,
                 encode_batch: int, default_k: int,
                 dynamic_batching: bool = True,
                 max_batch_wait_ms: float = 2.0,
                 passage_encode_fn=None,
                 passage_max_length: int = 256,
                 index_loader=None,
                 reranker: Optional[Reranker] = None,
                 docstore=None,
                 max_pending: int = 256):
        self.tokenizer = tokenizer
        self.encode_fn = encode_fn
        self.index = index
        # two-stage serving: cross-encoder + id->text resolution for it
        self.reranker = reranker
        self.docstore = docstore
        # texts of documents added live via /add, so they stay rerankable
        # even though the docstore TSV predates them
        self._live_texts: dict = {}
        # blue/green reloads (POST /reload): loads a store dir with the SAME
        # mode the daemon started with (flat/IVF, HBM dtype, precision)
        self._index_loader = index_loader
        self.max_length = max_length
        self.encode_batch = encode_batch
        self.default_k = default_k
        # live updates (POST /add): documents encode with the passage tower
        self.passage_encode_fn = passage_encode_fn
        self.passage_max_length = passage_max_length
        self.dynamic_batching = dynamic_batching
        self.max_batch_wait_ms = max_batch_wait_ms
        # backpressure: reject (503) rather than queue beyond this many
        # pending requests — the device drains at a bounded rate, so an
        # unbounded queue converts a burst into unbounded memory + latency
        self.max_pending = int(max_pending)
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "queries": 0, "device_batches": 0,
                      "reranked_queries": 0, "rejected_overload": 0}
        # guards stats increments (handler threads race) and the
        # enqueue-vs-close ordering: enqueues hold it, and close() swaps
        # _worker to None under it BEFORE posting the shutdown sentinel, so
        # the sentinel is always the LAST queue item — the FIFO worker
        # therefore drains every real request before it exits and no
        # waiter can be abandoned
        self._state_lock = threading.Lock()
        # request latency ring (seconds), for /healthz p50/p99
        self._latencies = collections.deque(maxlen=2048)
        self._queue: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        if dynamic_batching:
            self._worker = threading.Thread(
                target=self._worker_loop, name="cldrd-serve-batcher",
                daemon=True,
            )
            self._worker.start()

    def close(self) -> None:
        with self._state_lock:
            worker, self._worker = self._worker, None
            if worker is None:
                return
            self._queue.put(_SHUTDOWN)
        worker.join(timeout=60)

    # ------------------------------------------------- batching worker
    def _worker_loop(self) -> None:
        while True:
            first = self._queue.get()
            if first is _SHUTDOWN:
                return
            group = [first]
            total = len(first.texts)
            deadline = time.perf_counter() + self.max_batch_wait_ms / 1e3
            while total < self.encode_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is _SHUTDOWN:
                    self._finish_group(group)
                    return
                group.append(nxt)
                total += len(nxt.texts)
            self._finish_group(group)

    def _finish_group(self, group: List[_Pending]) -> None:
        texts: List[str] = []
        for p in group:
            texts.extend(p.texts)
        # every pass runs at default_k (requests validate k <= default_k
        # before enqueuing): one compiled executable forever — a novel k
        # can neither force a fresh XLA compile inside a shared pass nor
        # couple strangers to its cost
        try:
            all_results = self._search_device(texts, self.default_k)
        except Exception as e:  # deliver the failure to every waiter
            for p in group:
                p.error = e
                p.event.set()
            return
        off = 0
        for p in group:
            span = all_results[off : off + len(p.texts)]
            p.results = [_filter_ranked(ranked, p.exclude, p.k)
                         for ranked in span]
            off += len(p.texts)
            p.event.set()

    def warmup(self) -> None:
        """Compile the steady-state executables before serving traffic —
        including the passage tower, so the first /add does not hold the
        device lock through a multi-second XLA compile.

        Search warms EVERY batch size the micro-batcher can produce after
        padding. Each index class reports the representative sizes itself
        (``warmup_batch_sizes``, kept next to its own padding policy): the
        flat index pads all small batches to one shape (one warm search),
        the IVF index pads to powers of two (one per pow2), and a future
        index type cannot silently fall out of coverage."""
        with self._lock:
            self._warm_searches(self.index)
            if self.passage_encode_fn is not None:
                ptokens = self.tokenizer(["warmup"], self.passage_max_length)
                np.asarray(self.passage_encode_fn(
                    self._pad(ptokens, self.encode_batch)))
            if self.reranker is not None:
                # batches() pads to the fixed rerank batch shape, so one
                # call compiles THE cross-encoder executable
                self.reranker.score_texts("warmup", ["warmup"])

    def _pad(self, tokens, to: int):
        n = tokens["input_ids"].shape[0]
        if n >= to:
            return tokens
        return {
            k: np.concatenate(
                [v, np.zeros((to - n, v.shape[1]), v.dtype)]
            ) for k, v in tokens.items()
        }

    def search(self, texts: List[str], k: Optional[int], exclude_ids=None,
               rerank_k=None):
        """``exclude_ids``: per-request result exclusion (FAISS
        ``IDSelectorNot`` equivalence, the "don't show these again" serving
        filter) — implemented by over-fetch: every pass already computes
        top-``default_k``, and the request's k + |exclude| must fit under
        that ceiling so k survivors are guaranteed after filtering.

        ``rerank_k``: two-stage mode — the first stage fetches the top
        rerank_k (after exclusion), the resident cross-encoder rescores
        them against docstore texts, and the top k BY TEACHER SCORE come
        back with both scores. The first stage still coalesces through the
        micro-batcher; only the per-request second stage runs outside it
        (its batch is the request's own rerank_k pairs — already device-
        sized work)."""
        k = int(k or self.default_k)
        exclude = frozenset(int(i) for i in (exclude_ids or ()))
        if rerank_k is not None:
            if self.reranker is None:
                raise ValueError(
                    "this service carries no cross-encoder; restart with "
                    "--reranker to use rerank_k")
            rerank_k = int(rerank_k)
            if not 1 <= k <= rerank_k:
                raise ValueError(
                    f"k must be in [1, rerank_k] ({k} vs rerank_k="
                    f"{rerank_k}): the second stage returns the top k of "
                    "the rerank_k retrieved candidates")
        fetch_k = rerank_k if rerank_k is not None else k
        if not 1 <= fetch_k <= self.default_k:
            # validated in the REQUEST thread, before any coalescing:
            # a bad k 400s its own request and never joins a group
            raise ValueError(
                f"k must be in [1, {self.default_k}] (--topk sets the "
                f"serving ceiling; every pass computes top-{self.default_k} "
                f"and slices)"
            )
        if fetch_k + len(exclude) > self.default_k:
            raise ValueError(
                f"k + len(exclude_ids) ({fetch_k} + {len(exclude)}) exceeds "
                f"the serving ceiling {self.default_k} (--topk): the "
                "exclusion filter over-fetches from the same per-pass top-k")
        if not texts:
            return []
        t0 = time.perf_counter()
        with self._state_lock:
            worker = self._worker
            if worker is not None and self._queue.qsize() >= self.max_pending:
                # reject BEFORE enqueuing (and before counting the request
                # as accepted): the queue depth stays bounded under burst
                self.stats["rejected_overload"] += 1
                raise ServiceOverloaded(self._queue.qsize())
            self.stats["requests"] += 1
            self.stats["queries"] += len(texts)
            if worker is not None:
                pending = _Pending(texts, fetch_k, exclude)
                self._queue.put(pending)
        if worker is None:
            out = [_filter_ranked(r, exclude, fetch_k)
                   for r in self._search_device(texts, self.default_k)]
        else:
            # the worker always answers (see _state_lock invariant); the
            # timeout is a safety valve, not an expected path
            if not pending.event.wait(timeout=600):
                raise RuntimeError(
                    "search timed out waiting for the device worker")
            if pending.error is not None:
                raise pending.error
            out = pending.results
        if rerank_k is not None:
            out = [self._rerank_ranked(q, ranked, k)
                   for q, ranked in zip(texts, out)]
        with self._state_lock:
            self._latencies.append(time.perf_counter() - t0)
        return out

    # --------------------------------------------------- second stage

    def _passages_for_ids(self, ids: List[int]) -> List[object]:
        """Resolve retrieved ids to passage texts: the live-/add/ overlay
        first, then the --passages docstore."""
        out = [self._live_texts.get(i) for i in ids]
        missing = [(j, i) for j, (i, t) in enumerate(zip(ids, out))
                   if t is None]
        if missing:
            if self.docstore is None:
                raise ValueError(
                    "retrieved ids cannot be resolved to text: restart "
                    "with --passages <collection.tsv>, or score explicit "
                    "texts via POST /rerank")
            try:
                fetched = self.docstore.get_many([i for _, i in missing])
            except KeyError as e:
                raise ValueError(str(e))
            for (j, _), text in zip(missing, fetched):
                out[j] = text
        return out

    def _rerank_ranked(self, query: str, ranked, k: int):
        """Rescore one query's retrieved hits with the cross-encoder and
        return the top k by teacher score (stable: retrieval order breaks
        teacher-score ties)."""
        if not ranked:
            return ranked
        passages = self._passages_for_ids([h["id"] for h in ranked])
        with self._lock:
            scores = self.reranker.score_texts(query, passages)
        with self._state_lock:
            self.stats["reranked_queries"] += 1
        order = np.argsort(-scores, kind="stable")[:k]
        return [
            {"id": ranked[i]["id"], "score": float(scores[i]),
             "retrieval_score": ranked[i]["score"]}
            for i in order
        ]

    def rerank(self, query: str, passages: List[str], k=None):
        """Standalone second stage over explicit texts (POST /rerank):
        cross-encoder scores, sorted descending, as (index, score)."""
        if self.reranker is None:
            raise ValueError("this service carries no cross-encoder; "
                             "restart with --reranker to use /rerank")
        if not isinstance(query, str):
            raise ValueError("'query' must be a string")
        if (not isinstance(passages, list) or not passages
                or not all(isinstance(t, str) for t in passages)):
            raise ValueError("'passages' must be a non-empty list of strings")
        k = len(passages) if k is None else int(k)
        if not 1 <= k <= len(passages):
            raise ValueError(
                f"k must be in [1, len(passages)] (got {k} for "
                f"{len(passages)} passages)")
        with self._lock:
            scores = self.reranker.score_texts(query, passages)
        with self._state_lock:
            self.stats["reranked_queries"] += 1
        order = np.argsort(-scores, kind="stable")[:k]
        return [{"index": int(i), "score": float(scores[i])} for i in order]

    # ------------------------------------------------------- live updates

    def add_documents(self, ids: List[int], texts: List[str]) -> int:
        """Encode with the passage tower and append to the resident index
        (FAISS ``add_with_ids``; ``FlatIPIndex.add``). The swapped index
        becomes visible to the next device pass; an in-flight pass
        finishes against the old one (eventual consistency)."""
        if self.passage_encode_fn is None:
            raise ValueError("this service was built without a passage "
                             "tower; restart with one to use /add")
        if (not isinstance(texts, list)
                or not all(isinstance(t, str) for t in texts)):
            raise ValueError("'texts' must be a list of strings")
        if len(ids) != len(texts) or not texts:
            raise ValueError("'ids' and 'texts' must be equal-length, "
                             "non-empty lists")
        embs = []
        with self._lock:
            for s in range(0, len(texts), self.encode_batch):
                chunk = texts[s : s + self.encode_batch]
                tokens = self.tokenizer(chunk, self.passage_max_length)
                tokens = self._pad(tokens, self.encode_batch)
                embs.append(
                    np.asarray(self.passage_encode_fn(tokens))[: len(chunk)])
            new = self.index.add(
                np.concatenate(embs), np.asarray(ids, np.int64))
            self.index = new
        if self.reranker is not None:
            # keep live-added docs rerankable (the docstore TSV predates
            # them); GIL-atomic dict writes, reads are .get()
            for i, t in zip(ids, texts):
                self._live_texts[int(i)] = t
        return new.n_vectors

    def remove_documents(self, ids: List[int]) -> int:
        """Tombstone documents (FAISS ``remove_ids``; ``FlatIPIndex.remove``)."""
        if not ids:
            raise ValueError("'ids' must be a non-empty list")
        with self._lock:
            self.index = self.index.remove([int(i) for i in ids])
            n = self.index.n_vectors
        for i in ids:
            self._live_texts.pop(int(i), None)
        return n

    def reload_index(self, index_dir: str) -> int:
        """Blue/green index swap: load a NEW store (same mode as startup)
        and warm its executables OUTSIDE the device lock — in-flight passes
        keep answering against the old index — then swap atomically. The
        restart-free path from a rebuilt/snapshotted index to live traffic.
        """
        if self._index_loader is None:
            raise ValueError("this service carries no index loader; "
                             "restart to change the index")
        if not isinstance(index_dir, str) or not index_dir:
            raise ValueError("'dir' must be a non-empty path string")
        try:
            new = self._index_loader(index_dir)
        except (OSError, FileNotFoundError) as e:
            raise ValueError(f"cannot load index from {index_dir}: {e}")
        # pre-compile the new index's search executables (device ops from
        # this thread serialize with in-flight passes at the JAX level;
        # the service lock only guards the index-pointer swap)
        self._warm_searches(new)
        with self._lock:
            self.index = new
            return new.n_vectors

    def _warm_searches(self, index) -> None:
        """Search ``index`` once per batch size it can dispatch (each index
        class reports its own padded-shape representatives) so no live
        request absorbs an XLA compile."""
        tokens = self._pad(self.tokenizer(["warmup"], self.max_length),
                           self.encode_batch)
        embs = np.asarray(self.encode_fn(tokens))
        for b in getattr(index, "warmup_batch_sizes",
                         lambda mb: [min(mb, 128)])(self.encode_batch):
            index.search(embs[:b], self.default_k)

    def save_index(self, out_dir: str) -> int:
        """Persist the LIVE index state — the FAISS ``write_index`` of a
        mutated resident index. Without this, every /add//remove since
        startup dies with the process. Holds the device lock (consistent
        snapshot: no pass or update runs mid-save)."""
        if not isinstance(out_dir, str) or not out_dir:
            raise ValueError("'dir' must be a non-empty path string")
        with self._lock:
            self.index.save(out_dir)
            return self.index.n_vectors

    def latency_ms(self) -> dict:
        """p50/p99/mean over the most recent requests (ring of 2048)."""
        with self._state_lock:  # deque iteration races concurrent appends
            lat = sorted(self._latencies)
        if not lat:
            return {}
        n = len(lat)
        return {
            "latency_p50_ms": round(lat[n // 2] * 1e3, 2),
            "latency_p99_ms": round(lat[min(n - 1, int(n * 0.99))] * 1e3, 2),
            "latency_mean_ms": round(sum(lat) / n * 1e3, 2),
        }

    def _search_device(self, texts: List[str], k: int):
        """One locked encode+search pass over ``texts`` (chunked to the
        fixed encode batch shape)."""
        with self._lock:
            self.stats["device_batches"] += 1
            out = []
            for s in range(0, len(texts), self.encode_batch):
                chunk = texts[s : s + self.encode_batch]
                tokens = self.tokenizer(chunk, self.max_length)
                tokens = self._pad(tokens, self.encode_batch)
                # keep the embeddings ON DEVICE: index.search accepts device
                # arrays, so the encode->search hand-off costs no host
                # round-trip (a [128, 768] fetch + re-upload per pass
                # otherwise — ~0.8 MB, ruinous on thin host links)
                embs = self.encode_fn(tokens)[: len(chunk)]
                scores, ids = self.index.search(embs, k)
                for r in range(len(chunk)):
                    valid = ids[r] >= 0
                    out.append([
                        {"id": int(i), "score": float(v)}
                        for i, v in zip(ids[r][valid], scores[r][valid])
                    ])
            return out


class _Handler(BaseHTTPRequestHandler):
    service: SearchService = None  # set by serve()

    def _reply(self, code: int, payload: dict,
               headers: Optional[dict] = None) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for name, value in (headers or {}).items():
            self.send_header(name, value)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/healthz":
            payload = {
                "ok": True,
                "n_vectors": self.service.index.n_vectors,
                "dim": self.service.index.dim,
                **self.service.stats,
                **self.service.latency_ms(),
            }
            idx = self.service.index
            if hasattr(idx, "nprobe"):  # IVF mode: surface the probe config
                payload["nprobe"] = idx.nprobe
                payload["n_buckets"] = idx.n_buckets
            if hasattr(idx, "factor"):  # refine tier on top
                payload["refine_factor"] = idx.factor
            if self.service.reranker is not None:
                payload["reranker"] = self.service.reranker.arch
            self._reply(200, payload)
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path not in ("/search", "/add", "/remove", "/save",
                             "/reload", "/rerank"):
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            t0 = time.perf_counter()
            if self.path == "/search":
                queries = req["queries"]
                if not isinstance(queries, list) or not all(
                    isinstance(q, str) for q in queries
                ):
                    raise ValueError("'queries' must be a list of strings")
                results = self.service.search(
                    queries, req.get("k"),
                    exclude_ids=req.get("exclude_ids"),
                    rerank_k=req.get("rerank_k"))
                payload = {"results": results}
            elif self.path == "/rerank":
                results = self.service.rerank(
                    req["query"], req["passages"], req.get("k"))
                payload = {"results": results}
            elif self.path == "/add":
                n = self.service.add_documents(
                    [int(i) for i in req["ids"]], req["texts"])
                payload = {"ok": True, "n_vectors": n}
            elif self.path == "/save":
                n = self.service.save_index(req["dir"])
                payload = {"ok": True, "n_vectors": n, "dir": req["dir"]}
            elif self.path == "/reload":
                n = self.service.reload_index(req["dir"])
                payload = {"ok": True, "n_vectors": n, "dir": req["dir"]}
            else:
                n = self.service.remove_documents(
                    [int(i) for i in req["ids"]])
                payload = {"ok": True, "n_vectors": n}
            payload["elapsed_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
            self._reply(200, payload)
        except (KeyError, TypeError, ValueError, OverflowError,
                json.JSONDecodeError) as e:
            # OverflowError: numpy >= 2 raises it for out-of-range int
            # casts (e.g. a remove id beyond int64) — still a client error
            self._reply(400, {"error": str(e)})
        except NotImplementedError as e:
            self._reply(400, {"error": str(e)})
        except ServiceOverloaded as e:
            # backpressure: the pending queue is full — tell the client
            # when to come back instead of queueing without bound
            self._reply(503, {"error": str(e)},
                        headers={"Retry-After": str(e.retry_after_s)})
        except RuntimeError as e:
            # e.g. the device-worker wait timed out: the client gets a
            # status-coded JSON error, not a dropped connection
            self._reply(503, {"error": str(e)})

    def log_message(self, fmt, *args):
        logger.info("%s " + fmt, self.address_string(), *args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True, help="index directory (from cli.index)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--topk", type=int, default=1000, help="default k")
    p.add_argument("--max-length", type=int, default=30)
    p.add_argument("--passage-max-length", type=int, default=256,
                   help="tokenized length for documents added live via "
                        "POST /add")
    p.add_argument("--encode-batch-size", type=int, default=128)
    p.add_argument("--hbm-dtype", default="bfloat16",
                   choices=("bfloat16", "float32", "int8"))
    p.add_argument("--shards", type=int, default=1,
                   help="shard the corpus over this many local devices; "
                        "0 = all local devices. Applies to every index "
                        "tier (flat, IVF, IVFPQ) — FAISS shards any index "
                        "type, and so does this daemon")
    p.add_argument("--ivf", action="store_true",
                   help="serve from the IVF index at <index>/ivf "
                        "(built by cldrd-index --ivf-nlist): probes "
                        "--nprobe cells per query instead of scanning the "
                        "whole corpus — the low-latency mode for small "
                        "request batches. Combines with --shards (buckets "
                        "row-shard over the mesh, probe merge over ICI); "
                        "live /add and /remove require an unsharded index")
    p.add_argument("--nprobe", type=int, default=None,
                   help="IVF cells probed per query (default: the value "
                        "stored at build time); higher = better recall, "
                        "nprobe=n_buckets = exact")
    p.add_argument("--refine-factor", type=int, default=None,
                   help="with --ivf: re-score the top k*FACTOR first-tier "
                        "candidates EXACTLY against the flat disk store at "
                        "<index> (memmap'd, zero HBM — FAISS "
                        "IndexRefineFlat equivalence) and return the "
                        "refined top-k. Recovers most of the PQ/bf16 "
                        "first-tier recall loss")
    p.add_argument("--reranker", choices=("distilbert", "bert"), default=None,
                   help="keep a cross-encoder second stage resident: "
                        "enables POST /rerank and the 'rerank_k' field on "
                        "/search ('bert' = the reference MiniLM teacher's "
                        "family)")
    p.add_argument("--reranker-checkpoint", default=None,
                   help="cross-encoder weights (.msgpack or torch "
                        ".pth.tar/HF state dict); omitted = random init "
                        "(tests only)")
    p.add_argument("--reranker-size", choices=("full", "tiny"),
                   default="full",
                   help="'full' = MiniLM-L6 shape for --reranker bert, "
                        "distilbert-base otherwise")
    p.add_argument("--reranker-config", default=None,
                   help="cross-encoder config overrides as a JSON file "
                        "path or inline JSON (takes precedence over "
                        "--reranker-size)")
    p.add_argument("--reranker-tokenizer", default=None,
                   help="tokenizer for the cross-encoder (default: "
                        "--tokenizer)")
    p.add_argument("--rerank-max-length", type=int, default=256,
                   help="joined [CLS] q [SEP] p [SEP] length for the "
                        "second stage")
    p.add_argument("--rerank-batch-size", type=int, default=32,
                   help="fixed pair-batch shape for the cross-encoder "
                        "executable")
    p.add_argument("--passages", default=None,
                   help="collection TSV (pid\\ttext or pid\\ttitle\\tpara) "
                        "mmap'd as a docstore so /search rerank_k can "
                        "resolve retrieved ids to texts")
    p.add_argument("--max-batch-wait-ms", type=float, default=2.0,
                   help="dynamic micro-batching window: how long the "
                        "device worker waits for more concurrent requests "
                        "before launching a pass")
    p.add_argument("--no-dynamic-batching", action="store_true",
                   help="process each request in its own device pass")
    p.add_argument("--max-pending", type=int, default=256,
                   help="backpressure: reject requests with 503 + "
                        "Retry-After once this many are already queued "
                        "for the device worker (bounds queue memory and "
                        "tail latency under burst)")
    p.add_argument("--precision", default="default",
                   choices=("default", "high", "highest"))
    add_model_args(p)
    return p


def make_service(args) -> SearchService:
    args.share_weights = bool(args.share_weights)
    cfg = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)
    model = NwayDualEncoder(
        config=cfg, share_weights=args.share_weights, dtype=jnp.bfloat16,
        apply_cosine_similarity=args.cosine,
    )
    params = load_dual_encoder_params(
        args.checkpoint, model, cfg, args.share_weights,
        max_query_len=args.max_length,
    )
    for flag, val in (("--max-length", args.max_length),
                      ("--passage-max-length", args.passage_max_length)):
        if val > cfg.max_position_embeddings:
            raise SystemExit(
                f"{flag} {val} exceeds the model's max_position_embeddings"
                f"={cfg.max_position_embeddings}")
    mesh = None
    if args.shards != 1:
        from cldrd_tpu.parallel import CORPUS_AXIS, make_mesh

        mesh = make_mesh(args.shards or None, CORPUS_AXIS)
    hbm_dtype = jnp.dtype({"float32": jnp.float32, "int8": jnp.int8}
                          .get(args.hbm_dtype, jnp.bfloat16))
    use_ivf = getattr(args, "ivf", False)
    if use_ivf and args.nprobe is not None and args.nprobe < 1:
        raise SystemExit(f"--nprobe must be >= 1 (got {args.nprobe})")
    if getattr(args, "refine_factor", None) is not None:
        if not use_ivf:
            raise SystemExit("--refine-factor requires --ivf (the flat "
                             "index is already exact)")
        if args.refine_factor < 1:
            raise SystemExit(
                f"--refine-factor must be >= 1 (got {args.refine_factor})")

    def index_loader(index_dir: str):
        """Load ``index_dir`` with the daemon's startup mode — used at
        startup and by POST /reload (blue/green swaps keep flat/IVF mode,
        HBM dtype, precision, and nprobe)."""
        if use_ivf:
            import os

            from cldrd_tpu.index import IVFIndex, ivf_exists

            # accept either the parent store dir or the ivf dir itself
            ivf_dir = (index_dir if ivf_exists(index_dir)
                       else os.path.join(index_dir, "ivf"))
            if not ivf_exists(ivf_dir):
                raise ValueError(
                    f"no IVF index at {ivf_dir}: build one with "
                    "cldrd-index --ivf-nlist N (or drop --ivf)")
            import json

            from cldrd_tpu.index.ivf_index import IVF_META_NAME

            with open(os.path.join(ivf_dir, IVF_META_NAME)) as f:
                is_pq = json.load(f)["dtype"] == "pq"
            # a PQ store's device representation is fixed (uint8 codes,
            # fp32 LUT scoring): --hbm-dtype does not apply to it
            # mesh-sharded load (FAISS shards any index type into serving,
            # reference retrieval_utils.py:164-182): buckets row-shard over
            # the corpus axis, centroids/codebooks replicate, probe results
            # merge over ICI — answers are identical to the single-device
            # load (tests/test_ivf.py::TestShardedIVF)
            idx = IVFIndex.load(
                ivf_dir, dtype=None if is_pq else hbm_dtype,
                precision=args.precision, mesh=mesh)
            if args.nprobe is not None:
                idx.nprobe = min(args.nprobe, idx.n_buckets)
            logger.info("IVF%s serving: %d buckets x %d slot, nprobe=%d%s",
                        "PQ" if is_pq else "", idx.n_buckets, idx.slot,
                        idx.nprobe,
                        "" if mesh is None else
                        f", sharded over {mesh.devices.size} devices")
            if args.refine_factor:
                from cldrd_tpu.index import DiskRefiner, RefinedIndex
                from cldrd_tpu.index.persistence import index_exists

                if not index_exists(index_dir):
                    raise ValueError(
                        f"--refine-factor needs the flat embedding store "
                        f"at {index_dir} (point --index at the parent "
                        "store dir, not the ivf subdir)")
                idx = RefinedIndex(idx, DiskRefiner(index_dir),
                                   factor=args.refine_factor)
                logger.info("refine tier: exact disk re-scoring of the "
                            "top k*%d first-tier candidates",
                            args.refine_factor)
            return idx
        return load_index(
            index_dir, mesh=mesh, dtype=hbm_dtype, precision=args.precision)

    try:
        index = index_loader(args.index)
    except ValueError as e:
        raise SystemExit(str(e))
    encode = make_encode_fn(model, params, "query_embs")
    passage_encode = make_encode_fn(model, params, "passage_embs")
    reranker = _build_reranker(args)
    docstore = None
    if getattr(args, "passages", None):
        from cldrd_tpu.data import TsvDocStore

        docstore = TsvDocStore(args.passages)
        logger.info("docstore: %d passages mmap'd from %s",
                    len(docstore), args.passages)
    return SearchService(
        tokenizer, encode, index, args.max_length,
        args.encode_batch_size, args.topk,
        dynamic_batching=not args.no_dynamic_batching,
        max_batch_wait_ms=args.max_batch_wait_ms,
        passage_encode_fn=passage_encode,
        passage_max_length=args.passage_max_length,
        index_loader=index_loader,
        reranker=reranker,
        docstore=docstore,
        max_pending=args.max_pending,
    )


def _reranker_config(args):
    """Cross-encoder config: 'bert' full = the MiniLM-L6 teacher shape
    (the reference's actual teacher, ``reranking_evaluator.py:292``)."""
    if args.reranker == "bert":
        from cldrd_tpu.models import BertConfig as cfg_cls
    else:
        from cldrd_tpu.models import DistilBertConfig as cfg_cls
    spec = args.reranker_config
    if spec:
        import os

        overrides = (json.load(open(spec)) if os.path.exists(spec)
                     else json.loads(spec))
        return cfg_cls(**overrides)
    if args.reranker_size == "tiny":
        return cfg_cls.tiny()
    return (cfg_cls.minilm_l6() if args.reranker == "bert" else cfg_cls())


def _build_reranker(args) -> Optional[Reranker]:
    if not getattr(args, "reranker", None):
        return None
    from cldrd_tpu.evaluation.reranking_evaluator import (
        make_cross_encoder_score_fn,
    )
    from cldrd_tpu.models import CrossEncoder

    from .create_training_data import _teacher_params

    rcfg = _reranker_config(args)
    rmodel = CrossEncoder(config=rcfg, dtype=jnp.bfloat16,
                          arch=args.reranker)
    if not args.reranker_checkpoint:
        logger.warning("--reranker without --reranker-checkpoint: the "
                       "second stage scores with RANDOM weights")
    rparams = _teacher_params(args.reranker_checkpoint, rmodel, rcfg,
                              arch=args.reranker)
    rtok = build_tokenizer(args.reranker_tokenizer or args.tokenizer,
                           vocab_size=rcfg.vocab_size)
    if args.rerank_max_length > rcfg.max_position_embeddings:
        raise SystemExit(
            f"--rerank-max-length {args.rerank_max_length} exceeds the "
            "cross-encoder's max_position_embeddings="
            f"{rcfg.max_position_embeddings}")
    logger.info("reranker: %s cross-encoder resident (pair batch %d x %d)",
                args.reranker, args.rerank_batch_size,
                args.rerank_max_length)
    return Reranker(
        make_cross_encoder_score_fn(rmodel, rparams), rtok,
        args.rerank_max_length, args.rerank_batch_size,
        with_token_type_ids=args.reranker == "bert", arch=args.reranker,
    )


def serve(args, ready_event: Optional[threading.Event] = None):
    """Build the service, warm it up, serve forever. ``ready_event`` (for
    tests) is set once the socket is bound and executables are compiled."""
    service = make_service(args)
    service.warmup()
    handler = type("BoundHandler", (_Handler,), {"service": service})
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    logger.info(
        "serving %d vectors on http://%s:%d (k=%d)",
        service.index.n_vectors, args.host, httpd.server_address[1], args.topk,
    )
    if ready_event is not None:
        ready_event.set()
    return httpd


def main(argv: Optional[List[str]] = None) -> int:
    setup_logging()
    args = build_parser().parse_args(argv)
    httpd = serve(args)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.RequestHandlerClass.service.close()
        httpd.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
