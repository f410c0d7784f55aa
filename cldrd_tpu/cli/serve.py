"""Serve the index: a resident query daemon over HTTP.

The reference stops at batch retrieval-to-file
(``retriever/retrieve_top_passages.py``); every invocation re-loads the
checkpoint and re-clones the FAISS index to GPU (~27 GB). This entrypoint
completes the production-serving story the framework is built for: load
the query tower and the corpus index into TPU HBM ONCE, pre-compile the
encode and search executables, then answer queries until stopped.

API (stdlib ``http.server``, JSON over POST — zero extra dependencies):

- ``POST /search``  {"queries": ["text", ...], "k": 10}
  -> {"results": [[{"id": int, "score": float}, ...], ...],
      "elapsed_ms": float}
- ``GET /healthz``  -> {"ok": true, "n_vectors": N, "dim": D}

Queries tokenize host-side, encode on device (batch padded to a fixed
shape so the steady state reuses one executable), and search through
``FlatIPIndex.search`` (positions-mode exact MIPS + per-query certificate
recovery). Device access serializes through a lock — one TPU program at a
time; HTTP handling itself is threaded.
"""
from __future__ import annotations

import argparse
import json
import logging
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


class SearchService:
    """Tokenize -> encode -> exact top-k, behind one device lock."""

    def __init__(self, tokenizer, encode_fn, index, max_length: int,
                 encode_batch: int, default_k: int):
        self.tokenizer = tokenizer
        self.encode_fn = encode_fn
        self.index = index
        self.max_length = max_length
        self.encode_batch = encode_batch
        self.default_k = default_k
        self._lock = threading.Lock()

    def warmup(self) -> None:
        """Compile the steady-state executables before serving traffic."""
        with self._lock:
            tokens = self.tokenizer(["warmup"], self.max_length)
            tokens = self._pad(tokens, self.encode_batch)
            embs = np.asarray(self.encode_fn(tokens))
            self.index.search(embs[:1], self.default_k)

    def _pad(self, tokens, to: int):
        n = tokens["input_ids"].shape[0]
        if n >= to:
            return tokens
        return {
            k: np.concatenate(
                [v, np.zeros((to - n, v.shape[1]), v.dtype)]
            ) for k, v in tokens.items()
        }

    def search(self, texts: List[str], k: Optional[int]):
        k = int(k or self.default_k)
        n = len(texts)
        if n == 0:
            return []
        with self._lock:
            out = []
            for s in range(0, n, self.encode_batch):
                chunk = texts[s : s + self.encode_batch]
                tokens = self.tokenizer(chunk, self.max_length)
                tokens = self._pad(tokens, self.encode_batch)
                embs = np.asarray(self.encode_fn(tokens))[: len(chunk)]
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

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/healthz":
            self._reply(200, {
                "ok": True,
                "n_vectors": self.service.index.n_vectors,
                "dim": self.service.index.dim,
            })
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/search":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            queries = req["queries"]
            if not isinstance(queries, list) or not all(
                isinstance(q, str) for q in queries
            ):
                raise ValueError("'queries' must be a list of strings")
            t0 = time.perf_counter()
            results = self.service.search(queries, req.get("k"))
            self._reply(200, {
                "results": results,
                "elapsed_ms": round((time.perf_counter() - t0) * 1e3, 2),
            })
        except (KeyError, ValueError, json.JSONDecodeError) as e:
            self._reply(400, {"error": str(e)})

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
    p.add_argument("--encode-batch-size", type=int, default=128)
    p.add_argument("--hbm-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--precision", default="default",
                   choices=("default", "high", "highest"))
    add_model_args(p)
    return p


def make_service(args) -> SearchService:
    args.share_weights = bool(args.share_weights)
    cfg = model_config_from_args(args)
    tokenizer = build_tokenizer(args.tokenizer, vocab_size=cfg.vocab_size)
    model = NwayDualEncoder(
        config=cfg, share_weights=args.share_weights, dtype=jnp.bfloat16
    )
    params = load_dual_encoder_params(
        args.checkpoint, model, cfg, args.share_weights,
        max_query_len=args.max_length,
    )
    index = load_index(
        args.index,
        dtype=jnp.float32 if args.hbm_dtype == "float32" else jnp.bfloat16,
        precision=args.precision,
    )
    encode = make_encode_fn(model, params, "query_embs")
    return SearchService(
        tokenizer, encode, index, args.max_length,
        args.encode_batch_size, args.topk,
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
        httpd.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
