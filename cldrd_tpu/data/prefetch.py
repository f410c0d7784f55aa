"""Host-side batch prefetching.

SURVEY §7 "hard parts": the 8.8M-line parse + tokenization must overlap the
TPU encode stream or the host dominates the <15-min index budget. JAX
dispatch is async, but the *producer* (tokenization, collation) runs on the
Python thread — so a synchronous `for batch in dataset.batches(...)` leaves
the device idle while the host tokenizes the next batch.

``prefetch`` runs the producer iterator in a background thread with a
bounded queue: tokenization of batch N+1..N+depth proceeds while the device
works on batch N. Order is preserved; producer exceptions re-raise at the
consumer; the GIL is released inside the HF Rust tokenizer and the native
TSV parser, so the overlap is real. If the consumer abandons the generator
early (break / exception / GC), a stop event unblocks the producer so the
thread and the underlying iterator are released instead of leaking on the
bounded ``put``.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 4) -> Iterator[T]:
    """Yield from ``iterable`` with up to ``depth`` items produced ahead."""
    assert depth >= 1
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    error = []

    def producer():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised on the consumer thread
            error.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=producer, daemon=True, name="cldrd-prefetch")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        stop.set()
