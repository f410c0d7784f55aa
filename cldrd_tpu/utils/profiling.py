"""Profiling and throughput observability.

The reference's only timing is a wall-clock print in ``index_retrieve``
(``retriever/retrieval_utils.py:133,150-152``); SURVEY §5.1 calls for
first-class passages/sec and QPS plus device traces. This module provides:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of the enclosed region.
- ``PhaseTimer``: named wall-clock phases -> dict / TSV (index build,
  encode, search, merge ... the end-to-end budget breakdown).
- ``Throughput``: running items/sec meter (QPS, passages/sec).
- ``annotate(name)``: ``jax.profiler.TraceAnnotation`` passthrough so hot
  loops show up labeled in the trace viewer.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulate named wall-clock phases.

    >>> t = PhaseTimer()
    >>> with t.phase("encode"): ...
    >>> with t.phase("search"): ...
    >>> t.report()  # {"encode_s": ..., "search_s": ..., "total_s": ...}
    """

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._order: list = []

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self._acc:
                self._order.append(name)
            self._acc[name] = self._acc.get(name, 0.0) + dt

    def report(self) -> Dict[str, float]:
        out = {f"{k}_s": round(self._acc[k], 4) for k in self._order}
        out["total_s"] = round(sum(self._acc.values()), 4)
        return out

    def to_tsv(self) -> str:
        rep = self.report()
        return (
            "\t".join(rep.keys()) + "\n" + "\t".join(str(v) for v in rep.values()) + "\n"
        )


class Throughput:
    """Running items/sec with optional window reporting."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._items = 0

    def update(self, n_items: int) -> None:
        self._items += n_items

    @property
    def items(self) -> int:
        return self._items

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def per_second(self) -> float:
        return self._items / max(self.elapsed, 1e-9)

    def report(self, unit: str = "items") -> Dict[str, float]:
        return {
            unit: self._items,
            "elapsed_s": round(self.elapsed, 4),
            f"{unit}_per_s": round(self.per_second, 2),
        }
