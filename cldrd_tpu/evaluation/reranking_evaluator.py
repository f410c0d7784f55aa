"""Model-in-the-loop reranking evaluation.

Capability parity with the reference ``evaluation/reranking_evaluator.py``
(``RerankingEvaluator.compute_metrics(model, dataloader)`` ``:25-105``,
``direct_compute_metric`` ``:107-119``, metric core ``:121-248``) and with
the referenced-but-missing ``evaluation/continue_rerank_evaluator.py``
(SURVEY §2.4: periodic dev-set rerank evaluation over a folder of
checkpoints, ``scripts/unity/continue_rerank_evaluator.sh``).

Also provides a working ``write_rankdata`` — the reference's copy
(``evaluation/utils.py:145-178``) is broken by orphaned pasted code.

TPU-first design: scoring runs as one jitted fixed-shape program per batch
(dual-encoder dot or cross-encoder head); ranklist grouping and the metric
arithmetic stay host-side numpy, shared bit-for-bit with
``RankingEvaluator``.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from cldrd_tpu.data.reranking_dataset import RerankBatch, RerankingDataset

from .ranking_evaluator import RankingEvaluator

ScoreFn = Callable[[RerankBatch], np.ndarray]  # batch -> [bz] float scores


def make_dual_encoder_score_fn(model, params) -> ScoreFn:
    """Score (q, p) pairs with a dual encoder: dot(CLS_q, CLS_p)
    (reference ``reranking_evaluator.py:72-88`` dual path)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _score(params, query, passage):
        q = model.apply({"params": params}, query, method=model.query_embs)
        p = model.apply({"params": params}, passage, method=model.passage_embs)
        return jnp.einsum("bd,bd->b", q, p, preferred_element_type=jnp.float32)

    def fn(batch: RerankBatch) -> np.ndarray:
        assert batch.query is not None and batch.passage is not None
        return np.asarray(_score(params, batch.query, batch.passage))

    return fn


def make_cross_encoder_score_fn(model, params) -> ScoreFn:
    """Score concatenated (q ++ p) sequences with a cross encoder
    (reference ``reranking_evaluator.py:89-105`` cross path)."""
    import jax

    @jax.jit
    def _score(params, pairs):
        return model.apply({"params": params}, pairs)

    def fn(batch: RerankBatch) -> np.ndarray:
        assert batch.query_passage is not None
        return np.asarray(_score(params, batch.query_passage))

    return fn


def write_rankdata(
    qid_to_ranklist: Dict[int, Sequence[Tuple[int, float]]], path: str
) -> None:
    """Write scored ranklists as a ``qid\\tpid\\trank\\tscore`` run TSV."""
    with open(path, "w", encoding="utf-8") as f:
        for qid, ranked in qid_to_ranklist.items():
            for rank, (pid, score) in enumerate(ranked, start=1):
                f.write(f"{qid}\t{pid}\t{rank}\t{score:.6f}\n")


class RerankingEvaluator(RankingEvaluator):
    """Evaluate a scoring model over (qid, pid) candidate pairs."""

    def score_pairs(
        self,
        score_fn: ScoreFn,
        dataset: RerankingDataset,
        batch_size: int = 128,
        bucket_lengths: Optional[List[int]] = None,
        pack_pairs: bool = False,
    ) -> Dict[int, List[Tuple[int, float]]]:
        """Score every pair and group into per-query ranklists sorted by
        score descending (stable, so run-file order breaks ties).

        ``bucket_lengths`` (a list, possibly empty for the default ladder)
        switches to length-bucketed batches: identical scores at
        ~token-proportional device cost (``RerankingDataset.batches_bucketed``;
        one executable per bucket). ``pack_pairs`` (cross-encoder mode
        only) packs several pairs per row instead — even fewer padding
        FLOPs (``RerankingDataset.batches_packed``)."""
        if pack_pairs:
            batches = dataset.batches_packed(batch_size)
        elif bucket_lengths is not None:
            batches = dataset.batches_bucketed(
                batch_size, list(bucket_lengths) or None
            )
        else:
            batches = dataset.batches(batch_size)
        qid_to_scored: Dict[int, List[Tuple[int, float]]] = {}
        for batch in batches:
            scores = score_fn(batch)
            for i in range(batch.n_valid):
                qid_to_scored.setdefault(int(batch.qids[i]), []).append(
                    (int(batch.pids[i]), float(scores[i]))
                )
        return {
            qid: sorted(pairs, key=lambda x: -x[1])
            for qid, pairs in qid_to_scored.items()
        }

    def compute_metrics(  # type: ignore[override]
        self,
        score_fn: ScoreFn,
        dataset: RerankingDataset,
        batch_size: int = 128,
        rankdata_path: Optional[str] = None,
        bucket_lengths: Optional[List[int]] = None,
    ) -> Dict[int, object]:
        """Rerank with the model, then run the shared metric core."""
        qid_to_scored = self.score_pairs(
            score_fn, dataset, batch_size, bucket_lengths=bucket_lengths
        )
        if rankdata_path is not None:
            write_rankdata(qid_to_scored, rankdata_path)
        ranklists = {
            qid: [pid for pid, _ in scored] for qid, scored in qid_to_scored.items()
        }
        return self.compute_metrics_from_ranklists(ranklists)

    def direct_compute_metric(
        self, qid_to_ranklist: Dict[int, Sequence[int]]
    ) -> Dict[str, float]:
        """Metrics from precomputed ranklists (reference ``:107-119``)."""
        return self.compute_metrics_from_ranklists(dict(qid_to_ranklist))


class ContinueRerankEvaluator:
    """Evaluate every checkpoint in a training run folder — the missing
    ``continue_rerank_evaluator`` capability (SURVEY §2.4).

    ``params_loader(path) -> params`` adapts to checkpoint format (our
    msgpack or converted torch); results accumulate in a step-keyed table.
    """

    def __init__(
        self,
        evaluator: RerankingEvaluator,
        dataset: RerankingDataset,
        score_fn_factory: Callable[[object], ScoreFn],
        params_loader: Callable[[str], object],
        batch_size: int = 128,
        bucket_lengths: Optional[List[int]] = None,
    ):
        self.evaluator = evaluator
        self.dataset = dataset
        self.score_fn_factory = score_fn_factory
        self.params_loader = params_loader
        self.batch_size = batch_size
        self.bucket_lengths = bucket_lengths

    def checkpoints(self, folder: str, prefix: str = "checkpoint") -> List[Tuple[int, str]]:
        out = []
        for path in glob.glob(os.path.join(folder, f"{prefix}_*.msgpack")):
            m = re.search(rf"{prefix}_(\d+)\.msgpack$", path)
            if m:
                out.append((int(m.group(1)), path))
        return sorted(out)

    def evaluate_folder(
        self, folder: str, results_path: Optional[str] = None
    ) -> Dict[int, Dict[str, float]]:
        from cldrd_tpu.utils import MetricMonitor

        monitor = MetricMonitor()
        results: Dict[int, Dict[str, float]] = {}
        for step, path in self.checkpoints(folder):
            params = self.params_loader(path)
            metrics = self.evaluator.compute_metrics(
                self.score_fn_factory(params), self.dataset, self.batch_size,
                bucket_lengths=self.bucket_lengths,
            )
            results[step] = metrics
            monitor.update(step, **{k: float(v) for k, v in metrics.items()})
        if results_path is not None:
            monitor.write(results_path)
        return results
