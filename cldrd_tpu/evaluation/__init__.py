from .ranking_evaluator import RankingEvaluator, load_qrels, load_run_ranklists
from .reranking_evaluator import (
    ContinueRerankEvaluator,
    RerankingEvaluator,
    make_cross_encoder_score_fn,
    make_dual_encoder_score_fn,
    write_rankdata,
)
from .metrics import recall_at, recall_from_files
from .ms_marco_eval import compute_metrics_from_files, quality_checks_qids

__all__ = [
    "RankingEvaluator",
    "RerankingEvaluator",
    "ContinueRerankEvaluator",
    "make_dual_encoder_score_fn",
    "make_cross_encoder_score_fn",
    "write_rankdata",
    "load_qrels",
    "load_run_ranklists",
    "recall_at",
    "recall_from_files",
    "compute_metrics_from_files",
    "quality_checks_qids",
]
