from .ranking_evaluator import RankingEvaluator, load_qrels, load_run_ranklists
from .metrics import recall_at, recall_from_files
from .ms_marco_eval import compute_metrics_from_files, quality_checks_qids

__all__ = [
    "RankingEvaluator",
    "load_qrels",
    "load_run_ranklists",
    "recall_at",
    "recall_from_files",
    "compute_metrics_from_files",
    "quality_checks_qids",
]
