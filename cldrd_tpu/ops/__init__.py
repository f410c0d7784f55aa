from .attention import flash_attention
from .ivf_probe import probe_scores, probe_scores_reference

__all__ = ["flash_attention", "probe_scores", "probe_scores_reference"]
