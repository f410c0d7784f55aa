from .distilbert import (DistilBertConfig, DistilBertEncoder, cls_pool,
                         resolve_attention_impl)
from .bert import BertConfig, BertEncoder
from .dual_encoder import NwayDualEncoder, DualEncoder
from .cross_encoder import CrossEncoder
from .hf_loader import (
    distilbert_torch_to_flax,
    distilbert_flax_to_torch,
    bert_torch_to_flax,
    bert_flax_to_torch,
    bert_cross_encoder_torch_to_flax,
    dual_encoder_torch_to_flax,
    dual_encoder_flax_to_torch,
    cross_encoder_torch_to_flax,
    load_torch_checkpoint,
    strip_prefix,
)

__all__ = [
    "DistilBertConfig",
    "DistilBertEncoder",
    "BertConfig",
    "BertEncoder",
    "cls_pool",
    "NwayDualEncoder",
    "DualEncoder",
    "CrossEncoder",
    "distilbert_torch_to_flax",
    "resolve_attention_impl",
    "distilbert_flax_to_torch",
    "bert_torch_to_flax",
    "bert_flax_to_torch",
    "bert_cross_encoder_torch_to_flax",
    "dual_encoder_torch_to_flax",
    "dual_encoder_flax_to_torch",
    "cross_encoder_torch_to_flax",
    "load_torch_checkpoint",
    "strip_prefix",
]
