"""Torch/HF checkpoint -> Flax params conversion.

Re-provides the reference's weight-loading surface in one canonical place:

- HF ``DistilBertModel`` weights (TAS-B init,
  ``sebastian-hofstaetter/distilbert-dot-tas_b-b256-msmarco``,
  reference ``nway_listwise_1.py:106``) -> one encoder param tree.
- Reference training checkpoints ``checkpoint_<step>.pth.tar`` holding
  ``{"state_dict": ...}`` with optional DDP ``module.`` prefixes
  (stripped by consumers at ``index_text.py:64-71`` /
  ``nway_listwise_2.py:301-310``) -> dual-encoder param tree. We strip the
  prefix once, here, instead of at every call site.

Conversion rules (torch -> flax linen):
  Linear    weight [out,in] -> kernel [in,out] (transpose), bias -> bias
  LayerNorm weight -> scale, bias -> bias
  Embedding weight -> embedding (position table stays a raw param)
All params land in fp32 (compute dtype is applied at apply-time).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

Params = Dict[str, Any]


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    # torch tensor without importing torch at module scope
    return t.detach().cpu().numpy().astype(np.float32)


def strip_prefix(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Remove ``prefix`` (e.g. ``module.``) from every matching key."""
    out = {}
    for k, v in state_dict.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def _set(tree: Params, path: list, value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def distilbert_torch_to_flax(state_dict: Mapping[str, Any]) -> Params:
    """Convert one HF ``DistilBertModel`` state_dict to a
    ``DistilBertEncoder`` param tree. Unknown keys (pooler, heads) ignored."""
    sd = strip_prefix(state_dict, "distilbert.")
    params: Params = {}
    layer_re = re.compile(r"^transformer\.layer\.(\d+)\.(.+)$")
    for key, val in sd.items():
        arr = _to_numpy(val)
        if key == "embeddings.word_embeddings.weight":
            _set(params, ["embeddings", "word_embeddings", "embedding"], arr)
        elif key == "embeddings.position_embeddings.weight":
            _set(params, ["embeddings", "position_embeddings"], arr)
        elif key == "embeddings.LayerNorm.weight":
            _set(params, ["embeddings", "LayerNorm", "scale"], arr)
        elif key == "embeddings.LayerNorm.bias":
            _set(params, ["embeddings", "LayerNorm", "bias"], arr)
        else:
            m = layer_re.match(key)
            if not m:
                continue  # pooler / classification heads handled elsewhere
            i, rest = int(m.group(1)), m.group(2)
            base = [f"layer_{i}"]
            if rest.startswith("attention."):
                name, kind = rest[len("attention."):].split(".")
                if kind == "weight":
                    _set(params, base + ["attention", name, "kernel"], arr.T)
                else:
                    _set(params, base + ["attention", name, "bias"], arr)
            elif rest.startswith("ffn."):
                name, kind = rest[len("ffn."):].split(".")
                if kind == "weight":
                    _set(params, base + [name, "kernel"], arr.T)
                else:
                    _set(params, base + [name, "bias"], arr)
            elif rest.startswith(("sa_layer_norm.", "output_layer_norm.")):
                name, kind = rest.split(".")
                flax_kind = "scale" if kind == "weight" else "bias"
                _set(params, base + [name, flax_kind], arr)
    return params


def dual_encoder_torch_to_flax(
    state_dict: Mapping[str, Any], share_weights: bool = False
) -> Params:
    """Convert a reference ``NwayDualEncoder`` state_dict (optionally
    ``module.``-prefixed) into our ``NwayDualEncoder`` param tree."""
    sd = strip_prefix(state_dict, "module.")
    towers: Dict[str, Dict[str, Any]] = {"query_encoder": {}, "passage_encoder": {}}
    for key, val in sd.items():
        for tower in towers:
            prefix = tower + "."
            if key.startswith(prefix):
                towers[tower][key[len(prefix):]] = val
    if share_weights:
        src = towers["query_encoder"] or towers["passage_encoder"]
        return {"encoder": distilbert_torch_to_flax(src)}
    return {
        "query_encoder": distilbert_torch_to_flax(towers["query_encoder"]),
        "passage_encoder": distilbert_torch_to_flax(towers["passage_encoder"]),
    }


def cross_encoder_torch_to_flax(state_dict: Mapping[str, Any]) -> Params:
    """Convert HF ``DistilBertForSequenceClassification`` weights into our
    ``CrossEncoder`` param tree (encoder + pre_classifier + classifier)."""
    sd = strip_prefix(state_dict, "module.")
    params: Params = {"encoder": distilbert_torch_to_flax(sd)}
    for head in ("pre_classifier", "classifier"):
        w, b = sd.get(f"{head}.weight"), sd.get(f"{head}.bias")
        if w is not None:
            params[head] = {"kernel": _to_numpy(w).T, "bias": _to_numpy(b)}
    return params


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference ``*.pth.tar`` (or plain ``.bin``) checkpoint's
    state_dict on the host. Returns the raw (un-converted) mapping."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        return blob["state_dict"]
    return blob
