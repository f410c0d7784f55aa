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


_BERT_ATTN = {
    "attention.self.query": "q_lin",
    "attention.self.key": "k_lin",
    "attention.self.value": "v_lin",
    "attention.output.dense": "out_lin",
}
_BERT_MISC = {
    "attention.output.LayerNorm": "sa_layer_norm",
    "intermediate.dense": "lin1",
    "output.dense": "lin2",
    "output.LayerNorm": "output_layer_norm",
}


def bert_torch_to_flax(state_dict: Mapping[str, Any]) -> Params:
    """Convert one HF ``BertModel`` state_dict to a ``BertEncoder`` param
    tree (the reference teacher ``cross-encoder/ms-marco-MiniLM-L-6-v2``
    family, reference ``evaluation/reranking_evaluator.py:292``). Pooler and
    classification heads are handled by the consumers; the
    ``position_ids`` buffer is ignored."""
    sd = strip_prefix(state_dict, "bert.")
    params: Params = {}
    layer_re = re.compile(r"^encoder\.layer\.(\d+)\.(.+)\.(weight|bias)$")
    for key, val in sd.items():
        if key == "embeddings.position_ids":
            continue
        arr = _to_numpy(val)
        if key == "embeddings.word_embeddings.weight":
            _set(params, ["embeddings", "word_embeddings", "embedding"], arr)
        elif key == "embeddings.position_embeddings.weight":
            _set(params, ["embeddings", "position_embeddings"], arr)
        elif key == "embeddings.token_type_embeddings.weight":
            _set(params, ["embeddings", "token_type_embeddings", "embedding"], arr)
        elif key == "embeddings.LayerNorm.weight":
            _set(params, ["embeddings", "LayerNorm", "scale"], arr)
        elif key == "embeddings.LayerNorm.bias":
            _set(params, ["embeddings", "LayerNorm", "bias"], arr)
        else:
            m = layer_re.match(key)
            if not m:
                continue  # pooler / heads handled elsewhere
            i, mid, kind = int(m.group(1)), m.group(2), m.group(3)
            base = [f"layer_{i}"]
            if mid in _BERT_ATTN:
                path = base + ["attention", _BERT_ATTN[mid]]
                if kind == "weight":
                    _set(params, path + ["kernel"], arr.T)
                else:
                    _set(params, path + ["bias"], arr)
            elif mid in _BERT_MISC:
                name = _BERT_MISC[mid]
                if name.endswith("layer_norm") or name.endswith("LayerNorm"):
                    flax_kind = "scale" if kind == "weight" else "bias"
                    _set(params, base + [name, flax_kind], arr)
                else:
                    if kind == "weight":
                        _set(params, base + [name, "kernel"], arr.T)
                    else:
                        _set(params, base + [name, "bias"], arr)
    return params


def bert_flax_to_torch(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`bert_torch_to_flax`: a ``BertEncoder`` param tree
    -> HF ``BertModel`` state_dict (numpy values)."""
    flat = _flatten(params)
    attn_inv = {v: k for k, v in _BERT_ATTN.items()}
    misc_inv = {v: k for k, v in _BERT_MISC.items()}
    out: Dict[str, np.ndarray] = {}
    for key, arr in flat.items():
        parts = key.split(".")
        if key == "embeddings.word_embeddings.embedding":
            out["embeddings.word_embeddings.weight"] = arr
        elif key == "embeddings.position_embeddings":
            out["embeddings.position_embeddings.weight"] = arr
        elif key == "embeddings.token_type_embeddings.embedding":
            out["embeddings.token_type_embeddings.weight"] = arr
        elif key == "embeddings.LayerNorm.scale":
            out["embeddings.LayerNorm.weight"] = arr
        elif key == "embeddings.LayerNorm.bias":
            out["embeddings.LayerNorm.bias"] = arr
        elif parts[0].startswith("layer_"):
            base = f"encoder.layer.{int(parts[0][len('layer_'):])}"
            if parts[1] == "attention":
                mid, kind = attn_inv[parts[2]], parts[3]
                if kind == "kernel":
                    out[f"{base}.{mid}.weight"] = arr.T
                else:
                    out[f"{base}.{mid}.bias"] = arr
            elif parts[1] in ("lin1", "lin2"):
                mid = misc_inv[parts[1]]
                if parts[2] == "kernel":
                    out[f"{base}.{mid}.weight"] = arr.T
                else:
                    out[f"{base}.{mid}.bias"] = arr
            elif parts[1] in ("sa_layer_norm", "output_layer_norm"):
                mid = misc_inv[parts[1]]
                kind = "weight" if parts[2] == "scale" else "bias"
                out[f"{base}.{mid}.{kind}"] = arr
    return out


def bert_cross_encoder_torch_to_flax(state_dict: Mapping[str, Any]) -> Params:
    """Convert HF ``BertForSequenceClassification`` weights (the MiniLM
    teacher's checkpoint layout) into our ``CrossEncoder(arch='bert')``
    param tree: encoder + tanh pooler + classifier."""
    sd = strip_prefix(state_dict, "module.")
    params: Params = {"encoder": bert_torch_to_flax(sd)}
    for hf_names, ours in ((("bert.pooler.dense", "pooler.dense"), "pooler"),
                           (("classifier",), "classifier")):
        for hf_name in hf_names:
            w, b = sd.get(f"{hf_name}.weight"), sd.get(f"{hf_name}.bias")
            if w is not None:
                params[ours] = {"kernel": _to_numpy(w).T,
                                "bias": _to_numpy(b)}
                break
    return params


def _is_bert_state_dict(sd: Mapping[str, Any]) -> bool:
    """HF BERT layouts carry token-type embeddings and the
    ``attention.self.query`` key shape; DistilBERT has neither."""
    return any(
        "token_type_embeddings" in k or ".attention.self." in k for k in sd
    )


def _tower_torch_to_flax(sd: Mapping[str, Any]) -> Params:
    """Arch-sniffing single-tower converter: BERT and DistilBERT towers
    are distinguishable from their key layout, so dual-encoder warm starts
    and conversions need no arch flag."""
    return (bert_torch_to_flax(sd) if _is_bert_state_dict(sd)
            else distilbert_torch_to_flax(sd))


def dual_encoder_torch_to_flax(
    state_dict: Mapping[str, Any], share_weights: bool = False
) -> Params:
    """Convert a reference ``NwayDualEncoder`` state_dict (optionally
    ``module.``-prefixed) into our ``NwayDualEncoder`` param tree. The
    tower architecture (DistilBERT or BERT/MiniLM) is auto-detected."""
    sd = strip_prefix(state_dict, "module.")
    towers: Dict[str, Dict[str, Any]] = {"query_encoder": {}, "passage_encoder": {}}
    for key, val in sd.items():
        for tower in towers:
            prefix = tower + "."
            if key.startswith(prefix):
                towers[tower][key[len(prefix):]] = val
    if share_weights:
        src = towers["query_encoder"] or towers["passage_encoder"]
        return {"encoder": _tower_torch_to_flax(src)}
    return {
        "query_encoder": _tower_torch_to_flax(towers["query_encoder"]),
        "passage_encoder": _tower_torch_to_flax(towers["passage_encoder"]),
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


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def distilbert_flax_to_torch(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`distilbert_torch_to_flax`: one ``DistilBertEncoder``
    param tree -> HF ``DistilBertModel`` state_dict (numpy values; wrap with
    ``torch.from_numpy`` to load into torch). Lets models trained here be
    exported back to the HF/torch ecosystem."""
    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    for key, arr in flat.items():
        parts = key.split(".")
        if key == "embeddings.word_embeddings.embedding":
            out["embeddings.word_embeddings.weight"] = arr
        elif key == "embeddings.position_embeddings":
            out["embeddings.position_embeddings.weight"] = arr
        elif key == "embeddings.LayerNorm.scale":
            out["embeddings.LayerNorm.weight"] = arr
        elif key == "embeddings.LayerNorm.bias":
            out["embeddings.LayerNorm.bias"] = arr
        elif parts[0].startswith("layer_"):
            i = int(parts[0][len("layer_"):])
            base = f"transformer.layer.{i}"
            if parts[1] == "attention":
                name, kind = parts[2], parts[3]
                if kind == "kernel":
                    out[f"{base}.attention.{name}.weight"] = arr.T
                else:
                    out[f"{base}.attention.{name}.bias"] = arr
            elif parts[1] in ("lin1", "lin2"):
                kind = parts[2]
                if kind == "kernel":
                    out[f"{base}.ffn.{parts[1]}.weight"] = arr.T
                else:
                    out[f"{base}.ffn.{parts[1]}.bias"] = arr
            elif parts[1] in ("sa_layer_norm", "output_layer_norm"):
                kind = "weight" if parts[2] == "scale" else "bias"
                out[f"{base}.{parts[1]}.{kind}"] = arr
    return out


def dual_encoder_flax_to_torch(
    params: Mapping[str, Any], share_weights: bool = False
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`dual_encoder_torch_to_flax`: export a trained
    ``NwayDualEncoder`` param tree as a reference-layout state_dict
    (``query_encoder.* / passage_encoder.*`` keys, no ``module.`` prefix).
    BERT towers (identified by their token-type table) export in HF
    ``BertModel`` key layout."""

    def tower_to_torch(enc_params):
        is_bert = "token_type_embeddings" in enc_params.get("embeddings", {})
        return (bert_flax_to_torch if is_bert
                else distilbert_flax_to_torch)(enc_params)

    if share_weights:
        enc = tower_to_torch(params["encoder"])
        out = {}
        for tower in ("query_encoder", "passage_encoder"):
            out.update({f"{tower}.{k}": v for k, v in enc.items()})
        return out
    out = {}
    for tower in ("query_encoder", "passage_encoder"):
        enc = tower_to_torch(params[tower])
        out.update({f"{tower}.{k}": v for k, v in enc.items()})
    return out


def load_torch_checkpoint(path: str, trust_pickle: bool = False) -> Dict[str, Any]:
    """Read a reference ``*.pth.tar`` (or plain ``.bin``) checkpoint's
    state_dict on the host. Returns the raw (un-converted) mapping.

    Loads with ``weights_only=True`` by default — third-party pickles can
    execute arbitrary code otherwise. Reference checkpoints bundle an
    ``argparse.Namespace`` (the saved args), which is allow-listed. Pass
    ``trust_pickle=True`` only for checkpoints you created yourself if the
    safe path fails on an exotic pickled object."""
    import argparse

    import torch

    if trust_pickle:
        blob = torch.load(path, map_location="cpu", weights_only=False)
    else:
        with torch.serialization.safe_globals([argparse.Namespace]):
            blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "state_dict" in blob:
        return blob["state_dict"]
    return blob
