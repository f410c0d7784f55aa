"""Host-side TSV / JSON(L) loaders for queries, passages and teacher rankings.

Capability parity with the reference's ``dataset/utils.py:4-29``
(``load_queries`` / ``load_passages``) and the file-parsing halves of the
seven ``NwayDataset.create_from_*`` constructors
(``dataset/nway_dataset.py:120-467``), factored into one place instead of
being copy-pasted per constructor.

If the native C extension (``cldrd_tpu.native``) is built, the 8.8M-line
collection parse uses it; otherwise a pure-Python fallback is used.
"""
from __future__ import annotations

import json
from typing import Any, Dict, Iterable, List, Optional, Union

Passage = Union[str, Dict[str, str]]


def _native_tsv():
    try:
        from cldrd_tpu.native import parse_id_text_tsv  # type: ignore

        return parse_id_text_tsv
    except Exception:
        return None


def load_queries(path: str) -> Dict[int, str]:
    """TSV ``qid\\ttext`` -> {qid: text}."""
    native = _native_tsv()
    if native is not None:
        return native(path, allow_title=False)
    out: Dict[int, str] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            qid, text = line.rstrip("\n").split("\t", 1)
            out[int(qid)] = text.strip()
    return out


def load_passages(path: str) -> Dict[int, Passage]:
    """TSV ``pid\\ttext`` or ``pid\\ttitle\\tpara`` -> {pid: text | {title, para}}."""
    native = _native_tsv()
    if native is not None:
        return native(path, allow_title=True)
    out: Dict[int, Passage] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2:
                out[int(parts[0])] = parts[1].strip()
            elif len(parts) == 3:
                out[int(parts[0])] = {"title": parts[1], "para": parts[2]}
            else:
                raise ValueError(f"illegal TSV row with {len(parts)} columns")
    return out


def passage_text(passage: Passage, sep_token: str = "[SEP]") -> str:
    """Normalize a passage record to plain text; titled passages are joined
    ``title [SEP] para`` (reference ``reranking_dataset.py:47``)."""
    if isinstance(passage, str):
        return passage
    return passage["title"] + " " + sep_token + " " + passage["para"]


def iter_jsonl(path: str, rank: int = -1, nranks: Optional[int] = None) -> Iterable[dict]:
    """Stream a JSONL file; with ``rank >= 0`` yield only lines where
    ``line_idx % nranks == rank`` (the reference's DDP file sharding,
    ``nway_dataset.py:172-176``).

    Fast path (unsharded reads): the native mmap flat-JSONL parser
    (``cldrd_tpu/native/jsonlparse.cpp``, the ujson replacement) parses the
    whole file in one pass; any construct outside the training-file schema
    (including blank lines) falls the WHOLE file back to per-line
    ``json.loads``, so correctness never depends on the native scope.
    Rank-sharded reads stay on the streaming Python path — each rank then
    parses only its own lines instead of the full file."""
    if rank >= 0:
        assert nranks and 0 <= rank < nranks
    else:
        rows = None
        try:
            from cldrd_tpu import native

            if native.parse_jsonl is not None:
                rows = native.parse_jsonl(path)
        except ImportError:
            rows = None
        except ValueError:  # outside the flat training schema
            rows = None
        if rows is not None:
            yield from rows
            return
    with open(path, "r", encoding="utf-8") as f:
        for line_idx, line in enumerate(f):
            if rank >= 0 and line_idx % nranks != rank:
                continue
            yield json.loads(line)


def load_train_examples(
    path: str,
    fmt: str = "relT_most_semi_hard",
    rank: int = -1,
    nranks: Optional[int] = None,
) -> List[dict]:
    """Parse teacher-ranking training files into canonical
    ``{qid, relT_pids, neg_pids}`` examples.

    fmt:
      - ``"json"``: one JSON array of already-canonical examples
        (reference ``create_from_file``).
      - ``"jsonl"``: canonical examples, one per line
        (reference ``dist_create_from_file``).
      - ``"rel_pid"``: JSONL with a single ``rel_pid``
        (reference ``create_from_json_line_file``).
      - ``"relT_most_semi_hard"``: JSONL with ``relT_pids`` +
        ``most_hard_pids`` + ``semi_hard_pids``; negatives are the
        concatenation most+semi (reference
        ``create_from_relT_most_semi_hard_file`` and all four
        ``create_from_{5relT_25neg,10relT_20neg,20relT_10neg,30relT}_file``
        variants, ``nway_dataset.py:213-467``).
    """
    if fmt == "json":
        with open(path, "r", encoding="utf-8") as f:
            examples = json.load(f)
        if rank >= 0:
            examples = [e for i, e in enumerate(examples) if i % nranks == rank]
        return examples

    out: List[dict] = []
    for example in iter_jsonl(path, rank, nranks):
        if fmt == "jsonl":
            out.append(example)
        elif fmt == "rel_pid":
            assert "relT_pids" not in example and "rel_pid" in example
            example["relT_pids"] = [example.pop("rel_pid")]
            example.setdefault("neg_pids", [])
            out.append(example)
        elif fmt == "relT_most_semi_hard":
            canonical = {
                "qid": example["qid"],
                "relT_pids": example["relT_pids"],
                "neg_pids": example.get("most_hard_pids", [])
                + example.get("semi_hard_pids", []),
            }
            # teacher scores (the ``*_score.train.json`` files consumed by
            # the reference's missing knowledge_distill trainers, SURVEY
            # §2.4): carried through when present
            if "relT_scores" in example:
                canonical["relT_scores"] = example["relT_scores"]
                canonical["neg_scores"] = example.get(
                    "most_hard_scores", []
                ) + example.get("semi_hard_scores", [])
            out.append(canonical)
        else:
            raise ValueError(f"unknown training-file format {fmt!r}")
    return out
