"""Native (C++) host-runtime components.

The reference's host runtime is native through its dependencies (HF
``tokenizers`` in Rust, ujson and FAISS in C; SURVEY §2.1/§2.2); this
package provides the framework's own native pieces, compiled on first use
with the system toolchain (no pip):

- ``_tsvparse``: mmap TSV corpus parser (``parse_id_text_tsv``,
  ``count_lines``) — used automatically by ``cldrd_tpu.data.loaders``.
- ``_jsonlparse``: mmap flat-JSONL training-file parser (``parse_jsonl``)
  — the ujson replacement for the teacher ranking files; falls back to
  ``json.loads`` per file on any construct outside the training schema.

Pure-Python fallbacks keep everything working without a compiler. Set
``CLDRD_TPU_NO_NATIVE=1`` to force them.
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_EXT_TAG = sysconfig.get_config_var("EXT_SUFFIX") or ".so"


def _so_path(name: str) -> str:
    return os.path.join(_HERE, f"{name}{_EXT_TAG}")


def _build_one(name: str, src_name: str, force: bool = False) -> bool:
    """Compile one extension in place. Returns True on success."""
    out = _so_path(name)
    src = os.path.join(_HERE, src_name)
    if not force and os.path.exists(out) and (
        os.path.getmtime(out) >= os.path.getmtime(src)
    ):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        logger.warning("native build of %s failed (%s); using Python "
                       "fallbacks", name, detail)
        return False


def build(force: bool = False) -> bool:
    """Compile every extension in place. Returns True if all succeed."""
    ok = _build_one("_tsvparse", "tsvparse.cpp", force)
    ok = _build_one("_jsonlparse", "jsonlparse.cpp", force) and ok
    return ok


def _load(name: str, src_name: str):
    if os.environ.get("CLDRD_TPU_NO_NATIVE"):
        raise ImportError("native disabled via CLDRD_TPU_NO_NATIVE")
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    # build BEFORE import (mtime-checked, a no-op when fresh): importing
    # first would let a stale .so permanently shadow newer source
    if not _build_one(name, src_name) and not os.path.exists(_so_path(name)):
        raise ImportError(f"native build of {name} failed")
    return __import__(name)


# _tsvparse is the package's import contract: failure here raises and the
# data loaders fall back to pure Python wholesale (as before).
_tsv = _load("_tsvparse", "tsvparse.cpp")
parse_id_text_tsv = _tsv.parse_id_text_tsv
count_lines = _tsv.count_lines

# _jsonlparse degrades independently: parse_jsonl is None if unavailable.
try:
    parse_jsonl = _load("_jsonlparse", "jsonlparse.cpp").parse_jsonl
except ImportError:
    parse_jsonl = None

__all__ = ["parse_id_text_tsv", "count_lines", "parse_jsonl", "build"]
