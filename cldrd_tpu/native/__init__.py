"""Native (C++) host-runtime components.

The reference's host runtime is native through its dependencies (HF
``tokenizers`` in Rust, FAISS in C++; SURVEY §2.2); this package provides
the framework's own native pieces, compiled on first use with the system
toolchain (no pip):

- ``_tsvparse``: mmap TSV corpus parser (``parse_id_text_tsv``,
  ``count_lines``) — used automatically by ``cldrd_tpu.data.loaders`` when
  built; the pure-Python fallback keeps everything working without a
  compiler.

Set ``CLDRD_TPU_NO_NATIVE=1`` to force the Python fallbacks.
"""
from __future__ import annotations

import logging
import os
import subprocess
import sys
import sysconfig

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))


def _so_path() -> str:
    tag = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, f"_tsvparse{tag}")


def build(force: bool = False) -> bool:
    """Compile the extension in place. Returns True on success."""
    out = _so_path()
    src = os.path.join(_HERE, "tsvparse.cpp")
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
        logger.warning("native build failed (%s); using Python fallbacks", detail)
        return False


def _load():
    if os.environ.get("CLDRD_TPU_NO_NATIVE"):
        raise ImportError("native disabled via CLDRD_TPU_NO_NATIVE")
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    try:
        import _tsvparse  # type: ignore

        return _tsvparse
    except ImportError:
        if not build():
            raise
        import _tsvparse  # type: ignore

        return _tsvparse


_mod = _load()  # raises ImportError -> callers fall back to Python paths
parse_id_text_tsv = _mod.parse_id_text_tsv
count_lines = _mod.count_lines

__all__ = ["parse_id_text_tsv", "count_lines", "build"]
