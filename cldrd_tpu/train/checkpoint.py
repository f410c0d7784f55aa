"""Atomic checkpoint / resume / warm-start.

One canonical layout replacing the reference's ``torch.save`` dicts with
``module.`` prefix juggling (``nway_listwise_1.py:61-65,418-426``,
``nway_listwise_2.py:301-310``, ``index_text.py:64-71``):

- ``checkpoint_<step>.msgpack``: flax-serialized
  ``{params, opt_state, step, epoch}`` — full training state.
- writes are atomic (tmp file + ``os.replace``), so a preempted TPU job never
  leaves a torn checkpoint (SURVEY §5.3/§5.4: the reference had no such
  guarantee).
- warm-start (``--model_checkpoint`` semantics, weights only) accepts either
  our msgpack checkpoints or reference torch ``*.pth.tar`` files (converted
  via ``cldrd_tpu.models.hf_loader``), so published CL-DRD checkpoints drop in.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, Optional, Tuple

from flax import serialization


def save_checkpoint(
    state: Any, directory: str, step: int, prefix: str = "checkpoint"
) -> str:
    """Serialize ``state`` (any pytree / flax struct) atomically.

    Returns the final path ``<directory>/<prefix>_<step>.msgpack``.
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{prefix}_{step}.msgpack")
    tmp = path + ".tmp"
    blob = serialization.to_bytes(state)
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a checkpoint into ``target``'s pytree structure."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(target, blob)


def latest_checkpoint(directory: str, prefix: str = "checkpoint") -> Optional[str]:
    """Highest-step checkpoint in ``directory`` (or None)."""
    pattern = os.path.join(directory, f"{prefix}_*.msgpack")
    best: Tuple[int, Optional[str]] = (-1, None)
    for path in glob.glob(pattern):
        m = re.search(rf"{prefix}_(\d+)\.msgpack$", path)
        if m and int(m.group(1)) > best[0]:
            best = (int(m.group(1)), path)
    return best[1]


def load_warm_start_params(path: str, target_params: Any, share_weights: bool = False) -> Any:
    """Weights-only load (the reference's ``--model_checkpoint`` hand-off,
    ``nway_listwise_2.py:296-310``). Accepts:

    - ``*.msgpack`` full checkpoints from this framework (params extracted),
    - reference torch ``*.pth.tar`` / ``*.bin`` (converted to flax).
    """
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            blob = f.read()
        restored: Dict[str, Any] = serialization.msgpack_restore(blob)
        params_dict = restored["params"] if "params" in restored else restored
        return serialization.from_state_dict(target_params, params_dict)
    from cldrd_tpu.models.hf_loader import (
        dual_encoder_torch_to_flax,
        load_torch_checkpoint,
    )

    state_dict = load_torch_checkpoint(path)
    return dual_encoder_torch_to_flax(state_dict, share_weights=share_weights)
