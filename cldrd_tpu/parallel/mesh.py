"""Device-mesh and sharding helpers (SPMD over ICI).

The TPU-native replacement for the reference's NCCL/DDP machinery
(``trainer/multistep-curriculum/nway_listwise_1.py:38-49`` process groups,
``:250-253`` DDP wrap, ``dist.barrier()`` ``:255``) and for FAISS's
multi-GPU index sharding (``retriever/retrieval_utils.py:164-182``):

- training: one ``data`` mesh axis; the batch is sharded over it and XLA
  inserts the gradient ``psum`` — no explicit all-reduce, no barriers, no
  rank guards.
- retrieval: one ``corpus`` mesh axis; the 8.8M-row embedding matrix is
  sharded over it and per-shard top-k results merge over ICI (see
  ``cldrd_tpu.search``).

Both axes are views of the same flat device list; meshes are cheap to build.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CORPUS_AXIS = "corpus"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), (
            f"asked for {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def default_mesh() -> Mesh:
    return make_mesh()


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def corpus_sharding(mesh: Mesh, axis_name: str = CORPUS_AXIS) -> NamedSharding:
    """Shard the leading (corpus-row) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_to_devices(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """device_put a host batch pytree with its leading dim sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
