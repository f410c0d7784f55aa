"""Multi-host SPMD setup.

The reference scales with one process per GPU under
``torch.distributed.launch`` + NCCL (``nway_listwise_1.py:38-49``,
``scripts/unity/nway_listwise_1.sh:4``), sharding the training file by
``line_idx % nranks`` (``nway_dataset.py:172-176``). The TPU-native
equivalent is one process per HOST: ``jax.distributed`` brings up the
cluster over DCN, every process sees the global device mesh, and the input
pipeline feeds each process its slice of the data (the same ``rank/nranks``
modulo sharding, now per host instead of per device — devices within a host
get their slice of the batch via the batch sharding of the jitted step).
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up ``jax.distributed``. On TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere.
    No-op when already initialized or single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed up: process %d/%d, %d local + %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except (ValueError, RuntimeError) as e:
        # single-host launch without coordinator env: stay single-process
        logger.info("jax.distributed not initialized (%s); single-process", e)


def host_shard() -> Tuple[int, int]:
    """(rank, nranks) for per-host input sharding — feed straight into
    ``load_train_examples(..., rank=, nranks=)`` / the dataset factories
    (replaces the reference's per-GPU ``line_idx % nranks`` file shard)."""
    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else (-1, None)


def is_first_host() -> bool:
    """Rank-0 guard for host-side side effects (checkpoint writes, logs) —
    the reference's ``is_first_worker`` (``utils/utils.py:66-67``). Note
    device-side state is identical across hosts under SPMD, so this guards
    only filesystem duplication, not correctness."""
    return jax.process_index() == 0
