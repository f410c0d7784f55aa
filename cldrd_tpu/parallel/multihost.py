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
import os
from typing import Optional, Tuple

import jax

logger = logging.getLogger(__name__)


# Env vars that signal a multi-process launch was CONFIGURED. Covers the
# jax.distributed cluster auto-detectors (Slurm, OpenMPI, GKE/Cloud-TPU pods)
# plus the explicit JAX coordinator variables. Entries are
# (var, needs_multi): ``needs_multi`` vars only count when their value
# implies MORE THAN ONE process — e.g. TPU_WORKER_HOSTNAMES is present on
# every TPU VM (a single hostname on a single host), and Slurm sets
# SLURM_NTASKS=1 for ordinary single-task jobs.
_CLUSTER_ENV_VARS = (
    ("JAX_COORDINATOR_ADDRESS", False),
    ("COORDINATOR_ADDRESS", False),
    ("MEGASCALE_COORDINATOR_ADDRESS", False),
    ("TPU_WORKER_HOSTNAMES", True),
    ("OMPI_COMM_WORLD_SIZE", True),
    ("SLURM_NTASKS", True),
)


def _implies_multi_process(var: str, value: str) -> bool:
    if var == "TPU_WORKER_HOSTNAMES":
        return len([h for h in value.split(",") if h.strip()]) > 1
    try:
        return int(value) > 1
    except ValueError:
        return False


def _already_initialized() -> bool:
    """True iff ``jax.distributed.initialize`` already ran in this process.

    Checked WITHOUT touching the JAX backend: ``jax.process_count()`` would
    initialize the local backend as a side effect, and
    ``jax.distributed.initialize`` must run *before* any backend use — the
    reference's equivalent ordering constraint is ``set_env`` running
    ``init_process_group`` before any CUDA work
    (``nway_listwise_1.py:38-49``)."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:  # internal layout changed: assume not initialized
        return False


def _cluster_configured() -> bool:
    for var, needs_multi in _CLUSTER_ENV_VARS:
        value = os.environ.get(var)
        if not value:
            continue
        if not needs_multi or _implies_multi_process(var, value):
            return True
    return False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up ``jax.distributed``. On TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere.
    No-op when already initialized; silently single-process ONLY when no
    coordinator was configured at all.

    Must be called before any other JAX API that touches the backend
    (device queries, jit, device_put). A configured-but-failed bring-up
    raises instead of degrading: silently training single-process on every
    host would duplicate (not shard) the data."""
    if _already_initialized():
        return
    explicit = coordinator_address is not None or num_processes is not None
    configured = explicit or _cluster_configured()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:
        if configured:
            raise RuntimeError(
                "jax.distributed.initialize failed although a multi-process "
                "launch was configured — refusing to silently fall back to "
                "single-process (every host would train on duplicated "
                f"data). Original error: {e}"
            ) from e
        # single-host launch without any coordinator config: stay local
        logger.info("jax.distributed not initialized (%s); single-process", e)
        return
    logger.info(
        "jax.distributed up: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


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
