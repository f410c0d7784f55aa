"""Multi-host bring-up ordering contract.

``jax.distributed.initialize`` must run BEFORE any backend-touching JAX
call (``jax.process_count()`` initializes the local backend as a side
effect), and a configured-but-failing bring-up must raise loudly instead of
silently degrading every host to duplicated single-process training. The
reference's analogue of this ordering is ``set_env`` running
``init_process_group`` before any CUDA work
(``/root/reference/trainer/multistep-curriculum/nway_listwise_1.py:38-49``).

Real pods can't be tested here; these tests monkeypatch the JAX surface and
assert the call ORDER and failure policy, which is exactly the part that was
wrong in round 2.
"""
import jax
import pytest

from cldrd_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for v, _ in multihost._CLUSTER_ENV_VARS:
        monkeypatch.delenv(v, raising=False)
    yield


def test_cluster_configured_detection(monkeypatch):
    assert not multihost._cluster_configured()
    # single-host TPU VM: one hostname present — NOT multi-process
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "t1v-n-abc-w-0")
    assert not multihost._cluster_configured()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w-0,w-1,w-2,w-3")
    assert multihost._cluster_configured()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert not multihost._cluster_configured()
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert multihost._cluster_configured()
    monkeypatch.delenv("SLURM_NTASKS")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:1234")
    assert multihost._cluster_configured()


def test_initialize_called_before_any_backend_use(monkeypatch):
    calls = []

    monkeypatch.setattr(multihost, "_already_initialized", lambda: False)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append("initialize"),
    )
    for backend_fn in ("process_count", "process_index",
                       "local_device_count", "device_count", "devices"):
        monkeypatch.setattr(
            jax, backend_fn,
            lambda _name=backend_fn: calls.append(_name) or 1,
        )

    multihost.initialize_multihost(coordinator_address="host:1234",
                                   num_processes=2, process_id=0)
    assert calls[0] == "initialize", calls
    # anything after initialize is fine; nothing backend-touching before it
    assert "process_count" not in calls[:1]


def test_already_initialized_is_checked_without_backend(monkeypatch):
    """The already-initialized probe must not call jax.process_count()."""
    monkeypatch.setattr(multihost, "_already_initialized", lambda: True)

    def boom(*a, **k):
        raise AssertionError("backend touched")

    monkeypatch.setattr(jax, "process_count", boom)
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.initialize_multihost()  # no-op, no backend use


def test_configured_but_failing_init_raises(monkeypatch):
    monkeypatch.setattr(multihost, "_already_initialized", lambda: False)

    def failing(**kw):
        raise ValueError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", failing)
    # explicit coordinator argument
    with pytest.raises(RuntimeError, match="refusing to silently fall back"):
        multihost.initialize_multihost(coordinator_address="host:1234")
    # coordinator configured via environment
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host:1234")
    with pytest.raises(RuntimeError, match="refusing to silently fall back"):
        multihost.initialize_multihost()


def test_unconfigured_failure_falls_back_quietly(monkeypatch):
    monkeypatch.setattr(multihost, "_already_initialized", lambda: False)

    def failing(**kw):
        raise ValueError("no cluster detected")

    monkeypatch.setattr(jax.distributed, "initialize", failing)
    multihost.initialize_multihost()  # single-host: no raise


def test_already_initialized_probe_matches_reality():
    # in this single-process test environment the client is absent
    assert multihost._already_initialized() is False


def test_host_shard_single_process():
    assert multihost.host_shard() == (-1, None)
    assert multihost.is_first_host()
