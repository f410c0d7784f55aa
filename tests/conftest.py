"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-device sharding tests run on a fake 8-device CPU mesh
(xla_force_host_platform_device_count) — the SPMD programs compile and
execute identically to a real TPU mesh modulo performance.

NOTE on this environment: a sitecustomize hook registers the `axon` TPU
plugin in every interpreter and sets ``jax_platforms`` via jax.config, which
*overrides* the JAX_PLATFORMS env var. So we must both set the env vars
(for any subprocesses) and override jax.config back to cpu before the first
backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep subprocesses off the TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (sitecustomize may have imported it already)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles dozens of SPMD programs;
# caching them across runs cuts the full suite from ~12 min toward ~3 min.
_CACHE_DIR = os.path.expanduser("~/.cache/cldrd_tpu_jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import sys  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
