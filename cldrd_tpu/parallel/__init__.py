from .mesh import (
    DATA_AXIS,
    CORPUS_AXIS,
    default_mesh,
    make_mesh,
    batch_sharding,
    corpus_sharding,
    replicated,
    shard_batch_to_devices,
)
from .multihost import host_shard, initialize_multihost, is_first_host

__all__ = [
    "DATA_AXIS",
    "CORPUS_AXIS",
    "default_mesh",
    "make_mesh",
    "batch_sharding",
    "corpus_sharding",
    "replicated",
    "shard_batch_to_devices",
    "host_shard",
    "initialize_multihost",
    "is_first_host",
]
