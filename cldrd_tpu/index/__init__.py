from .flat_index import FlatIPIndex, quantize_rows
from .ivf_index import IVFIndex, ivf_exists
from .kmeans import assign_clusters, kmeans
from .builder import (
    build_index_from_dataset,
    build_index_on_device,
    encode_dataset,
    make_encode_fn,
)
from .persistence import (
    index_exists,
    load_index,
    read_embeddings,
    write_embeddings,
)
from .refine import DiskRefiner, RefinedIndex

__all__ = [
    "FlatIPIndex",
    "IVFIndex",
    "ivf_exists",
    "assign_clusters",
    "kmeans",
    "quantize_rows",
    "build_index_from_dataset",
    "build_index_on_device",
    "encode_dataset",
    "make_encode_fn",
    "index_exists",
    "load_index",
    "read_embeddings",
    "write_embeddings",
    "DiskRefiner",
    "RefinedIndex",
]
