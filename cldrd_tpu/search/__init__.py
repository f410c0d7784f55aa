from .mips import (
    sharded_topk,
    topk_binmax,
    topk_binmax_jit,
    topk_dense,
    topk_jit,
    topk_streaming,
)
from .run_writer import retrieve_to_run_file, write_run_file

__all__ = [
    "sharded_topk",
    "topk_binmax",
    "topk_binmax_jit",
    "topk_dense",
    "topk_jit",
    "topk_streaming",
    "retrieve_to_run_file",
    "write_run_file",
]
