"""Exact maximum-inner-product top-k search on TPU.

The TPU-native replacement for FAISS ``IndexFlatIP`` GPU search
(reference ``retriever/retrieve_top_passages.py:85-88`` +
``retrieval_utils.py:131-184``): a blocked Q x C^T matmul on the MXU with a
streaming top-k merge, sharded over the device mesh with an ICI all-gather
merge — the single hottest path of the whole system.

Design:

- the corpus matrix never materializes a ``[B, N]`` score tensor; a
  ``lax.scan`` walks corpus blocks, each iteration computing ``[B, blk]``
  scores (bf16 inputs, fp32 MXU accumulation via ``preferred_element_type``)
  and folding them into a running ``[B, k]`` top-k buffer with ``lax.top_k``.
  HBM traffic ~= one read of the corpus per query batch -> the search is
  HBM-bandwidth-bound, which is the speed-of-light for exact search.
- multi-device: the corpus is sharded along rows; ``shard_map`` runs the
  streaming search per shard and merges the per-shard ``(score, id)`` buffers
  with ``lax.all_gather`` over the mesh axis (ICI), then one final
  ``lax.top_k``. This reproduces FAISS's ``co.shard=True`` multi-GPU
  clone+merge (``retrieval_utils.py:173-182``) as a single SPMD program.
- padded corpus rows carry ``row_id == -1`` and are masked to -inf, so
  padding to block/shard multiples never changes results.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = jnp.float32(-jnp.inf)


def _block_scores(queries: jax.Array, corpus_blk: jax.Array) -> jax.Array:
    """[B, D] x [blk, D] -> [B, blk] fp32 scores on the MXU."""
    return jax.lax.dot_general(
        queries,
        corpus_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def topk_dense(
    queries: jax.Array, corpus: jax.Array, row_ids: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Single full-matrix top-k (materializes [B, N]); for small corpora
    and as the correctness oracle for the streaming path."""
    scores = _block_scores(queries, corpus)
    scores = jnp.where(row_ids[None, :] >= 0, scores, NEG_INF)
    top_s, top_idx = jax.lax.top_k(scores, k)
    return top_s, jnp.take(row_ids, top_idx)


def topk_streaming(
    queries: jax.Array,
    corpus: jax.Array,
    row_ids: jax.Array,
    k: int,
    block_rows: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming blocked top-k: corpus [N, D] walked in ``block_rows`` chunks.

    N must be a multiple of ``block_rows`` (pad with ``row_id == -1`` rows;
    see ``cldrd_tpu.index.FlatIPIndex`` which maintains this invariant).
    Returns (scores [B, k] fp32 desc, ids [B, k] int32, -1 for empty slots).
    """
    n, d = corpus.shape
    bz = queries.shape[0]
    if n <= block_rows:
        return topk_dense(queries, corpus, row_ids, k)
    assert n % block_rows == 0, (n, block_rows)
    nblocks = n // block_rows
    blocks = corpus.reshape(nblocks, block_rows, d)
    id_blocks = row_ids.reshape(nblocks, block_rows)

    def body(carry, blk):
        top_s, top_i = carry
        c_blk, i_blk = blk
        s = _block_scores(queries, c_blk)
        s = jnp.where(i_blk[None, :] >= 0, s, NEG_INF)
        cat_s = jnp.concatenate([top_s, s], axis=-1)
        cat_i = jnp.concatenate(
            [top_i, jnp.broadcast_to(i_blk[None, :], (bz, block_rows))], axis=-1
        )
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=-1)
        return (new_s, new_i), None

    init = (
        jnp.full((bz, k), NEG_INF, jnp.float32),
        jnp.full((bz, k), -1, row_ids.dtype),
    )
    (top_s, top_i), _ = jax.lax.scan(body, init, (blocks, id_blocks))
    return top_s, top_i


def sharded_topk(
    queries: jax.Array,
    corpus: jax.Array,
    row_ids: jax.Array,
    k: int,
    mesh: Mesh,
    axis_name: str = "corpus",
    block_rows: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Corpus-sharded exact top-k under ``shard_map``.

    ``corpus``/``row_ids`` are sharded along rows over ``axis_name``;
    ``queries`` are replicated. Per-shard streaming top-k, then the
    ``[ndev, B, k]`` candidate buffers all-gather over ICI and a final
    ``top_k`` picks the global winners. k candidates per shard always cover
    the global top-k, so the result is exact.
    """

    def shard_fn(q, c_shard, id_shard):
        local_s, local_i = topk_streaming(q, c_shard, id_shard, k, block_rows)
        all_s = jax.lax.all_gather(local_s, axis_name)  # [ndev, B, k]
        all_i = jax.lax.all_gather(local_i, axis_name)
        ndev = all_s.shape[0]
        bz = all_s.shape[1]
        cand_s = jnp.transpose(all_s, (1, 0, 2)).reshape(bz, ndev * k)
        cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(bz, ndev * k)
        top_s, sel = jax.lax.top_k(cand_s, k)
        top_i = jnp.take_along_axis(cand_i, sel, axis=-1)
        return top_s, top_i

    from jax import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, corpus, row_ids)


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def topk_jit(queries, corpus, row_ids, k: int, block_rows: int = 8192):
    return topk_streaming(queries, corpus, row_ids, k, block_rows)
