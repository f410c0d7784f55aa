"""Corpus/query encoding pipeline: text -> CLS embeddings at device speed.

The TPU-native replacement for the reference's
``get_embeddings_from_scratch`` (``retriever/retrieval_utils.py:30-58``) and
the encode half of ``index_text.py`` — batched eval-mode encoding of 8.8M
passages. Redesign:

- the encode step is one jitted SPMD program: the token batch is sharded
  over the mesh's data axis, every device encodes its slice, and the fp32
  CLS embeddings come back batch-sharded (XLA overlaps the host transfers
  with compute thanks to async dispatch — no manual double buffering).
- fixed batch shape (ragged tail padded, ``SequenceBatch.n_valid``) -> one
  compile for the whole 17k-batch job.
- tokenization runs on the host thread ahead of dispatch; with the Rust HF
  tokenizer this overlaps device compute (dispatch is async).
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cldrd_tpu.data.sequence_dataset import SequenceBatch, SequenceDataset

logger = logging.getLogger(__name__)

EncodeFn = Callable[[dict], jax.Array]  # tokens {input_ids, attention_mask} -> [B, D]


def _batch_stream(
    dataset,
    batch_size: int,
    bucket_lengths,
    batch_multiple: int = 1,
):
    """Resolve the batch iterator: flat fixed-shape batches, or
    length-bucketed ones (``data/bucketing.py`` — rows regrouped by valid
    length so short passages stop paying max_length FLOPs; identical
    numerics, ~proportional-to-token-count encode time).

    Returns ``(iterator, max_batch_rows, emitted_rows_bound)`` — the latter
    two size device append buffers (bucketed batches vary in row count and
    pad at most one partial batch per bucket)."""
    if bucket_lengths is None:
        n_batches = -(-max(len(dataset), 1) // batch_size)
        return dataset.batches(batch_size), batch_size, n_batches * batch_size
    from cldrd_tpu.data.bucketing import (
        bucket_specs, bucketize, max_emitted_rows,
    )

    # () / [] selects the default power-of-two ladder; None (handled
    # above) means no bucketing at all
    specs = bucket_specs(
        dataset.max_length, batch_size, list(bucket_lengths) or None,
        batch_multiple,
    )
    if hasattr(dataset, "batches_bucketed"):
        it = dataset.batches_bucketed(specs)  # sorted: minimal padding
    else:
        it = bucketize(dataset.batches(batch_size), specs)
    max_bz = max(s.batch_size for s in specs)
    return it, max_bz, max_emitted_rows(len(dataset), specs)


def make_encode_fn(
    model,
    params,
    method: str,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    dtype=jnp.bfloat16,
) -> EncodeFn:
    """Build a jitted, batch-sharded encode closure from a flax model.

    ``method``: 'query_embs' or 'passage_embs' on the dual encoder.
    Embeddings are returned fp32 (the reference also emits fp32 even under
    autocast, ``retrieval_utils.py:56``)."""

    bound_method = getattr(model, method)

    def encode(tokens):
        # device-side widen of host-compacted inputs (see _compact_tokens)
        tokens = {
            "input_ids": tokens["input_ids"].astype(jnp.int32),
            "attention_mask": tokens["attention_mask"].astype(jnp.int32),
        }
        out = model.apply({"params": params}, tokens, method=bound_method)
        return out.astype(jnp.float32)

    def _compact_tokens(tokens):
        # host->device payload compaction: WordPiece ids fit uint16 and the
        # mask is 0/1, so ship 3 bytes/token instead of 8 and widen to
        # int32 on device — identical numerics, 2.7x less transfer (the
        # encode pipeline is transfer-bound on thin host links)
        ids = tokens["input_ids"]
        if ids.dtype != np.uint16 and ids.size and ids.max() < (1 << 16) \
                and ids.min() >= 0:
            ids = ids.astype(np.uint16)
        return {
            "input_ids": ids,
            "attention_mask": tokens["attention_mask"].astype(np.uint8),
        }

    if mesh is not None:
        shard = NamedSharding(mesh, P(axis_name))
        jit_encode = jax.jit(encode, in_shardings=(shard,), out_shardings=shard)

        def fn(tokens):
            tokens = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, shard), _compact_tokens(tokens)
            )
            return jit_encode(tokens)

        return fn
    jit_encode = jax.jit(encode)
    return lambda tokens: jit_encode(_compact_tokens(tokens))


def encode_dataset(
    encode_fn: EncodeFn,
    dataset: SequenceDataset,
    batch_size: int,
    log_every: int = 200,
    prefetch_depth: int = 4,
    bucket_lengths=None,
    batch_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode every sequence; returns (embeddings fp32 [N, D], ids int64 [N]).

    Tokenization/collation runs ``prefetch_depth`` batches ahead on a
    background thread so the host pipeline overlaps device compute (JAX
    dispatch is async; the producer otherwise serializes with it).

    ``bucket_lengths``: enable length-bucketed encoding (a sequence of
    bucket lengths, or ``()`` for the default power-of-two ladder) — rows
    come back GROUPED BY LENGTH, not in dataset order; pair embeddings
    with the returned ``ids``, never with the input row order.

    NaN count is checked like the reference (``retrieval_utils.py:55``) but
    raises instead of printing-and-continuing."""
    from cldrd_tpu.data.prefetch import prefetch

    # batch_multiple: SPMD encode shards batch rows over the mesh, so every
    # (possibly bucket-specific) batch size must divide the device count
    batches, _, _ = _batch_stream(dataset, batch_size, bucket_lengths,
                                  batch_multiple)
    emb_chunks, id_chunks = [], []
    t0 = time.perf_counter()
    n_batches = 0
    for batch in prefetch(batches, depth=prefetch_depth):
        embs = encode_fn(batch.tokens)
        n = batch.n_valid
        emb_chunks.append(np.asarray(embs)[:n])
        id_chunks.append(batch.ids[:n])
        n_batches += 1
        if log_every and n_batches % log_every == 0:
            done = sum(len(c) for c in id_chunks)
            rate = done / (time.perf_counter() - t0)
            logger.info("encoded %d seqs (%.0f seq/s)", done, rate)
    embeddings = np.concatenate(emb_chunks) if emb_chunks else np.zeros((0, 0), np.float32)
    ids = np.concatenate(id_chunks) if id_chunks else np.zeros((0,), np.int64)
    n_nan = int(np.isnan(embeddings).sum())
    if n_nan:
        raise FloatingPointError(f"{n_nan} NaNs in encoded embeddings")
    elapsed = time.perf_counter() - t0
    logger.info(
        "encoded %d sequences in %.1fs (%.0f seq/s)",
        len(ids), elapsed, len(ids) / max(elapsed, 1e-9),
    )
    return embeddings, ids


def build_index_from_dataset(
    encode_fn: EncodeFn,
    dataset: SequenceDataset,
    batch_size: int,
    mesh: Optional[Mesh] = None,
    out_dir: Optional[str] = None,
    dtype=jnp.bfloat16,
    block_rows: int = 8192,
):
    """End-to-end: encode the corpus, optionally persist the embedding store,
    and stand up the in-HBM ``FlatIPIndex`` (reference ``index_text.main``,
    ``index_text.py:57-110``)."""
    from .flat_index import FlatIPIndex
    from .persistence import write_embeddings

    embeddings, ids = encode_dataset(encode_fn, dataset, batch_size)
    if out_dir is not None:
        write_embeddings(out_dir, embeddings, ids)
    return FlatIPIndex.build(
        embeddings, ids, mesh=mesh, dtype=dtype, block_rows=block_rows
    )


def build_index_on_device(
    encode_fn: EncodeFn,
    dataset: SequenceDataset,
    batch_size: int,
    dim: int,
    dtype=jnp.bfloat16,
    block_rows: int = 8192,
    prefetch_depth: int = 4,
    mesh: Optional[Mesh] = None,
    axis_name: str = "corpus",
    bucket_lengths=None,
):
    """Encode straight into the in-HBM index — no host round-trip.

    ``encode_dataset`` + ``FlatIPIndex.build`` moves every embedding
    device -> host -> device (the reference does the same through numpy,
    ``retrieval_utils.py:30-58`` then ``index_text.py:91-97``). When the
    index is only needed in HBM (serving, per-iteration evaluation), this
    path appends each encoded batch into a preallocated device buffer with
    a donated ``dynamic_update_slice`` — the embeddings never leave the
    chip (and the 8.8M x 768 fp32 corpus never stages ~27 GB on host).

    With ``mesh``, the whole build is SPMD: ``encode_fn`` must return the
    batch sharded by rows over ``axis_name`` (build it with
    ``make_encode_fn(..., mesh=mesh, axis_name=axis_name)``), and the
    append runs under ``shard_map`` — each device writes its slice of
    every batch into its own shard of the index at the same local offset.
    Zero inter-device communication, zero host staging; the corpus row
    order interleaves across devices, which is immaterial for exact MIPS
    (identity travels via ``row_ids``). This is the TPU-native replacement
    for FAISS's host-built multi-GPU sharded clone
    (``retrieval_utils.py:155-184``).
    """
    if mesh is not None:
        return _build_index_on_device_sharded(
            encode_fn, dataset, batch_size, dim, dtype, block_rows,
            prefetch_depth, mesh, axis_name, bucket_lengths,
        )

    from cldrd_tpu.data.prefetch import prefetch

    from .flat_index import FlatIPIndex, _pad_rows, quantize_rows

    n = len(dataset)
    batches, max_bz, _ = _batch_stream(dataset, batch_size, bucket_lengths)
    # every batch writes its full (possibly bucket-specific) row count of
    # which the tail is padding; the buffer must cover the largest write at
    # the largest offset (<= n) without clipping
    n_pad = _pad_rows(max(n, 1) + max_bz, block_rows)
    int8 = jnp.dtype(dtype) == jnp.int8
    buf = jnp.zeros((n_pad, dim), dtype)
    # int8 quantized store: per-row scales quantize each encoded batch on
    # device (scores factorize as (q . c8) * s at search time); padding
    # rows keep scale 1.0
    scales_buf = jnp.ones((n_pad,), jnp.float32) if int8 else None
    ids_buf = np.full((n_pad,), -1, np.int64)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def append(buf, embs, offset):
        return jax.lax.dynamic_update_slice(buf, embs.astype(buf.dtype), (offset, 0))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def append8(buf, sbuf, embs, offset):
        codes, s = quantize_rows(embs, xp=jnp)
        buf = jax.lax.dynamic_update_slice(buf, codes, (offset, 0))
        sbuf = jax.lax.dynamic_update_slice(sbuf, s, (offset,))
        return buf, sbuf

    offset = 0
    for batch in prefetch(batches, depth=prefetch_depth):
        embs = encode_fn(batch.tokens)  # [bz, dim] on device
        if int8:
            buf, scales_buf = append8(buf, scales_buf, embs,
                                      jnp.asarray(offset, jnp.int32))
        else:
            buf = append(buf, embs, jnp.asarray(offset, jnp.int32))
        ids_buf[offset : offset + batch.n_valid] = batch.ids[: batch.n_valid]
        # padded tail rows (ids stay -1, masked out of every search) are
        # overwritten by the next batch's write at offset + n_valid —
        # except after the stream's final batch, where they persist as
        # masked rows
        offset += batch.n_valid
    assert offset == n, (offset, n)
    return FlatIPIndex(
        embeddings=buf,
        row_ids=jnp.asarray(ids_buf.astype(np.int32)),
        mesh=None,
        block_rows=block_rows,
        row_scales=scales_buf,
    )


def _build_index_on_device_sharded(
    encode_fn: EncodeFn,
    dataset: SequenceDataset,
    batch_size: int,
    dim: int,
    dtype,
    block_rows: int,
    prefetch_depth: int,
    mesh: Mesh,
    axis_name: str,
    bucket_lengths=None,
):
    """SPMD device-resident build: every device appends its slice of each
    encoded batch into its own index shard at the same local offset."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cldrd_tpu.data.prefetch import prefetch

    from .flat_index import FlatIPIndex, _pad_rows, quantize_rows

    ndev = mesh.devices.size
    assert batch_size % ndev == 0, (batch_size, ndev)

    n = len(dataset)
    # bucketed batch sizes are forced to multiples of ndev so every batch
    # row-shards evenly; emitted_bound covers valid rows + pad tails
    batches, _, emitted_bound = _batch_stream(
        dataset, batch_size, bucket_lengths, batch_multiple=ndev
    )
    local_rows = _pad_rows(-(-max(emitted_bound, 1) // ndev), block_rows)
    n_pad = local_rows * ndev

    shard = NamedSharding(mesh, P(axis_name))
    int8 = jnp.dtype(dtype) == jnp.int8
    # allocate the buffer directly sharded — never materialized on host
    buf = jax.jit(
        lambda: jnp.zeros((n_pad, dim), dtype), out_shardings=shard
    )()
    scales_buf = (jax.jit(
        lambda: jnp.ones((n_pad,), jnp.float32), out_shardings=shard
    )() if int8 else None)
    ids_buf = np.full((n_pad,), -1, np.int64)

    def _append(buf_l, embs_l, offset):
        # buf_l [local_rows, D], embs_l [per_dev, D]: same program on every
        # device, no collectives
        return jax.lax.dynamic_update_slice(
            buf_l, embs_l.astype(buf_l.dtype), (offset, 0)
        )

    def _append8(buf_l, sbuf_l, embs_l, offset):
        # per-row int8 quantization of this device's slice, in place
        codes, s = quantize_rows(embs_l, xp=jnp)
        return (jax.lax.dynamic_update_slice(buf_l, codes, (offset, 0)),
                jax.lax.dynamic_update_slice(sbuf_l, s, (offset,)))

    append = jax.jit(
        jax.shard_map(
            _append,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P()),
            out_specs=P(axis_name),
        ),
        donate_argnums=(0,),
    )
    append8 = jax.jit(
        jax.shard_map(
            _append8,
            mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
            out_specs=(P(axis_name), P(axis_name)),
        ),
        donate_argnums=(0, 1),
    )

    local_offset = 0
    for batch in prefetch(batches, depth=prefetch_depth):
        bz = batch.tokens["input_ids"].shape[0]
        per_dev = bz // ndev
        embs = encode_fn(batch.tokens)  # [bz, dim], row-sharded
        if int8:
            buf, scales_buf = append8(buf, scales_buf, embs,
                                      jnp.asarray(local_offset, jnp.int32))
        else:
            buf = append(buf, embs, jnp.asarray(local_offset, jnp.int32))
        # host-side id bookkeeping: device j's shard covers global rows
        # [j*local_rows, (j+1)*local_rows); batch rows [j*per_dev,
        # (j+1)*per_dev) land at its local_offset
        batch_ids = np.full((bz,), -1, np.int64)
        batch_ids[: batch.n_valid] = batch.ids[: batch.n_valid]
        for j in range(ndev):
            dst = j * local_rows + local_offset
            ids_buf[dst : dst + per_dev] = batch_ids[
                j * per_dev : (j + 1) * per_dev
            ]
        local_offset += per_dev
    row_ids = jax.device_put(ids_buf.astype(np.int32), shard)
    return FlatIPIndex(
        embeddings=buf,
        row_ids=row_ids,
        mesh=mesh,
        axis_name=axis_name,
        block_rows=block_rows,
        row_scales=scales_buf,
    )
