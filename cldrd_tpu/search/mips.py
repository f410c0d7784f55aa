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


# Matmul precision for the score computation. On TPU, XLA's DEFAULT
# precision rounds even fp32 matmul inputs to bf16 (one MXU pass);
# 'high' = bf16x3 (near-fp32), 'highest' = bf16x6 (fp32-exact). With an
# fp32 in-HBM corpus, precision='highest' reproduces FAISS fp32 scoring
# bit-for-bit-grade; measured tail cost of DEFAULT on an adversarially
# near-tied corpus: 3.2% of the top-1000 (examples/quantization_study.py) —
# zero on well-separated corpora.
_PRECISIONS = {
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _block_scores(
    queries: jax.Array, corpus_blk: jax.Array, precision: str = "default"
) -> jax.Array:
    """[B, D] x [blk, D] -> [B, blk] fp32 scores on the MXU."""
    return jax.lax.dot_general(
        queries,
        corpus_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )


def topk_dense(
    queries: jax.Array, corpus: jax.Array, row_ids: jax.Array, k: int,
    precision: str = "default",
) -> Tuple[jax.Array, jax.Array]:
    """Single full-matrix top-k (materializes [B, N]); for small corpora
    and as the correctness oracle for the streaming path.

    Handles k > N: results are padded with (-inf, -1) beyond the corpus
    size (``lax.top_k`` itself rejects k > axis size)."""
    n = corpus.shape[0]
    scores = _block_scores(queries, corpus, precision)
    scores = jnp.where(row_ids[None, :] >= 0, scores, NEG_INF)
    k_eff = min(k, n)
    top_s, top_idx = jax.lax.top_k(scores, k_eff)
    top_i = jnp.take(row_ids, top_idx)
    if k_eff < k:
        bz = queries.shape[0]
        top_s = jnp.concatenate(
            [top_s, jnp.full((bz, k - k_eff), NEG_INF, top_s.dtype)], axis=-1
        )
        top_i = jnp.concatenate(
            [top_i, jnp.full((bz, k - k_eff), -1, top_i.dtype)], axis=-1
        )
    top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
    return top_s, top_i


def topk_streaming(
    queries: jax.Array,
    corpus: jax.Array,
    row_ids: jax.Array,
    k: int,
    block_rows: int = 8192,
    precision: str = "default",
) -> Tuple[jax.Array, jax.Array]:
    """Streaming blocked top-k: corpus [N, D] walked in ``block_rows`` chunks.

    N must be a multiple of ``block_rows`` (pad with ``row_id == -1`` rows;
    see ``cldrd_tpu.index.FlatIPIndex`` which maintains this invariant).
    Returns (scores [B, k] fp32 desc, ids [B, k] int32, -1 for empty slots).
    """
    n, d = corpus.shape
    bz = queries.shape[0]
    if n <= block_rows:
        return topk_dense(queries, corpus, row_ids, k, precision)
    assert n % block_rows == 0, (n, block_rows)
    nblocks = n // block_rows
    blocks = corpus.reshape(nblocks, block_rows, d)
    id_blocks = row_ids.reshape(nblocks, block_rows)

    def body(carry, blk):
        top_s, top_i = carry
        c_blk, i_blk = blk
        s = _block_scores(queries, c_blk, precision)
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
    method: str = "binmax",
    precision: str = "default",
) -> Tuple[jax.Array, jax.Array]:
    """Corpus-sharded exact top-k under ``shard_map``.

    ``corpus``/``row_ids`` are sharded along rows over ``axis_name``;
    ``queries`` are replicated. Per-shard exact top-k (``method``:
    'binmax' fast path or 'stream' memory-lean path), then the
    ``[ndev, B, k]`` candidate buffers all-gather over ICI and a final
    ``top_k`` picks the global winners. k candidates per shard always cover
    the global top-k, so the result is exact.
    """

    def shard_fn(q, c_shard, id_shard):
        if method == "binmax":
            local_s, local_i = topk_binmax(q, c_shard, id_shard, k,
                                           precision=precision)
        else:
            local_s, local_i = topk_streaming(q, c_shard, id_shard, k,
                                              block_rows, precision)
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


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "precision"))
def topk_jit(queries, corpus, row_ids, k: int, block_rows: int = 8192,
             precision: str = "default"):
    return topk_streaming(queries, corpus, row_ids, k, block_rows, precision)


# --------------------------------------------------------------------------
# Bin-max exact top-k: the fast path.
#
# Exactness argument (per corpus segment): partition the segment's rows into
# contiguous bins of L rows and reduce scores to per-bin maxima. If item x is
# among the true top-k, fewer than k items score above x, so fewer than k
# bins have max > score(x); since x's own bin has max >= score(x), that bin
# is among the top-k bins ranked by bin max. Hence the true top-k is covered
# by the contents of the top-k bins — an exact candidate set of k*L items.
#
# Defaults (bin_rows=128, extract=6) are the swept optimum on v5e at
# [B=512, N=1.1M, D=768, k=1000]: 41.7 ms/batch = 12.3k QPS exact. A
# smaller ``extract`` narrows faster but falls back (still exact, slower)
# more often on corpora where many near-tied items share a bin.
#
# The candidate set is then narrowed from k*L to k*m (m << L) by extracting
# the top-m items of each bin with m rounds of (max, argmax, mask). This
# narrowing is verified: tau = k-th largest bin max is a lower bound on the
# true k-th score (>= k bins have max >= tau, each contributing >= 1 item
# >= tau). If every non-extracted item is < tau, no true top-k item was
# dropped; otherwise a (rare, data-adversarial) fallback runs the full
# top_k over all k*L candidates. Either way the result is EXACT.
#
# Why this shape of algorithm: on TPU the full scan's cost is one corpus
# read (HBM-bound, MXU matmul) — but XLA's TopK on a [B, 16k+] axis costs
# more than the matmul itself. Bin-max replaces almost all TopK work with
# VPU max-reductions that fuse into the matmul's consumer, leaving two
# small TopKs ([B, nbins] and [B, k*m]).
# --------------------------------------------------------------------------


# Pallas fused scores+binmax: one pass computes the [B, T] score tile on the
# MXU and reduces its per-bin maxima on the VPU before the tile leaves VMEM,
# so the score matrix is written to HBM exactly once and never re-read for
# the reduction. Measured on v5e at [B=512, N=1.1M, D=768, L=128]:
# 6.3 ms vs 15.9 ms for the XLA version (matmul + separate reduce) — the
# reduction rides along for free instead of costing a 2.3 GB re-read.
# bmax is emitted bins-on-sublanes ([nbins, B]) because lane-axis stores at
# non-128-aligned offsets do not lower; the caller transposes (17 MB, ~0.1ms).
_FUSED_TILE_ROWS = 1024


def _fused_kernel_factory(bz: int, bins_t: int, bin_rows: int):
    def kernel(q_ref, c_ref, ids_ref, s_ref, bmax_ref):
        s = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, T]
        # literal -inf: module-level NEG_INF is a traced jnp scalar, which a
        # Pallas kernel may not capture as a constant
        s = jnp.where(ids_ref[0, :][None, :] >= 0, s, float("-inf"))
        s_ref[:] = s
        bm = jnp.max(s.reshape(bz, bins_t, bin_rows), axis=-1)  # [B, bins_t]
        bmax_ref[:] = bm.T  # bins-on-sublanes

    return kernel


def _fused_eligible(bz: int, n: int, bin_rows: int) -> bool:
    t = _FUSED_TILE_ROWS
    return (
        jax.default_backend() == "tpu"
        and n % t == 0
        and t % bin_rows == 0
        and bz % 8 == 0
        and bz <= 1024  # VMEM budget for the [B, T] f32 score tile
        and (t // bin_rows) % 8 == 0  # bmax block sublane alignment
    )


def _scores_and_binmax(
    queries: jax.Array,
    segment: jax.Array,
    seg_row_ids: jax.Array,
    bin_rows: int,
    precision: str = "default",
) -> Tuple[jax.Array, jax.Array]:
    """(scores [B, n] fp32 masked, bin maxima [B, nbins] fp32).

    Non-default precision bypasses the fused Pallas kernel (whose in-kernel
    dot runs at MXU-native bf16 input precision)."""
    bz = queries.shape[0]
    n = segment.shape[0]
    nbins = n // bin_rows
    if precision != "default" or not _fused_eligible(bz, n, bin_rows):
        scores = _block_scores(queries, segment, precision)
        scores = jnp.where(seg_row_ids[None, :] >= 0, scores, NEG_INF)
        return scores, jnp.max(scores.reshape(bz, nbins, bin_rows), axis=-1)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = _FUSED_TILE_ROWS
    bins_t = t // bin_rows
    d = segment.shape[1]
    scores, bmax_t = pl.pallas_call(
        _fused_kernel_factory(bz, bins_t, bin_rows),
        grid=(n // t,),
        in_specs=[
            pl.BlockSpec((bz, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bz, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_t, bz), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bz, n), jnp.float32),
            jax.ShapeDtypeStruct((nbins, bz), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bz * n * d,
            bytes_accessed=n * d * segment.dtype.itemsize + bz * n * 4,
            transcendentals=0,
        ),
    )(queries, segment, seg_row_ids.reshape(1, n))
    return scores, bmax_t.T


def _binmax_segment(
    queries: jax.Array,
    segment: jax.Array,
    seg_row_ids: jax.Array,
    k: int,
    bin_rows: int,
    extract: int,
    precision: str = "default",
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of one corpus segment via bin-max selection.

    Returns (scores [B, k] fp32, ids [B, k]). Segment rows must be a
    multiple of ``bin_rows``.

    Performance note: candidate *positions* are derived arithmetically
    (``bin_base + argmax_lane``) during the extraction rounds — TPU gathers
    along the minor axis (``take_along_axis(..., axis=-1)`` on a [B, kb, L]
    operand) are an order of magnitude slower than the whole rest of the
    pipeline, so the fast path performs none."""
    bz = queries.shape[0]
    n = segment.shape[0]
    assert n % bin_rows == 0, (n, bin_rows)
    nbins = n // bin_rows

    scores, bmax = _scores_and_binmax(queries, segment, seg_row_ids, bin_rows,
                                      precision)
    sb = scores.reshape(bz, nbins, bin_rows)

    kb = min(k, nbins)
    bvals, bsel = jax.lax.top_k(bmax, kb)  # exact top-kb bins
    tau = bvals[:, kb - 1]  # [B] lower bound on the true k-th score

    cand = jnp.take_along_axis(sb, bsel[:, :, None], axis=1)  # [B, kb, L]

    # extract top-m per bin: m rounds of (max, argmax, mask); positions are
    # pure arithmetic on the argmax lane — no gathers in the fast path.
    m = min(extract, bin_rows)
    lane = jnp.arange(bin_rows)[None, None, :]
    base_pos = bsel * bin_rows  # [B, kb]
    vals, poss = [], []
    c = cand
    for _ in range(m):
        mx = jnp.max(c, axis=-1)
        am = jnp.argmax(c, axis=-1)
        vals.append(mx)
        poss.append(base_pos + am)
        c = jnp.where(lane == am[:, :, None], NEG_INF, c)
    kept_v = jnp.stack(vals, -1).reshape(bz, kb * m)
    kept_p = jnp.stack(poss, -1).reshape(bz, kb * m)
    rem_max = jnp.max(c, axis=(1, 2))
    segment_max_pos = n  # positions are segment-local

    # exact unless some non-extracted item could still reach tau
    # (ties included conservatively; all -inf rem is always fine)
    ok = jnp.all((rem_max < tau) | (rem_max == NEG_INF))

    def fast(_):
        v, sel = jax.lax.top_k(kept_v, k)
        # position lookup as a one-hot MXU matmul: 2.3x faster than the
        # lane-axis take_along_axis on TPU (2.4 ms vs 5.5 ms at
        # [512, 6000] -> [512, 1000]). f32 represents positions exactly up
        # to 2^24; segments are capped well below that.
        assert segment_max_pos <= 1 << 24
        oh = jax.nn.one_hot(sel, kb * m, dtype=jnp.float32)
        p = jnp.einsum(
            "bkn,bn->bk", oh, kept_p.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        return v, p

    def slow(_):
        cand_pos = base_pos[:, :, None] + lane  # [B, kb, L]
        v, sel = jax.lax.top_k(cand.reshape(bz, kb * bin_rows), k)
        p = jnp.take_along_axis(cand_pos.reshape(bz, kb * bin_rows), sel, axis=-1)
        return v, p

    if kb < k or kb * m < k:
        # kb < k: tau (the kb-th bin max) is NOT a lower bound on the true
        # k-th score, so the narrowing check is unsound — but then kb ==
        # nbins and ``cand`` holds the ENTIRE segment, so the slow path is
        # an exact full top-k. kb*m < k: not enough narrowed candidates.
        v, p = slow(None)
    else:
        v, p = jax.lax.cond(ok, fast, slow, None)
    ids = jnp.take(seg_row_ids, p)
    ids = jnp.where(jnp.isfinite(v), ids, -1)
    return v, ids


def topk_binmax(
    queries: jax.Array,
    corpus: jax.Array,
    row_ids: jax.Array,
    k: int,
    bin_rows: int = 128,
    extract: int = 6,
    segment_rows: int = 2_097_152,
    precision: str = "default",
) -> Tuple[jax.Array, jax.Array]:
    """Exact MIPS top-k via bin-max selection (see block comment above).

    Materializes fp32 scores one ``segment_rows`` corpus segment at a time
    (B * segment_rows * 4 bytes of HBM scratch), so large corpora stream in
    exact segment-topk + merge steps. ``bin_rows`` is halved automatically
    (down to 8) until it divides N; if nothing fits, the dense path runs —
    the result is exact in every case.
    """
    n, _ = corpus.shape
    while bin_rows > 8 and n % bin_rows:
        bin_rows //= 2
    if n <= k or n <= bin_rows * 2 or n % bin_rows:
        return topk_dense(queries, corpus, row_ids, k, precision)
    segment_rows = min(segment_rows, n)
    # segments must be bin-aligned
    segment_rows -= segment_rows % bin_rows
    seg_results = []
    for start in range(0, n, segment_rows):
        end = min(start + segment_rows, n)
        if end - start <= k:  # tiny tail: dense
            seg_results.append(
                topk_dense(queries, corpus[start:end], row_ids[start:end], k,
                           precision)
            )
        else:
            seg_results.append(
                _binmax_segment(
                    queries, corpus[start:end], row_ids[start:end],
                    k, bin_rows, extract, precision,
                )
            )
    if len(seg_results) == 1:
        return seg_results[0]
    all_v = jnp.concatenate([v for v, _ in seg_results], axis=-1)
    all_i = jnp.concatenate([i for _, i in seg_results], axis=-1)
    v, sel = jax.lax.top_k(all_v, k)
    return v, jnp.take_along_axis(all_i, sel, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "bin_rows", "extract", "segment_rows", "precision"),
)
def topk_binmax_jit(
    queries, corpus, row_ids, k: int,
    bin_rows: int = 128, extract: int = 6, segment_rows: int = 2_097_152,
    precision: str = "default",
):
    return topk_binmax(queries, corpus, row_ids, k, bin_rows, extract,
                       segment_rows, precision)
