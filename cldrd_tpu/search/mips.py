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


def _topk_with_payload(values: jax.Array, payload: jax.Array, k: int):
    """Descending top-k of ``values`` [B, W] carrying ``payload`` along.

    One variadic ``lax.sort`` (key = -values, payload rides as a second
    operand) replaces the ``lax.top_k`` + position-resolve pair. Measured
    on v5e at [B=512, W=8160, k=1000]: 1.26 ms vs 4.99 ms for
    top_k + one-hot-matmul resolve and 7.67 ms for top_k +
    ``take_along_axis`` (TPU gathers at this shape cost 5-13 ms; the
    sort's payload permutation is free). Exact score ties break toward the
    smaller payload (= lower row position / id): deterministic, matching
    the host numpy oracle and independent of candidate layout."""
    neg_v, p = jax.lax.sort((-values, payload), num_keys=2, dimension=-1,
                            is_stable=False)
    return -neg_v[..., :k], p[..., :k]


def topk_with_payload_chunked(values: jax.Array, payload: jax.Array,
                              k: int):
    """Exact descending top-k of ``values`` [B, W] carrying ``payload``,
    chunked for wide W.

    XLA TopK (and one whole-width sort) costs grow super-linearly with W
    (measured on v5e: 2.4 ms at 8.7k wide, 41 ms at 61k — and the [8,
    65536] IVF candidate row cost ~34 ms, the entire batch-1 IVF latency
    budget). So wide rows select in ~``_SELECT_WIDTH`` chunks: one
    batched per-chunk variadic sort keeps each chunk's top-k strip, one
    merge sort over [B, nseg*k] finishes. Same recipe as the binmax
    selection below, but over a FULLY-SCORED candidate set, so it is
    unconditionally exact: every global top-k element survives its
    chunk's depth-k strip (any element it displaced has >= k chunk-local
    elements above it, hence cannot be global top-k either) — this also
    preserves the smaller-payload tie-break of the single sort exactly.
    """
    b, w = values.shape
    k = min(k, w)
    if w <= max(_SELECT_WIDTH, 2 * k):
        return _topk_with_payload(values, payload, k)
    width = max(_SELECT_WIDTH, k)
    nseg = -(-w // width)
    pad = nseg * width - w
    if pad:
        values = jnp.concatenate(
            [values, jnp.full((b, pad), NEG_INF, values.dtype)], axis=1)
        payload = jnp.concatenate(
            [payload, jnp.full((b, pad), -1, payload.dtype)], axis=1)
    cv, cp = _topk_with_payload(values.reshape(b, nseg, width),
                                payload.reshape(b, nseg, width), k)
    return _topk_with_payload(cv.reshape(b, nseg * k),
                              cp.reshape(b, nseg * k), k)


def _block_scores(
    queries: jax.Array, corpus_blk: jax.Array, precision: str = "default",
    blk_scales: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, D] x [blk, D] -> [B, blk] fp32 scores on the MXU.

    ``blk_scales`` ([blk] fp32, int8 quantized store): the corpus block
    holds per-row-scaled int8 codes ``c8[j] ~ c[j] / s[j]``; real scores
    factorize exactly as ``(q . c8[j]) * s[j]`` — the multiply happens here
    in fp32, AFTER the dot, so every downstream top-k/certificate operates
    on real-score magnitudes. int8 codes (<= 127) are exact in bf16, so the
    cast below is lossless."""
    if corpus_blk.dtype == jnp.int8:
        corpus_blk = corpus_blk.astype(
            queries.dtype if queries.dtype != jnp.int8 else jnp.bfloat16)
    s = jax.lax.dot_general(
        queries,
        corpus_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )
    if blk_scales is not None:
        s = s * blk_scales[None, :]
    return s


def topk_dense(
    queries: jax.Array, corpus: jax.Array, row_ids: jax.Array, k: int,
    precision: str = "default", row_scales: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single full-matrix top-k (materializes [B, N]); for small corpora
    and as the correctness oracle for the streaming path.

    Handles k > N: results are padded with (-inf, -1) beyond the corpus
    size (``lax.top_k`` itself rejects k > axis size)."""
    n = corpus.shape[0]
    scores = _block_scores(queries, corpus, precision, row_scales)
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
    row_scales: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming blocked top-k: corpus [N, D] walked in ``block_rows`` chunks.

    N must be a multiple of ``block_rows`` (pad with ``row_id == -1`` rows;
    see ``cldrd_tpu.index.FlatIPIndex`` which maintains this invariant).
    Returns (scores [B, k] fp32 desc, ids [B, k] int32, -1 for empty slots).
    """
    n, d = corpus.shape
    bz = queries.shape[0]
    if n <= block_rows:
        return topk_dense(queries, corpus, row_ids, k, precision, row_scales)
    assert n % block_rows == 0, (n, block_rows)
    nblocks = n // block_rows
    blocks = corpus.reshape(nblocks, block_rows, d)
    id_blocks = row_ids.reshape(nblocks, block_rows)
    scale_blocks = (row_scales.reshape(nblocks, block_rows)
                    if row_scales is not None else
                    jnp.zeros((nblocks, 0), jnp.float32))

    def body(carry, blk):
        top_s, top_i = carry
        c_blk, i_blk, s_blk = blk
        s = _block_scores(queries, c_blk, precision,
                          s_blk if row_scales is not None else None)
        s = jnp.where(i_blk[None, :] >= 0, s, NEG_INF)
        cat_s = jnp.concatenate([top_s, s], axis=-1)
        cat_i = jnp.concatenate(
            [top_i, jnp.broadcast_to(i_blk[None, :], (bz, block_rows))], axis=-1
        )
        new_s, new_i = _topk_with_payload(cat_s, cat_i, k)
        return (new_s, new_i), None

    init = (
        jnp.full((bz, k), NEG_INF, jnp.float32),
        jnp.full((bz, k), -1, row_ids.dtype),
    )
    (top_s, top_i), _ = jax.lax.scan(
        body, init, (blocks, id_blocks, scale_blocks))
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
    return_positions: bool = False,
    on_miss: str = "fallback",
    row_scales: Optional[jax.Array] = None,
):
    """Corpus-sharded exact top-k under ``shard_map``.

    ``row_scales`` ([N] fp32, int8 quantized store) shards along
    ``axis_name`` with the corpus rows; per-shard scoring applies the
    per-row scale before any top-k, so the ICI merge compares real scores.

    ``corpus``/``row_ids`` are sharded along rows over ``axis_name``;
    ``queries`` are replicated. Per-shard exact top-k (``method``:
    'binmax' fast path or 'stream' memory-lean path), then the
    ``[ndev, B, k]`` candidate buffers all-gather over ICI and a final
    ``top_k`` picks the global winners. k candidates per shard always cover
    the global top-k, so the result is exact.

    ``return_positions=True`` returns GLOBAL row positions into the
    sharded corpus instead of external ids — the per-shard position ->
    global position conversion is pure arithmetic (shard index times shard
    rows), so no device gather runs anywhere (for 'stream' the scan's id
    buffer simply carries local positions instead of external ids).

    ``on_miss='flag'`` (binmax only; 'stream' is unconditionally exact)
    returns ``(scores, ids_or_positions, ok [B] bool)``: per-shard
    certificates AND-reduce over the mesh axis (a ``psum`` of misses), so
    ``ok`` is replicated and a query is certified only if every shard
    certified its local top-k. No in-graph fallback is traced; the caller
    re-runs flagged queries (``FlatIPIndex`` per-query recovery).
    """

    def shard_fn(q, c_shard, id_shard, *rest):
        sc_shard = rest[0] if rest else None
        okq = None
        if method == "binmax":
            res = topk_binmax(
                q, c_shard, id_shard, k, precision=precision,
                return_positions=return_positions, on_miss=on_miss,
                row_scales=sc_shard)
            if on_miss == "flag":
                local_s, local_i, okq = res
            else:
                local_s, local_i = res
        else:
            ids_or_pos = id_shard
            if return_positions:
                ids_or_pos = jnp.where(
                    id_shard >= 0,
                    jnp.arange(c_shard.shape[0], dtype=jnp.int32), -1,
                )
            local_s, local_i = topk_streaming(q, c_shard, ids_or_pos, k,
                                              block_rows, precision,
                                              row_scales=sc_shard)
        if return_positions:
            offset = jax.lax.axis_index(axis_name) * c_shard.shape[0]
            local_i = jnp.where(local_i >= 0, local_i + offset, -1)
        all_s = jax.lax.all_gather(local_s, axis_name)  # [ndev, B, k]
        all_i = jax.lax.all_gather(local_i, axis_name)
        ndev = all_s.shape[0]
        bz = all_s.shape[1]
        cand_s = jnp.transpose(all_s, (1, 0, 2)).reshape(bz, ndev * k)
        cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(bz, ndev * k)
        top_s, top_i = _topk_with_payload(cand_s, cand_i, k)
        if on_miss == "flag":
            if okq is None:  # streaming shards are exact
                okq = jnp.ones((q.shape[0],), jnp.bool_)
            # certified iff no shard missed: psum of misses == 0
            miss = jax.lax.psum((~okq).astype(jnp.int32), axis_name)
            return top_s, top_i, miss == 0
        return top_s, top_i

    from jax import shard_map

    in_specs = [P(), P(axis_name), P(axis_name)]
    operands = [queries, corpus, row_ids]
    if row_scales is not None:
        in_specs.append(P(axis_name))
        operands.append(row_scales)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P()) if on_miss == "flag" else (P(), P()),
        check_vma=False,
    )
    return fn(*operands)


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "precision"))
def topk_jit(queries, corpus, row_ids, k: int, block_rows: int = 8192,
             precision: str = "default", row_scales=None):
    return topk_streaming(queries, corpus, row_ids, k, block_rows, precision,
                          row_scales)


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
# Two implementations share this idea:
#
# - the PRIMARY path (`_binmax_segment_extract`, TPU + aligned shapes): the
#   fused Pallas kernel extracts two LEVELS of per-region top-m in VMEM and
#   the result self-certifies against the final top-k's own k-th value —
#   18.7 ms/batch = 27.4k QPS exact at [B=512, N=1.1M, D=768, k=1000] on
#   one v5e chip. See the kernel block comment below.
# - the PORTABLE path (below in this function): XLA-only bins top-k +
#   candidate gather + extraction; runs everywhere (CPU tests, odd shapes,
#   non-default precision). Defaults (bin_rows=128, extract=6) were the
#   swept optimum for it on v5e: 41.7 ms/batch = 12.3k QPS exact. A
#   smaller ``extract`` narrows faster but falls back (still exact, slower)
#   more often on corpora where many near-tied items share a bin.
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


def _fused_kernel_factory(bz: int, bins_t: int, bin_rows: int,
                          with_scales: bool = False):
    def kernel(q_ref, c_ref, ids_ref, *rest):
        if with_scales:
            scale_ref, s_ref, bmax_ref = rest
        else:
            s_ref, bmax_ref = rest
        c = c_ref[:]
        if c.dtype == jnp.int8:
            # int8 quantized store: codes <= 127 are exact in bf16/f32; the
            # tile's HBM read halves vs bf16. Cast to the query dtype so
            # the dot operands match.
            c = c.astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q_ref[:],
            c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, T]
        if with_scales:
            # real scores = code dot x per-row scale (fp32, post-dot)
            s = s * scale_ref[0, :][None, :]
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
    seg_scales: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(scores [B, n] fp32 masked, bin maxima [B, nbins] fp32).

    Non-default precision bypasses the fused Pallas kernel (whose in-kernel
    dot runs at MXU-native bf16 input precision)."""
    bz = queries.shape[0]
    n = segment.shape[0]
    nbins = n // bin_rows
    if precision != "default" or not _fused_eligible(bz, n, bin_rows):
        scores = _block_scores(queries, segment, precision, seg_scales)
        scores = jnp.where(seg_row_ids[None, :] >= 0, scores, NEG_INF)
        return scores, jnp.max(scores.reshape(bz, nbins, bin_rows), axis=-1)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = _FUSED_TILE_ROWS
    bins_t = t // bin_rows
    d = segment.shape[1]
    with_scales = seg_scales is not None
    in_specs = [
        pl.BlockSpec((bz, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    operands = [queries, segment, seg_row_ids.reshape(1, n)]
    if with_scales:
        in_specs.append(
            pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM))
        operands.append(seg_scales.reshape(1, n))
    scores, bmax_t = pl.pallas_call(
        _fused_kernel_factory(bz, bins_t, bin_rows, with_scales),
        grid=(n // t,),
        in_specs=in_specs,
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
    )(*operands)
    return scores, bmax_t.T


# Fused scores + TWO-LEVEL in-VMEM extraction: one pass computes the
# transposed score tile [T, B] on the MXU (batch on lanes) and reduces it to
# the tile's top-(R-1) items before anything leaves VMEM:
#
#   level 1: each 128-row bin yields its top-(R-1) values + positions and an
#            R-th value (the per-bin remainder bound), via R rounds of
#            (max, first-occurrence-argmin, mask) on the VPU;
#   level 2: the tile's bins_t*(R-1) level-1 candidates reduce again to the
#            tile's top-(R-1) + an R-th tile-remainder bound, masking by
#            POSITION equality (positions are unique; values may tie).
#
# Output per tile is just [R, B] values + positions + a [1, B] level-1
# remainder — ~70x smaller than the score tensor, so the [B, N] scores
# NEVER reach HBM, and the downstream needs NO per-query bin selection at
# all (the profiled killers: TPU gathers cost ~2-10 ns per selected row,
# 13+ ms for any 512k-row selection at [B=512, k=1000], and the one-hot-
# matmul alternative compiles to a 9.7 ms windowed emitter in-graph).
# Exactness is certified AFTER the final top-k against its own k-th value
# (see _binmax_segment_extract).
# Profiled motivation (v5e, B=512, N=1.1M, k=1000): the v1 path spent
# 12.8 ms gathering candidate bins from HBM scores and 4.6 ms extracting;
# both now ride the matmul's VMEM consumer.
_EXTRACT_ROUNDS = 7   # level 1 MAX: 6 candidates + 1 remainder bound per bin
# (The certificate is sound at ANY depth — bin-level exclusions are bounded
# by rem1 — so depth only tunes fallback frequency. The actual depth is
# Poisson-sized per corpus size by _extract_rounds below: 7 rounds at the
# 1.1M per-chip shard, 5 at the 8.86M full corpus — each dropped round
# removes one (max, argmax-emulate, mask) VPU sweep over every score.)
_SUPER_ROWS = 2048    # rows per level-2 super-block
# Level-2 depth is sized by the Poisson tail of "top-k items landing in one
# super-block": at k=1000, N=1.1M, S=2048 rows, lambda = k*S/N = 1.84 and
# P(Pois >= 16) ~ 1.3e-10 — times 544 super-blocks x 512 queries that is a
# ~4e-5 per-batch fallback probability. (The first, single-tile version used
# depth 8 at lambda = 0.92: ~3 expected violations PER BATCH -> it fell back
# almost every time and benched at 450 QPS.)
_SUPER_ROUNDS = 16    # level 2 MAX: 15 candidates + 1 remainder per block
# (the rounds actually EMITTED are Poisson-sized by _super_rounds below:
# 8 at full-corpus sizes, where every emitted round doubles as a selection
# candidate and the last as the block remainder bound)
# Selection-chunk candidate width for the post-kernel top-k: 8160 is the
# measured variadic-sort sweet spot on v5e (sort cost grows super-linearly
# in width).
_SELECT_WIDTH = 8160


def _select_rounds(n: int, nsup: int, bz: int, k: int, m2: int) -> int:
    """Per-super-block candidate depth actually entering selection.

    The kernel always emits ``m2`` candidates per super-block, but the
    number of true top-k items landing in one 2048-row block is
    ~Poisson(k * 2048 / n): at large n most emitted rounds are dead
    weight for the selection sorts/transposes. Keep the smallest depth m
    whose Poisson tail puts the expected number of (block, query) misses
    per batch below ~1e-4 — a block deeper than m just fails the
    certificate (its (m+1)-th candidate, which bounds everything dropped
    from it, lands above vk) and those queries re-run, so the result is
    EXACT at any depth. Governs the FULL-emission layout (shard sizes);
    at corpus sizes where ``_super_rounds`` cuts the emission itself to 8
    the selection consumes every emitted round and this is bypassed."""
    import math

    lam = k * _SUPER_ROWS / n
    pmf = math.exp(-lam)
    cdf = pmf
    for m in range(1, m2):
        pmf *= lam / m
        cdf += pmf
        # tail = P(X >= m + 1): blocks holding more top-k items than kept
        if m * nsup >= k and (1.0 - cdf) * nsup * bz <= 1e-4:
            return m
    return m2


def _extract_rounds(n: int, bz: int, k: int, bin_rows: int) -> int:
    """Level-1 extraction rounds (candidates + 1 remainder) for an n-row
    segment — the bin-granularity twin of ``_select_rounds``.

    The number of true top-k items landing in one ``bin_rows``-row bin is
    ~Poisson(k * bin_rows / n); a bin holding MORE items than the kept
    depth m fails the per-query certificate (its (m+1)-th value — the
    remainder bound rem1 — lands at/above vk) and that query re-runs
    exactly, so depth only tunes the fallback rate. Keep the smallest m
    whose expected (bin, query) misses per batch stay below ~5e-4 (the
    measured-acceptable rate of the historical fixed depth 6 at 1.1M
    rows; the amortized rescue cost at that rate is microseconds). Each
    dropped round removes one full (max, argmax-emulate, mask) VPU sweep
    over every score the kernel produces: at 8.86M rows this cuts level-1
    extraction work by 2/7."""
    import math

    lam = k * bin_rows / n
    nbins = n // bin_rows
    pmf = math.exp(-lam)
    cdf = pmf
    for m in range(1, _EXTRACT_ROUNDS - 1):
        pmf *= lam / m
        cdf += pmf
        # tail = P(X >= m + 1): bins holding more top-k items than kept
        if (1.0 - cdf) * nbins * bz <= 5e-4:
            return m + 1
    return _EXTRACT_ROUNDS


def _super_rounds(n: int, nsup: int, bz: int, k: int) -> int:
    """Level-2 rounds the kernel EMITS (multiple of 8: Mosaic block
    sublane constraint on the [nsup, R2, B] outputs).

    Reduced mode (8 at the 8.86M full corpus): all emitted rounds are
    selection candidates and the LAST one doubles as the block remainder
    bound — flagging a query whenever any block holds >= R2 top-k items
    (Poisson tail P(X >= R2) * nsup * bz <= ~5e-4 per batch, the same
    budget as the level-1 depth). Full mode keeps ``_SUPER_ROUNDS`` with
    the selection depth handled by ``_select_rounds``. Two effects of the
    reduced layout at 8.86M rows, both profiled in
    examples/profile_search.py: the post-kernel candidate SLICE disappears
    (14.2 ms/batch of 2 ns/element relayout copies) and half the level-2
    extraction rounds are never executed."""
    import math

    lam = k * _SUPER_ROWS / n
    for r2 in range(8, _SUPER_ROUNDS, 8):
        if r2 * nsup < k:
            continue
        tail = 1.0 - math.exp(-lam) * sum(
            lam**i / math.factorial(i) for i in range(r2))
        if tail * nsup * bz <= 5e-4:
            return r2
    return _SUPER_ROUNDS


_INTERPRET = False  # tests flip this to run the kernel on CPU


def _tile_plan(bz: int):
    """(tile_rows, tiles_per_super_block): one 2048-row tile when the
    [t, B] f32 score tile fits the VMEM budget (bz <= 512; measured +2%
    over two accumulated 1024-row tiles), else two tiles with scratch
    accumulation."""
    tile_rows = _SUPER_ROWS if bz <= 512 else _SUPER_ROWS // 2
    return tile_rows, _SUPER_ROWS // tile_rows


def _extract_kernel_factory(bins_t: int, bin_rows: int, bz: int,
                            tile_rows: int, s_tiles: int,
                            with_scales: bool = False,
                            rounds: int = _EXTRACT_ROUNDS,
                            rounds2: int = _SUPER_ROUNDS):
    from jax.experimental import pallas as pl

    R = rounds
    m = R - 1
    # ``rounds2``: level-2 rounds actually emitted — Poisson-sized by
    # ``_super_rounds`` (8 at the 8.86M full corpus, 16 at shard sizes).
    # In reduced mode ALL emitted rounds are selection candidates and the
    # LAST one doubles as the block remainder bound (descending emission:
    # the R2-th value bounds everything deeper), so the post-kernel path
    # needs no slice — whose 2 ns/element relayout copies cost a profiled
    # 14.2 ms/batch at 8.86M rows (examples/profile_search.py) — and the
    # kernel runs half the extraction rounds.
    R2 = rounds2
    cw = bins_t * m  # level-1 candidates per tile
    neg = float("-inf")

    def kernel(q_ref, c_ref, ids_ref, *rest):
        if with_scales:
            (scale_ref, sup_v_ref, sup_p_ref, rem1_ref, v_sc, p_sc) = rest
        else:
            scale_ref = None
            (sup_v_ref, sup_p_ref, rem1_ref, v_sc, p_sc) = rest
        i = pl.program_id(0)
        c = c_ref[:]
        if c.dtype == jnp.int8:
            # int8 quantized store: codes <= 127 are exact in bf16/f32; the
            # tile's HBM read halves vs bf16. Cast to the query dtype so
            # the dot operands match.
            c = c.astype(q_ref.dtype)
        s = jax.lax.dot_general(
            c,
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, B] — batch on lanes
        if with_scales:
            # real scores = code dot x per-row scale (fp32, post-dot):
            # [T, 1] broadcast over the lane (batch) axis
            s = s * scale_ref[:]
        s = jnp.where(ids_ref[:] >= 0, s, neg)  # ids [T, 1] bcast
        s = s.reshape(bins_t, bin_rows, bz)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bins_t, bin_rows, bz), 1)
        bin_base = (
            i * tile_rows
            + jax.lax.broadcasted_iota(jnp.int32, (bins_t, bz), 0) * bin_rows
        )
        vs, ps = [], []
        for r in range(R):
            mx = jnp.max(s, axis=1)  # [bins_t, B]
            if r == m:
                # R-th value = per-bin remainder bound, reduced to a
                # tile max (broadcast over 8 sublanes — Mosaic requires
                # 8-divisible block sublane dims)
                tile_rem = jnp.broadcast_to(
                    jnp.max(mx, axis=0, keepdims=True), (8, bz)
                )[None]
                break
            # first-occurrence argmax via min-over-matching-lanes (argmax
            # along a non-minor axis does not lower in Mosaic)
            am = jnp.min(
                jnp.where(s == mx[:, None, :], lane, bin_rows), axis=1
            )
            vs.append(mx)
            ps.append(bin_base + am)
            s = jnp.where(lane == am[:, None, :], neg, s)

        cand_v = jnp.stack(vs, axis=1).reshape(cw, bz)
        cand_p = jnp.stack(ps, axis=1).reshape(cw, bz)

        # accumulate level-1 candidates across s_tiles grid steps in
        # VMEM scratch; the output blocks (indexed i // s_tiles) stay
        # resident across those steps
        if s_tiles == 1:
            v_sc[0:cw, :] = cand_v
            p_sc[0:cw, :] = cand_p
            rem1_ref[:] = tile_rem
        else:
            first = i % s_tiles == 0

            @pl.when(first)
            def _():
                v_sc[0:cw, :] = cand_v
                p_sc[0:cw, :] = cand_p
                rem1_ref[:] = tile_rem

            @pl.when(jnp.logical_not(first))
            def _():
                v_sc[cw : 2 * cw, :] = cand_v
                p_sc[cw : 2 * cw, :] = cand_p
                rem1_ref[:] = jnp.maximum(rem1_ref[:], tile_rem)

        # level 2 on the super-block's accumulated candidates, last step only
        @pl.when(i % s_tiles == s_tiles - 1)
        def _():
            v2 = v_sc[:]
            p2 = p_sc[:]
            sv, sp = [], []
            big = jnp.int32(2147483647)
            for _r in range(R2):
                mx = jnp.max(v2, axis=0)  # [B]
                # position of the max; masking by position keeps tied
                # VALUES from being extracted twice (positions are unique)
                px = jnp.min(jnp.where(v2 == mx[None, :], p2, big), axis=0)
                sv.append(mx)
                sp.append(px)
                v2 = jnp.where(p2 == px[None, :], neg, v2)
            sup_v_ref[:] = jnp.stack(sv, axis=0)[None]  # [1, R2, B]
            sup_p_ref[:] = jnp.stack(sp, axis=0)[None]

    return kernel


def _extract_eligible(bz: int, n: int, bin_rows: int) -> bool:
    t, _ = _tile_plan(bz)
    return (
        (jax.default_backend() == "tpu" or _INTERPRET)
        and n % _SUPER_ROWS == 0
        and t % bin_rows == 0
        and bz % 128 == 0  # batch rides the lane axis
        and bz <= 1024  # VMEM budget for the [T, B] f32 score tile
        and (t // bin_rows) % 8 == 0
    )


def _binmax_segment_extract(
    queries: jax.Array,
    segment: jax.Array,
    seg_row_ids: jax.Array,
    k: int,
    bin_rows: int,
    on_miss: str = "fallback",
    seg_scales: Optional[jax.Array] = None,
):
    """Exact segment top-k via the fused scores+two-level-extraction kernel.

    Same contract as ``_binmax_segment``. Each 2048-row super-block emits
    its top-``m_sel`` items (the Poisson-sized selection depth, up to
    ``_SUPER_ROUNDS - 1``) plus two remainder bounds; the final top-k runs
    over the ``nsup * m_sel`` block candidates and certifies itself
    against its own k-th value (always a sound lower bound on the true
    k-th score, because candidates are a subset of all items). Falls
    back to ``topk_streaming`` (memory-lean, exact) whenever a bound cannot
    certify the narrowing.

    ``on_miss``: 'fallback' (default) re-scans IN-GRAPH when the
    whole-batch certificate fails — one adversarial query drags all B
    queries through the slow path (the certificate is ``jnp.all`` over the
    batch because a jit program cannot compact a dynamic subset). 'flag'
    returns ``(values, positions, ok [B] bool)`` instead, never tracing
    the slow path: rows with ``ok=False`` MAY be inexact and the caller
    re-runs just those queries (see ``FlatIPIndex`` per-query recovery —
    the whole-batch cliff becomes a per-query surcharge)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bz = queries.shape[0]
    n, d = segment.shape
    R = _extract_rounds(n, bz, k, bin_rows)  # Poisson-sized level-1 depth
    R2 = _SUPER_ROUNDS
    m2 = R2 - 1

    t, s_tiles = _tile_plan(bz)
    bins_t = t // bin_rows
    ntiles = n // t
    nsup = ntiles // s_tiles
    cw = bins_t * (R - 1)
    with_scales = seg_scales is not None

    f32 = jnp.float32
    finfo_min = f32(jnp.finfo(jnp.float32).min)
    # Poisson-adaptive level-2 emission (see _super_rounds): at large n
    # the kernel emits 8 rounds instead of 16 — every round a selection
    # candidate, the last doubling as the block remainder bound — which
    # removes the post-kernel slice (and its relayout copies) and half
    # the level-2 extraction work. At shard sizes it emits the full R2
    # and _select_rounds trims the SELECTION depth instead.
    cand_rows = _super_rounds(n, nsup, bz, k)
    reduced = cand_rows < R2
    m_sel = cand_rows if reduced else _select_rounds(n, nsup, bz, k, m2)
    if nsup * m_sel < k:
        # not enough super-block candidates to cover k: exact streaming
        # fallback, skipping the kernel entirely. block_rows must divide
        # n; the extract path only guarantees n % _SUPER_ROWS == 0, so
        # pass that rather than the 8192 default. Contract: this function
        # returns SEGMENT-LOCAL POSITIONS, so feed the scan
        # position-substituted ids, not the external ones.
        lpos = jnp.where(seg_row_ids >= 0,
                         jnp.arange(n, dtype=seg_row_ids.dtype), -1)
        v, p = topk_streaming(queries, segment, lpos, k, _SUPER_ROWS,
                              row_scales=seg_scales)
        if on_miss == "flag":
            return v, p, jnp.ones((bz,), jnp.bool_)  # streaming is exact
        return v, p

    in_specs = [
        pl.BlockSpec((bz, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [queries, segment, seg_row_ids.reshape(n, 1)]
    if with_scales:
        in_specs.append(
            pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM))
        operands.append(seg_scales.reshape(n, 1))
    sup_v, sup_p, rem1 = pl.pallas_call(
        _extract_kernel_factory(bins_t, bin_rows, bz, t, s_tiles,
                                with_scales, rounds=R, rounds2=cand_rows),
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, cand_rows, bz), lambda i: (i // s_tiles, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cand_rows, bz), lambda i: (i // s_tiles, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, bz), lambda i: (i // s_tiles, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsup, cand_rows, bz), jnp.float32),
            jax.ShapeDtypeStruct((nsup, cand_rows, bz), jnp.int32),
            jax.ShapeDtypeStruct((nsup, 8, bz), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_tiles * cw, bz), jnp.float32),
            pltpu.VMEM((s_tiles * cw, bz), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bz * n * d,
            bytes_accessed=n * d * segment.dtype.itemsize
            + (2 * nsup * cand_rows * bz + nsup * 8 * bz) * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(*operands)
    # rem2: candidates are emitted in descending order, so a block's LAST
    # emitted value bounds everything deeper. In reduced mode that last
    # round is itself a selection candidate (conservative: a block holding
    # exactly cand_rows top-k items flags even though all were found —
    # priced into _super_rounds' tail budget); in full mode it is the
    # dedicated remainder round beyond the m_sel selection depth.
    rem2 = jnp.max(sup_v[:, (cand_rows if reduced else m_sel + 1) - 1, :],
                   axis=0)  # [B]
    rem1 = jnp.max(rem1, axis=(0, 1))  # [B] bin-level remainder bound

    # Final selection needs NO per-query bin gather: each super-block
    # already carries its selection candidates, flattened to B-major
    # through one plain 2-D transpose (XLA's tiled transpose emitter —
    # the B-major-from-the-kernel alternative slowed the kernel ~45% with
    # lane->sublane relayouts).
    if reduced:
        # every emitted round is a candidate: contiguous reshape + fast
        # transpose, NO slice anywhere (a slice here emitted 14.2 ms of
        # 2 ns/element relayout copies at 8.86M — profile_search.py)
        kv = sup_v.reshape(nsup * cand_rows, bz).T
        kp = sup_p.reshape(nsup * cand_rows, bz).T
        m_lay = cand_rows  # candidate rows per block in the sort layout
    else:
        # full depth: transpose-everything-then-slice fuses the slice
        # into the selection sort (measured 10.7 vs 12.6 ms/batch at 1.1M)
        kvt = sup_v.reshape(nsup * R2, bz).T.reshape(bz, nsup, R2)
        kpt = sup_p.reshape(nsup * R2, bz).T.reshape(bz, nsup, R2)
        kv = kvt[:, :, :m_sel].reshape(bz, nsup * m_sel)
        kp = kpt[:, :, :m_sel].reshape(bz, nsup * m_sel)
        m_lay = m_sel

    # Selection. Variadic-sort cost grows super-linearly in width
    # (measured: [512, 8160] 1.26 ms but [512, 64920] 41.8 ms), so large
    # corpora select in ~8160-candidate chunks and merge the per-chunk
    # top-k strips — the whole-corpus kernel pass stays ONE pallas_call
    # either way (no lax.scan segment staging).
    # super-blocks per chunk; every chunk strip must hold k candidates
    # (sel_sup * m_lay >= k) for the per-chunk top-k to be meaningful
    sel_sup = max(_SELECT_WIDTH // m_lay, -(-k // m_lay), 1)
    if nsup <= sel_sup:
        kept_v = jnp.maximum(kv, finfo_min)  # -inf -> sentinel (empty)
        # one variadic sort yields winner values AND positions together —
        # no one-hot resolve, no gather (see _topk_with_payload)
        v, p_raw = _topk_with_payload(kept_v, kp, k)
    else:
        nseg = -(-nsup // sel_sup)
        pad = (nseg * sel_sup - nsup) * m_lay
        if pad:
            # padded blocks behave exactly like empty candidates
            kv = jnp.concatenate(
                [kv, jnp.full((bz, pad), NEG_INF, f32)], axis=1)
            kp = jnp.concatenate(
                [kp, jnp.full((bz, pad), -1, jnp.int32)], axis=1)
        sel_w = sel_sup * m_lay
        kept_v = jnp.maximum(kv.reshape(bz, nseg, sel_w), finfo_min)
        kept_p = kp.reshape(bz, nseg, sel_w)
        # batched per-chunk sort, then one merge over [B, nseg*k]. Every
        # true global-top-k item survives its chunk's top-k, so the merge
        # is exact given the (global) certificate below.
        cv, cp = _topk_with_payload(kept_v, kept_p, k)
        v, p_raw = _topk_with_payload(
            cv.reshape(bz, nseg * k), cp.reshape(bz, nseg * k), k)
    # vk = k-th best CANDIDATE value: candidates are a subset of all items,
    # so vk <= true k-th score ALWAYS — a self-certifying bound. If every
    # item not in the candidate set (bounded by rem1/rem2) scores below vk,
    # nothing was dropped and the result is exact; otherwise fall back.
    vk = v[:, k - 1]
    okq = (
        ((rem1 < vk) | (rem1 == NEG_INF))
        & ((rem2 < vk) | (rem2 == NEG_INF))
    )  # [B] per-query certificate
    ok = jnp.all(okq)

    def fast(_):
        # restore the -inf convention for empty slots (real scores cannot
        # reach f32 min short of overflowing bf16 inputs)
        empty = v <= finfo_min
        return jnp.where(empty, NEG_INF, v), jnp.where(empty, -1, p_raw)

    def slow(_):
        # positions-as-ids substitution keeps the fallback gather-free too.
        # lax.cond traces BOTH branches, so the streaming block size must
        # divide n unconditionally: the extract path guarantees only
        # n % _SUPER_ROWS == 0 (not the 8192 default).
        lpos = jnp.where(seg_row_ids >= 0,
                         jnp.arange(n, dtype=seg_row_ids.dtype), -1)
        return topk_streaming(queries, segment, lpos, k, _SUPER_ROWS,
                              row_scales=seg_scales)

    if on_miss == "flag":
        fv, fp = fast(None)
        return fv, fp, okq
    return jax.lax.cond(ok, fast, slow, None)


def _binmax_segment(
    queries: jax.Array,
    segment: jax.Array,
    seg_row_ids: jax.Array,
    k: int,
    bin_rows: int,
    extract: int,
    precision: str = "default",
    on_miss: str = "fallback",
    seg_scales: Optional[jax.Array] = None,
):
    """Exact top-k of one corpus segment via bin-max selection.

    Returns (scores [B, k] fp32, SEGMENT-LOCAL positions [B, k], -1 for
    empty slots) — plus a per-query ``ok [B]`` certificate when
    ``on_miss='flag'`` (see ``_binmax_segment_extract``: flagged rows may
    be inexact and the caller re-runs them; nothing slow is traced).
    Segment rows must be a multiple of ``bin_rows``.

    Performance note: candidate *positions* are derived arithmetically
    (``bin_base + argmax_lane``) during the extraction rounds — TPU gathers
    along the minor axis (``take_along_axis(..., axis=-1)`` on a [B, kb, L]
    operand) are an order of magnitude slower than the whole rest of the
    pipeline, so the fast path performs none."""
    bz = queries.shape[0]
    n = segment.shape[0]
    assert n % bin_rows == 0, (n, bin_rows)
    nbins = n // bin_rows

    if precision == "default" and _extract_eligible(bz, n, bin_rows):
        # fast path: fused scores+extraction kernel, no [B, N] score tensor
        return _binmax_segment_extract(queries, segment, seg_row_ids, k,
                                       bin_rows, on_miss, seg_scales)

    scores, bmax = _scores_and_binmax(queries, segment, seg_row_ids, bin_rows,
                                      precision, seg_scales)
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

    # exact unless some non-extracted item could still reach tau
    # (ties included conservatively; all -inf rem is always fine)
    okq = (rem_max < tau) | (rem_max == NEG_INF)  # [B] per-query
    ok = jnp.all(okq)

    def fast(_):
        # winner values and positions in one variadic sort (payload rides
        # the sort — no one-hot resolve, no take_along_axis gather)
        return _topk_with_payload(kept_v, kept_p, k)

    def slow(_):
        cand_pos = base_pos[:, :, None] + lane  # [B, kb, L]
        return _topk_with_payload(
            cand.reshape(bz, kb * bin_rows),
            cand_pos.reshape(bz, kb * bin_rows).astype(jnp.int32), k)

    if kb < k or kb * m < k:
        # kb < k: tau (the kb-th bin max) is NOT a lower bound on the true
        # k-th score, so the narrowing check is unsound — but then kb ==
        # nbins and ``cand`` holds the ENTIRE segment, so the slow path is
        # an exact full top-k. kb*m < k: not enough narrowed candidates.
        v, p = slow(None)
        okq = jnp.ones((bz,), jnp.bool_)  # slow covers all candidates
    elif on_miss == "flag":
        v, p = fast(None)
    else:
        v, p = jax.lax.cond(ok, fast, slow, None)
    p = jnp.where(jnp.isfinite(v), p, -1)
    if on_miss == "flag":
        return v, p, okq
    return v, p


def topk_binmax(
    queries: jax.Array,
    corpus: jax.Array,
    row_ids: jax.Array,
    k: int,
    bin_rows: int = 128,
    extract: int = 6,
    segment_rows: int = 2_097_152,
    precision: str = "default",
    return_positions: bool = False,
    on_miss: str = "fallback",
    row_scales: Optional[jax.Array] = None,
):
    """Exact MIPS top-k via bin-max selection (see block comment above).

    ``row_scales`` ([N] fp32): int8 quantized store — the corpus holds
    per-row int8 codes and real scores factorize as ``(q . c8) * s``; the
    scale multiply rides inside every kernel/fallback, so certificates and
    merges see real-score magnitudes and the result is EXACT with respect
    to the quantized vectors (quantization error itself is a store-time
    property, measured in examples/quantization_study.py).

    Materializes fp32 scores one ``segment_rows`` corpus segment at a time
    (B * segment_rows * 4 bytes of HBM scratch), so large corpora stream in
    exact segment-topk + merge steps. ``bin_rows`` is halved automatically
    (down to 8) until it divides N; if nothing fits, the dense path runs —
    the result is exact in every case.

    ``return_positions=True`` returns corpus ROW POSITIONS instead of
    external ids, skipping the final device gather (~3.7 ms at
    [B=512, k=1000] — TPU gathers are slow); callers map positions to ids
    with a host-side ``np.take`` (see ``FlatIPIndex.search``).

    ``on_miss='flag'`` returns ``(scores, ids_or_positions, ok [B] bool)``
    and never runs the in-graph exact re-scan: rows whose certificate
    failed in ANY segment have ``ok=False`` and may be inexact — the
    caller re-runs exactly those queries (per-query recovery replaces the
    whole-batch fallback cliff; see ``FlatIPIndex.search``). Rows with
    ``ok=True`` are exact, unconditionally.
    """
    assert on_miss in ("fallback", "flag"), on_miss
    n, _ = corpus.shape
    while bin_rows > 8 and n % bin_rows:
        bin_rows //= 2
    # position-substituted ids: downstream results become row POSITIONS,
    # converted to external ids exactly once at the end (or returned as-is
    # when the caller maps ids on host — see FlatIPIndex)
    pos_ids = jnp.where(row_ids >= 0,
                        jnp.arange(n, dtype=jnp.int32), jnp.int32(-1))

    bz = queries.shape[0]
    ok_all = jnp.ones((bz,), jnp.bool_)

    def finish(v, p, ok):
        if not return_positions:
            ids = jnp.take(row_ids, jnp.maximum(p, 0))
            v, p = v, jnp.where(p >= 0, ids, -1)
        if on_miss == "flag":
            return v, p, ok
        return v, p

    if n <= k or n <= bin_rows * 2 or n % bin_rows:
        v, p = topk_dense(queries, corpus, pos_ids, k, precision, row_scales)
        return finish(v, p, ok_all)  # dense is exact
    if precision == "default" and _extract_eligible(bz, n, bin_rows):
        # ONE fused kernel pass over the WHOLE corpus — the grid covers
        # every tile, selection chunks internally (_SELECT_SUPERS), so no
        # ``segment_rows`` streaming is needed: the lax.scan alternative
        # re-stages every segment's rows through HBM (measured 20.8 ms +
        # 13.8 ms of operand copies per 512-query batch at 8.86M int8
        # rows) and pays a per-segment selection besides.
        res = _binmax_segment_extract(queries, corpus, row_ids, k, bin_rows,
                                      on_miss, row_scales)
        if on_miss == "flag":
            v, p, okq = res
            return finish(v, p, okq)
        v, p = res
        return finish(v, p, ok_all)
    segment_rows = min(segment_rows, n)
    # segments must be bin-aligned
    segment_rows -= segment_rows % bin_rows
    # Prefer an EQUAL split: when segments divide n, the scan consumes
    # reshape(corpus) — a zero-copy bitcast — instead of slicing a
    # head copy (corpus[:tail_start] materializes an n-sized HLO temp:
    # 6 GB at 8.8M int8 rows, the difference between fitting one chip and
    # OOM). Scanning a few percent more segments costs ~nothing.
    if n % segment_rows:
        nseg = -(-n // segment_rows)
        for cand in range(nseg, nseg + 8):
            seg2 = n // cand
            if (n % cand == 0 and seg2 > k and seg2 % bin_rows == 0
                    and seg2 % _SUPER_ROWS == 0):
                segment_rows = seg2
                break
    if segment_rows <= k:
        # degenerate caller choice: _binmax_segment needs > k rows to
        # narrow into; grow segments to the smallest bin-aligned size > k
        # (the tail-start handling below copes with nfull == 0)
        segment_rows = (k // bin_rows + 1) * bin_rows
    seg_results = []
    nfull = n // segment_rows
    tail_start = nfull * segment_rows
    d = corpus.shape[1]

    if nfull >= 2:
        # lax.scan over the full segments rather than unrolled slices: the
        # unrolled pallas calls have no data dependencies, so XLA overlaps
        # them and their scoped-VMEM windows SUM — two concurrent segment
        # kernels blow the 16 MB scoped-vmem limit (measured: 16.5 M at
        # [B=512, 2 x 2,097,152 rows]). The scan serializes the kernel
        # (one scoped allocation, one compiled body for any segment count)
        # at zero cost: each segment scan saturates the chip on its own.
        blocks = corpus[:tail_start].reshape(nfull, segment_rows, d)
        id_blocks = row_ids[:tail_start].reshape(nfull, segment_rows)
        starts = jnp.arange(nfull, dtype=jnp.int32) * segment_rows
        scale_blocks = (
            row_scales[:tail_start].reshape(nfull, segment_rows)
            if row_scales is not None else
            jnp.zeros((nfull, 0), jnp.float32))

        def body(ok_carry, xs):
            c_seg, id_seg, start, sc_seg = xs
            res = _binmax_segment(
                queries, c_seg, id_seg, k, bin_rows, extract, precision,
                on_miss,
                sc_seg if row_scales is not None else None,
            )
            if on_miss == "flag":
                v, p, seg_ok = res
                # a query is exact only if EVERY segment certified it
                ok_carry = ok_carry & seg_ok
            else:
                v, p = res
            return ok_carry, (v, jnp.where(p >= 0, p + start, -1))

        ok_all, (vs, ps) = jax.lax.scan(
            body, ok_all, (blocks, id_blocks, starts, scale_blocks)
        )
        # [nfull, B, k] -> [B, nfull*k] candidate strips
        seg_results.append((
            jnp.transpose(vs, (1, 0, 2)).reshape(bz, nfull * k),
            jnp.transpose(ps, (1, 0, 2)).reshape(bz, nfull * k),
        ))
    elif nfull == 1:
        res = _binmax_segment(
            queries, corpus[:tail_start], row_ids[:tail_start],
            k, bin_rows, extract, precision, on_miss,
            row_scales[:tail_start] if row_scales is not None else None,
        )
        if on_miss == "flag":
            v, p, seg_ok = res
            ok_all = ok_all & seg_ok
        else:
            v, p = res
        seg_results.append((v, p))

    if tail_start < n:
        tail_scales = (row_scales[tail_start:]
                       if row_scales is not None else None)
        if n - tail_start <= k:  # tiny tail: dense
            v, p = topk_dense(queries, corpus[tail_start:],
                              pos_ids[tail_start:], k, precision,
                              tail_scales)
            # pos_ids slices already carry GLOBAL positions
            seg_results.append((v, p))
        else:
            res = _binmax_segment(
                queries, corpus[tail_start:], row_ids[tail_start:],
                k, bin_rows, extract, precision, on_miss, tail_scales,
            )
            if on_miss == "flag":
                v, p, seg_ok = res
                ok_all = ok_all & seg_ok
            else:
                v, p = res
            seg_results.append((v, jnp.where(p >= 0, p + tail_start, -1)))

    if len(seg_results) == 1:
        v, p = seg_results[0]
        if v.shape[-1] > k:  # scanned multi-segment strip: merge
            v, p = _topk_with_payload(v, p, k)
        return finish(v, p, ok_all)
    all_v = jnp.concatenate([v for v, _ in seg_results], axis=-1)
    all_i = jnp.concatenate([i for _, i in seg_results], axis=-1)
    v, p = _topk_with_payload(all_v, all_i, k)
    return finish(v, p, ok_all)


@functools.partial(
    jax.jit,
    static_argnames=("k", "bin_rows", "extract", "segment_rows", "precision",
                     "return_positions", "on_miss"),
)
def topk_binmax_jit(
    queries, corpus, row_ids, k: int,
    bin_rows: int = 128, extract: int = 6, segment_rows: int = 2_097_152,
    precision: str = "default", return_positions: bool = False,
    on_miss: str = "fallback", row_scales=None,
):
    return topk_binmax(queries, corpus, row_ids, k, bin_rows, extract,
                       segment_rows, precision, return_positions, on_miss,
                       row_scales)
