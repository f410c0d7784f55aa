"""IVF (inverted-file) approximate MIPS index — TPU-native IndexIVFFlat.

The reference's FAISS dependency (``retriever/retrieval_utils.py:116-129``)
uses the Flat index, and our ``FlatIPIndex`` matches it exactly. The flat
scan is near-optimal on TPU for LARGE offline query batches (the corpus
streams from HBM once per batch, amortized over all queries — 37k QPS at
B=512). It is the WRONG shape for low-latency serving: a single query still
pays the full corpus scan (~8.8M rows -> milliseconds of HBM traffic).

IVF fixes the low-batch regime the FAISS way — probe ``nprobe`` of
``nlist`` cells — with a TPU-first layout:

- **Row-layout device store.** Non-PQ buckets live on device as
  [n_buckets*slot, D] rows (bucket j = rows j*slot:(j+1)*slot): the
  probe step streams (slot, D) rectangles from it at HBM bandwidth —
  both the Pallas probe kernel and the XLA row-gather. (The earlier
  [n_buckets, slot*D] layout forced a whole-store XLA retile inside
  every search call: measured 20-140 ms/batch at the 8.4M-row config,
  the entire IVF latency budget.) PQ code stores stay [n_buckets,
  slot*mb] — their gather is KBs. Disk format is unchanged.
- **Fixed-size buckets, not ragged lists.** FAISS stores ragged inverted
  lists; ragged anything is hostile to XLA. We pad every cluster into one
  or more fixed ``slot``-row buckets ([n_buckets, slot, D] storage); a
  cluster larger than ``slot`` spans several buckets, each carrying a
  duplicate of the cluster centroid. Probing selects top-``nprobe``
  *buckets* by centroid score, so an oversized cluster naturally consumes
  several probe slots (same cost accounting as FAISS visiting its longer
  list).
- **Search is three MXU/VPU ops, no host round trip**: q @ centroids.T ->
  ``lax.top_k`` buckets -> one batched block-gather of [B, nprobe,
  slot*D] -> scoring einsum -> masked chunked payload-sort selection
  (``topk_with_payload_chunked`` — one ``lax.top_k`` over the wide
  [B, nprobe*slot] candidate row measured 34 ms at 65k wide, the entire
  batch-1 latency budget; the chunked sort is exact and ~10x cheaper).
  The gather moves B*nprobe*slot rows instead of the whole corpus: at
  serving batch sizes that is 10-100x less HBM traffic than the flat
  scan.
- **Exactness invariant**: with ``nprobe == n_buckets`` the search visits
  every row — results must equal ``FlatIPIndex`` / the numpy oracle
  exactly (tested). Recall at smaller nprobe is a measured, monotone
  trade-off (``examples/bench_ivf.py``).
- int8 stores reuse the one shared ``quantize_rows`` definition; scores
  factorize as ``(q . c8) * s`` exactly like every other search path.

When to use which (documented honestly): offline run-file retrieval at
B >= 128 -> ``FlatIPIndex`` (batch-amortized exact scan); online serving
at B <= ~32 -> ``IVFIndex`` (probed subset).
"""
from __future__ import annotations

import functools
import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .flat_index import (
    HostIdCacheMixin,
    _check_ids,
    quantize_rows,
    query_dtype_for,
)
from .kmeans import assign_clusters, kmeans
from .pq import (
    encode_pq,
    pack_codes4,
    pq_lut,
    pq_scores_from_codes,
    train_opq,
    train_pq,
    unpack_codes4,
)
from cldrd_tpu.parallel import CORPUS_AXIS
from cldrd_tpu.search.mips import (
    _PRECISIONS,
    NEG_INF,
    _block_scores,
    _topk_with_payload,
    topk_with_payload_chunked,
)

IVF_META_NAME = "ivf_meta.json"


def _chunk_into_buckets(row_idx, values, ids, slot: int, scales=None):
    """Chunk the given rows (indices into ``values``/``ids``[/``scales``])
    into padded ``slot``-row buckets; the ONE bucket-padding convention
    (zero rows, id -1, scale 1) shared by build() and add()-overflow.
    Yields (blk [slot, d], bid [slot] int32, sc [slot] fp32 | None)."""
    d = values.shape[1]
    for s0 in range(0, len(row_idx), slot):
        chunk = row_idx[s0 : s0 + slot]
        blk = np.zeros((slot, d), values.dtype)
        blk[: len(chunk)] = values[chunk]
        bid = np.full((slot,), -1, np.int32)
        bid[: len(chunk)] = ids[chunk].astype(np.int32)
        sc = None
        if scales is not None:
            sc = np.ones((slot,), np.float32)
            sc[: len(chunk)] = scales[chunk]
        yield blk, bid, sc


def _probe_kernel_eligible(store_dtype, precision: str) -> bool:
    """The fused probe-score Pallas kernel (ops/ivf_probe.py) runs on TPU
    at 'default' precision for <=2-byte stores (bf16/int8 — its in-VMEM
    dot is bf16, which IS the TPU 'default' matmul input precision; fp32
    stores at higher precision keep the XLA path, same policy as the
    fused exact-search kernel's ``_fused_eligible``)."""
    return (jax.default_backend() == "tpu"
            and precision == "default"
            and jnp.dtype(store_dtype).itemsize <= 2)


def _probe_and_score(q, buckets_rows, bucket_scales, probe,
                     slot: int, precision: str):
    """Scores [B, p*slot] fp32 of every row in the probed buckets, from
    the ROW-layout store [nb*slot, D]. TPU: one streaming Pallas kernel
    (each probed bucket HBM->VMEM exactly once, scored in VMEM — no
    materialized gather). Elsewhere: row-gather + einsum."""
    from cldrd_tpu.ops.ivf_probe import probe_scores

    b = q.shape[0]
    nprobe = probe.shape[1]
    if _probe_kernel_eligible(buckets_rows.dtype, precision):
        return probe_scores(q, buckets_rows, probe,
                            bucket_scales if bucket_scales.shape[1] else None,
                            slot=slot)
    rowix = (probe[:, :, None] * slot
             + jnp.arange(slot, dtype=probe.dtype)[None, None, :]
             ).reshape(b, nprobe * slot)
    cand = jnp.take(buckets_rows, rowix, axis=0)        # [B, p*slot, D]
    if cand.dtype == jnp.int8:
        cand = cand.astype(q.dtype if q.dtype != jnp.int8 else jnp.bfloat16)
    scores = jnp.einsum(
        "bd,bnd->bn", q, cand,
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[precision],
    )
    if bucket_scales.shape[1]:
        sc = jnp.take(bucket_scales, probe, axis=0).reshape(b, nprobe * slot)
        scores = scores * sc
    return scores


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "slot", "precision"))
def _ivf_search(
    q, centroids, buckets_rows, bucket_ids, bucket_scales,
    k: int, nprobe: int, slot: int, precision: str,
):
    """Device IVF search.

    q [B, D] (compute dtype), centroids [nb, D] fp32,
    buckets_rows [nb*slot, D] ROW-layout store (store dtype; bucket j =
    rows j*slot:(j+1)*slot), bucket_ids [nb, slot] int32 (-1 padding),
    bucket_scales [nb, slot] fp32 or [nb, 0] when unused.
    Returns (scores [B, k] fp32 desc, external ids [B, k] int32, -1 pad).
    """
    b, d = q.shape
    # 1) coarse scores + probe selection (fp32 accumulate on the MXU;
    #    the shared scoring helper from the exact-search stack)
    cs = _block_scores(q.astype(jnp.float32), centroids)   # [B, nb]
    _, probe = jax.lax.top_k(cs, nprobe)                    # [B, nprobe]
    # 2+3) stream the probed buckets and score them — cost scales with
    #    rows probed (B*nprobe*slot), NOT with corpus size
    cand_ids = jnp.take(bucket_ids, probe, axis=0).reshape(b, nprobe * slot)
    scores = _probe_and_score(q, buckets_rows, bucket_scales, probe,
                              slot, precision)          # [B, p*slot]
    scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
    k_eff = min(k, nprobe * slot)
    # chunked payload-sort selection: the [B, nprobe*slot] candidate row
    # is wide (65k at full-corpus probe configs) and one lax.top_k over it
    # measured 34 ms at [8, 65536] — the whole batch-1 IVF budget; the
    # chunked sort is exact, tie-stable, and ~10x cheaper there
    v, ids = topk_with_payload_chunked(scores, cand_ids, k_eff)
    if k_eff < k:
        v = jnp.concatenate(
            [v, jnp.full((b, k - k_eff), NEG_INF, v.dtype)], axis=-1)
        ids = jnp.concatenate(
            [ids, jnp.full((b, k - k_eff), -1, ids.dtype)], axis=-1)
    ids = jnp.where(jnp.isfinite(v), ids, -1)
    return v, ids


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "slot"))
def _ivf_pq_search(
    q, q_lut, centroids, buckets_flat, bucket_ids, codebooks,
    k: int, nprobe: int, slot: int,
):
    """Device IVFPQ search (FAISS ``IndexIVFPQ`` semantics, MXU form).

    q [B, D] fp32, centroids [nb, D] fp32, buckets_flat [nb, slot*mb]
    uint8 RESIDUAL codes (mb = m for 8-bit, m/2 for nibble-packed 4-bit
    — the row width vs ``m`` tells the two apart, statically under jit),
    codebooks [m, n_codes, D/m] fp32. Score of a row in bucket j is
    ``q . centroid_j`` (already computed by the coarse matmul — gathered
    back for free) plus the LUT decomposition of ``q . residual`` —
    exactly ``q . (centroid + decode(code))`` in fp32.

    ``q_lut`` feeds the LUT build: == ``q`` for plain PQ, the
    OPQ-rotated query for rotated codebooks (``q . x == (q R) . (x R)``
    — the rotation moves entirely into the query side at search time).
    """
    b, d = q.shape
    m = codebooks.shape[0]
    row_bytes = buckets_flat.shape[1] // slot
    q = q.astype(jnp.float32)
    cs = _block_scores(q, centroids)                       # [B, nb]
    base, probe = jax.lax.top_k(cs, nprobe)                # [B, p] x2
    cand = jnp.take(buckets_flat, probe, axis=0)           # [B, p, slot*mb]
    cand = cand.reshape(b, nprobe * slot, row_bytes)
    if row_bytes == m:
        cand_codes = cand.astype(jnp.int32)
    else:                                   # 4-bit: two codes per byte
        cand_codes = unpack_codes4(cand, xp=jnp)
    cand_ids = jnp.take(bucket_ids, probe, axis=0).reshape(b, nprobe * slot)
    lut = pq_lut(q_lut.astype(jnp.float32), codebooks)     # [B, m, n_codes]
    scores = pq_scores_from_codes(cand_codes, lut)         # [B, p*slot]
    # residual base: rows of bucket j all share coarse score base[:, j]
    scores = scores + jnp.repeat(base, slot, axis=1)
    scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
    k_eff = min(k, nprobe * slot)
    v, ids = topk_with_payload_chunked(scores, cand_ids, k_eff)
    if k_eff < k:
        v = jnp.concatenate(
            [v, jnp.full((b, k - k_eff), NEG_INF, v.dtype)], axis=-1)
        ids = jnp.concatenate(
            [ids, jnp.full((b, k - k_eff), -1, ids.dtype)], axis=-1)
    ids = jnp.where(jnp.isfinite(v), ids, -1)
    return v, ids


# ---------------------------------------------------------------------------
# Mesh-sharded IVF search (FAISS multi-GPU shard+merge equivalence for the
# approximate tiers: the reference shards ANY index type via
# ``co.shard=True``, ``retriever/retrieval_utils.py:164-182``).
#
# Layout: buckets / bucket_ids / bucket_scales are row-sharded over the
# mesh's corpus axis; CENTROIDS ARE REPLICATED (nlist x D fp32 is ~26 MB at
# 8.8M-row scale — two orders below one bucket shard), as are PQ codebooks.
# Every shard therefore computes the IDENTICAL global probe set — exactly
# ``nprobe`` buckets probed GLOBALLY, the same recall accounting as the
# single-device index and as FAISS's replicated coarse quantizer — then
# gathers only the probed buckets it owns (out-of-shard probes are masked,
# not fetched), takes a local top-k, and the [ndev, B, k] candidates
# all-gather over ICI for the final payload-sort merge: the same merge
# machinery as ``sharded_topk`` (search/mips.py). With
# ``nprobe == n_real_buckets`` every row is visited on exactly one shard,
# so the sharded search inherits the exactness invariant (tested on the
# virtual 8-device mesh against the numpy oracle).


def _local_probe_indices(probe, nb_local: int, axis_name: str):
    """Global probe bucket indices -> (clamped local indices, owned mask)
    for this shard. Pure arithmetic: shard s owns the contiguous bucket
    range [s*nb_local, (s+1)*nb_local)."""
    offset = jax.lax.axis_index(axis_name) * nb_local
    local = probe - offset
    valid = (local >= 0) & (local < nb_local)
    return jnp.where(valid, local, 0), valid


def _merge_topk_over_mesh(scores, cand_ids, k: int, axis_name: str):
    """Local masked-score top-k -> ICI all-gather -> global payload-sort
    merge; pads to k with (-inf, -1) when fewer candidates exist."""
    b = scores.shape[0]
    k_eff = min(k, scores.shape[1])
    v, ids = topk_with_payload_chunked(scores, cand_ids, k_eff)
    all_v = jax.lax.all_gather(v, axis_name)        # [ndev, B, k_eff]
    all_i = jax.lax.all_gather(ids, axis_name)
    ndev = all_v.shape[0]
    cand_v = jnp.transpose(all_v, (1, 0, 2)).reshape(b, ndev * k_eff)
    cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(b, ndev * k_eff)
    kk = min(k, ndev * k_eff)
    top_v, top_i = _topk_with_payload(cand_v, cand_i, kk)
    if kk < k:
        top_v = jnp.concatenate(
            [top_v, jnp.full((b, k - kk), NEG_INF, top_v.dtype)], axis=-1)
        top_i = jnp.concatenate(
            [top_i, jnp.full((b, k - kk), -1, top_i.dtype)], axis=-1)
    return top_v, jnp.where(jnp.isfinite(top_v), top_i, -1)


def _ivf_search_sharded(
    q, centroids, buckets_flat, bucket_ids, bucket_scales,
    k: int, nprobe: int, slot: int, precision: str, n_real: int,
    mesh: Mesh, axis_name: str,
):
    """Mesh-sharded flat/int8 IVF search; see the block comment above."""
    from jax import shard_map

    def shard_fn(q, cents, bkts, bids, scs):
        b, d = q.shape
        nb_local = bkts.shape[0] // slot      # bkts: local rows [nbl*slot, D]
        cs = _block_scores(q.astype(jnp.float32), cents[:n_real])
        _, probe = jax.lax.top_k(cs, nprobe)            # [B, p] global
        lidx, valid = _local_probe_indices(probe, nb_local, axis_name)
        cand_ids = jnp.where(
            valid[:, :, None], jnp.take(bids, lidx, axis=0), -1
        ).reshape(b, nprobe * slot)
        scores = _probe_and_score(q, bkts, scs, lidx, slot, precision)
        scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
        return _merge_topk_over_mesh(scores, cand_ids, k, axis_name)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()), check_vma=False)
    return fn(q, centroids, buckets_flat, bucket_ids, bucket_scales)


def _ivf_pq_search_sharded(
    q, q_lut, centroids, buckets_flat, bucket_ids, codebooks,
    k: int, nprobe: int, slot: int, n_real: int,
    mesh: Mesh, axis_name: str,
):
    """Mesh-sharded IVFPQ search: coarse matmul + LUT build replicate
    (both depend only on the query and the replicated small arrays); only
    the code gather + LUT scoring touch the sharded store."""
    from jax import shard_map

    def shard_fn(q, q_lut, cents, bkts, bids, cbs):
        b, d = q.shape
        m = cbs.shape[0]
        nb_local = bkts.shape[0]
        row_bytes = bkts.shape[1] // slot
        q32 = q.astype(jnp.float32)
        cs = _block_scores(q32, cents[:n_real])
        base, probe = jax.lax.top_k(cs, nprobe)         # [B, p] x2
        lidx, valid = _local_probe_indices(probe, nb_local, axis_name)
        cand = jnp.take(bkts, lidx, axis=0).reshape(
            b, nprobe * slot, row_bytes)
        if row_bytes == m:
            cand_codes = cand.astype(jnp.int32)
        else:                           # 4-bit: two codes per byte
            cand_codes = unpack_codes4(cand, xp=jnp)
        cand_ids = jnp.where(
            valid[:, :, None], jnp.take(bids, lidx, axis=0), -1
        ).reshape(b, nprobe * slot)
        lut = pq_lut(q_lut.astype(jnp.float32), cbs)    # [B, m, n_codes]
        scores = pq_scores_from_codes(cand_codes, lut)
        scores = scores + jnp.repeat(base, slot, axis=1)
        scores = jnp.where(cand_ids >= 0, scores, NEG_INF)
        return _merge_topk_over_mesh(scores, cand_ids, k, axis_name)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()), check_vma=False)
    return fn(q, q_lut, centroids, buckets_flat, bucket_ids, codebooks)


def _place_bucket_store(
    mat_flat: np.ndarray, bids: np.ndarray, scs, cents: np.ndarray,
    bcl, store_dtype, slot: int, mesh: Optional[Mesh], axis_name: str,
):
    """Device-place the host bucket store: unsharded (mesh None), or pad
    the bucket count to the mesh size and row-shard buckets/ids/scales
    while replicating centroids. The ONE placement used by build() and
    load(). Returns (buckets, bucket_ids, scales, centroids, bcl, n_real);
    pad buckets carry zero rows, ids -1, scales 1, zero centroids, and
    cluster -1 — and are additionally masked out of probe selection by the
    static ``n_real`` slice (a zero centroid could otherwise win a probe
    slot on all-negative coarse scores)."""
    nb = mat_flat.shape[0]
    int8 = scs is not None
    pq = jnp.dtype(store_dtype) == jnp.uint8

    def _layout(m):
        # Non-PQ stores live device-side in ROW layout [nb*slot, D]: the
        # probe step (Pallas kernel AND the XLA row-gather) streams
        # (slot, D) blocks at HBM bandwidth from it, whereas any in-jit
        # reshape of a [nb, slot*D] store retiles the WHOLE array every
        # call (measured: the retile alone was 20-140 ms per batch at the
        # 8.4M-row config — the entire IVF latency budget; row layout
        # probes the same bytes in 1.6 ms). A host-side numpy reshape
        # here is free. PQ code stores keep [nb, slot*mb] (the code
        # gather is KBs; nothing to win).
        return m if pq else m.reshape(m.shape[0] * slot, -1)

    if mesh is None:
        buckets = jnp.asarray(_layout(mat_flat), dtype=store_dtype)
        return (buckets, jnp.asarray(bids),
                jnp.asarray(scs) if int8 else None,
                jnp.asarray(cents, jnp.float32), bcl, nb)
    ndev = mesh.devices.size
    nb_pad = -(-max(nb, 1) // ndev) * ndev
    if nb_pad != nb:
        pad = nb_pad - nb
        mat_flat = np.concatenate(
            [mat_flat, np.zeros((pad, mat_flat.shape[1]), mat_flat.dtype)])
        bids = np.concatenate([bids, np.full((pad, slot), -1, np.int32)])
        if int8:
            scs = np.concatenate([scs, np.ones((pad, slot), np.float32)])
        cents = np.concatenate(
            [cents, np.zeros((pad, cents.shape[1]), cents.dtype)])
        if bcl is not None:
            bcl = np.concatenate([bcl, np.full((pad,), -1, np.int32)])
    sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    buckets = jax.device_put(_layout(mat_flat), sh)
    if (mat_flat.dtype == np.float32
            and jnp.dtype(store_dtype) != jnp.float32):
        # float stores stage fp32 on host; cast to the HBM dtype on device
        buckets = jax.jit(
            lambda x: x.astype(store_dtype), out_shardings=sh)(buckets)
    scales = jax.device_put(scs, sh) if int8 else None
    return (buckets, jax.device_put(bids, sh), scales,
            jax.device_put(cents.astype(np.float32), rep), bcl, nb)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(buf, idx, rows):
    """In-place (donated) row scatter for live adds — the bucket matrix is
    aliased, no second corpus materializes."""
    return buf.at[idx].set(rows)


@dataclass
class IVFIndex(HostIdCacheMixin):
    """Approximate MIPS index: bucketed corpus + per-bucket centroids."""

    _ids_field = "bucket_ids"

    centroids: jax.Array        # [n_buckets, D] fp32 (clusters spanning
                                # several buckets duplicate their centroid)
    buckets: jax.Array          # [n_buckets, slot*D] store dtype
    bucket_ids: jax.Array       # [n_buckets, slot] int32, -1 = padding
    slot: int
    nprobe: int = 8             # default probes (override per search)
    precision: str = "default"
    bucket_scales: Optional[jax.Array] = None  # [n_buckets, slot] fp32 (int8)
    bucket_cluster: Optional[np.ndarray] = None  # [n_buckets] int32 host map
                                # bucket -> training cluster (add() routing)
    codebooks: Optional[jax.Array] = None  # [pq_m, 2**bits, D/pq_m] fp32:
                                # PQ mode — buckets hold uint8 residual codes
    opq_rotation: Optional[jax.Array] = None  # [D, D] fp32 orthogonal:
                                # codes quantize ROTATED residuals (OPQ)
    mesh: Optional[Mesh] = None  # row-shard buckets over this mesh's
                                # axis_name (FAISS co.shard=True equivalence)
    axis_name: str = CORPUS_AXIS
    n_real_buckets: Optional[int] = None  # non-pad bucket count (sharded
                                # stores pad nb to the mesh size); None =
                                # all buckets are real

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    @property
    def n_buckets(self) -> int:
        return self.centroids.shape[0]

    @property
    def n_real(self) -> int:
        """Buckets that hold (or held) data — excludes mesh-pad buckets."""
        return (self.n_buckets if self.n_real_buckets is None
                else self.n_real_buckets)

    @property
    def is_pq(self) -> bool:
        return self.codebooks is not None

    @property
    def _pq_packed(self) -> bool:
        """4-bit stores hold two codes per byte: row width < pq_m."""
        return (self.is_pq
                and self.buckets.shape[1] // self.slot
                < self.codebooks.shape[0])

    @property
    def _query_dtype(self):
        if self.is_pq:  # LUTs are fp32; codes are not a scoring dtype
            return jnp.float32
        return query_dtype_for(self.buckets.dtype, self.precision)

    # ------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        ids: np.ndarray,
        nlist: int,
        slot: Optional[int] = None,
        nprobe: int = 8,
        dtype=jnp.bfloat16,
        precision: str = "default",
        kmeans_iters: int = 15,
        seed: int = 0,
        centroids: Optional[np.ndarray] = None,
        pq_m: Optional[int] = None,
        pq_bits: int = 4,
        opq: bool = False,
        mesh: Optional[Mesh] = None,
        axis_name: str = CORPUS_AXIS,
    ) -> "IVFIndex":
        """Train (or accept) ``nlist`` centroids, group rows into
        fixed-``slot`` buckets, device-put everything.

        ``slot`` defaults to the mean cluster size rounded up to 128 (the
        minor-dim-friendly granule); clusters larger than ``slot`` span
        multiple buckets. ``dtype`` bf16 (default) / float32 / int8.

        ``pq_m`` switches the store to product-quantized RESIDUAL codes
        (FAISS ``IndexIVFPQ``): ``pq_m`` sub-quantizers of ``2**pq_bits``
        codewords each — ``pq_m * pq_bits / 8`` bytes a row (96x4-bit on
        768-d = 48 B, 32x less HBM than bf16). ``dtype`` is then ignored
        (codes are the store). ``opq`` additionally learns an orthogonal
        pre-rotation (FAISS ``OPQMatrix``) that decorrelates sub-spaces
        before coding — lower distortion, same search cost (the rotation
        rides the query at search time).

        ``mesh`` row-shards the bucket store over ``axis_name`` (FAISS
        multi-GPU ``co.shard=True`` applied to the IVF tiers,
        ``retrieval_utils.py:164-182``); centroids/codebooks replicate.
        See the sharded-search block comment above ``_ivf_search_sharded``."""
        embeddings = np.asarray(embeddings, np.float32)
        n, d = embeddings.shape
        assert ids.shape == (n,)
        _check_ids(ids)
        if centroids is None:
            centroids = kmeans(embeddings, nlist, iters=kmeans_iters,
                               seed=seed)
        else:
            centroids = np.asarray(centroids, np.float32)
            assert centroids.shape == (nlist, d), centroids.shape
        assign = assign_clusters(embeddings, centroids)
        if slot is None:
            mean = max(1, n // max(1, nlist))
            slot = max(128, -(-mean // 128) * 128)

        # quantize first (per-row, order-independent), then group rows by
        # cluster and chunk each cluster into slot-row buckets via the ONE
        # shared chunker (padding convention identical to add()-overflow)
        int8 = jnp.dtype(dtype) == jnp.int8 and pq_m is None
        codebooks = rotation = None
        if pq_m is not None:
            if pq_bits not in (4, 8):
                raise ValueError(f"pq_bits must be 4 or 8 (got {pq_bits})")
            if pq_bits == 4 and pq_m % 2:
                raise ValueError(
                    f"pq_m must be even for 4-bit codes (got {pq_m}): "
                    "they pack two per byte")
            # FAISS IVFPQ semantics: codes quantize the residual to the
            # assigned coarse centroid; search adds q.centroid back from
            # the coarse matmul it already ran
            residuals = embeddings - centroids[assign]
            if opq:
                rotation, codebooks = train_opq(
                    residuals, pq_m, 1 << pq_bits, seed=seed)
                residuals = residuals @ rotation
            else:
                rotation = None
                codebooks = train_pq(residuals, pq_m, 1 << pq_bits,
                                     seed=seed)
            values = encode_pq(residuals, codebooks)
            if pq_bits == 4:  # nibble-pack: m*4/8 bytes a row, for real
                values = pack_codes4(values)
            row_scales = None
        elif int8:
            values, row_scales = quantize_rows(embeddings, xp=np)
        else:
            values, row_scales = embeddings, None
        row_w = values.shape[1]  # D, or pq_m in code space
        order = np.argsort(assign, kind="stable")
        sizes = np.bincount(assign, minlength=nlist)
        # preallocate the bucket store (one host copy, not a list-of-blocks
        # double: at 8.8M x 768 fp32 the transient second copy is 27 GB)
        nb = int(sum(-(-int(s) // slot) for s in sizes if s))
        mat = np.zeros((nb, slot, row_w),
                       np.uint8 if pq_m is not None
                       else (np.int8 if int8 else np.float32))
        bids = np.full((nb, slot), -1, np.int32)
        scs = np.ones((nb, slot), np.float32) if int8 else None
        cents = np.empty((nb, d), np.float32)
        bcl = np.empty((nb,), np.int32)
        bi = 0
        start = 0
        for c in range(nlist):
            rows = order[start : start + sizes[c]]
            start += sizes[c]
            if sizes[c] == 0:
                continue
            for blk, bid, sc in _chunk_into_buckets(
                rows, values, ids, slot, row_scales
            ):
                mat[bi], bids[bi], cents[bi], bcl[bi] = blk, bid, centroids[c], c
                if int8:
                    scs[bi] = sc
                bi += 1
        assert bi == nb, (bi, nb)

        store_dtype = (jnp.uint8 if pq_m is not None
                       else (jnp.int8 if int8 else dtype))
        dev_mat, dev_ids, scales, dev_cents, bcl, n_real = (
            _place_bucket_store(
                mat.reshape(nb, slot * row_w), bids,
                scs if int8 else None, cents, bcl, store_dtype, slot,
                mesh, axis_name))
        rep = (NamedSharding(mesh, P()) if mesh is not None else None)

        def _replicate(x):
            if x is None:
                return None
            x = np.asarray(x, np.float32)
            return (jax.device_put(x, rep) if rep is not None
                    else jnp.asarray(x))

        return cls(
            centroids=dev_cents,
            buckets=dev_mat,
            bucket_ids=dev_ids,
            slot=slot,
            nprobe=nprobe,
            precision=precision,
            bucket_scales=scales,
            bucket_cluster=bcl,
            codebooks=_replicate(codebooks),
            opq_rotation=_replicate(rotation),
            mesh=mesh,
            axis_name=axis_name,
            n_real_buckets=n_real,
        )

    # ------------------------------------------------------------ search

    def warmup_batch_sizes(self, max_batch: int) -> list:
        """One representative b per padded shape ``search()`` can dispatch
        for b <= max_batch (mirrors its pad-to-power-of-two policy; kept
        next to that policy so they cannot drift apart)."""
        sizes, b = [], 8
        while True:
            sizes.append(min(max_batch, b))
            if b >= max_batch:
                return sizes
            b *= 2

    def search(
        self, queries, k: int, nprobe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """queries [B, D] -> (scores [B, k] fp32, external ids [B, k];
        -1 fills ranks beyond the probed rows).

        ``nprobe`` clamps to ``n_real`` (at which point the search is
        EXACT — every data-carrying bucket is visited — on one device or
        sharded over a mesh alike).

        The query batch pads to the next power of two (>= 8) by
        replicating the first row: the dynamic micro-batcher in
        ``cldrd-serve`` produces arbitrary group sizes, and one compiled
        executable per DISTINCT batch size would recompile constantly.
        Power-of-two padding bounds the executable count at ~5 while the
        wasted gather traffic stays < 2x (unlike the flat index's
        pad-to-128, which is free there because the corpus scan does not
        grow with B)."""
        q = jnp.asarray(queries, self._query_dtype)
        b = q.shape[0]
        p = self.nprobe if nprobe is None else int(nprobe)
        if p < 1:
            raise ValueError(f"nprobe must be >= 1 (got {p})")
        p = min(p, self.n_real)
        if p * self.slot < k and p < self.n_real:
            raise ValueError(
                f"nprobe*slot ({p}*{self.slot}) < k ({k}): raise nprobe "
                "or build with a larger slot")
        if b == 0:
            return (np.zeros((0, k), np.float32),
                    np.full((0, k), -1, np.int32))
        b_pad = max(8, 1 << (b - 1).bit_length())
        if b_pad != b:
            q = jnp.concatenate(
                [q, jnp.broadcast_to(q[:1], (b_pad - b, q.shape[1]))])
        if self.is_pq:
            # OPQ moves entirely into the LUT input at search time:
            # q . x == (q R) . (x R); the coarse term keeps plain q
            q_lut = (q if self.opq_rotation is None
                     else q @ self.opq_rotation)
            if self.mesh is not None:
                v, ids = _ivf_pq_search_sharded(
                    q, q_lut, self.centroids, self.buckets,
                    self.bucket_ids, self.codebooks, k, p, self.slot,
                    self.n_real, self.mesh, self.axis_name,
                )
            else:
                v, ids = _ivf_pq_search(
                    q, q_lut, self.centroids, self.buckets,
                    self.bucket_ids, self.codebooks, k, p, self.slot,
                )
        else:
            scales = self.bucket_scales
            if scales is None:
                scales = jnp.zeros((self.n_buckets, 0), jnp.float32)
                if self.mesh is not None:
                    scales = jax.device_put(
                        scales,
                        NamedSharding(self.mesh, P(self.axis_name)))
            if self.mesh is not None:
                v, ids = _ivf_search_sharded(
                    q, self.centroids, self.buckets, self.bucket_ids,
                    scales, k, p, self.slot, self.precision, self.n_real,
                    self.mesh, self.axis_name,
                )
            else:
                v, ids = _ivf_search(
                    q, self.centroids, self.buckets, self.bucket_ids,
                    scales, k, p, self.slot, self.precision,
                )
        return np.asarray(v)[:b], np.asarray(ids)[:b]

    # ------------------------------------------------------- live updates

    def add(self, embeddings: np.ndarray, ids) -> "IVFIndex":
        """Append documents to the resident IVF index (FAISS IVF
        ``add_with_ids`` equivalence: assign to the nearest trained
        centroid, no retraining). Returns a NEW index; the old object is
        CONSUMED (its bucket matrix is donated to an in-place scatter).

        New rows first fill free slots (padding or reclaimed tombstones)
        in their cluster's existing buckets — a device row-scatter, no
        shape change, so the compiled search executable is reused. Only
        cluster overflow appends new buckets (shape change -> the next
        search recompiles)."""
        if self.mesh is not None:
            raise NotImplementedError(
                "add() on a sharded IVF index would redistribute shards; "
                "rebuild with IVFIndex.build(mesh=...)")
        embeddings = np.asarray(embeddings, np.float32)
        n, d = embeddings.shape
        ids = np.asarray(ids)
        assert ids.shape == (n,) and d == self.dim
        _check_ids(ids)
        if self.bucket_cluster is None:
            raise ValueError("this IVFIndex carries no bucket->cluster map "
                             "(pre-add-format store); rebuild to add()")
        # route: nearest bucket centroid == nearest cluster centroid
        # (a multi-bucket cluster duplicates its centroid; ties land on
        # any of its buckets, and we re-route through the cluster map)
        nearest_bucket = assign_clusters(embeddings,
                                         np.asarray(self.centroids))
        clusters = self.bucket_cluster[nearest_bucket]

        cluster_buckets: dict = {}
        for b, c in enumerate(self.bucket_cluster):
            cluster_buckets.setdefault(int(c), []).append(b)
        host_ids = self._host_ids().copy()
        free: dict = {}
        cursor: dict = {}           # cluster -> first bucket with free slots
        placements: dict = {}       # bucket -> [(slot_pos, new_row_idx)]
        overflow: dict = {}         # cluster -> [new_row_idx]
        int8 = self.buckets.dtype == jnp.int8
        if self.is_pq:
            # encode the residual to the ASSIGNED cluster's centroid (any
            # of its duplicated bucket centroids — identical vectors)
            cent_rows = np.asarray(self.centroids)[nearest_bucket]
            resid_new = embeddings - cent_rows
            if self.opq_rotation is not None:
                resid_new = resid_new @ np.asarray(self.opq_rotation)
            codes_new = encode_pq(resid_new, np.asarray(self.codebooks))
            if self._pq_packed:
                codes_new = pack_codes4(codes_new)
            scales_new = None
        elif int8:
            codes_new, scales_new = quantize_rows(embeddings, xp=np)
        else:
            codes_new, scales_new = embeddings, None
        # D for row-layout flat/int8 stores, pq_m bytes for PQ code stores
        row_w = (self.buckets.shape[1] // self.slot if self.is_pq
                 else self.buckets.shape[1])
        for i in range(n):
            c = int(clusters[i])
            blist = cluster_buckets[c]
            # per-cluster cursor: once a bucket's free list empties it is
            # never re-visited in this call (free slots only get consumed),
            # so routing stays O(n + buckets_touched) instead of
            # O(n * buckets_per_cluster) when a hot cluster is full
            j = cursor.get(c, 0)
            while j < len(blist):
                b = blist[j]
                fl = free.setdefault(
                    b, list(np.flatnonzero(host_ids[b] == -1)))
                if fl:
                    s = int(fl.pop(0))
                    placements.setdefault(b, []).append((s, i))
                    host_ids[b, s] = np.int32(ids[i])
                    break
                j += 1
            cursor[c] = j
            if j == len(blist):
                overflow.setdefault(c, []).append(i)

        # Overflow FIRST: the concatenates below are fallible (host slab
        # build + device alloc) but non-destructive — self.buckets is only
        # DONATED in the final scatter, after which nothing can throw, so a
        # failed add() never leaves the caller holding a consumed index.
        buckets, scales = self.buckets, self.bucket_scales
        centroids, bcl = self.centroids, self.bucket_cluster
        if overflow:
            cent_host = np.asarray(self.centroids)
            nbk_rows, nbk_ids, nbk_cents, nbk_cl, nbk_sc = [], [], [], [], []
            for c, idxs in sorted(overflow.items()):
                ccent = cent_host[cluster_buckets[c][0]]
                for blk, bid, sc in _chunk_into_buckets(
                    np.asarray(idxs), codes_new, ids, self.slot, scales_new
                ):
                    nbk_rows.append(blk)
                    nbk_ids.append(bid)
                    nbk_cents.append(ccent)
                    nbk_cl.append(c)
                    nbk_sc.append(sc)
            slab = np.stack(nbk_rows)                 # [n_new, slot, row_w]
            slab = (slab.reshape(len(nbk_rows), self.slot * row_w)
                    if self.is_pq                     # PQ: bucket layout
                    else slab.reshape(len(nbk_rows) * self.slot, row_w))
            buckets = jnp.concatenate(
                [buckets, jnp.asarray(slab, dtype=buckets.dtype)])
            host_ids = np.concatenate([host_ids, np.stack(nbk_ids)])
            centroids = jnp.concatenate(
                [centroids, jnp.asarray(np.stack(nbk_cents))])
            bcl = np.concatenate([bcl, np.asarray(nbk_cl, np.int32)])
            if int8:
                scales = jnp.concatenate(
                    [scales, jnp.asarray(np.stack(nbk_sc))])

        if placements:
            idx = np.asarray(sorted(placements), np.int32)
            dev_idx = jnp.asarray(idx)
            if self.is_pq:
                # PQ bucket layout: block read-modify-write
                cur = np.asarray(jnp.take(buckets, dev_idx, axis=0))
                cur = cur.reshape(len(idx), self.slot, row_w).copy()
                for j, b in enumerate(idx):
                    for s, i in placements[int(b)]:
                        cur[j, s] = codes_new[i]
                buckets = _scatter_rows(
                    buckets, dev_idx,
                    jnp.asarray(cur.reshape(len(idx), self.slot * row_w),
                                dtype=buckets.dtype))
            else:
                # row layout: scatter the new rows DIRECTLY into their
                # bucket*slot+pos positions — no block read-back at all
                flat_pos, flat_val = [], []
                for b in idx:
                    for s, i in placements[int(b)]:
                        flat_pos.append(int(b) * self.slot + s)
                        flat_val.append(codes_new[i])
                buckets = _scatter_rows(
                    buckets, jnp.asarray(np.asarray(flat_pos, np.int32)),
                    jnp.asarray(np.stack(flat_val), dtype=buckets.dtype))
            if int8:
                cur_sc = np.asarray(jnp.take(scales, dev_idx, axis=0)).copy()
                for j, b in enumerate(idx):
                    for s, i in placements[int(b)]:
                        cur_sc[j, s] = scales_new[i]
                scales = _scatter_rows(scales, dev_idx, jnp.asarray(cur_sc))

        return IVFIndex(
            centroids=centroids, buckets=buckets,
            bucket_ids=jnp.asarray(host_ids), slot=self.slot,
            nprobe=self.nprobe, precision=self.precision,
            bucket_scales=scales, bucket_cluster=bcl,
            codebooks=self.codebooks, opq_rotation=self.opq_rotation,
        )

    def remove(self, ids) -> "IVFIndex":
        """Tombstone matching rows (id -> -1); FAISS ``remove_ids``
        equivalence. Capacity within the bucket is reclaimable by add()."""
        if self.mesh is not None:
            raise NotImplementedError(
                "remove() on a sharded IVF index: rebuild instead")
        drop = np.asarray(sorted(set(int(i) for i in ids)), np.int64)
        _check_ids(drop)
        host = self._host_ids()
        new_ids = np.where(np.isin(host, drop.astype(np.int32)), -1, host)
        return IVFIndex(
            centroids=self.centroids, buckets=self.buckets,
            bucket_ids=jnp.asarray(new_ids.astype(np.int32)),
            slot=self.slot, nprobe=self.nprobe, precision=self.precision,
            bucket_scales=self.bucket_scales,
            bucket_cluster=self.bucket_cluster,
            codebooks=self.codebooks, opq_rotation=self.opq_rotation,
        )

    # -------------------------------------------------------- persistence

    def save(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        nr = self.n_real  # mesh-pad buckets never persist: a reload onto a
        # different mesh size (or none) re-pads for ITS topology
        np.save(os.path.join(out_dir, "centroids.npy"),
                np.asarray(self.centroids)[:nr])
        # fetch once, in the dtype being written (a bf16 store otherwise
        # pays a full host copy that is immediately discarded); PQ codes
        # are the store — they persist verbatim as uint8. The DISK format
        # stays [nb, slot*row_w] (format_version 1, unchanged): the
        # device-side row layout is a placement detail of
        # ``_place_bucket_store``, re-derived on load.
        store = (np.asarray(self.buckets)
                 if self.buckets.dtype in (jnp.int8, jnp.uint8)
                 else np.asarray(self.buckets.astype(jnp.float32)))
        if not self.is_pq:          # rows [nb*slot, D] -> disk [nr, slot*D]
            store = store[: nr * self.slot].reshape(nr, -1)
        np.save(os.path.join(out_dir, "buckets.npy"), store[:nr])
        np.save(os.path.join(out_dir, "bucket_ids.npy"),
                self._host_ids()[:nr])
        if self.bucket_scales is not None:
            np.save(os.path.join(out_dir, "bucket_scales.npy"),
                    np.asarray(self.bucket_scales)[:nr])
        if self.bucket_cluster is not None:
            np.save(os.path.join(out_dir, "bucket_cluster.npy"),
                    self.bucket_cluster.astype(np.int32)[:nr])
        if self.is_pq:
            np.save(os.path.join(out_dir, "pq_codebooks.npy"),
                    np.asarray(self.codebooks))
            if self.opq_rotation is not None:
                np.save(os.path.join(out_dir, "opq_rotation.npy"),
                        np.asarray(self.opq_rotation))
        meta = {
            "slot": int(self.slot),
            "nprobe": int(self.nprobe),
            "precision": self.precision,
            "dim": int(self.dim),
            "n_buckets": int(nr),
            "dtype": ("pq" if self.is_pq
                      else "int8" if store.dtype == np.int8
                      else "float32"),
            "format_version": 1,
        }
        if self.is_pq:
            meta["pq_m"] = int(self.codebooks.shape[0])
            meta["pq_codes"] = int(self.codebooks.shape[1])
            meta["pq_packed"] = self._pq_packed
            meta["opq"] = self.opq_rotation is not None
        with open(os.path.join(out_dir, IVF_META_NAME), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, out_dir: str, dtype=None, precision=None,
             mesh: Optional[Mesh] = None,
             axis_name: str = CORPUS_AXIS) -> "IVFIndex":
        with open(os.path.join(out_dir, IVF_META_NAME)) as f:
            meta = json.load(f)
        cents = np.load(os.path.join(out_dir, "centroids.npy"))
        buckets = np.load(os.path.join(out_dir, "buckets.npy"))
        bids = np.load(os.path.join(out_dir, "bucket_ids.npy"))
        scales = None
        codebooks = rotation = None
        # HBM dtype semantics MATCH persistence.load_index: an int8 store
        # keeps its codes only when int8 HBM is explicitly requested;
        # any float request (or the bf16 default) dequantizes codes x
        # per-row scales — the caller asking for float scoring gets it.
        # A PQ store has exactly one on-device representation (uint8 codes
        # scored through fp32 LUTs): ``dtype`` requests are meaningless
        # and rejected rather than silently ignored.
        host_scales = None
        if meta["dtype"] == "pq":
            if dtype is not None:
                raise ValueError(
                    "this IVF store holds PQ codes; the HBM dtype is "
                    "fixed (uint8 codes, fp32 LUT scoring) — drop the "
                    "dtype request or rebuild without --pq-m")
            codebooks = np.load(os.path.join(out_dir, "pq_codebooks.npy"))
            rot_path = os.path.join(out_dir, "opq_rotation.npy")
            if os.path.isfile(rot_path):
                rotation = np.load(rot_path)
            store_dtype = jnp.uint8   # codes, verbatim
        elif meta["dtype"] == "int8":
            sc = np.load(os.path.join(out_dir, "bucket_scales.npy"))
            if jnp.dtype(dtype or jnp.bfloat16) == jnp.int8:
                host_scales = sc
                store_dtype = jnp.int8
            else:
                nb_, slot_ = sc.shape
                buckets = (buckets.reshape(nb_, slot_, meta["dim"])
                           .astype(np.float32) * sc[:, :, None]
                           ).reshape(nb_, slot_ * meta["dim"])
                store_dtype = jnp.dtype(dtype or jnp.bfloat16)
        else:
            if dtype is not None and jnp.dtype(dtype) == jnp.int8:
                raise ValueError(
                    "int8 HBM requested but this IVF store is float "
                    "(a raw cast would destroy the rows); rebuild with "
                    "cldrd-index --store-dtype int8 --ivf-nlist N")
            store_dtype = jnp.dtype(dtype or jnp.bfloat16)
        bcl_path = os.path.join(out_dir, "bucket_cluster.npy")
        bcl = np.load(bcl_path) if os.path.isfile(bcl_path) else None
        dev, dev_ids, scales, dev_cents, bcl, n_real = _place_bucket_store(
            buckets, bids, host_scales, cents, bcl, store_dtype,
            int(meta["slot"]), mesh, axis_name)
        rep = NamedSharding(mesh, P()) if mesh is not None else None

        def _replicate(x):
            if x is None:
                return None
            x = np.asarray(x, np.float32)
            return (jax.device_put(x, rep) if rep is not None
                    else jnp.asarray(x))

        return cls(
            centroids=dev_cents,
            buckets=dev,
            bucket_ids=dev_ids,
            slot=int(meta["slot"]),
            nprobe=int(meta["nprobe"]),
            precision=precision or meta.get("precision", "default"),
            bucket_scales=scales,
            bucket_cluster=bcl,
            codebooks=_replicate(codebooks),
            opq_rotation=_replicate(rotation),
            mesh=mesh,
            axis_name=axis_name,
            n_real_buckets=n_real,
        )


def ivf_exists(out_dir: str) -> bool:
    return os.path.isfile(os.path.join(out_dir, IVF_META_NAME))
