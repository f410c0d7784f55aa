"""Sharded in-HBM exact inner-product index.

The TPU-native replacement for FAISS ``IndexFlatIP + IndexIDMap``
(reference ``retriever/index_text.py:91-97``, ``retrieval_utils.py:116-129``):
the corpus embedding matrix lives in device HBM (bf16 by default, fp32
accumulation at search time), sharded along rows over the mesh's ``corpus``
axis; external ids are a device int32 array aligned row-for-row (-1 marks
padding). Search is the streaming blocked MIPS of ``cldrd_tpu.search.mips``.

Unlike FAISS there is no CPU->GPU "clone" step (the reference's
``convert_index_to_gpu``, ``retrieval_utils.py:155-184``): the index is
*built* sharded in HBM and queried in place.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cldrd_tpu.parallel import CORPUS_AXIS
from cldrd_tpu.search.mips import sharded_topk, topk_binmax_jit, topk_jit


def _pad_rows(n: int, multiple: int) -> int:
    return int(math.ceil(n / multiple) * multiple)


def _check_ids(ids: np.ndarray) -> None:
    """External ids live in an int32 device array with -1 as the padding
    sentinel; anything outside [0, 2^31) would silently truncate/alias
    (np.int32 cast wraps) — reject loudly instead. The reference's FAISS
    IndexIDMap took int64 ids; callers with larger ids must remap."""
    ids = np.asarray(ids)
    if ids.size and (int(ids.min()) < 0 or int(ids.max()) >= 2**31):
        raise ValueError(
            "external ids must be in [0, 2**31): the id map is int32 with "
            f"-1 reserved for padding (got min={ids.min()}, max={ids.max()})"
        )


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_rows(buf, rows, offset):
    """In-place (donated) row write into the corpus buffer."""
    return jax.lax.dynamic_update_slice(buf, rows, (offset, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_scales(buf, scales, offset):
    return jax.lax.dynamic_update_slice(buf, scales, (offset,))


def quantize_rows(c, xp=np):
    """Per-row symmetric int8 quantization: ``s[j] = max|c[j]| / 127``
    (zero rows get scale 1), ``c8[j] = rint(c[j] / s[j])``.

    THE one definition shared by the host build (``xp=numpy``), the
    device-resident builds (``xp=jax.numpy``, inside jit), and the
    quantization study — device-build == host-build equivalence
    (``test_build_index_on_device_int8``) depends on these staying
    byte-identical. Returns ``(codes int8 [N, D], scales fp32 [N])``;
    real scores factorize exactly as ``(q . c8[j]) * s[j]``."""
    s = xp.abs(c).max(axis=1).astype(xp.float32) / xp.float32(127.0)
    s = xp.where(s == 0.0, xp.float32(1.0), s)
    codes = xp.rint(c.astype(xp.float32) / s[:, None]).astype(xp.int8)
    return codes, s


def query_dtype_for(store_dtype, precision: str):
    """THE query-dtype policy, shared by every resident index flavor:
    int8 stores score bf16 queries against bf16-cast int8 codes (codes
    <= 127 are exact in bf16); under a non-default precision the caller
    is paying for exact input precision, so queries stay fp32 — the
    factorized ``(q . c8) * s`` scores are then fp32-exact (codes are
    exact in fp32 too). Float stores score in their own dtype."""
    if store_dtype == jnp.int8:
        return jnp.float32 if precision != "default" else jnp.bfloat16
    return store_dtype


class HostIdCacheMixin:
    """Host-cached external-id map shared by the resident index classes.

    ``_ids_field`` names the device id array (-1 = padding/tombstone).
    The cache matters: /healthz and every add/remove response read
    ``n_vectors`` — a fresh device fetch would stream the whole id array
    (35 MB at 8.8M rows) per call."""

    _ids_field = "row_ids"

    def _host_ids(self) -> np.ndarray:
        ids = getattr(self, "_host_ids_cache", None)
        if ids is None:
            ids = np.asarray(getattr(self, self._ids_field))
            object.__setattr__(self, "_host_ids_cache", ids)
        return ids

    @property
    def n_vectors(self) -> int:
        return int((self._host_ids() >= 0).sum())


@dataclass
class FlatIPIndex(HostIdCacheMixin):
    """Exact MIPS index: embeddings [N_pad, D] + row ids [N_pad] on device."""

    embeddings: jax.Array
    row_ids: jax.Array
    mesh: Optional[Mesh] = None
    axis_name: str = CORPUS_AXIS
    block_rows: int = 8192
    method: str = "binmax"  # 'binmax' (fast exact) | 'stream' (memory-lean exact)
    # score matmul precision: 'default' (MXU-native bf16 inputs, fastest),
    # 'high' (bf16x3, near-fp32), 'highest' (bf16x6 == fp32-exact; with an
    # fp32 HBM corpus this reproduces FAISS fp32 scoring). XLA's DEFAULT
    # rounds even fp32 inputs to bf16 — measured tail cost 3.2% of top-1000
    # ONLY on adversarially near-tied corpora (examples/quantization_study.py)
    precision: str = "default"
    # int8 quantized store (build(dtype=jnp.int8)): embeddings hold per-row
    # int8 codes and row_scales [N_pad] fp32 the per-row scale; real scores
    # factorize exactly as (q . c8) * s inside every search kernel. Halves
    # HBM vs bf16 — the full 8.8M x 768 MS MARCO corpus fits ONE v5e chip
    # (6.8 GB). Search is exact w.r.t. the quantized vectors; the
    # quantization recall cost is measured in examples/quantization_study.py
    row_scales: Optional[jax.Array] = None

    @property
    def dim(self) -> int:
        return self.embeddings.shape[1]

    @property
    def _query_dtype(self):
        return query_dtype_for(self.embeddings.dtype, self.precision)

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        ids: np.ndarray,
        mesh: Optional[Mesh] = None,
        axis_name: str = CORPUS_AXIS,
        dtype=jnp.bfloat16,
        block_rows: int = 8192,
        method: str = "binmax",
        precision: str = "default",
    ) -> "FlatIPIndex":
        """Pad rows to (n_devices * block_rows) multiples and device-put
        sharded (or unsharded when ``mesh`` is None).

        ``dtype=jnp.int8`` quantizes per row on the host: ``s[j] =
        max|c[j]| / 127``, ``c8[j] = round(c[j] / s[j])`` — symmetric,
        zero-point-free, so scores factorize exactly (FAISS-GPU-fp16-clone
        equivalence class: the reference's ``convert_index_to_gpu``
        ``useFloat16`` option, ``retrieval_utils.py:155-184``, traded
        store precision for capacity the same way)."""
        n, d = embeddings.shape
        assert ids.shape == (n,)
        _check_ids(ids)
        if jnp.dtype(dtype) == jnp.int8:
            codes, s = quantize_rows(embeddings, xp=np)
            return cls.build_quantized(codes, s, ids, mesh, axis_name,
                                       block_rows, method, precision)
        ndev = mesh.devices.size if mesh is not None else 1
        n_pad = _pad_rows(max(n, 1), block_rows * ndev)
        row_ids = np.full((n_pad,), -1, np.int32)
        row_ids[:n] = ids.astype(np.int32)
        embs = np.zeros((n_pad, d), np.float32)
        embs[:n] = embeddings

        if mesh is not None:
            sh = NamedSharding(mesh, P(axis_name))
            dev_embs = jax.device_put(embs.astype(np.float32), sh)
            dev_embs = jax.jit(
                lambda x: x.astype(dtype), out_shardings=sh
            )(dev_embs)
            dev_ids = jax.device_put(row_ids, sh)
        else:
            dev_embs = jnp.asarray(embs, dtype=dtype)
            dev_ids = jnp.asarray(row_ids)
        return cls(dev_embs, dev_ids, mesh, axis_name, block_rows, method,
                   precision)

    @classmethod
    def build_quantized(
        cls,
        codes: np.ndarray,
        scales: np.ndarray,
        ids: np.ndarray,
        mesh: Optional[Mesh] = None,
        axis_name: str = CORPUS_AXIS,
        block_rows: int = 8192,
        method: str = "binmax",
        precision: str = "default",
    ) -> "FlatIPIndex":
        """Stand up the int8 index from PRE-QUANTIZED per-row codes +
        scales (e.g. an int8 disk store, ``persistence.py``) — no
        dequantize/requantize round trip; padding rows get scale 1 and
        id -1."""
        n, d = codes.shape
        assert codes.dtype == np.int8 and ids.shape == (n,)
        assert scales.shape == (n,)
        _check_ids(ids)
        ndev = mesh.devices.size if mesh is not None else 1
        n_pad = _pad_rows(max(n, 1), block_rows * ndev)
        embs = np.zeros((n_pad, d), np.int8)
        embs[:n] = codes
        sc = np.ones((n_pad,), np.float32)
        sc[:n] = scales
        row_ids = np.full((n_pad,), -1, np.int32)
        row_ids[:n] = ids.astype(np.int32)
        if mesh is not None:
            sh = NamedSharding(mesh, P(axis_name))
            dev_embs = jax.device_put(embs, sh)
            dev_sc = jax.device_put(sc, sh)
            dev_ids = jax.device_put(row_ids, sh)
        else:
            dev_embs = jnp.asarray(embs)
            dev_sc = jnp.asarray(sc)
            dev_ids = jnp.asarray(row_ids)
        return cls(dev_embs, dev_ids, mesh, axis_name, block_rows, method,
                   precision, dev_sc)

    # ------------------------------------------------------- live updates

    def _free_tail(self) -> int:
        """Rows of contiguous id==-1 padding at the END of the id array —
        spare capacity that add() can fill in place."""
        host = self._host_ids()
        valid = np.flatnonzero(host >= 0)
        used = int(valid[-1]) + 1 if valid.size else 0
        return len(host) - used

    def add(self, embeddings: np.ndarray, ids: np.ndarray) -> "FlatIPIndex":
        """Append documents to a resident index (FAISS ``add_with_ids``
        equivalence, incremental): returns a NEW index. New rows first fill
        the existing padding tail IN PLACE (a device ``dynamic_update_slice``
        — no shape change, so the compiled search executable is reused and
        no second corpus materializes); only when capacity is exhausted
        does a block-aligned slab concatenate on, which changes the corpus
        shape and recompiles the next search. Batch adds accordingly. int8
        stores quantize new rows with the shared quantizer. Unsharded
        indexes only (a sharded add would redistribute every shard)."""
        if self.mesh is not None:
            raise NotImplementedError(
                "add() on a sharded index would redistribute shards; "
                "rebuild with FlatIPIndex.build(mesh=...)")
        n, d = embeddings.shape
        assert ids.shape == (n,) and d == self.dim
        _check_ids(ids)
        int8 = self.embeddings.dtype == jnp.int8
        free = self._free_tail()
        n_total = len(self._host_ids())
        if int8:
            rows, scales_new = quantize_rows(embeddings, xp=np)
        else:
            rows, scales_new = embeddings.astype(np.float32), None
        fill = min(n, free)   # rows that reuse the existing padding tail
        over = n - fill       # rows that need a new block-aligned slab

        # Overflow FIRST (fallible, non-destructive): the slab concatenate
        # copies — self.embeddings is never donated before every fallible
        # device alloc has succeeded, so a failed add() never leaves the
        # caller (e.g. the serving daemon) holding a consumed index.
        embs = self.embeddings
        row_scales = self.row_scales
        host = self._host_ids().copy()
        if over > 0:
            n_pad = _pad_rows(over, self.block_rows)
            new_ids = np.full((n_pad,), -1, np.int32)
            new_ids[:over] = ids[fill:].astype(np.int32)
            slab = np.zeros((n_pad, d), np.int8 if int8 else np.float32)
            slab[:over] = rows[fill:]
            embs = jnp.concatenate(
                [embs, jnp.asarray(slab, dtype=embs.dtype)])
            if int8:
                sc = np.ones((n_pad,), np.float32)
                sc[:over] = scales_new[fill:]
                row_scales = jnp.concatenate([row_scales, jnp.asarray(sc)])
            host = np.concatenate([host, new_ids])

        if fill > 0:
            # in-place fill of the padding tail: the corpus buffer is
            # DONATED to a jitted dynamic_update_slice, so XLA aliases it
            # (no transient second corpus) and, when no slab was appended,
            # the search executable keeps its shape. The OLD index object
            # is consumed on the no-overflow path — do not use it after
            # add() (serve swaps under its device lock).
            offset = n_total - free
            embs = _update_rows(
                embs,
                jnp.asarray(rows[:fill], dtype=self.embeddings.dtype),
                jnp.asarray(offset, jnp.int32))
            host[offset : offset + fill] = ids[:fill].astype(np.int32)
            if int8:
                row_scales = _update_scales(
                    row_scales, jnp.asarray(scales_new[:fill]),
                    jnp.asarray(offset, jnp.int32))
        return FlatIPIndex(
            embeddings=embs, row_ids=jnp.asarray(host), mesh=None,
            axis_name=self.axis_name, block_rows=self.block_rows,
            method=self.method, precision=self.precision,
            row_scales=row_scales,
        )

    def remove(self, ids) -> "FlatIPIndex":
        """Tombstone documents (FAISS ``remove_ids`` equivalence): matching
        rows get id -1 and are masked out of every search. Capacity is not
        reclaimed (rows stay as padding); returns a NEW index sharing the
        embedding array."""
        if self.mesh is not None:
            raise NotImplementedError("remove() on a sharded index: "
                                      "rebuild instead")
        drop_list = sorted(set(int(i) for i in ids))
        _check_ids(np.asarray(drop_list, np.int64))
        drop = np.asarray(drop_list, np.int32)
        host = self._host_ids()
        new_ids = np.where(np.isin(host, drop), -1, host).astype(np.int32)
        return FlatIPIndex(
            embeddings=self.embeddings,
            row_ids=jnp.asarray(new_ids),
            mesh=None,
            axis_name=self.axis_name,
            block_rows=self.block_rows,
            method=self.method,
            precision=self.precision,
            row_scales=self.row_scales,
        )

    def save(self, out_dir: str, rows_per_shard: int = 500_000) -> None:
        """Persist the resident index (padding rows dropped): fp32 store
        for float stores, int8 codes + scales for quantized ones —
        ``load_index`` round-trips either."""
        from .persistence import write_embeddings

        host_ids = self._host_ids()
        valid = host_ids >= 0
        ids = host_ids[valid].astype(np.int64)
        if self.embeddings.dtype == jnp.int8:
            # codes + scales persist DIRECTLY (write_quantized): no fp32
            # dequantized temporary, and the on-disk codes are bit-for-bit
            # the resident ones by construction
            from .persistence import write_quantized

            codes = np.asarray(self.embeddings)[valid]
            scales = np.asarray(self.row_scales)[valid]
            write_quantized(out_dir, codes, scales, ids,
                            rows_per_shard=rows_per_shard)
        else:
            embs = np.asarray(
                self.embeddings.astype(jnp.float32))[valid]
            write_embeddings(out_dir, embs, ids,
                             rows_per_shard=rows_per_shard)

    # ------------------------------------------------- FAISS read surface

    def _id_to_row(self, ids: np.ndarray) -> np.ndarray:
        """External ids -> corpus row positions via a cached sorted-id map
        (binary search; a python dict at 8.8M ids would cost ~600 MB).
        Raises KeyError on unknown or removed ids."""
        maps = getattr(self, "_id_row_map_cache", None)
        if maps is None:
            host = self._host_ids()
            rows = np.flatnonzero(host >= 0).astype(np.int64)
            order = np.argsort(host[rows], kind="stable")
            maps = (host[rows][order], rows[order])  # (sorted ids, rows)
            object.__setattr__(self, "_id_row_map_cache", maps)
        sorted_ids, sorted_rows = maps
        pos = np.searchsorted(sorted_ids, ids)
        bad = (pos >= len(sorted_ids)) | (sorted_ids[np.minimum(
            pos, len(sorted_ids) - 1)] != ids)
        if bad.any():
            raise KeyError(
                f"ids not in index: {np.asarray(ids)[bad][:10].tolist()}")
        return sorted_rows[pos]

    def reconstruct(self, ids) -> np.ndarray:
        """Return the STORED vectors for external ``ids`` as fp32
        [len(ids), D] (FAISS ``reconstruct``/``reconstruct_n``/
        ``reconstruct_batch`` equivalence; a scalar id returns [D]).

        int8 stores dequantize ``codes * scale`` — i.e. exactly the vectors
        search scores against, not the pre-quantization originals. Raises
        ``KeyError`` for unknown or removed ids."""
        scalar = np.ndim(ids) == 0
        idv = np.atleast_1d(np.asarray(ids, np.int64))
        rows = self._id_to_row(idv)
        out = np.asarray(
            jnp.take(self.embeddings, jnp.asarray(rows), axis=0)
        ).astype(np.float32)
        if self.embeddings.dtype == jnp.int8:
            out *= np.asarray(self.row_scales)[rows][:, None]
        return out[0] if scalar else out

    def range_search(
        self, queries, radius: float, k_start: int = 1024,
        max_passes: Optional[int] = 8,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All hits with inner product STRICTLY above ``radius`` (FAISS
        ``range_search`` IP semantics), exact, returned in FAISS's CSR
        convention: ``(lims [B+1], scores, ids)`` with query q's hits at
        ``[lims[q]:lims[q+1]]``, sorted by score descending (FAISS leaves
        them unsorted; sorted is strictly more useful).

        TPU-native shape discipline: a data-dependent result size cannot
        come out of one jit program, so this runs exact top-k at doubling
        depths (``k_start``, 2*k_start, ... — each depth is one compiled
        executable, reused across calls) until every query's k-th score has
        fallen to ``radius`` or the corpus is exhausted, then filters
        host-side. Queries whose hit count is <= ``k_start`` (the common
        case for a sane radius) pay exactly one search.

        ``max_passes`` bounds the worst case: a radius below the corpus
        minimum would otherwise pay log2(N/k_start) full searches — a ~10x
        latency surprise in a service. After ``max_passes`` doublings
        (default 8 => depth 256*k_start) the search RAISES rather than
        silently truncating, naming the offending radius; pass
        ``max_passes=None`` for the unbounded FAISS-exhaustive behavior."""
        q = np.asarray(queries)
        n_rows = len(self._host_ids())  # padded size; -inf beyond corpus
        k = min(max(int(k_start), 1), n_rows)
        passes = 0
        while True:
            scores, ids = self.search(q, k)
            passes += 1
            valid = ids >= 0
            # deeper hits are possible only if some query's k-th kept slot
            # is a real row still scoring above radius
            if k >= n_rows or not np.any(valid[:, -1] &
                                         (scores[:, -1] > radius)):
                break
            if max_passes is not None and passes >= max_passes:
                raise RuntimeError(
                    f"range_search(radius={radius!r}) still unsaturated "
                    f"after {passes} passes (depth {k} of {n_rows} rows): "
                    f"the radius matches a large fraction of the corpus. "
                    f"Raise k_start, raise max_passes, or pass "
                    f"max_passes=None to search exhaustively.")
            k = min(k * 2, n_rows)
        keep = valid & (scores > radius)
        counts = keep.sum(axis=1)
        lims = np.zeros(len(q) + 1, np.int64)
        np.cumsum(counts, out=lims[1:])
        # rows are already score-descending from search(); boolean-compress
        return (lims,
                scores[keep].astype(np.float32),
                ids[keep].astype(np.int64))

    def warmup_batch_sizes(self, max_batch: int) -> list:
        """Batch sizes that, searched once each, compile every executable
        ``search()`` can dispatch for b <= max_batch. Lives HERE because it
        mirrors search()'s padding policy (pad b up to a multiple of 128):
        one representative b per padded shape."""
        sizes, m = [], 128
        while True:
            sizes.append(min(max_batch, m))
            if m >= max_batch:
                return sizes
            m += 128

    def search(self, queries, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """queries [B, D] (host or device) -> (scores [B, k], ids [B, k]).

        Exact top-k; ids are the external int ids; -1 fills ranks beyond the
        corpus size.

        The binmax path searches in POSITIONS mode — the device returns row
        positions and the external-id lookup is a host-side ``np.take``
        (a device gather of [B, k] ids costs ~3.7 ms at B=512/k=1000; the
        host map is overlappable numpy — measured 4.9 ms on this 1-core
        host, bench.py's ``api_resolve_ms``).

        Query batches are padded up to a multiple of 128 so the fused
        extraction kernel's batch-on-lanes eligibility always holds (an
        89-query batch would otherwise silently take the ~2x-slower
        portable path). Pad rows REPLICATE the first real query rather
        than zero-fill: an all-zero query scores 0.0 on every row, so the
        strict ``rem < vk`` exactness certificate could never pass and
        ragged batches would always look like certificate misses.

        Certificate misses recover PER QUERY: the binmax path runs in
        ``on_miss='flag'`` mode (no in-graph whole-batch fallback), and
        the rare queries whose certificate failed re-run through the
        exact streaming scan in small host-dispatched batches — one
        adversarial query costs one 128-query re-scan, not a 512-query
        slow path (measured cliff: examples/bench_cliff.py)."""
        q = jnp.asarray(queries, self._query_dtype)
        b = q.shape[0]
        b_pad = -(-b // 128) * 128
        if b_pad != b:
            q = jnp.concatenate(
                [q, jnp.broadcast_to(q[:1], (b_pad - b, q.shape[1]))]
            )
        s, i = self._recover_resolve(q, k, b, *self._search_device(q, k))
        return s[:b], i[:b]

    def _device_pos_ids(self) -> jax.Array:
        """Device array of position-substituted ids (-1 keeps padding),
        cached — lets every search path run in positions mode (no device
        id-gather anywhere; external ids resolve host-side)."""
        pos = getattr(self, "_device_pos_ids_cache", None)
        if pos is None:
            pos = jnp.where(
                self.row_ids >= 0,
                jnp.arange(self.row_ids.shape[0], dtype=jnp.int32), -1,
            )
            object.__setattr__(self, "_device_pos_ids_cache", pos)
        return pos

    def _search_device(self, q: jax.Array, k: int):
        """Dispatch one device search; returns device arrays (scores,
        positions, is_positions=True, ok_or_None) WITHOUT forcing a host
        fetch. Every path searches in POSITIONS mode: the ~3.7 ms
        [B=512, k=1000] device id-gather is replaced by an
        overlappable host np.take (measured 4.9 ms on this 1-core host,
        bench.py's ``api_resolve_ms``). The single-device binmax path also
        returns the per-query exactness certificate (``ok``) so misses
        recover per query instead of per batch."""
        if self.mesh is not None:
            if self.method == "binmax":
                s, i, ok = sharded_topk(
                    q, self.embeddings, self.row_ids, k, self.mesh,
                    self.axis_name, self.block_rows, method=self.method,
                    precision=self.precision, return_positions=True,
                    on_miss="flag", row_scales=self.row_scales,
                )
            else:
                s, i = sharded_topk(
                    q, self.embeddings, self.row_ids, k, self.mesh,
                    self.axis_name, self.block_rows, method=self.method,
                    precision=self.precision, return_positions=True,
                    row_scales=self.row_scales,
                )
                ok = None
        elif self.method == "binmax":
            s, i, ok = topk_binmax_jit(q, self.embeddings, self.row_ids, k,
                                       precision=self.precision,
                                       return_positions=True, on_miss="flag",
                                       row_scales=self.row_scales)
        else:
            s, i = topk_jit(q, self.embeddings, self._device_pos_ids(), k,
                            self.block_rows, self.precision,
                            row_scales=self.row_scales)
            ok = None
        return s, i, True, ok

    # fixed re-scan batch: one compile, small enough that a single
    # adversarial query costs ~a quarter of a fast-path batch
    _RESCAN_BATCH = 128

    def _rescan_exact(self, q: np.ndarray, k: int):
        """Exact streaming re-scan (positions mode) for queries whose
        binmax certificate failed; fixed-batch jit, replicated padding.
        Sharded indexes re-scan with the corpus-sharded streaming path."""
        fb = self._RESCAN_BATCH
        out_s, out_p = [], []
        for s0 in range(0, len(q), fb):
            chunk = q[s0 : s0 + fb]
            n = len(chunk)
            if n < fb:
                chunk = np.concatenate(
                    [chunk, np.broadcast_to(chunk[:1], (fb - n, q.shape[1]))]
                )
            qd = jnp.asarray(chunk, self._query_dtype)
            if self.mesh is not None:
                v, p = sharded_topk(
                    qd, self.embeddings, self.row_ids, k, self.mesh,
                    self.axis_name, self.block_rows, method="stream",
                    precision=self.precision, return_positions=True,
                    row_scales=self.row_scales,
                )
            else:
                v, p = topk_jit(
                    qd, self.embeddings, self._device_pos_ids(), k,
                    self.block_rows, self.precision,
                    row_scales=self.row_scales,
                )
            out_s.append(np.asarray(v)[:n])
            out_p.append(np.asarray(p)[:n])
        return np.concatenate(out_s), np.concatenate(out_p)

    def _recover_resolve(
        self, q: jax.Array, k: int, n_valid: int, s, i, positions, ok
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch device results, re-run certificate-miss queries exactly
        (first ``n_valid`` rows only — pad rows are sliced off anyway),
        and map positions to external ids host-side."""
        s, i = np.asarray(s), np.asarray(i)
        if ok is not None:
            bad = np.nonzero(~np.asarray(ok)[:n_valid])[0]
            if bad.size:
                rs, rp = self._rescan_exact(np.asarray(q)[bad], k)
                s = s.copy(); i = i.copy()
                s[bad] = rs
                i[bad] = rp
        if positions:
            ids = self._host_ids()
            i = np.where(i >= 0, ids[np.maximum(i, 0)], -1)
        return s, i

    def search_batched(
        self, queries: np.ndarray, k: int, batch_size: int = 128,
        max_in_flight: int = 4,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-shape batched search over many queries (reference
        ``index_retrieve`` batching, ``retrieval_utils.py:131-153``). The
        final ragged batch is padded to ``batch_size`` to avoid a recompile.

        Batches are PIPELINED: up to ``max_in_flight`` device searches stay
        dispatched (JAX async dispatch) while earlier results are fetched
        and host-mapped to ids, so host work and transfers overlap device
        compute instead of serializing with it."""
        nq, d = queries.shape
        batch_size = -(-batch_size // 128) * 128  # fused-kernel eligibility
        out_s = np.empty((nq, k), np.float32)
        out_i = np.empty((nq, k), np.int64)
        pending: list = []  # (start, n, q_dev, s_dev, i_dev, positions, ok)

        def drain_one():
            start, n, q_dev, s_dev, i_dev, positions, ok = pending.pop(0)
            s, i = self._recover_resolve(q_dev, k, n, s_dev, i_dev,
                                         positions, ok)
            out_s[start : start + n] = s[:n]
            out_i[start : start + n] = i[:n]

        for start in range(0, nq, batch_size):
            chunk = queries[start : start + batch_size]
            n = chunk.shape[0]
            if n < batch_size:
                # replicate a real query into the pad rows (see search())
                chunk = np.concatenate(
                    [chunk, np.broadcast_to(chunk[:1], (batch_size - n, d))]
                )
            q = jnp.asarray(chunk, self._query_dtype)
            pending.append((start, n, q) + self._search_device(q, k))
            if len(pending) >= max_in_flight:
                drain_one()
        while pending:
            drain_one()
        return out_s, out_i
