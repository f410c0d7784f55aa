"""Product quantization: the TPU-native ``IndexIVFPQ`` storage layer.

FAISS's remaining index family we cover (Flat -> ``FlatIPIndex``, IVFFlat
-> ``IVFIndex``, SQ8 -> the shared int8 store): PQ splits each vector into
``m`` subvectors and stores one codebook index per subvector —
``m * bits / 8`` bytes a row instead of ``2 * D`` (bf16). At the MS MARCO
shape (768-d) a 96x4-bit code is 48 B/row: the full 8.8M corpus in
~0.42 GB of HBM, a 32x capacity multiplier over bf16.

TPU-first scoring (no SIMD LUT tables, no scalar loops):

- FAISS CPU scans PQ codes with in-register SIMD lookup tables
  (``IndexIVFPQFastScan``: 4-bit codes so 16 LUT entries fit a SIMD
  shuffle). The MXU equivalent of a LUT shuffle is a ONE-HOT MATMUL:
  ``scores = one_hot(codes) @ lut`` — the same reason the k-means update
  is a one-hot matmul (scatter/gather is what the TPU is bad at, matmul
  is what it is great at). 4-bit codes are the sweet spot here too: the
  one-hot axis is 16 wide, so the contraction is dense and tiny.
- Codes quantize RESIDUALS (x - coarse centroid), FAISS IVFPQ semantics:
  the coarse matmul already computes ``q . centroid`` for every probed
  bucket, so the search adds it back for free and the codebooks only
  carry within-cell structure (much lower distortion than raw-vector PQ).
- Training reuses the same jitted Lloyd's as the coarse quantizer — one
  independent k-means per subspace over the residuals.

Everything here is exact *with respect to the stored codes*: search
scores equal ``q . (centroid + decode(codes))`` (tested); the only
approximation is the encoding itself, a measured recall/memory dial.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import kmeans


def train_pq(
    x: np.ndarray,
    m: int,
    n_codes: int = 16,
    iters: int = 15,
    seed: int = 0,
) -> np.ndarray:
    """Train ``m`` independent sub-quantizers -> codebooks [m, n_codes,
    D/m] fp32 (one Lloyd's per subspace, each on the MXU via ``kmeans``).

    ``n_codes`` is 2**bits: 16 for 4-bit codes (the TPU-native fast-scan
    shape), 256 for classic 8-bit PQ."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} is not divisible by pq_m={m}")
    if n < n_codes:
        raise ValueError(f"need >= n_codes ({n_codes}) training rows, got {n}")
    dsub = d // m
    out = np.empty((m, n_codes, dsub), np.float32)
    for j in range(m):
        out[j] = kmeans(
            x[:, j * dsub : (j + 1) * dsub], n_codes, iters=iters,
            seed=seed * 131 + j,
        )
    return out


@functools.partial(jax.jit, static_argnames=("block",))
def _encode_block_scan(x, codebooks, block: int):
    """Blocked nearest-codeword assignment: x [N_pad, D] fp32 ->
    codes [N_pad, m] int32. One einsum per block over all subspaces at
    once (the L2 -> dot identity per subspace, like the coarse k-means)."""
    n_pad, d = x.shape
    m, kq, dsub = codebooks.shape
    half_c2 = 0.5 * jnp.sum(codebooks * codebooks, axis=2)  # [m, kq]
    xb = x.reshape(n_pad // block, block, m, dsub)

    def body(_, rows):  # rows [block, m, dsub]
        s = jnp.einsum(
            "bmd,mkd->bmk", rows, codebooks,
            preferred_element_type=jnp.float32,
        ) - half_c2[None]
        return None, jnp.argmax(s, axis=2).astype(jnp.int32)

    _, codes = jax.lax.scan(body, None, xb)
    return codes.reshape(n_pad, m)


def encode_pq(
    x: np.ndarray, codebooks: np.ndarray, block: int = 16384,
    chunk_rows: int = 1_048_576,
) -> np.ndarray:
    """Nearest-codeword codes for every row -> uint8 [N, m].

    Rows stream in fixed-shape chunks like ``assign_clusters`` (the full
    corpus cannot sit on device in fp32 next to its own bucket store)."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    m, kq, dsub = codebooks.shape
    if d != m * dsub:
        raise ValueError(f"dim {d} != pq_m*dsub ({m}*{dsub})")
    assert kq <= 256, "codes are stored as uint8"
    if n == 0:
        return np.empty((0, m), np.uint8)
    if n > chunk_rows:
        out = np.empty((n, m), np.uint8)
        for s0 in range(0, n, chunk_rows):
            e0 = min(s0 + chunk_rows, n)
            out[s0:e0] = encode_pq(x[s0:e0], codebooks, block, chunk_rows)
        return out
    block = min(block, n)
    n_pad = -(-n // block) * block
    if n_pad != n:
        x = np.concatenate([x, np.zeros((n_pad - n, d), np.float32)])
    codes = _encode_block_scan(
        jnp.asarray(x), jnp.asarray(codebooks, jnp.float32), block)
    return np.asarray(codes)[:n].astype(np.uint8)


def decode_pq(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Reconstruct vectors from codes -> fp32 [N, D] (host-side: the
    search never decodes — it scores codes directly via the LUT matmul;
    this is the oracle/tooling path)."""
    codes = np.asarray(codes)
    m, kq, dsub = np.asarray(codebooks).shape
    n = codes.shape[0]
    assert codes.shape == (n, m), codes.shape
    return (
        np.asarray(codebooks, np.float32)[np.arange(m)[None, :], codes]
        .reshape(n, m * dsub)
    )


def train_opq(
    x: np.ndarray,
    m: int,
    n_codes: int = 16,
    iters: int = 8,
    pq_iters: int = 8,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """OPQ (FAISS ``OPQMatrix``; Ge et al., CVPR'13): learn an ORTHOGONAL
    rotation R that decorrelates the sub-spaces before PQ, by alternating

    1. codebook refresh on the rotated data ``y = x @ R``
    2. the orthogonal-Procrustes solve ``R = U V^T`` of
       ``svd(x^T decode(encode(y)))`` — the rotation that best aligns the
       data with its own current reconstruction.

    Returns ``(R [D, D] fp32, codebooks [m, n_codes, D/m] fp32)`` trained
    as a pair (the codebooks are refreshed once more after the final R).
    Inner products survive the rotation exactly: ``q . x =
    (q @ R) . (x @ R)``, so search only rotates the query's LUT input.
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    # random orthogonal init (QR of a gaussian): starting from identity
    # can stall in the axis-aligned local optimum plain PQ already found
    q0, _ = np.linalg.qr(rng.standard_normal((d, d)))
    rot = q0.astype(np.float32)
    for it in range(iters):
        y = x @ rot
        cb = train_pq(y, m, n_codes, iters=pq_iters, seed=seed * 7 + it)
        rec = decode_pq(encode_pq(y, cb), cb)
        u, _, vt = np.linalg.svd(x.T @ rec, full_matrices=False)
        rot = (u @ vt).astype(np.float32)
    cb = train_pq(x @ rot, m, n_codes, iters=pq_iters,
                  seed=seed * 7 + iters)
    return rot, cb


def pack_codes4(codes, xp=np):
    """Pack 4-bit codes two-per-byte: [N, m] (values < 16) -> [N, m//2]
    with byte j = codes[2j] | codes[2j+1] << 4. Halves the HBM store AND
    the probe-gather traffic; the device unpack is two VPU ops."""
    n, m = codes.shape
    if m % 2:
        raise ValueError(f"4-bit packing needs even pq_m (got {m})")
    if xp is np:
        codes = np.asarray(codes)
        assert codes.max(initial=0) < 16, "pack_codes4 is for 4-bit codes"
    c = codes.astype(xp.uint8).reshape(n, m // 2, 2)
    return (c[:, :, 0] | (c[:, :, 1] << 4)).astype(xp.uint8)


def unpack_codes4(packed, xp=np):
    """Inverse of :func:`pack_codes4`; works on numpy (host tooling) and
    jnp (inside the search jit): [..., m//2] uint8 -> [..., m] int32."""
    lo = (packed & 0xF).astype(xp.int32)
    hi = (packed >> 4).astype(xp.int32)
    return xp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)


def pq_lut(q: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """Per-query score lookup tables: q [B, D] -> [B, m, n_codes] fp32,
    ``lut[b, j, c] = q_subspace_j . codeword_c``. The whole PQ inner
    product decomposes as ``sum_j lut[b, j, codes[n, j]]``."""
    b, d = q.shape
    m, kq, dsub = codebooks.shape
    return jnp.einsum(
        "bmd,mkd->bmk", q.astype(jnp.float32).reshape(b, m, dsub),
        codebooks, preferred_element_type=jnp.float32,
    )


def pq_scores_from_codes(
    codes: jnp.ndarray, lut: jnp.ndarray
) -> jnp.ndarray:
    """codes [B, R, m] int -> scores [B, R] fp32 via the one-hot matmul
    (the MXU form of FAISS fast-scan's SIMD LUT shuffle)."""
    kq = lut.shape[2]
    oh = jax.nn.one_hot(codes, kq, dtype=lut.dtype)  # [B, R, m, kq]
    return jnp.einsum("brmk,bmk->br", oh, lut,
                      preferred_element_type=jnp.float32)
