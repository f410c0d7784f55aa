"""TPU-native k-means for IVF coarse quantization.

FAISS's ``IndexIVFFlat`` trains its coarse quantizer with a C++ Lloyd's
k-means (``faiss::Clustering``) — the capability our IVF index needs the
TPU-native equivalent of (the reference pins the FAISS dependency at
``retriever/retrieval_utils.py:116-129``; it uses the Flat index, but the
same FAISS build ships IVF, and production serving at 8.8M rows wants it).

Design (idiomatic XLA, not a port of faiss::Clustering):

- The hot op in Lloyd's is the assignment scan: ``x @ centroids.T`` over the
  whole training set — a [N, D] x [D, K] matmul, exactly what the MXU wants.
  We fold the L2 -> dot identity ``argmin ||x-c||^2 == argmax (x.c -
  ||c||^2/2)`` so assignment is one matmul + argmax, no [N, K] distance
  materialization beyond one block.
- The centroid update is a second MXU matmul: ``one_hot(assign).T @ x``
  accumulated per block (a segment-sum expressed as matmul — scatter-adds
  are the thing XLA:TPU is bad at, one-hot matmuls are the thing it is
  great at).
- The whole iteration is one jitted ``lax.scan`` over fixed-size row blocks
  (static shapes; ragged tails handled by a weight mask, so padding rows
  contribute nothing).
- Empty clusters re-seed deterministically to a jittered copy of the
  currently-largest cluster's centroid (FAISS splits the largest cluster the
  same way, ``Clustering::split_clusters``).

Everything here is fp32 params / MXU-default matmul precision: k-means is a
statistical procedure, bf16 rounding of the assignment scores does not move
the optimum measurably (and the IVF *search* exactness story never depends
on centroid quality — centroids only steer which buckets are probed).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pad_blocks(x: np.ndarray, block: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad rows up to a multiple of ``block``; returns (x_pad, weight)."""
    n, d = x.shape
    n_pad = -(-n // block) * block
    w = np.zeros((n_pad,), np.float32)
    w[:n] = 1.0
    if n_pad != n:
        x = np.concatenate([x, np.zeros((n_pad - n, d), x.dtype)])
    return x, w


@functools.partial(jax.jit, static_argnames=("block",))
def _lloyd_iter(x, w, centroids, key, block: int):
    """One Lloyd iteration. x [N_pad, D] fp32, w [N_pad] {0,1} weights,
    centroids [K, D] fp32 -> (new_centroids, counts, inertia_proxy).

    inertia_proxy = sum of per-row best (x.c - ||c||^2/2) scores — a
    monotone surrogate of negative within-cluster variance (differs from
    true -inertia by the constant sum ||x||^2/2), used only for
    convergence monitoring."""
    n_pad, d = x.shape
    k = centroids.shape[0]
    half_c2 = 0.5 * jnp.sum(centroids * centroids, axis=1)  # [K]

    xb = x.reshape(n_pad // block, block, d)
    wb = w.reshape(n_pad // block, block)

    def body(carry, blk):
        sums, counts, inertia = carry
        rows, rw = blk
        s = jax.lax.dot_general(
            rows, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) - half_c2[None, :]                                   # [block, K]
        assign = jnp.argmax(s, axis=1)                          # [block]
        oh = jax.nn.one_hot(assign, k, dtype=jnp.float32) * rw[:, None]
        sums = sums + jax.lax.dot_general(
            oh, rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [K, D]
        counts = counts + oh.sum(axis=0)
        inertia = inertia + jnp.sum(jnp.max(s, axis=1) * rw)
        return (sums, counts, inertia), None

    (sums, counts, inertia), _ = jax.lax.scan(
        body,
        (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32),
         jnp.float32(0.0)),
        (xb, wb),
    )
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    # Empty clusters: re-seed to the largest cluster's centroid plus a tiny
    # deterministic jitter so the pair separates next iteration (FAISS
    # split_clusters policy, jit-expressible form).
    biggest = jnp.argmax(counts)
    jitter = 1e-3 * jax.random.normal(key, (k, d), jnp.float32)
    reseed = new_c[biggest][None, :] * (1.0 + jitter) + jitter
    new_c = jnp.where((counts > 0)[:, None], new_c, reseed)
    return new_c, counts, inertia


@functools.partial(jax.jit, static_argnames=("k",))
def _farthest_first(x, k: int, start: int):
    """Greedy farthest-first traversal seeding (jit scan): pick the point
    with the largest distance to the chosen seed set, k times. Covers every
    well-separated mode of the data if the pool contains one of its points
    — much stronger than FAISS's random init for clustered corpora, at
    O(k * n_pool * D) elementwise cost (pool is capped by the caller)."""
    n, d = x.shape
    first = x[start]
    seeds0 = jnp.zeros((k, d), x.dtype).at[0].set(first)
    mind0 = jnp.sum((x - first[None, :]) ** 2, axis=1)

    def body(carry, i):
        seeds, mind = carry
        nxt = x[jnp.argmax(mind)]
        seeds = jax.lax.dynamic_update_slice(seeds, nxt[None, :],
                                             (i, jnp.int32(0)))
        mind = jnp.minimum(mind, jnp.sum((x - nxt[None, :]) ** 2, axis=1))
        return (seeds, mind), None

    (seeds, _), _ = jax.lax.scan(
        body, (seeds0, mind0), jnp.arange(1, k, dtype=jnp.int32))
    return seeds


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_block_scan(x, centroids, block: int):
    """Blocked hard assignment: x [N_pad, D] -> [N_pad] int32 cluster ids."""
    n_pad, d = x.shape
    half_c2 = 0.5 * jnp.sum(centroids * centroids, axis=1)
    xb = x.reshape(n_pad // block, block, d)

    def body(_, rows):
        s = jax.lax.dot_general(
            rows, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) - half_c2[None, :]
        return None, jnp.argmax(s, axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(body, None, xb)
    return out.reshape(n_pad)


def assign_clusters(
    x: np.ndarray, centroids: np.ndarray, block: int = 16384,
    chunk_rows: int = 1_048_576,
) -> np.ndarray:
    """Nearest-centroid (L2) assignment for every row of ``x`` -> int32 [N].

    Rows stream to the device in ``chunk_rows`` slices: a production
    corpus (8.8M x 768 fp32 = 27 GB) cannot live on device whole, and the
    assignment only ever needs one chunk resident (chunks are padded to a
    fixed shape so every slice reuses one compiled executable)."""
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    if n > chunk_rows:
        out = np.empty((n,), np.int32)
        for s0 in range(0, n, chunk_rows):
            m = min(chunk_rows, n - s0)
            chunk = x[s0 : s0 + m]
            if m < chunk_rows:
                # only the final ragged chunk pads (a full chunk already
                # has the fixed executable shape — zero-filling a 3 GB
                # buffer per full chunk would double host traffic)
                pad = np.zeros((chunk_rows, x.shape[1]), np.float32)
                pad[:m] = chunk
                chunk = pad
            out[s0 : s0 + m] = assign_clusters(
                chunk, centroids, block, chunk_rows)[:m]
        return out
    block = min(block, n)
    x_pad, _ = _pad_blocks(x, block)
    out = _assign_block_scan(jnp.asarray(x_pad),
                             jnp.asarray(centroids, jnp.float32), block)
    return np.asarray(out)[:n]


def kmeans(
    x: np.ndarray,
    k: int,
    iters: int = 15,
    seed: int = 0,
    block: int = 16384,
    max_points_per_centroid: Optional[int] = 256,
    tol: float = 1e-5,
) -> np.ndarray:
    """Lloyd's k-means; returns centroids fp32 [k, D].

    ``max_points_per_centroid`` subsamples the training set the way FAISS
    does (``Clustering`` default 256/centroid): assignment of the full
    corpus happens once at IVF build, training doesn't need every row.
    Stops early when the inertia surrogate improves by < ``tol`` relative.
    """
    x = np.asarray(x, np.float32)
    n, d = x.shape
    if k <= 0 or k > n:
        raise ValueError(f"k must be in [1, n_rows]: k={k}, n={n}")
    rng = np.random.default_rng(seed)
    if max_points_per_centroid is not None and n > k * max_points_per_centroid:
        sub = rng.choice(n, size=k * max_points_per_centroid, replace=False)
        x = x[np.sort(sub)]
        n = x.shape[0]
    # init: greedy farthest-first traversal over a capped random pool —
    # unlike FAISS's random init this seeds every separated mode the pool
    # touches, so Lloyd's doesn't depend on the empty-cluster reseed to
    # discover missed blobs
    pool_n = min(n, max(4 * k, 2048))
    pool = (x if pool_n == n
            else x[np.sort(rng.choice(n, size=pool_n, replace=False))])
    centroids = np.asarray(_farthest_first(
        jnp.asarray(pool), k, int(rng.integers(pool_n))))
    centroids = jnp.asarray(centroids, jnp.float32)

    block = min(block, max(256, -(-n // 8) ))
    x_pad, w = _pad_blocks(x, block)
    x_dev, w_dev = jnp.asarray(x_pad), jnp.asarray(w)

    prev = -np.inf
    for it in range(iters):
        key = jax.random.PRNGKey(seed * 1000003 + it)
        centroids, counts, inertia = _lloyd_iter(
            x_dev, w_dev, centroids, key, block)
        cur = float(inertia)
        if np.isfinite(prev) and abs(cur - prev) <= tol * max(abs(prev), 1.0):
            break
        prev = cur
    return np.asarray(centroids)
