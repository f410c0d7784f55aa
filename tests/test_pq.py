"""Product quantization + IVFPQ: codebooks, LUT scoring, search, lifecycle.

PQ is the capacity tier of the index family (FAISS ``IndexIVFPQ``,
``faiss`` shipped by the reference's env but unused by CL-DRD itself —
``/root/reference/retriever/retrieval_utils.py:116-129`` uses Flat). The
TPU-native design scores codes with a one-hot matmul against per-query
LUTs instead of FAISS's SIMD table shuffles; see ``cldrd_tpu/index/pq.py``.

The load-bearing invariant tested throughout: search scores are EXACT
with respect to the stored codes — ``q . (centroid + decode(code))`` —
so the only approximation anywhere is the encoding itself.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cldrd_tpu.index.flat_index import FlatIPIndex
from cldrd_tpu.index.ivf_index import IVFIndex
from cldrd_tpu.index.pq import (
    decode_pq,
    encode_pq,
    pack_codes4,
    pq_lut,
    pq_scores_from_codes,
    train_pq,
    unpack_codes4,
)


def _corpus(n=2048, d=32, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(n, d)).astype(np.float32)
    ids = (rng.permutation(4 * n)[:n] + 3).astype(np.int64)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    return c, ids, q


def _reconstruct(idx: IVFIndex) -> dict:
    """id -> centroid + decode(code), straight from the index's storage:
    the vectors the search contract says it scores against."""
    m = idx.codebooks.shape[0]
    raw = np.asarray(idx.buckets).reshape(idx.n_buckets, idx.slot, -1)
    codes = unpack_codes4(raw) if raw.shape[-1] < m else raw
    cents = np.asarray(idx.centroids)
    host_ids = np.asarray(idx.bucket_ids)
    cb = np.asarray(idx.codebooks)
    # OPQ codes decode into the ROTATED space; rotate back (R orthogonal)
    rot_t = (np.asarray(idx.opq_rotation).T
             if idx.opq_rotation is not None else None)
    out = {}
    for b in range(idx.n_buckets):
        live = np.flatnonzero(host_ids[b] >= 0)
        if not len(live):
            continue
        dec = decode_pq(codes[b, live], cb)
        if rot_t is not None:
            dec = dec @ rot_t
        rec = cents[b][None, :] + dec
        for j, s in enumerate(live):
            out[int(host_ids[b, s])] = rec[j]
    return out


class TestPQCore:
    def test_encode_decode_reduces_distortion(self):
        c, _, _ = _corpus(n=4096)
        cb = train_pq(c, m=8, n_codes=16, iters=10, seed=0)
        assert cb.shape == (8, 16, 4) and cb.dtype == np.float32
        codes = encode_pq(c, cb)
        assert codes.shape == (4096, 8) and codes.dtype == np.uint8
        assert codes.max() < 16
        rec = decode_pq(codes, cb)
        mse = float(((c - rec) ** 2).mean())
        base = float((c ** 2).mean())  # distortion of the zero code-book
        assert mse < 0.7 * base, (mse, base)
        # 8-bit codebooks strictly beat 4-bit on the same data
        cb8 = train_pq(c, m=8, n_codes=256, iters=10, seed=0)
        mse8 = float(((c - decode_pq(encode_pq(c, cb8), cb8)) ** 2).mean())
        assert mse8 < mse

    def test_encode_is_nearest_codeword(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(300, 16)).astype(np.float32)
        cb = train_pq(x, m=4, n_codes=16, iters=8, seed=1)
        codes = encode_pq(x, cb, block=128)
        for j in range(4):
            sub = x[:, j * 4 : (j + 1) * 4]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
            np.testing.assert_array_equal(codes[:, j], d2.argmin(1))

    def test_lut_scoring_equals_decode_oracle(self):
        c, _, q = _corpus(n=512, d=32, nq=8, seed=2)
        cb = train_pq(c, m=8, n_codes=16, iters=5, seed=2)
        codes = encode_pq(c, cb)
        lut = pq_lut(jnp.asarray(q), jnp.asarray(cb))
        assert lut.shape == (8, 8, 16)
        s = np.asarray(pq_scores_from_codes(
            jnp.asarray(codes.astype(np.int32))[None].repeat(8, 0),
            lut))
        want = q @ decode_pq(codes, cb).T
        np.testing.assert_allclose(s, want, rtol=1e-5, atol=1e-5)

    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(13)
        codes = rng.integers(0, 16, size=(37, 8)).astype(np.uint8)
        packed = pack_codes4(codes)
        assert packed.shape == (37, 4) and packed.dtype == np.uint8
        np.testing.assert_array_equal(unpack_codes4(packed), codes)
        # jnp path (the in-jit unpack) agrees with the host path
        np.testing.assert_array_equal(
            np.asarray(unpack_codes4(jnp.asarray(packed), xp=jnp)), codes)
        with pytest.raises(ValueError):
            pack_codes4(codes[:, :7])  # odd m cannot pack

    def test_validation(self):
        with pytest.raises(ValueError):
            train_pq(np.zeros((64, 30), np.float32), m=8)  # 30 % 8 != 0
        with pytest.raises(ValueError):
            train_pq(np.zeros((8, 32), np.float32), m=8, n_codes=16)
        cb = train_pq(np.random.default_rng(0)
                      .normal(size=(64, 32)).astype(np.float32), m=8)
        with pytest.raises(ValueError):
            encode_pq(np.zeros((4, 16), np.float32), cb)  # dim mismatch
        assert encode_pq(np.zeros((0, 32), np.float32), cb).shape == (0, 8)


class TestIVFPQ:
    def test_search_scores_are_exact_on_stored_codes(self):
        """The defining invariant: every returned score equals
        q . (centroid + decode(code)) for the row it names."""
        c, ids, q = _corpus(seed=3)
        idx = IVFIndex.build(c, ids, nlist=8, slot=512, kmeans_iters=4,
                             seed=3, pq_m=8)
        assert idx.is_pq and idx.buckets.dtype == jnp.uint8
        # 4-bit codes really pack two per byte: m*bits/8 bytes a row
        assert idx._pq_packed
        assert idx.buckets.shape[1] == idx.slot * 4
        rec = _reconstruct(idx)
        v, i = idx.search(q, 10, nprobe=idx.n_buckets)
        for r in range(len(q)):
            for rank in range(10):
                want = float(q[r] @ rec[int(i[r, rank])])
                assert abs(v[r, rank] - want) <= 1e-3 + 1e-3 * abs(want)

    def test_full_probe_matches_reconstruction_oracle(self):
        c, ids, q = _corpus(seed=4)
        idx = IVFIndex.build(c, ids, nlist=8, slot=512, kmeans_iters=4,
                             seed=4, pq_m=8)
        rec = _reconstruct(idx)
        rid = np.asarray(sorted(rec), np.int64)
        mat = np.stack([rec[int(x)] for x in rid])
        oracle = rid[np.argsort(-(q @ mat.T), axis=1)[:, :10]]
        _, got = idx.search(q, 10, nprobe=idx.n_buckets)
        agree = (got == oracle).mean()
        assert agree > 0.95, agree  # ties in reconstructed scores only

    def test_recall_against_exact_on_clustered_data(self):
        rng = np.random.default_rng(6)
        centers = rng.normal(size=(32, 32)).astype(np.float32) * 3.0
        x = (centers[np.repeat(np.arange(32), 128)]
             + rng.normal(size=(4096, 32)).astype(np.float32) * 0.05)
        ids = np.arange(4096).astype(np.int64)
        q = x[rng.choice(4096, 32, replace=False)] + \
            rng.normal(size=(32, 32)).astype(np.float32) * 0.01
        idx = IVFIndex.build(x, ids, nlist=32, slot=256, kmeans_iters=8,
                             seed=6, pq_m=16, pq_bits=8)
        exact = FlatIPIndex.build(x, ids, block_rows=1024)
        ve, ie = exact.search(q, 10)
        _, i = idx.search(q, 10, nprobe=4)
        hit = np.mean([
            len(set(i[r]) & set(ie[r].astype(np.int32))) / 10
            for r in range(len(q))
        ])
        assert hit >= 0.8, hit

    def test_persistence_roundtrip(self, tmp_path):
        c, ids, q = _corpus(seed=7)
        idx = IVFIndex.build(c, ids, nlist=8, slot=256, kmeans_iters=3,
                             seed=7, pq_m=8, nprobe=3)
        out = str(tmp_path / "ivfpq")
        idx.save(out)
        back = IVFIndex.load(out)
        assert back.is_pq and back.buckets.dtype == jnp.uint8
        assert back.codebooks.shape == idx.codebooks.shape
        v0, i0 = idx.search(q, 10, nprobe=4)
        v1, i1 = back.search(q, 10, nprobe=4)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v1, rtol=0, atol=0)
        with pytest.raises(ValueError):
            IVFIndex.load(out, dtype=jnp.bfloat16)  # dtype is fixed in PQ

    def test_add_and_remove_lifecycle(self):
        c, ids, q = _corpus(n=1500, seed=8)
        idx = IVFIndex.build(c, ids, nlist=4, slot=256, kmeans_iters=3,
                             seed=8, pq_m=8)
        rng = np.random.default_rng(9)
        new = rng.normal(size=(900, c.shape[1])).astype(np.float32)
        new_ids = (np.arange(900) + 1_000_000).astype(np.int64)
        idx2 = idx.add(new, new_ids)  # must overflow (4*256 < 2400 rows)
        assert idx2.is_pq and idx2.n_vectors == 2400
        assert idx2.n_buckets > idx.n_buckets
        # scores stay exact-on-stored-codes through the add
        rec = _reconstruct(idx2)
        v, i = idx2.search(q, 10, nprobe=idx2.n_buckets)
        for r in range(len(q)):
            for rank in range(10):
                want = float(q[r] @ rec[int(i[r, rank])])
                assert abs(v[r, rank] - want) <= 1e-3 + 1e-3 * abs(want)
        # added ids are findable: query AT an added row's reconstruction
        probe_q = np.stack([rec[1_000_000], rec[1_000_005]])
        _, hits = idx2.search(probe_q, 3, nprobe=idx2.n_buckets)
        assert 1_000_000 in set(hits[0]) and 1_000_005 in set(hits[1])
        idx3 = idx2.remove(new_ids[:100])
        assert idx3.is_pq and idx3.n_vectors == 2300
        _, got = idx3.search(q, 25, nprobe=idx3.n_buckets)
        assert not (set(got.ravel().tolist())
                    & set(int(x) for x in new_ids[:100]))

    def test_add_fills_tombstones_without_growth(self):
        c, ids, _ = _corpus(n=1024, seed=10)
        idx = IVFIndex.build(c, ids, nlist=4, slot=512, kmeans_iters=3,
                             seed=10, pq_m=8)
        nb0 = idx.n_buckets
        idx = idx.remove(ids[:64])
        rng = np.random.default_rng(11)
        new = c[:64] + rng.normal(size=(64, c.shape[1])).astype(np.float32) * 0.01
        idx2 = idx.add(new, (np.arange(64) + 9_000_000).astype(np.int64))
        assert idx2.n_vectors == 1024 and idx2.n_buckets == nb0

    def test_pq_bits_validation(self):
        c, ids, _ = _corpus(n=256, seed=12)
        with pytest.raises(ValueError):
            IVFIndex.build(c, ids, nlist=2, slot=128, kmeans_iters=2,
                           seed=12, pq_m=8, pq_bits=5)
        with pytest.raises(ValueError):  # odd pq_m cannot nibble-pack
            IVFIndex.build(c, ids, nlist=2, slot=128, kmeans_iters=2,
                           seed=12, pq_m=1, pq_bits=4)

    def test_opq_reduces_distortion_on_correlated_data(self):
        """OPQ's raison d'etre: when coordinates are correlated (here: a
        random linear mix of independent factors), the learned rotation
        must beat axis-aligned PQ's reconstruction error."""
        from cldrd_tpu.index.pq import train_opq

        rng = np.random.default_rng(20)
        mix = rng.normal(size=(32, 32)).astype(np.float32)
        mix *= (np.linspace(2.0, 0.1, 32) ** 0.5)[None, :]  # anisotropic
        x = (rng.normal(size=(4096, 32)).astype(np.float32) @ mix)
        cb = train_pq(x, m=8, n_codes=16, iters=8, seed=0)
        mse_pq = float(((x - decode_pq(encode_pq(x, cb), cb)) ** 2).mean())
        rot, cb_o = train_opq(x, m=8, n_codes=16, iters=6, seed=0)
        # R is orthogonal (inner products survive exactly)
        np.testing.assert_allclose(rot @ rot.T, np.eye(32), atol=1e-4)
        y = x @ rot
        rec = decode_pq(encode_pq(y, cb_o), cb_o) @ rot.T
        mse_opq = float(((x - rec) ** 2).mean())
        assert mse_opq < mse_pq, (mse_opq, mse_pq)

    def test_opq_index_keeps_exactness_invariant(self):
        c, ids, q = _corpus(seed=21)
        idx = IVFIndex.build(c, ids, nlist=4, slot=512, kmeans_iters=3,
                             seed=21, pq_m=8, opq=True)
        assert idx.opq_rotation is not None
        rec = _reconstruct(idx)
        v, i = idx.search(q, 10, nprobe=idx.n_buckets)
        for r in range(len(q)):
            for rank in range(10):
                want = float(q[r] @ rec[int(i[r, rank])])
                assert abs(v[r, rank] - want) <= 1e-3 + 1e-3 * abs(want)
        # add() encodes through the same rotation: invariant survives
        rng = np.random.default_rng(22)
        new = rng.normal(size=(64, c.shape[1])).astype(np.float32)
        idx2 = idx.add(new, (np.arange(64) + 5_000_000).astype(np.int64))
        rec2 = _reconstruct(idx2)
        v2, i2 = idx2.search(q, 10, nprobe=idx2.n_buckets)
        for r in range(len(q)):
            want = float(q[r] @ rec2[int(i2[r, 0])])
            assert abs(v2[r, 0] - want) <= 1e-3 + 1e-3 * abs(want)

    def test_opq_persistence_roundtrip(self, tmp_path):
        c, ids, q = _corpus(n=512, seed=23)
        idx = IVFIndex.build(c, ids, nlist=2, slot=256, kmeans_iters=3,
                             seed=23, pq_m=8, opq=True)
        out = str(tmp_path / "opq")
        idx.save(out)
        back = IVFIndex.load(out)
        assert back.opq_rotation is not None
        np.testing.assert_array_equal(np.asarray(back.opq_rotation),
                                      np.asarray(idx.opq_rotation))
        v0, i0 = idx.search(q, 5, nprobe=idx.n_buckets)
        v1, i1 = back.search(q, 5, nprobe=back.n_buckets)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v1, rtol=0, atol=0)

    def test_8bit_store_is_unpacked(self):
        c, ids, q = _corpus(n=512, seed=14)
        idx = IVFIndex.build(c, ids, nlist=2, slot=256, kmeans_iters=3,
                             seed=14, pq_m=4, pq_bits=8)
        assert not idx._pq_packed
        assert idx.buckets.shape[1] == idx.slot * 4
        # the invariant holds for the 8-bit layout too
        rec = _reconstruct(idx)
        v, i = idx.search(q, 5, nprobe=idx.n_buckets)
        for r in range(len(q)):
            want = float(q[r] @ rec[int(i[r, 0])])
            assert abs(v[r, 0] - want) <= 1e-3 + 1e-3 * abs(want)
