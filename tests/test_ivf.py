"""IVF index: k-means, exactness at full probe, recall, persistence.

The IVF index is a capability ADDITION over the reference (whose FAISS
build ships IndexIVFFlat even though CL-DRD uses Flat,
``/root/reference/retriever/retrieval_utils.py:116-129``): it targets the
low-batch serving regime where the flat scan cannot amortize the corpus
stream over a large query batch.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cldrd_tpu.index.kmeans import assign_clusters, kmeans
from cldrd_tpu.index.ivf_index import IVFIndex, ivf_exists
from cldrd_tpu.index.flat_index import FlatIPIndex


def _clustered(n_clusters=32, per=64, d=32, seed=0, spread=0.05):
    """Well-separated Gaussian blobs; returns (x, true_centers)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3.0
    x = (centers[np.repeat(np.arange(n_clusters), per)]
         + rng.normal(size=(n_clusters * per, d)).astype(np.float32) * spread)
    return x.astype(np.float32), centers


class TestKMeans:
    def test_recovers_separated_clusters(self):
        x, centers = _clustered()
        c = kmeans(x, 32, iters=25, seed=1)
        assert c.shape == (32, x.shape[1]) and c.dtype == np.float32
        # every true center should have a learned centroid within the blob
        d2 = ((centers[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assert float(d2.min(axis=1).max()) < 0.1
        # and the assignment should split rows into 32 nonempty groups
        a = assign_clusters(x, c)
        assert a.shape == (len(x),) and a.dtype == np.int32
        assert len(np.unique(a)) == 32

    def test_assignment_is_nearest_centroid(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(500, 16)).astype(np.float32)
        c = rng.normal(size=(13, 16)).astype(np.float32)
        a = assign_clusters(x, c, block=128)
        oracle = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
        np.testing.assert_array_equal(a, oracle)

    def test_k_greater_than_n_raises(self):
        with pytest.raises(ValueError):
            kmeans(np.zeros((4, 8), np.float32), 5)

    def test_no_nans_with_duplicate_points(self):
        # degenerate input: many identical rows -> empty clusters reseed
        x = np.ones((256, 8), np.float32)
        c = kmeans(x, 16, iters=5, seed=0)
        assert np.isfinite(c).all()


def _random_corpus(n=3000, d=48, nq=32, seed=0):
    rng = np.random.default_rng(seed)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    ids = rng.permutation(10 * n)[:n].astype(np.int64)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    return corpus, ids, q


class TestIVFIndex:
    def test_full_probe_is_exact_fp32(self):
        corpus, ids, q = _random_corpus()
        idx = IVFIndex.build(corpus, ids, nlist=16, slot=256,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=5, seed=0)
        v, got = idx.search(q, 10, nprobe=idx.n_buckets)
        oracle = ids[np.argsort(-(q @ corpus.T), axis=1)[:, :10]]
        np.testing.assert_array_equal(got, oracle)
        np.testing.assert_allclose(
            v, np.sort(q @ corpus.T, axis=1)[:, ::-1][:, :10], rtol=1e-6)

    def test_full_probe_matches_flat_index_bf16(self):
        corpus, ids, q = _random_corpus(seed=1)
        ivf = IVFIndex.build(corpus, ids, nlist=8, slot=512,
                             kmeans_iters=4, seed=1)
        flat = FlatIPIndex.build(corpus, ids, block_rows=1024)
        vi, ii = ivf.search(q, 20, nprobe=ivf.n_buckets)
        vf, fi = flat.search(q, 20)
        # both pipelines round matmul inputs to bf16 and accumulate fp32,
        # but the IVF einsum sums in bucket order while the flat kernel
        # sums in corpus order — scores agree to accumulation-order LSBs,
        # and the id SETS must agree everywhere scores are separated
        np.testing.assert_allclose(vi, vf, rtol=1e-5)
        overlap = np.mean([
            len(set(ii[r]) & set(fi[r].astype(np.int32))) / 20
            for r in range(len(q))
        ])
        assert overlap >= 0.99, overlap

    def test_partial_probe_recall_on_clustered_data(self):
        x, _ = _clustered(n_clusters=64, per=128, d=32, seed=5)
        ids = np.arange(len(x)).astype(np.int64)
        rng = np.random.default_rng(7)
        # queries near blob members -> their true neighbors live in 1 cell
        q = x[rng.choice(len(x), 64, replace=False)] + \
            rng.normal(size=(64, 32)).astype(np.float32) * 0.01
        idx = IVFIndex.build(x, ids, nlist=64, slot=256, kmeans_iters=10,
                             seed=5)
        exact = FlatIPIndex.build(x, ids, block_rows=1024)
        ve, ie = exact.search(q, 10)
        v, i = idx.search(q, 10, nprobe=8)
        hit = np.mean([
            len(set(i[r]) & set(ie[r].astype(np.int32))) / 10
            for r in range(len(q))
        ])
        assert hit >= 0.9, hit

    def test_recall_monotone_in_nprobe(self):
        corpus, ids, q = _random_corpus(n=4096, seed=2)
        idx = IVFIndex.build(corpus, ids, nlist=16, slot=512,
                             kmeans_iters=5, seed=2)
        oracle = ids[np.argsort(-(q @ corpus.T), axis=1)[:, :10]]

        def recall(npr):
            _, got = idx.search(q, 10, nprobe=npr)
            return np.mean([
                len(set(got[r]) & set(oracle[r].astype(np.int64))) / 10
                for r in range(len(q))
            ])

        r1, r4, rall = recall(1), recall(4), recall(idx.n_buckets)
        assert r1 <= r4 + 1e-9 and r4 <= rall + 1e-9
        assert rall >= 0.99  # full probe == exact modulo bf16 ties

    def test_int8_full_probe_matches_flat_int8(self):
        corpus, ids, q = _random_corpus(seed=3)
        ivf = IVFIndex.build(corpus, ids, nlist=8, slot=512,
                             dtype=jnp.int8, kmeans_iters=4, seed=3)
        flat = FlatIPIndex.build(corpus, ids, dtype=jnp.int8,
                                 block_rows=1024)
        vi, ii = ivf.search(q, 15, nprobe=ivf.n_buckets)
        vf, fi = flat.search(q, 15)
        np.testing.assert_allclose(vi, vf, rtol=1e-6)
        for r in range(len(q)):
            assert set(ii[r]) == set(fi[r].astype(np.int32))

    def test_persistence_roundtrip(self, tmp_path):
        corpus, ids, q = _random_corpus(seed=4)
        idx = IVFIndex.build(corpus, ids, nlist=8, slot=256,
                             kmeans_iters=4, seed=4, nprobe=3)
        out = str(tmp_path / "ivf")
        assert not ivf_exists(out)
        idx.save(out)
        assert ivf_exists(out)
        back = IVFIndex.load(out)
        assert back.slot == idx.slot and back.nprobe == 3
        v0, i0 = idx.search(q, 10, nprobe=4)
        v1, i1 = back.search(q, 10, nprobe=4)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v1, rtol=0, atol=0)

    def test_persistence_roundtrip_int8(self, tmp_path):
        corpus, ids, q = _random_corpus(seed=8)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=512,
                             dtype=jnp.int8, kmeans_iters=3, seed=8)
        out = str(tmp_path / "ivf8")
        idx.save(out)
        # explicit int8 HBM: codes load verbatim -> identical scores
        back = IVFIndex.load(out, dtype=jnp.int8)
        v0, i0 = idx.search(q, 10, nprobe=2)
        v1, i1 = back.search(q, 10, nprobe=2)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v1, rtol=0, atol=0)
        # float request DEQUANTIZES (load_index parity): near-identical
        # rankings, no scales carried
        deq = IVFIndex.load(out, dtype=jnp.float32, precision="highest")
        assert deq.bucket_scales is None
        v2, i2 = deq.search(q, 10, nprobe=idx.n_buckets)
        ve, ie = idx.search(q, 10, nprobe=idx.n_buckets)
        overlap = np.mean([
            len(set(i2[r]) & set(ie[r])) / 10 for r in range(len(q))
        ])
        assert overlap >= 0.99, overlap

    def test_remove_tombstones(self):
        corpus, ids, q = _random_corpus(seed=6)
        idx = IVFIndex.build(corpus, ids, nlist=8, slot=512,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=4, seed=6)
        n0 = idx.n_vectors
        drop = ids[:50]
        idx2 = idx.remove(drop)
        assert idx2.n_vectors == n0 - 50
        _, got = idx2.search(q, 25, nprobe=idx2.n_buckets)
        assert not (set(got.ravel()) & set(int(i) for i in drop))
        # survivors still exact at full probe
        keep = np.setdiff1d(np.arange(len(ids)), np.arange(50))
        oracle = ids[keep][np.argsort(
            -(q @ corpus[keep].T), axis=1)[:, :25]]
        for r in range(len(q)):
            assert set(got[r]) == set(oracle[r].astype(np.int32))

    def test_add_fills_free_slots_then_overflows(self):
        corpus, ids, q = _random_corpus(n=2000, seed=10)
        idx = IVFIndex.build(corpus, ids, nlist=8, slot=512,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=4, seed=10)
        nb0 = idx.n_buckets
        rng = np.random.default_rng(11)
        new = rng.normal(size=(300, corpus.shape[1])).astype(np.float32)
        new_ids = (np.arange(300) + 1_000_000).astype(np.int64)
        idx2 = idx.add(new, new_ids)
        assert idx2.n_vectors == 2300
        # full probe over the grown index == exact oracle over the union
        allc = np.concatenate([corpus, new])
        alli = np.concatenate([ids, new_ids])
        _, got = idx2.search(q, 20, nprobe=idx2.n_buckets)
        oracle = alli[np.argsort(-(q @ allc.T), axis=1)[:, :20]]
        np.testing.assert_array_equal(got, oracle)
        # free capacity was plentiful: no overflow buckets appended
        assert idx2.n_buckets == nb0

    def test_add_overflow_appends_buckets(self):
        corpus, ids, q = _random_corpus(n=1000, seed=12)
        # slot chosen tight so adds MUST overflow
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=256,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=4, seed=12)
        rng = np.random.default_rng(13)
        new = rng.normal(size=(1500, corpus.shape[1])).astype(np.float32)
        new_ids = (np.arange(1500) + 2_000_000).astype(np.int64)
        idx2 = idx.add(new, new_ids)
        assert idx2.n_buckets > idx.n_buckets
        assert idx2.n_vectors == 2500
        allc = np.concatenate([corpus, new])
        alli = np.concatenate([ids, new_ids])
        _, got = idx2.search(q, 10, nprobe=idx2.n_buckets)
        oracle = alli[np.argsort(-(q @ allc.T), axis=1)[:, :10]]
        np.testing.assert_array_equal(got, oracle)

    def test_add_reuses_tombstoned_slots(self):
        corpus, ids, q = _random_corpus(n=1024, seed=14)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=256,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=3, seed=14)
        nb0 = idx.n_buckets
        idx = idx.remove(ids[:100])
        rng = np.random.default_rng(15)
        # re-add near the removed rows so they route to the same clusters
        new = corpus[:100] + rng.normal(
            size=(100, corpus.shape[1])).astype(np.float32) * 0.01
        idx2 = idx.add(new, (np.arange(100) + 5_000_000).astype(np.int64))
        assert idx2.n_vectors == 1024
        assert idx2.n_buckets == nb0  # reclaimed, not grown

    def test_add_int8_quantizes_like_flat(self):
        corpus, ids, q = _random_corpus(n=1024, seed=16)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=512,
                             dtype=jnp.int8, kmeans_iters=3, seed=16)
        rng = np.random.default_rng(17)
        new = rng.normal(size=(64, corpus.shape[1])).astype(np.float32)
        new_ids = (np.arange(64) + 7_000_000).astype(np.int64)
        idx2 = idx.add(new, new_ids)
        flat = FlatIPIndex.build(
            np.concatenate([corpus, new]),
            np.concatenate([ids, new_ids]),
            dtype=jnp.int8, block_rows=1024)
        vi, ii = idx2.search(q, 10, nprobe=idx2.n_buckets)
        vf, fi = flat.search(q, 10)
        np.testing.assert_allclose(vi, vf, rtol=1e-6)
        for r in range(len(q)):
            assert set(ii[r]) == set(fi[r].astype(np.int32))

    def test_k_exceeding_probed_rows_raises(self):
        corpus, ids, q = _random_corpus(n=2048, seed=7)
        idx = IVFIndex.build(corpus, ids, nlist=16, slot=128,
                             kmeans_iters=3, seed=7)
        with pytest.raises(ValueError):
            idx.search(q, 1000, nprobe=1)

    def test_ragged_batch_sizes_share_padded_shapes(self):
        """Odd batch sizes (the dynamic micro-batcher produces arbitrary
        group sizes) pad to powers of two and return exactly B rows,
        identical to the full-batch answers."""
        corpus, ids, q = _random_corpus(n=2048, nq=13, seed=18)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=512,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=3, seed=18)
        v_all, i_all = idx.search(q, 5, nprobe=idx.n_buckets)
        assert v_all.shape == (13, 5) and i_all.shape == (13, 5)
        for b in (1, 3, 8, 13):
            v, i = idx.search(q[:b], 5, nprobe=idx.n_buckets)
            assert v.shape == (b, 5)
            np.testing.assert_array_equal(i, i_all[:b])
            np.testing.assert_array_equal(v, v_all[:b])

    def test_empty_batch_and_bad_nprobe(self):
        corpus, ids, _ = _random_corpus(n=1024, seed=19)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=512,
                             kmeans_iters=3, seed=19)
        v, i = idx.search(np.zeros((0, corpus.shape[1]), np.float32), 5)
        assert v.shape == (0, 5) and i.shape == (0, 5)
        with pytest.raises(ValueError):
            idx.search(np.zeros((2, corpus.shape[1]), np.float32), 5,
                       nprobe=0)

    def test_nprobe_clamps_to_n_buckets(self):
        corpus, ids, q = _random_corpus(n=1024, seed=9)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=512,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=3, seed=9)
        v, i = idx.search(q, 5, nprobe=10_000)  # clamp, no error
        oracle = ids[np.argsort(-(q @ corpus.T), axis=1)[:, :5]]
        for r in range(len(q)):
            assert set(i[r]) == set(oracle[r].astype(np.int64))


def test_randomized_ivf_invariant_sweep():
    """Seeded randomized sweep over the IVF stack: random shapes, slots,
    nlist, k, dtypes (fp32 / int8-store), and nprobe levels. Invariants per
    configuration: scores descend; every returned id's score equals the
    oracle dot product against the row the store actually holds; full
    probe reproduces the exact oracle top-k. Catches shape-edge regressions
    the targeted tests don't enumerate (mirrors the flat index's
    test_randomized_invariant_sweep)."""
    from cldrd_tpu.index.flat_index import quantize_rows

    rng = np.random.default_rng(321)
    for case in range(8):
        n = int(rng.choice([65, 300, 1024, 3000]))
        d = int(rng.choice([16, 32, 48]))
        bz = int(rng.choice([1, 3, 9]))
        k = int(rng.choice([1, 7, 33]))
        nlist = int(rng.choice([2, 5, min(16, n)]))
        slot = int(rng.choice([64, 128, 256]))
        dtype = rng.choice(["float32", "int8"])

        c = rng.standard_normal((n, d)).astype(np.float32)
        ids_ext = (rng.permutation(n) + 11).astype(np.int64)
        q = rng.standard_normal((bz, d)).astype(np.float32)

        kw = (dict(dtype=jnp.float32, precision="highest")
              if dtype == "float32" else dict(dtype=jnp.int8))
        idx = IVFIndex.build(c, ids_ext, nlist=nlist, slot=slot,
                             kmeans_iters=3, seed=case, **kw)
        if dtype == "int8":
            codes, sc = quantize_rows(c)
            stored = codes.astype(np.float32) * sc[:, None]
        else:
            stored = c
        q_used = np.asarray(
            jnp.asarray(q, idx._query_dtype).astype(jnp.float32))
        id2row = {int(e): r for r, e in enumerate(ids_ext)}

        probes = sorted({1, max(1, idx.n_buckets // 2), idx.n_buckets})
        for nprobe in probes:
            if nprobe * slot < k and nprobe < idx.n_buckets:
                continue  # rejected by design (tested elsewhere)
            s, i = idx.search(q, k, nprobe=nprobe)
            assert s.shape == (bz, k) and i.shape == (bz, k), case
            finite = np.isfinite(s)
            # descending within the finite prefix; -1 exactly where -inf
            assert ((i == -1) == ~finite).all(), case
            for r in range(bz):
                fr = s[r][finite[r]]
                assert (fr[:-1] >= fr[1:] - 1e-5).all(), case
                for rank in np.nonzero(finite[r])[0]:
                    want = float(q_used[r] @ stored[id2row[int(i[r, rank])]])
                    assert abs(s[r, rank] - want) <= 1e-3 + 1e-3 * abs(want), (
                        case, nprobe, r, rank)

        # full probe == exact oracle over the stored rows
        s, i = idx.search(q, k, nprobe=idx.n_buckets)
        k_eff = min(k, n)
        order = np.argsort(-(q_used @ stored.T), axis=1)[:, :k_eff]
        es = np.take_along_axis(q_used @ stored.T, order, axis=1)
        np.testing.assert_allclose(
            s[:, :k_eff], es, rtol=1e-4, atol=1e-4, err_msg=str(case))
        ei = ids_ext[order]
        assert (i[:, :k_eff] == ei).mean() > 0.9, case
        assert (i[:, k_eff:] == -1).all(), case


class TestShardedIVF:
    """Mesh-sharded IVF/IVFPQ (FAISS multi-GPU ``co.shard=True`` applied to
    the approximate tiers, ``/root/reference/retriever/retrieval_utils.py:
    164-182``): buckets row-shard over the corpus axis, centroids/codebooks
    replicate, per-shard local top-k all-gathers over the mesh for the
    payload-sort merge. Runs on the virtual 8-device CPU mesh."""

    def _mesh(self):
        from cldrd_tpu.parallel import CORPUS_AXIS, make_mesh
        return make_mesh(8, CORPUS_AXIS)

    def test_sharded_full_probe_is_exact_fp32(self):
        corpus, ids, q = _random_corpus(n=4100, d=32, seed=7)
        idx = IVFIndex.build(corpus, ids, nlist=23, slot=128,
                             dtype=jnp.float32, precision="highest",
                             kmeans_iters=4, seed=0, mesh=self._mesh())
        assert idx.n_buckets % 8 == 0          # padded to the mesh
        assert idx.n_real <= idx.n_buckets
        v, got = idx.search(q, 10, nprobe=idx.n_real)
        oracle = ids[np.argsort(-(q @ corpus.T), axis=1)[:, :10]]
        np.testing.assert_array_equal(got, oracle)
        np.testing.assert_allclose(
            v, np.sort(q @ corpus.T, axis=1)[:, ::-1][:, :10], rtol=1e-6)

    def test_sharded_matches_single_device_partial_probe(self):
        # same build seed -> identical buckets; the probe set is identical
        # (replicated centroids), so partial-probe results must agree
        corpus, ids, q = _random_corpus(n=3000, d=48, seed=8)
        kw = dict(nlist=16, slot=128, dtype=jnp.float32,
                  precision="highest", kmeans_iters=4, seed=3)
        single = IVFIndex.build(corpus, ids, **kw)
        shard = IVFIndex.build(corpus, ids, mesh=self._mesh(), **kw)
        for nprobe in (1, 3, 7):
            v1, i1 = single.search(q, 15, nprobe=nprobe)
            v2, i2 = shard.search(q, 15, nprobe=nprobe)
            np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(i1, i2)

    def test_sharded_int8_matches_single_device(self):
        corpus, ids, q = _random_corpus(n=2500, d=32, seed=9)
        kw = dict(nlist=12, slot=128, dtype=jnp.int8, kmeans_iters=4,
                  seed=1)
        single = IVFIndex.build(corpus, ids, **kw)
        shard = IVFIndex.build(corpus, ids, mesh=self._mesh(), **kw)
        v1, i1 = single.search(q, 20, nprobe=single.n_real)
        v2, i2 = shard.search(q, 20, nprobe=shard.n_real)
        np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)
        assert (i1 == i2).mean() > 0.99  # near-tied int8 scores may swap

    def test_sharded_pq_matches_single_device(self):
        corpus, ids, q = _random_corpus(n=2000, d=32, seed=10)
        for pq_kw in (dict(pq_m=8, pq_bits=8),
                      dict(pq_m=8, pq_bits=4, opq=True)):
            kw = dict(nlist=10, slot=128, kmeans_iters=4, seed=2, **pq_kw)
            single = IVFIndex.build(corpus, ids, **kw)
            shard = IVFIndex.build(corpus, ids, mesh=self._mesh(), **kw)
            v1, i1 = single.search(q, 10, nprobe=4)
            v2, i2 = shard.search(q, 10, nprobe=4)
            np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-4)
            assert (i1 == i2).mean() > 0.99, pq_kw

    def test_sharded_persistence_roundtrip(self, tmp_path):
        # save strips mesh padding; load onto a mesh re-pads for ITS size
        corpus, ids, q = _random_corpus(n=1500, d=32, seed=11)
        mesh = self._mesh()
        idx = IVFIndex.build(corpus, ids, nlist=9, slot=128,
                             dtype=jnp.float32, kmeans_iters=4, seed=0,
                             mesh=mesh)
        idx.save(str(tmp_path))
        meta = __import__("json").load(open(tmp_path / "ivf_meta.json"))
        assert meta["n_buckets"] == idx.n_real  # pads not persisted
        back_single = IVFIndex.load(str(tmp_path), dtype=jnp.float32)
        back_shard = IVFIndex.load(str(tmp_path), dtype=jnp.float32,
                                   mesh=mesh)
        assert back_single.n_real == back_single.n_buckets == idx.n_real
        v0, i0 = idx.search(q, 12, nprobe=5)
        v1, i1 = back_single.search(q, 12, nprobe=5)
        v2, i2 = back_shard.search(q, 12, nprobe=5)
        np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v2, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(i0, i2)

    def test_sharded_add_remove_raise(self):
        corpus, ids, _ = _random_corpus(n=600, d=16, seed=12)
        idx = IVFIndex.build(corpus, ids, nlist=4, slot=128,
                             dtype=jnp.float32, kmeans_iters=3, seed=0,
                             mesh=self._mesh())
        with pytest.raises(NotImplementedError):
            idx.add(corpus[:2], np.asarray([990001, 990002]))
        with pytest.raises(NotImplementedError):
            idx.remove([int(ids[0])])
