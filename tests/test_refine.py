"""Refine tier: disk-store exact re-scoring over IVF/IVFPQ candidates.

FAISS ``IndexRefineFlat``/``IVFPQR`` equivalence (see
``cldrd_tpu/index/refine.py``); the exact store stays on disk (memmap)
so refinement costs zero HBM on top of the compressed first tier.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cldrd_tpu.index import (
    DiskRefiner,
    FlatIPIndex,
    IVFIndex,
    RefinedIndex,
    write_embeddings,
)


def _corpus(n=2048, d=32, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(n, d)).astype(np.float32)
    ids = (rng.permutation(4 * n)[:n] + 7).astype(np.int64)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    return c, ids, q


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    c, ids, q = _corpus()
    d = str(tmp_path_factory.mktemp("refine") / "store")
    write_embeddings(d, c, ids, rows_per_shard=700)  # 3 shards, ragged tail
    return {"dir": d, "c": c, "ids": ids, "q": q}


class TestDiskRefiner:
    def test_lookup_and_gather(self, store):
        r = DiskRefiner(store["dir"])
        ids, c = store["ids"], store["c"]
        pick = np.array([0, 1, 699, 700, 1399, 1400, 2047])  # shard edges
        rows = r.lookup_rows(ids[pick])
        np.testing.assert_array_equal(rows, pick)
        np.testing.assert_allclose(r.gather(rows), c[pick], rtol=0, atol=0)
        # unknown ids and -1 padding map to row -1
        unknown = np.array([-1, 10_000_000, int(ids.max()) + 1])
        np.testing.assert_array_equal(r.lookup_rows(unknown), [-1, -1, -1])

    def test_rescore_is_exact_fp32(self, store):
        r = DiskRefiner(store["dir"])
        q, ids, c = store["q"], store["ids"], store["c"]
        cand = np.stack([ids[:10]] * len(q))
        got = r.rescore(q, cand)
        want = q @ c[:10].T
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # unknown candidates come back NaN, not 0
        cand2 = cand.copy()
        cand2[:, 0] = -1
        got2 = r.rescore(q, cand2)
        assert np.isnan(got2[:, 0]).all()
        np.testing.assert_allclose(got2[:, 1:], want[:, 1:], rtol=1e-5,
                                   atol=1e-5)

    def test_int8_store_dequantizes(self, tmp_path):
        c, ids, q = _corpus(n=512, seed=1)
        d = str(tmp_path / "int8_store")
        write_embeddings(d, c, ids, rows_per_shard=200, dtype="int8")
        from cldrd_tpu.index.flat_index import quantize_rows

        codes, sc = quantize_rows(c)
        stored = codes.astype(np.float32) * sc[:, None]
        r = DiskRefiner(d)
        got = r.rescore(q, np.stack([ids[:8]] * len(q)))
        np.testing.assert_allclose(got, q @ stored[:8].T, rtol=1e-5,
                                   atol=1e-5)


class TestRefinedIndex:
    def test_pq_plus_refine_recovers_exact_topk(self, store):
        """Full probe + a candidate pool covering every row: the refined
        result must equal the fp32 numpy oracle EXACTLY — the PQ tier
        only proposes, the disk store decides."""
        c, ids, q = store["c"], store["ids"], store["q"]
        pq = IVFIndex.build(c, ids, nlist=8, slot=256, kmeans_iters=4,
                            seed=0, pq_m=8)
        k = 10
        factor = -(-pq.n_buckets * pq.slot // k)  # pool == all probed rows
        ref = RefinedIndex(pq, DiskRefiner(store["dir"]), factor=factor)
        v, i = ref.search(q, k, nprobe=pq.n_buckets)
        oracle_order = np.argsort(-(q @ c.T), axis=1)[:, :k]
        np.testing.assert_array_equal(i, ids[oracle_order])
        np.testing.assert_allclose(
            v, np.take_along_axis(q @ c.T, oracle_order, axis=1),
            rtol=1e-5, atol=1e-5)

    def test_refine_beats_raw_pq_recall(self, store):
        c, ids, q = store["c"], store["ids"], store["q"]
        pq = IVFIndex.build(c, ids, nlist=8, slot=256, kmeans_iters=4,
                            seed=0, pq_m=8)
        ref = RefinedIndex(pq, DiskRefiner(store["dir"]), factor=32)
        k = 10
        oracle = ids[np.argsort(-(q @ c.T), axis=1)[:, :k]]

        def recall(got):
            return np.mean([
                len(set(got[r].tolist()) & set(oracle[r].tolist())) / k
                for r in range(len(q))
            ])

        _, raw_i = pq.search(q, k, nprobe=pq.n_buckets)
        _, ref_i = ref.search(q, k, nprobe=pq.n_buckets)
        assert recall(ref_i) >= recall(raw_i)
        # i.i.d. gaussian corpora are PQ's worst case (near-tied scores,
        # no cluster structure to absorb into residuals) — a 320-wide
        # exact-rescored pool still reaches high recall where the raw
        # 4-bit ranking sits far lower
        assert recall(ref_i) >= 0.9, recall(ref_i)

    def test_live_adds_keep_first_tier_scores(self, store):
        """Documents added after the store was written are not in the
        refiner — they must still be findable (coarse-score fallback)."""
        c, ids, q = store["c"], store["ids"], store["q"]
        pq = IVFIndex.build(c, ids, nlist=4, slot=512, kmeans_iters=3,
                            seed=2, pq_m=8)
        ref = RefinedIndex(pq, DiskRefiner(store["dir"]), factor=4)
        rng = np.random.default_rng(3)
        new = rng.normal(size=(4, c.shape[1])).astype(np.float32) * 3.0
        new_ids = (np.arange(4) + 9_000_000).astype(np.int64)
        ref2 = ref.add(new, new_ids)
        assert isinstance(ref2, RefinedIndex)
        assert ref2.n_vectors == len(ids) + 4
        _, got = ref2.search(new.astype(np.float32), 3,
                             nprobe=ref2.coarse.n_buckets)
        for r in range(4):
            assert int(new_ids[r]) in set(got[r].tolist())
        ref3 = ref2.remove(new_ids[:2])
        assert ref3.n_vectors == len(ids) + 2

    def test_wrapper_surface(self, store):
        c, ids, q = store["c"], store["ids"], store["q"]
        pq = IVFIndex.build(c, ids, nlist=4, slot=512, kmeans_iters=3,
                            seed=4, pq_m=8, nprobe=2)
        ref = RefinedIndex(pq, DiskRefiner(store["dir"]), factor=4)
        # serving surface rides the wrapped index
        assert ref.nprobe == 2 and ref.n_buckets == pq.n_buckets
        assert ref.n_vectors == pq.n_vectors
        assert ref.warmup_batch_sizes(8) == pq.warmup_batch_sizes(8)
        with pytest.raises(ValueError):
            RefinedIndex(pq, DiskRefiner(store["dir"]), factor=0)
        # shapes and -1 padding on a tiny k over a sparse probe
        v, i = ref.search(q[:3], 5, nprobe=1)
        assert v.shape == (3, 5) and i.shape == (3, 5)
        assert ((i == -1) == ~np.isfinite(v)).all()

    def test_refine_over_ivfflat_tier(self, store):
        """The refiner composes with the IVFFlat (non-PQ) tier too: a
        bf16 first tier gets fp32-exact final scores."""
        c, ids, q = store["c"], store["ids"], store["q"]
        ivf = IVFIndex.build(c, ids, nlist=8, slot=256, kmeans_iters=4,
                             seed=5)  # bf16 store
        ref = RefinedIndex(ivf, DiskRefiner(store["dir"]), factor=8)
        k = 10
        v, i = ref.search(q, k, nprobe=ivf.n_buckets)
        # refined scores are fp32-exact for every returned id
        id2row = {int(e): r for r, e in enumerate(ids)}
        for r in range(len(q)):
            for rank in range(k):
                want = float(q[r] @ c[id2row[int(i[r, rank])]])
                np.testing.assert_allclose(v[r, rank], want, rtol=1e-5)
