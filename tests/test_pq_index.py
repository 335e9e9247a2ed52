"""Product-quantized retrieval index (serving/pq.py).

Covers: quantizer training, exact-recovery special case (data points ON
centroids -> PQ scores == exact scores), recall vs the exact index on
clustered data, multi-device shard agreement, rerank == exact results,
pickle-free persistence round-trip, HTTP service compatibility.
"""
import numpy as np
import pytest
import jax

from gandtr_tpu.serving.index import RetrievalIndex
from gandtr_tpu.serving.pq import PQRetrievalIndex, train_product_quantizer


def _unit_rows(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _clustered(rng, n, d, n_clusters=32, noise=0.05):
    centers = _unit_rows(rng, n_clusters, d)
    x = centers[rng.randint(0, n_clusters, n)] + noise * rng.randn(n, d)
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


class TestQuantizer:
    def test_codebook_shape_and_improvement(self):
        rng = np.random.RandomState(0)
        X = _clustered(rng, 2000, 32)
        C = train_product_quantizer(X, m=4, ksub=16, iters=20)
        assert C.shape == (4, 16, 8)
        # quantization error must beat the 1-iteration codebook
        C1 = train_product_quantizer(X, m=4, ksub=16, iters=1)

        def qerr(C):
            Xs = X.reshape(-1, 4, 8)
            d = ((Xs[:, :, None, :] - C[None]) ** 2).sum(-1).min(2)
            return float(d.sum())
        assert qerr(C) < qerr(C1) * 0.9

    def test_exact_recovery_when_data_on_centroids(self):
        """If every subvector is exactly a centroid, ADC scores == exact
        inner products and the PQ top-k == exact top-k."""
        rng = np.random.RandomState(1)
        d, m, ksub = 16, 4, 8
        C = rng.randn(m, ksub, d // m).astype(np.float32)
        codes = rng.randint(0, ksub, (64, m))
        X = np.concatenate([C[mi, codes[:, mi]] for mi in range(m)], axis=1)
        q = rng.randn(3, d).astype(np.float32)

        pq = PQRetrievalIndex(d, m=m, ksub=ksub, codebooks=C)
        pq.add([str(i) for i in range(64)], X)
        exact = RetrievalIndex(d)
        exact.add([str(i) for i in range(64)], X)
        got, want = pq.query(q, k=10), exact.query(q, k=10)
        for g, w in zip(got, want):
            assert [n for n, _ in g] == [n for n, _ in w]
            np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                                       rtol=1e-4, atol=1e-5)


class TestPQIndex:
    def test_recall_vs_exact(self):
        rng = np.random.RandomState(2)
        d, n = 64, 3000
        X = _clustered(rng, n, d, n_clusters=50, noise=0.08)
        q = _clustered(rng, 8, d, n_clusters=50, noise=0.08)
        exact = RetrievalIndex(d)
        exact.add([str(i) for i in range(n)], X)
        pq = PQRetrievalIndex(d, m=16, ksub=64).fit(X, iters=15)
        pq.add([str(i) for i in range(n)], X)

        want = exact.query(q, k=10)
        got = pq.query(q, k=50)
        recalls = []
        for g, w in zip(got, want):
            gn = {n_ for n_, _ in g}
            recalls.append(np.mean([n_ in gn for n_, _ in w]))
        assert np.mean(recalls) > 0.8, recalls

    def test_rerank_recovers_exact_topk(self):
        rng = np.random.RandomState(3)
        d, n = 32, 800
        X = _clustered(rng, n, d, n_clusters=24, noise=0.1)
        q = _clustered(rng, 5, d, n_clusters=24, noise=0.1)
        exact = RetrievalIndex(d)
        exact.add([str(i) for i in range(n)], X)
        pq = PQRetrievalIndex(d, m=8, ksub=64, rerank=200).fit(X, iters=15)
        pq.add([str(i) for i in range(n)], X)
        want = exact.query(q, k=5)
        got = pq.query(q, k=5)
        hits = 0
        for g, w in zip(got, want):
            # rerank scores are exact inner products
            for (gn, gs), (wn, ws) in zip(g, w):
                if gn == wn:
                    hits += 1
                    np.testing.assert_allclose(gs, ws, rtol=1e-4, atol=1e-5)
        assert hits >= 0.9 * 5 * len(want), hits

    def test_sharded_matches_single_device(self):
        rng = np.random.RandomState(4)
        d, n = 32, 500
        X = _clustered(rng, n, d)
        q = _unit_rows(rng, 4, d)
        pq1 = PQRetrievalIndex(d, m=8, ksub=32).fit(X, iters=10)
        pq1.add([str(i) for i in range(n)], X)
        pq8 = PQRetrievalIndex(d, m=8, ksub=32, devices=jax.devices(),
                               codebooks=pq1.codebooks)
        pq8.add([str(i) for i in range(n)], X)
        for g, w in zip(pq8.query(q, k=7), pq1.query(q, k=7)):
            assert [n_ for n_, _ in g] == [n_ for n_, _ in w]
            np.testing.assert_allclose([s for _, s in g], [s for _, s in w],
                                       rtol=1e-4, atol=1e-5)

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.RandomState(5)
        d, n = 32, 200
        X = _clustered(rng, n, d)
        q = _unit_rows(rng, 2, d)
        pq = PQRetrievalIndex(d, m=8, ksub=32, rerank=50).fit(X, iters=10)
        pq.add([str(i) for i in range(n)], X)
        path = str(tmp_path / "pq_index.npz")
        pq.save(path)
        back = PQRetrievalIndex.load(path)
        assert len(back) == n and back.rerank == 50
        for g, w in zip(back.query(q, k=5), pq.query(q, k=5)):
            assert g == w
        # rerank can be disabled at load time
        fast = PQRetrievalIndex.load(path, rerank=0)
        assert fast.query(q, k=5)[0]

    def test_memory_footprint_claim(self):
        """Codes really are m bytes/vector on the shard (the point of PQ)."""
        rng = np.random.RandomState(6)
        d, n, m = 64, 256, 8
        X = _unit_rows(rng, n, d)
        pq = PQRetrievalIndex(d, m=m, ksub=16).fit(X, iters=5)
        pq.add([str(i) for i in range(n)], X)
        assert pq._codes[0].dtype == np.uint8
        assert pq._codes[0].nbytes == n * m  # vs n*d*4 exact


def test_service_accepts_pq_index():
    """serving/service.py duck-types the index: the PQ index serves :search."""
    from gandtr_tpu.serving import service as svc
    rng = np.random.RandomState(7)
    d, n = 16, 60
    X = _unit_rows(rng, n, d)
    pq = PQRetrievalIndex(d, m=4, ksub=16).fit(X, iters=5)
    pq.add(["img%d" % i for i in range(n)], X)
    out = pq.query(X[:2], k=3)
    assert len(out) == 2 and out[0][0][0] == "img0"
    assert hasattr(svc, "serve_http") or hasattr(svc, "Server")


def test_exact_topk_terminates_for_large_k():
    """k == chunk used to make the candidate width (n/chunk)*k == n: no
    reduction, unbounded recursion. The adaptive chunk (>= 2k) fixes it."""
    from gandtr_tpu.serving.index import exact_topk
    import jax.numpy as jnp
    rng = np.random.RandomState(8)
    s = jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    for k in (128, 200, 300):
        vals, idx = exact_topk(s, k)
        want_v, want_i = jax.lax.top_k(s, k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i), err_msg=str(k))
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v), rtol=1e-6)


class TestOPQ:
    def _anisotropic(self, rng, n, d):
        """Strongly anisotropic covariance hidden behind a random rotation —
        the regime where plain PQ's axis-aligned subspace split loses and OPQ
        wins (tight-cluster data is the WRONG test: there the exact top-k
        differ by sub-noise margins no quantizer can resolve)."""
        scales = np.exp(-np.arange(d) / 4.0)
        Q, _ = np.linalg.qr(rng.randn(d, d))
        x = (rng.randn(n, d) * scales) @ Q.astype(np.float32)
        return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)

    def test_rotation_is_orthogonal(self):
        rng = np.random.RandomState(10)
        X = self._anisotropic(rng, 600, 32)
        pq = PQRetrievalIndex(32, m=8, ksub=16).fit(X, opq_iters=4)
        R = pq.rotation
        np.testing.assert_allclose(R @ R.T, np.eye(32), atol=1e-4)

    def test_opq_beats_plain_pq_quantization_error(self):
        rng = np.random.RandomState(11)
        X = self._anisotropic(rng, 1200, 32)
        from gandtr_tpu.serving.pq import (train_product_quantizer,
                                           train_opq_rotation, _decode)

        def qerr(Xr, C):
            Xs = Xr.reshape(-1, C.shape[0], Xr.shape[1] // C.shape[0])
            xc = np.einsum("nmd,mkd->nmk", Xs, C)
            c2 = np.sum(C * C, -1)
            codes = np.argmax(2.0 * xc - c2[None], -1)
            return float(((Xr - _decode(C, codes)) ** 2).sum())

        C0 = train_product_quantizer(X, 8, 16, iters=15)
        R, C1 = train_opq_rotation(X, 8, 16, opq_iters=6, kmeans_iters=8)
        assert qerr(X @ R, C1) < qerr(X, C0) * 0.95

    def test_opq_recall_and_roundtrip(self, tmp_path):
        rng = np.random.RandomState(12)
        d, n = 32, 1500
        X = self._anisotropic(rng, n, d)
        q = self._anisotropic(rng, 8, d)
        exact = RetrievalIndex(d)
        exact.add([str(i) for i in range(n)], X)
        want = exact.query(q, k=5)

        def recall(idx):
            got = idx.query(q, k=20)
            r = []
            for g, w in zip(got, want):
                gn = {n_ for n_, _ in g}
                r.append(np.mean([n_ in gn for n_, _ in w]))
            return float(np.mean(r))

        pq = PQRetrievalIndex(d, m=8, ksub=16).fit(X, iters=15)
        pq.add([str(i) for i in range(n)], X)
        opq = PQRetrievalIndex(d, m=8, ksub=16).fit(X, opq_iters=6)
        opq.add([str(i) for i in range(n)], X)
        assert recall(opq) >= recall(pq), (recall(opq), recall(pq))
        assert recall(opq) > 0.85

        path = str(tmp_path / "opq.npz")
        opq.save(path)
        back = PQRetrievalIndex.load(path)
        assert back.rotation is not None
        for g, w in zip(back.query(q, k=5), opq.query(q, k=5)):
            assert g == w


def test_fit_after_add():
    """fit() after add() must not silently pair old codes with new codebooks:
    with rerank it re-encodes from the kept rows, without it refuses."""
    rng = np.random.RandomState(20)
    X = _unit_rows(rng, 300, 32)
    X2 = _unit_rows(rng, 300, 32)

    pq = PQRetrievalIndex(32, m=8, ksub=16, rerank=50).fit(X, iters=5)
    pq.add([str(i) for i in range(300)], X)
    pq.fit(X2, iters=5)  # re-encodes the 300 rows under the new codebooks
    (res,) = pq.query(X[7], k=3)
    assert res[0][0] == "7" and abs(res[0][1] - 1.0) < 1e-4

    bare = PQRetrievalIndex(32, m=8, ksub=16).fit(X, iters=5)
    bare.add([str(i) for i in range(300)], X)
    with pytest.raises(RuntimeError, match="fit"):
        bare.fit(X2, iters=5)
