"""Grouping/VLAD layers: DSL parsing, hard/soft assignment, clustering."""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.models import grouping as G


RNG = np.random.RandomState(0)


def feats(n=20, d=8):
    return jnp.asarray(RNG.rand(n, d).astype(np.float32)), \
        jnp.asarray(RNG.rand(n, 1).astype(np.float32))


class TestDSL:
    def test_str_func_call(self):
        fn = G.str_func_call("softmax-2.0", G.ASSIGNMENT_FUNCTIONS)
        d = jnp.asarray([[0.1, 0.9], [0.5, 0.5]])
        out = fn(d)
        np.testing.assert_allclose(np.asarray(out).sum(1), 1.0, atol=1e-6)

    def test_flag_param(self):
        fn = G.str_func_call("softmax-2.0-detach", G.ASSIGNMENT_FUNCTIONS)
        assert fn is not None

    def test_size_shortcuts(self):
        assert G.parse_size("64k") == 65536
        assert G.parse_size(128) == 128


class TestAssign:
    def _grouping(self, nearest):
        return G.Grouping(4, "normres", nearest, "uniform", "l2norm", "unif")

    def test_soft_assignment_shapes(self):
        g = G.Grouping(4, "res", "all", "softmax-1.0", "l2norm", "avgass")
        f, a = feats()
        c = jnp.asarray(RNG.rand(4, 8).astype(np.float32))
        desc, fx, ass = g.assign_features(f, a, c)
        assert desc.shape == (4, 8)
        assert ass.shape == (20, 4)
        np.testing.assert_allclose(np.asarray(ass).sum(1), 1.0, atol=1e-5)

    def test_hard_assignment_dense_scatter(self):
        g = self._grouping("top-1")
        f, a = feats()
        c = jnp.asarray(RNG.rand(4, 8).astype(np.float32))
        desc, fx, ass = g.assign_features(f, a, c)
        assert desc.shape == (4, 8)
        # each feature assigned to exactly 1 centroid
        np.testing.assert_allclose(np.asarray((ass != 0).sum(1)), 1.0)
        # dense descriptor equals the manual sum of residuals per centroid
        d = np.asarray(G.cdist(f, c))
        nearest = d.argmin(1)
        for k in range(4):
            sel = nearest == k
            expected = np.asarray(G.normalize_vec_l2(
                f[sel] - c[k])).sum(0) if sel.any() else np.zeros(8)
            np.testing.assert_allclose(np.asarray(desc)[k], expected, atol=1e-5)

    def test_cdist_matches_numpy(self):
        f, _ = feats()
        c = jnp.asarray(RNG.rand(4, 8).astype(np.float32))
        ref = np.sqrt(((np.asarray(f)[:, None] - np.asarray(c)[None]) ** 2).sum(-1))
        np.testing.assert_allclose(np.asarray(G.cdist(f, c)), ref, atol=1e-4)


class TestClustering:
    def test_kmeans_separates_clusters(self):
        pts = np.concatenate([RNG.rand(30, 2) * 0.1,
                              RNG.rand(30, 2) * 0.1 + 5.0]).astype(np.float32)
        clusters = G.init_clusters_forgy(jnp.asarray(pts), 2, jax.random.PRNGKey(1))
        out = np.asarray(G.iterate_kmeans(jnp.asarray(pts), clusters, 10))
        centers = sorted(out[:, 0])
        assert centers[0] < 1.0 and centers[1] > 4.0

    def test_batch_clustering_forward(self):
        g = G.BatchClustering(4, "normres", "top-1", "uniform", "l2norm", "unif",
                              "kmeans", 5, outputdim=8)
        images = [feats(12), feats(15)]
        grouped, weights = g.forward(images)
        assert grouped.shape == (2, 4, 8)
        assert weights.shape == (2, 4)

    def test_codebook_top_centroids(self):
        cb = jnp.asarray(RNG.rand(16, 8).astype(np.float32))
        g = G.Codebook(cb, "normres", "all", "softmax-1.0", "l2norm", "avgass",
                       top_centroids=4)
        images = [feats(10), feats(10), feats(10)]
        grouped, weights = g.forward(images)
        assert grouped.shape == (3, 4, 8)

    def test_faiss_codebook_fallback(self):
        """FaissCodebook closes the reference registry (grouping.py:329-343);
        without faiss installed it clusters via the pure-JAX exact k-means."""
        g = G.FaissCodebook(4, "normres", "top-1", "uniform", "l2norm",
                            "unif", outputdim=8, iterations=5)
        g.compute_codebook(RNG.rand(60, 8).astype(np.float32))
        assert g.codebook.shape == (4, 8)
        assert float(jnp.abs(g.codebook).sum()) > 0
        images = [feats(10), feats(10)]
        grouped, weights = g.forward(images)
        assert grouped.shape[0] == 2
        assert "FaissCodebook" in G.GROUPINGS

    def test_clustering_codebook(self):
        g = G.ClusteringCodebook(4, "normres", "top-1", "uniform", "l2norm",
                                 "unif", outputdim=8, iterations=3)
        g.compute_codebook(RNG.rand(50, 8).astype(np.float32))
        assert g.codebook.shape == (4, 8)
        assert float(jnp.abs(g.codebook).sum()) > 0
