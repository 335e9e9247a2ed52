"""Local-feature grouping layers (VLAD family) in functional JAX.

Re-design of /root/reference/mdir/components/model/layers/{grouping,
functional}.py: composable string-configured feature / assignment / descriptor
/ weight functions (`func-arg1-arg2-flag` mini-DSL), hard (top-k + dense
scatter) vs soft assignment, per-batch clustering (k-means / fuzzy c-means /
softmax k-means with Forgy init), and codebooks up to 512k centroids with
chunked weight computation + top-centroid reduction.

Functional shapes: features (N, D), attentions (N, 1), centroids (K, D).
Hard path returns dense (K, D) descriptors via segment-sum — the TPU-native
replacement for the reference's scatter indexing (grouping.py:118-126).
"""
import pickle

import numpy as np
import jax
import jax.numpy as jnp


SIZE_SHORTCUTS = {"1k": 1024, "2k": 2048, "4k": 4096, "8k": 8192, "16k": 16384,
                  "32k": 32768, "64k": 65536, "128k": 131072, "256k": 262144,
                  "512k": 524288}

EPS = 1e-6


def parse_size(size):
    if isinstance(size, str):
        return SIZE_SHORTCUTS[size]
    return size


def normalize_vec_l2(v):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + EPS)


def cdist(a, b):
    """Euclidean distances via the expanded-square matmul (MXU-friendly)."""
    a2 = jnp.sum(a ** 2, axis=-1, keepdims=True)
    b2 = jnp.sum(b ** 2, axis=-1)
    sq = a2 + b2[None, :] - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.clip(sq, 0.0, None))


def idx2rank_dim1(idxs):
    """Indexes -> ranks across dim 1 (functional.py:12-18)."""
    N, K = idxs.shape
    ranks = jnp.zeros_like(idxs)
    rows = jnp.arange(N)[:, None]
    return ranks.at[rows, idxs].set(jnp.broadcast_to(jnp.arange(K), (N, K)))


def assign_weights_softmax(dists, base):
    return jax.nn.softmax(-base * dists, axis=1)


def assign_weights_cmeans(dists, fuzzifier, eps=EPS):
    dists_eps = eps ** ((fuzzifier - 1) / 2)
    d = dists + dists_eps
    ratio = d[:, :, None] / d[:, None, :]
    return 1.0 / jnp.sum(ratio ** (2.0 / (fuzzifier - 1)), axis=-1)


FEATURE_FUNCTIONS = {
    "iden": lambda x, att, c: x,
    "att": lambda x, att, c: att * x,
    "res": lambda x, att, c: x - c,
    "resatt": lambda x, att, c: att * (x - c),
    "normres": lambda x, att, c: normalize_vec_l2(x - c),
    "normresatt": lambda x, att, c: att * normalize_vec_l2(x - c),
    "normressoftmaxatt": lambda x, att, c: jax.nn.softmax(att, axis=0) * att * normalize_vec_l2(x - c),
    "normresatt2": lambda x, att, c: att ** 2 * normalize_vec_l2(x - c),
}

NEAREST_PARAMS = {
    "all": lambda: None,
    "top": lambda ma=1: ma,
}

ASSIGNMENT_FUNCTIONS = {
    "uniform": lambda: (lambda dst: jnp.ones_like(dst)),
    "softmax": lambda base, *, detach=False: (
        lambda dst: assign_weights_softmax(
            jax.lax.stop_gradient(dst) if detach else dst, base)),
    "softmax2": lambda base: (lambda dst: assign_weights_softmax(dst ** 2, base)),
    "rankserie": lambda base: (lambda dst: base ** (
        -idx2rank_dim1(jnp.argsort(dst, axis=1)).astype(jnp.float32) - 1) * (base - 1)),
    "cmeans": lambda fuzzifier: (lambda dst: assign_weights_cmeans(dst, fuzzifier)),
}

DESCRIPTOR_FUNCTIONS = {
    "l2norm": lambda: (lambda d: d / (jnp.linalg.norm(d, axis=1, keepdims=True) + EPS)),
    "normsign": lambda: (lambda d: jnp.sign(d) / d.shape[1] ** 0.5),
    "sigmoid": lambda base: (lambda d: 2 * jax.nn.sigmoid(base * d) - 1),
}

WEIGHT_FUNCTIONS = {
    "unif": lambda: (lambda d, f, att, ass: (ass != 0).any(axis=0).astype(jnp.float32)),
    "maxass": lambda: (lambda d, f, att, ass: ass.max(axis=0)),
    "avgass": lambda: (lambda d, f, att, ass: ass.mean(axis=0)),
    "maxassatt": lambda *, detach=False: (lambda d, f, att, ass: (
        jax.lax.stop_gradient(ass * att) if detach else ass * att).max(axis=0)),
    "softmaxassatt": lambda: (lambda d, f, att, ass: (
        jax.nn.softmax(ass * att, axis=0) * ass * att).sum(axis=0)),
    "avgassatt": lambda *, detach=False: (lambda d, f, att, ass: (
        jax.lax.stop_gradient(ass * att) if detach else ass * att).mean(axis=0)),
    "avgassatt2": lambda: (lambda d, f, att, ass: (ass * att ** 2).mean(axis=0)),
    "descnorm3": lambda: (lambda d, f, att, ass: jnp.linalg.norm(d, axis=-1) ** 3),
}


def str_func_call(func, functions):
    """`func-arg1-arg2-flag` -> functions[func](arg1, arg2, flag=True)
    (grouping.py:126-139). Numeric params are args, strings become flags."""
    name, *params = func.lower().split("-")
    args, kwargs = [], {}
    for param in params:
        try:
            args.append(float(param) if "." in param else int(param))
        except ValueError:
            kwargs[param] = True
    return functions[name](*args, **kwargs)


class Grouping:
    """Composable grouping (grouping.py:19-171). Works on flat feature/attention
    arrays; `forward(images)` takes a list of (features (N, D), attentions
    (N, 1)) per image."""

    def __init__(self, centroids, features, nearest, assignment, descriptor,
                 weights):
        centroids = parse_size(centroids)
        assert centroids > 0
        self.feature_function = FEATURE_FUNCTIONS[features.lower()]
        self.nearest = str_func_call(nearest, NEAREST_PARAMS)
        self.assignment_function = str_func_call(assignment, ASSIGNMENT_FUNCTIONS)
        self.weight_function = str_func_call(weights, WEIGHT_FUNCTIONS)
        self.descriptor_function = str_func_call(descriptor, DESCRIPTOR_FUNCTIONS)
        self.params = {"centroids": centroids, "features": features,
                       "nearest": nearest, "assignment": assignment,
                       "descriptor": descriptor, "weights": weights}

    def assign_features(self, features, attentions, centroids):
        """(descriptor (K, D), expanded features, dense assignment (N, K))."""
        if self.nearest is None:
            assignment = self.assignment_function(cdist(features, centroids))
            f = self.feature_function(features[:, None, :],
                                      attentions[:, None, :], centroids)
            return (f * assignment[:, :, None]).sum(0), f, assignment

        # hard: top-k nearest, dense scatter via segment-sum
        k = self.nearest
        d = cdist(jax.lax.stop_gradient(features),
                  jax.lax.stop_gradient(centroids))
        neg_dists, indexes = jax.lax.top_k(-d, k)
        dists = -neg_dists
        assignment = self.assignment_function(dists)
        f = self.feature_function(features[:, None, :], attentions[:, None, :],
                                  centroids[indexes])
        weighted = f * assignment[:, :, None]  # (N, k, D)
        K = centroids.shape[0]
        dense_descriptor = jax.ops.segment_sum(
            weighted.reshape(-1, features.shape[-1]), indexes.reshape(-1),
            num_segments=K)
        N = features.shape[0]
        dense_assignment = jnp.zeros((N, K)).at[
            jnp.arange(N)[:, None], indexes].set(assignment)
        return dense_descriptor, f, dense_assignment

    def assign_images(self, images, centroids):
        grouped, weights = [], []
        zeros = None
        for feat, att in images:
            if feat.shape[0] == 0:
                # reference guard (grouping.py:98): an image whose features
                # were all filtered out contributes zero rows
                if zeros is None:
                    K, D = centroids.shape
                    zeros = (self.descriptor_function(jnp.zeros((K, D))),
                             jnp.zeros((K,)))
                grouped.append(zeros[0])
                weights.append(zeros[1])
                continue
            desc, f, ass = self.assign_features(feat, att, centroids)
            grouped.append(self.descriptor_function(desc))
            weights.append(self.weight_function(desc, f, att, ass))
        return jnp.stack(grouped), jnp.stack(weights)

    def forward(self, images):
        return self._forward([(jnp.asarray(f), jnp.asarray(a)) for f, a in images])


# clustering iterations (layers/functional.py:37-60)

def init_clusters_forgy(points, n_clusters, rng):
    idx = jax.random.permutation(rng, points.shape[0])[:n_clusters]
    return points[idx]


def iterate_kmeans(points, clusters, iterations):
    def body(_, c):
        assignment = jnp.argmin(cdist(points, c), axis=1)
        sums = jax.ops.segment_sum(points, assignment, num_segments=c.shape[0])
        counts = jax.ops.segment_sum(jnp.ones(points.shape[0]), assignment,
                                     num_segments=c.shape[0])
        return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), c)
    return jax.lax.fori_loop(0, iterations, body, clusters)


def iterate_cmeans(points, clusters, iterations, fuzzifier, eps=EPS):
    def body(_, c):
        w = assign_weights_cmeans(cdist(points, c), fuzzifier) ** fuzzifier
        return (w.T @ points) / (w.T.sum(-1, keepdims=True) + eps)
    return jax.lax.fori_loop(0, iterations, body, clusters)


def iterate_softmax(points, clusters, iterations, base, eps=EPS):
    def body(_, c):
        w = assign_weights_softmax(cdist(points, c), base) ** base
        return (w.T @ points) / (w.T.sum(-1, keepdims=True) + eps)
    return jax.lax.fori_loop(0, iterations, body, clusters)


CLUSTERING_FUNCTIONS = {
    "kmeans": lambda: iterate_kmeans,
    "cmeans": lambda fuzzifier: (lambda f, c, i: iterate_cmeans(f, c, i, fuzzifier)),
    "softmax": lambda base: (lambda f, c, i: iterate_softmax(f, c, i, base)),
}


class BatchClustering(Grouping):
    """Per-batch clustering (grouping.py:174-193)."""

    def __init__(self, centroids, features, nearest, assignment, descriptor,
                 weights, clustering, iterations, *, outputdim, rng=None):
        super().__init__(centroids, features, nearest, assignment, descriptor,
                         weights)
        self.clustering = str_func_call(clustering, CLUSTERING_FUNCTIONS)
        self.params.update({"clustering": clustering, "iterations": iterations})
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)

    def _forward(self, images):
        features = jnp.concatenate([jax.lax.stop_gradient(f) for f, _ in images])
        # fresh Forgy randomness per batch like the reference's per-call
        # torch.randperm (layers/functional.py:35-37)
        self.rng, key = jax.random.split(self.rng)
        clusters = init_clusters_forgy(features, self.params["centroids"], key)
        clusters = self.clustering(features, clusters, self.params["iterations"])
        return self.assign_images(images, clusters)


class Codebook(Grouping):
    """Codebook grouping with optional top-centroid reduction
    (grouping.py:199-295). The codebook is a learnable array held by the
    caller; `top_centroids` selects the centroids most weighted by the first
    two images (query/positive) before assignment."""

    def __init__(self, codebook, features, nearest, assignment, descriptor,
                 weights, lr_multiplier=1.0, top_centroids=None):
        codebook = jnp.asarray(codebook)
        super().__init__(codebook.shape[0], features, nearest, assignment,
                         descriptor, weights)
        self.codebook = codebook
        self.lr_multiplier = lr_multiplier
        self.top_centroids = parse_size(top_centroids) if top_centroids else None
        if self.top_centroids:
            assert any(self.params["weights"].lower().startswith(x)
                       for x in ("max", "sum", "avg", "unif"))

    def _forward(self, images):
        codebook = self.codebook
        if self.top_centroids:
            pospair = images[:2]  # weights only from query + positive
            atts = jnp.concatenate([jax.lax.stop_gradient(a) for _, a in pospair])
            if self.nearest is None:
                # soft path (grouping.py:217-221): soft-assign the pospair
                # features, keep the top-weighted centroids
                feats = jnp.concatenate([jax.lax.stop_gradient(f)
                                         for f, _ in pospair])
                ass = self.assignment_function(
                    cdist(feats, jax.lax.stop_gradient(codebook)))
                w = self.weight_function(None, None, atts, ass)
                _, top_idx = jax.lax.top_k(w, self.top_centroids)
                codebook = codebook[top_idx]
            else:
                # hard path (grouping.py:222-229 + _chunk_weights_topk +
                # _reduce_codebook): hard-assign ALL image features, weight
                # centroids by the pospair one-hot assignments, drop features
                # assigned to excluded centroids
                assert self.nearest == 1, "ma with reduction not implemented"
                feats = jnp.concatenate([jax.lax.stop_gradient(f)
                                         for f, _ in images])
                idx = jnp.argmin(cdist(feats, jax.lax.stop_gradient(codebook)),
                                 axis=1)
                n_pp = atts.shape[0]
                one_hot = jax.nn.one_hot(idx[:n_pp], codebook.shape[0])
                w = self.weight_function(None, None, atts, one_hot)
                if isinstance(w, jax.core.Tracer):
                    raise TypeError(
                        "Codebook hard top-centroid reduction has "
                        "data-dependent output shapes and runs host-side "
                        "(like the reference's numpy path, grouping.py:"
                        "278-293); call the layer eagerly, not inside jit")
                codebook, feature_mask = self._reduce_codebook(
                    np.asarray(w), np.asarray(idx), codebook,
                    self.top_centroids)
                if feature_mask is not None:
                    images = self._filter_features(images, feature_mask)
        return self.assign_images(images, codebook)

    @staticmethod
    def _reduce_codebook(weights, assignment, codebook, top_centroids):
        """Reduce the codebook to the top-weighted centroids; return a mask of
        the flattened features assigned to the kept ones (grouping.py:278-293).
        Host-side numpy — the result shapes are data-dependent."""
        nonzero = weights > 0
        if nonzero.sum() < top_centroids:
            return codebook[np.nonzero(nonzero)[0]], None
        order = np.argsort(-weights[nonzero], kind="stable")
        idx = np.arange(nonzero.shape[0])[nonzero][order]
        reduced = codebook[idx[:top_centroids]]
        exclude = idx[top_centroids:]
        feature_mask = ~np.isin(assignment, exclude)
        return reduced, feature_mask

    @staticmethod
    def _filter_features(images, feature_mask):
        """Apply a flattened-feature boolean mask back onto the per-image
        feature/attention arrays (grouping.py:153-167)."""
        pointer = 0
        result = []
        for feat, att in images:
            mask = feature_mask[pointer:pointer + feat.shape[0]]
            result.append((feat[np.nonzero(mask)[0]],
                           att[np.nonzero(mask)[0]]))
            pointer += feat.shape[0]
        assert pointer == feature_mask.shape[0]
        return result


class LoadedCodebook(Codebook):
    """Codebook loaded from a pickle (grouping.py:312-325)."""

    def __init__(self, centroids, features, nearest, assignment, descriptor,
                 weights, lr_multiplier=1.0, top_centroids=None, *, outputdim=None):
        super().__init__(self.load_codebook(centroids), features, nearest,
                         assignment, descriptor, weights, lr_multiplier,
                         top_centroids)

    @staticmethod
    def load_codebook(path):
        if not isinstance(path, str):
            return jnp.asarray(path)
        with open(path, "rb") as handle:
            state = pickle.load(handle)
        return jnp.asarray(state["state"]["centroids"])


class ClusteringCodebook(Codebook):
    """Codebook computed by clustering at the start of training
    (grouping.py:298-309)."""

    def __init__(self, centroids, features, nearest, assignment, descriptor,
                 weights, lr_multiplier=1.0, top_centroids=None, iterations=10,
                 *, outputdim, **inference_params):
        super().__init__(jnp.zeros((parse_size(centroids), outputdim)),
                         features, nearest, assignment, descriptor, weights,
                         lr_multiplier, top_centroids)
        self.clustering = str_func_call("kmeans", CLUSTERING_FUNCTIONS)
        self.params["iterations"] = iterations

    def compute_codebook(self, descriptors, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        centroids = init_clusters_forgy(jnp.asarray(descriptors),
                                        self.params["centroids"], rng)
        self.codebook = self.clustering(jnp.asarray(descriptors), centroids,
                                        self.params["iterations"])


class FaissCodebook(Codebook):
    """Codebook clustered at the start of the first epoch, faiss-style
    (reference grouping.py:329-343: `functional.cluster_faiss` = faiss
    k-means with L2 metric via the optional asmk dependency).

    faiss is an optional dependency in the reference and absent here; when it
    is importable we delegate to it, otherwise `compute_codebook` falls back
    to the pure-JAX exact k-means (Forgy init + Lloyd iterations, faiss's
    default niter=25) over chunked exact L2 distances — same algorithm
    family, deterministic, no external dep. Codebooks are clustering
    heuristics: centroids differ between faiss versions too, so the fallback
    is behaviorally equivalent for training purposes.
    """

    def __init__(self, centroids, features, nearest, assignment, descriptor,
                 weights, lr_multiplier=1.0, top_centroids=None, iterations=25,
                 *, outputdim, **inference_params):
        super().__init__(jnp.zeros((parse_size(centroids), outputdim)),
                         features, nearest, assignment, descriptor, weights,
                         lr_multiplier, top_centroids)
        self.clustering = str_func_call("kmeans", CLUSTERING_FUNCTIONS)
        self.params["iterations"] = iterations

    def compute_codebook(self, descriptors, rng=None):
        descriptors = jnp.asarray(descriptors)
        n = self.params["centroids"]
        try:
            import faiss  # optional, mirrors the reference's asmk path
            import numpy as _np
            pts = _np.asarray(descriptors, _np.float32)
            km = faiss.Kmeans(pts.shape[1], n, niter=self.params["iterations"])
            km.train(pts)
            self.codebook = jnp.asarray(km.centroids)
        except ImportError:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            centroids = init_clusters_forgy(descriptors, n, rng)
            self.codebook = self.clustering(descriptors, centroids,
                                            self.params["iterations"])


GROUPINGS = {
    "BatchClustering": BatchClustering,
    "ClusteringCodebook": ClusteringCodebook,
    "LoadedCodebook": LoadedCodebook,
    "FaissCodebook": FaissCodebook,
}
