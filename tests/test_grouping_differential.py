"""Differential test of the VLAD-family grouping layers vs the reference's
ACTUAL grouping.py + functional.py (loaded standalone, real torch CPU).

Pins, across the feature/assignment/descriptor/weight mini-DSL grid:
soft assignment, hard top-k assignment with dense scatter, clustering
iterations (kmeans/cmeans/softmax) from identical inits, and the codebook
top-centroid reduction in BOTH the soft (pospair-weights topk) and hard
(nearest-1 reduction + feature filtering) paths.

Known reference bugs NOT replicated (documented in docs/PARITY.md):
- iterate_kmeans NaNs empty clusters (torch.mean over an empty slice); ours
  keeps the previous centroid — the fuzz below avoids empty clusters;
- ClusteringCodebook.compute_codebook references self.clustering which the
  reference never sets (latent AttributeError); ours wires kmeans.

Reference: /root/reference/mdir/components/model/layers/grouping.py,
           functional.py.
"""
import os
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.models import grouping as G

_GR = "/root/reference/mdir/components/model/layers/grouping.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_GR),
                                     reason="reference tree not mounted")
torch = pytest.importorskip("torch")


def _load(fullname, path, search=None):
    spec = ilu.spec_from_file_location(fullname, path,
                                       submodule_search_locations=search)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("reflayers")
    pkg.__path__ = []
    sys.modules["reflayers"] = pkg
    func = _load("reflayers.functional",
                 "/root/reference/mdir/components/model/layers/functional.py")
    mod = _load("reflayers.grouping", _GR)
    return mod, func


def _data(rng, n=24, d=8, k=6, n_images=3):
    images = [rng.rand(rng.randint(5, n), d).astype(np.float32) * 2 - 1
              for _ in range(n_images)]
    atts = [rng.rand(f.shape[0], 1).astype(np.float32) + 0.1 for f in images]
    centroids = (rng.rand(k, d).astype(np.float32) * 2 - 1) * 2
    return images, atts, centroids


def _ref_images(images, atts):
    return [([torch.from_numpy(f)], [torch.from_numpy(a)])
            for f, a in zip(images, atts)]


def _our_images(images, atts):
    return [(f, a) for f, a in zip(images, atts)]


CONFIG_GRID = [
    # (features, nearest, assignment, descriptor, weights)
    ("iden", "all", "uniform", "l2norm", "unif"),
    ("res", "all", "softmax-2.0", "l2norm", "avgass"),
    ("normres", "all", "softmax2-1.5", "normsign", "maxass"),
    ("resatt", "all", "cmeans-2.0", "sigmoid-1.0", "avgassatt"),
    ("normresatt", "all", "softmax-3.0-detach", "l2norm", "maxassatt"),
    ("normresatt2", "all", "rankserie-2", "l2norm", "avgassatt2"),
    ("att", "all", "softmax-1.0", "l2norm", "softmaxassatt"),
    ("normres", "all", "softmax-2.0", "l2norm", "descnorm3"),
    ("normres", "top", "uniform", "l2norm", "unif"),
    ("res", "top-2", "softmax-2.0", "l2norm", "avgass"),
    ("normresatt", "top-3", "rankserie-2", "normsign", "maxass"),
    ("iden", "top-1", "uniform", "sigmoid-2.0", "avgassatt"),
]


@needs_reference
@pytest.mark.parametrize("cfg", CONFIG_GRID,
                         ids=["-".join(c) for c in CONFIG_GRID])
def test_assign_images_vs_reference(ref, cfg):
    mod, _ = ref
    features, nearest, assignment, descriptor, weights = cfg
    rng = np.random.RandomState(hash(cfg) % (2 ** 31))
    for trial in range(5):
        images, atts, centroids = _data(rng)
        r = mod.Grouping(centroids.shape[0], features, nearest, assignment,
                         descriptor, weights)
        o = G.Grouping(centroids.shape[0], features, nearest, assignment,
                       descriptor, weights)
        rg, rw = r.assign_images(_ref_images(images, atts),
                                 torch.from_numpy(centroids))
        og, ow = o.assign_images(_our_images(images, atts), centroids)
        np.testing.assert_allclose(np.asarray(og), rg.detach().numpy(),
                                   rtol=2e-3, atol=2e-5,
                                   err_msg="grouped %s trial %d" % (cfg, trial))
        np.testing.assert_allclose(np.asarray(ow), rw.detach().numpy(),
                                   rtol=2e-3, atol=2e-5,
                                   err_msg="weights %s trial %d" % (cfg, trial))


@needs_reference
@pytest.mark.parametrize("clustering,iters", [("kmeans", 4), ("cmeans-2.0", 4),
                                              ("softmax-5.0", 4)])
def test_clustering_iterations_vs_reference(ref, clustering, iters):
    _, func = ref
    rng = np.random.RandomState(0)
    # well-separated blobs so no kmeans cluster goes empty (reference NaNs
    # empty clusters — a known bug we do not replicate)
    blobs = np.concatenate([rng.randn(20, 6).astype(np.float32) * 0.05 + mu
                            for mu in np.eye(6)[:4] * 4.0])
    init = blobs[[0, 20, 40, 60]].copy()

    if clustering == "kmeans":
        ref_out = func.iterate_kmeans(torch.from_numpy(blobs),
                                      torch.from_numpy(init.copy()), iters)
        our_out = G.iterate_kmeans(blobs, init.copy(), iters)
    elif clustering.startswith("cmeans"):
        ref_out = func.iterate_cmeans(torch.from_numpy(blobs),
                                      torch.from_numpy(init.copy()), iters,
                                      2.0, 1e-6)
        our_out = G.iterate_cmeans(blobs, init.copy(), iters, 2.0)
    else:
        ref_out = func.iterate_softmax(torch.from_numpy(blobs),
                                       torch.from_numpy(init.copy()), iters,
                                       5.0, 1e-6)
        our_out = G.iterate_softmax(blobs, init.copy(), iters, 5.0)
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               rtol=1e-3, atol=1e-5)


@needs_reference
@pytest.mark.parametrize("nearest", ["all", "top"])
def test_codebook_top_centroids_vs_reference(ref, nearest):
    """Top-centroid reduction: same centroid SELECTION and, aligned by
    original centroid index, the same descriptors/weights — in both the soft
    (pospair topk) and hard (nearest-1 + feature filtering) paths."""
    mod, _ = ref
    rng = np.random.RandomState(42)
    for trial in range(5):
        images, atts, centroids = _data(rng, n=20, d=6, k=12, n_images=3)
        top = 4
        r = mod.Codebook(torch.from_numpy(centroids.copy()), "normres",
                         nearest, "softmax-2.0" if nearest == "all"
                         else "uniform", "l2norm", "maxassatt", 1.0, top)
        o = G.Codebook(centroids.copy(), "normres", nearest,
                       "softmax-2.0" if nearest == "all" else "uniform",
                       "l2norm", "maxassatt", 1.0, top)
        rg, rw = r._forward(_ref_images(images, atts))
        og, ow = o._forward(_our_images(images, atts))
        rg, rw = rg.detach().numpy(), rw.detach().numpy()
        og, ow = np.asarray(og), np.asarray(ow)
        assert rg.shape == og.shape, (rg.shape, og.shape)

        # align centroid order: both sides selected the same top-K centroids,
        # possibly in different orders (torch.topk sorted=False vs lax.top_k).
        # lexsort by the per-centroid weight vectors gives a canonical order
        # (weights are centroid-identifying with random data).
        ro = np.lexsort(np.round(rw, 5))
        oo = np.lexsort(np.round(ow, 5))
        np.testing.assert_allclose(og[:, oo], rg[:, ro], rtol=2e-3, atol=2e-5,
                                   err_msg="trial %d" % trial)
        np.testing.assert_allclose(ow[:, oo], rw[:, ro], rtol=2e-3, atol=2e-5)
