"""Differential fuzz of tuple mining vs the reference's ACTUAL code.

- search_hard_negatives vs cirtorch TuplesDataset._search_hard_negatives
  (/root/reference/mdir/external/cirtorch/datasets/traindataset.py:246-279)
- select_diverse_queries vs DiverseAnchorsDataset._select_positive_pairs_db
  (/root/reference/mdir/components/data/dataset/cirtorch_datasets.py:68-115)

Both reference methods are called unbound on a crafted dummy `self`, with the
descriptor matrices injected, so the selection logic is isolated from image
IO / network forwards. shuffle=False makes the diverse-anchor pick
deterministic on both sides (choice = last of the percentile window).
"""
import os
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.data import mining as M

_REF_EXT = "/root/reference/mdir/external"
_REF_DS = "/root/reference/mdir/components/data/dataset"

needs_reference = pytest.mark.skipif(not os.path.isdir(_REF_EXT),
                                     reason="reference tree not mounted")
torch = pytest.importorskip("torch")


def _load(fullname, path):
    spec = ilu.spec_from_file_location(fullname, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    for pkg in ("cirtorch", "cirtorch.datasets", "cirtorch.utils", "daan",
                "daan.ml", "daan.core"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    cd = os.path.join(_REF_EXT, "cirtorch", "datasets")
    cu = os.path.join(_REF_EXT, "cirtorch", "utils")
    general = _load("cirtorch.utils.general", os.path.join(cu, "general.py"))
    sys.modules["cirtorch.utils"].general = general
    helpers = _load("cirtorch.datasets.datahelpers",
                    os.path.join(cd, "datahelpers.py"))
    sys.modules["cirtorch.datasets"].datahelpers = helpers
    generic = _load("cirtorch.datasets.genericdataset",
                    os.path.join(cd, "genericdataset.py"))
    sys.modules["cirtorch.datasets"].genericdataset = generic
    traind = _load("cirtorch.datasets.traindataset",
                   os.path.join(cd, "traindataset.py"))
    sys.modules["cirtorch.datasets"].traindataset = traind
    sys.modules["cirtorch"].datasets = sys.modules["cirtorch.datasets"]
    # daan stubs used only at cirtorch_datasets import time
    mlt = types.ModuleType("daan.ml.tools")
    mlt.path_join = os.path.join
    pr = types.ModuleType("daan.core.path_resolver")
    pr.resolve_path = lambda p: p
    sys.modules["daan.ml.tools"] = mlt
    sys.modules["daan.core.path_resolver"] = pr
    sys.modules["daan.ml"].tools = mlt
    sys.modules["daan.core"].path_resolver = pr
    cirds = _load("refmining.cirtorch_datasets",
                  os.path.join(_REF_DS, "cirtorch_datasets.py"))
    return types.SimpleNamespace(traindataset=traind, cirds=cirds)


def _unit_cols(rng, d, n):
    x = rng.randn(d, n)
    return (x / np.linalg.norm(x, axis=0, keepdims=True)).astype(np.float32)


@needs_reference
def test_search_hard_negatives_fuzz(ref, capsys):
    rng = np.random.RandomState(0)
    for _ in range(15):
        d = rng.randint(4, 32)
        n_images = rng.randint(30, 120)
        npool = rng.randint(20, n_images + 1)
        nq = rng.randint(1, 8)
        nnum = rng.randint(1, 6)
        # enough clusters that nnum dedup picks always exist
        n_clusters = max(nnum + 2, n_images // 3)
        clusters = rng.randint(0, n_clusters, n_images).tolist()
        qidxs = rng.permutation(n_images)[:nq].tolist()
        idxs2images = rng.permutation(n_images)[:npool].tolist()
        qvecs = _unit_cols(rng, d, nq)
        poolvecs = _unit_cols(rng, d, npool)

        dummy = types.SimpleNamespace(clusters=clusters, nnum=nnum)
        want_nidxs, want_stats = ref.traindataset.TuplesDataset._search_hard_negatives(
            dummy, qidxs, torch.from_numpy(qvecs), idxs2images,
            torch.from_numpy(poolvecs))
        got_nidxs, got_stats = M.search_hard_negatives(
            qvecs, poolvecs, qidxs, idxs2images, clusters, nnum)
        assert got_nidxs == want_nidxs
        np.testing.assert_allclose(got_stats["average_negative_distance"],
                                   want_stats["average_negative_distance"],
                                   rtol=1e-4, atol=1e-6)


@needs_reference
def test_select_diverse_queries_fuzz(ref, capsys):
    rng = np.random.RandomState(1)
    for _ in range(10):
        d = rng.randint(4, 24)
        qpool = rng.randint(8, 40)
        qsize = rng.randint(2, qpool + 1)
        se = float(rng.uniform(0.05, 0.4))
        si = float(rng.uniform(se, 0.95))
        qvecs = _unit_cols(rng, d, qpool)
        db = {"qidxs": list(range(1000, 1000 + qpool)),
              "pidxs": list(range(2000, 2000 + qpool))}

        dummy = types.SimpleNamespace(
            qpool_size=qpool, similar_exclude=se, similar_include=si,
            shuffle=False, mark_easy=None, first_neg="neg", nnum=3,
            _randperm=lambda size, samples: list(range(size))[:samples],
            _extract_descriptors=lambda idxs, label, net, device:
                torch.from_numpy(qvecs),
        )
        want_q, want_p, want_labels, want_stats = \
            ref.cirds.DiverseAnchorsDataset._select_positive_pairs_db(
                dummy, None, "cpu", db, qsize)

        sel, qscore = M.select_diverse_queries(qvecs, qsize, se, si,
                                               shuffle=False)
        got_q = [db["qidxs"][i] for i in sel]
        got_p = [db["pidxs"][i] for i in sel]
        assert got_q == want_q, (qpool, qsize, se, si)
        assert got_p == want_p
        np.testing.assert_allclose(
            qscore, want_stats["average_new_query_max_score"],
            rtol=1e-5, atol=1e-6)
        assert [l[0] for l in want_labels] == ["anc", "pos", "neg", "neg", "neg"]


@needs_reference
def test_mark_easy_difficulties_vs_reference(ref):
    """mark_easy suffixes vs the reference's _select_positive_pairs_db with
    mark_easy set (cirtorch_datasets.py:106-114)."""
    rng = np.random.RandomState(2)
    for _ in range(8):
        d = rng.randint(4, 16)
        qpool = rng.randint(8, 30)
        qsize = rng.randint(2, qpool + 1)
        se, si = 0.2, 0.8
        mark_easy = float(rng.uniform(0.1, 0.9))
        qvecs_pool = _unit_cols(rng, d, qpool)
        pvecs_pool = _unit_cols(rng, d, qpool)
        db = {"qidxs": list(range(qpool)),
              "pidxs": list(range(500, 500 + qpool))}

        def extract(idxs, label, net, device):
            if label.startswith("anc"):
                return torch.from_numpy(qvecs_pool)
            # reference extracts pvecs for the SELECTED pidxs
            cols = [i - 500 for i in idxs]
            return torch.from_numpy(pvecs_pool[:, cols])

        dummy = types.SimpleNamespace(
            qpool_size=qpool, similar_exclude=se, similar_include=si,
            shuffle=False, mark_easy=mark_easy, first_neg="neg", nnum=2,
            _randperm=lambda size, samples: list(range(size))[:samples],
            _extract_descriptors=extract,
        )
        want_q, _, want_labels, _ = \
            ref.cirds.DiverseAnchorsDataset._select_positive_pairs_db(
                dummy, None, "cpu", db, qsize)

        sel, _ = M.select_diverse_queries(qvecs_pool, qsize, se, si,
                                          shuffle=False)
        assert [db["qidxs"][i] for i in sel] == want_q
        got_diffs = M.mark_easy_difficulties(
            qvecs_pool[:, sel], pvecs_pool[:, sel], mark_easy, qsize)
        want_diffs = [l[len("anc"):] for l in want_labels[0]]
        assert got_diffs == want_diffs, (qsize, mark_easy)


# ---------------------------------------------------------------------------
# first_neg / mark_easy plumbed through the tuple dataset (unit, no reference)
# ---------------------------------------------------------------------------

def _mini_dataset(first_neg="neg", mark_easy=None):
    from gandtr_tpu.data.cir_datasets import TupleEpochDataset
    rng = np.random.RandomState(0)
    n = 12
    db = {"qidxs": list(range(0, 6)), "pidxs": list(range(6, 12)),
          "cluster": list(range(n)), "cids": ["c%d" % i for i in range(n)]}
    desc = _unit_cols(rng, 8, n)
    miner = M.TuplesMiner(db, nnum=3, qsize=4, poolsize=n, shuffle=False,
                          qpool_size=6, similar_exclude=0.2,
                          similar_include=0.8, mark_easy=mark_easy,
                          first_neg=first_neg)
    ds = TupleEpochDataset(db, ["img%d" % i for i in range(n)],
                           lambda img: img, 16, miner, augment_ratio=0.0,
                           neg_num=3)
    ds.extract_fn = lambda idxs, label=None: desc[:, idxs]
    ds._load_tuple = lambda idxs: [(np.full((4, 4, 3), idx, np.float32),
                                    np.ones((4, 4), np.float32))
                                   for idx in idxs]
    ds.prepare_epoch()
    return ds


def test_first_neg_variants_tuple_assembly():
    ds = _mini_dataset("neg")
    imgs, masks, labels, pmask = ds[0]
    assert imgs.shape[0] == 5 and list(labels) == [-1.0, 1.0, 0.0, 0.0, 0.0]

    ds = _mini_dataset("pos")
    imgs, _, labels, _ = ds[0]
    assert imgs.shape[0] == 5 and list(labels) == [-1.0, 1.0, 1.0, 0.0, 0.0]

    ds_exc = _mini_dataset("exc")
    imgs, _, labels, _ = ds_exc[0]
    # top-ranked negative mined but EXCLUDED from the tuple
    assert imgs.shape[0] == 4 and list(labels) == [-1.0, 1.0, 0.0, 0.0]
    ds_neg = _mini_dataset("neg")
    q, p, negs = ds_exc.tuples[0]
    assert list(negs)[1:] == [int(imgs[2, 0, 0, 0]), int(imgs[3, 0, 0, 0])]
    assert ds_neg.tuples[0][2] == negs


def test_mark_easy_labels_reach_dataset():
    ds = _mini_dataset("neg", mark_easy=0.5)
    labels0 = [row[0] for row in ds.tuple_labels]
    assert all(l.endswith("-easy") or l.endswith("-hard") for l in labels0)
    assert labels0[0].startswith("anc") and labels0[1].startswith("pos")
    # exactly mark_easy*qsize tuples marked easy
    n_easy = sum(1 for l in ds.tuple_labels[0] if l.endswith("-easy"))
    assert n_easy == 2  # 0.5 * qsize 4
