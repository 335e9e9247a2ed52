"""Differential test of the whiten-stage functions vs the reference's ACTUAL
mdir/stages/whiten.py (loaded standalone with stats/cirtorch stubs).

Pins paste_pca_normalize (feature-wise concat + scalar-mean PCA rank
reduction + L2), l2_normalize (no eps: zero rows -> NaN), and the whiten
stage's no-whitening passthrough. Our stage layout is (D, N) columns = the
transpose of the reference's (N, D) rows.

Reference: /root/reference/mdir/stages/whiten.py:10-135.
"""
import os
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.scenarios.stages import (l2_normalize, paste_pca_normalize,
                                         whiten_stage)

_WH = "/root/reference/mdir/stages/whiten.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_WH),
                                     reason="reference tree not mounted")


def _load(fullname, path, search=None):
    spec = ilu.spec_from_file_location(fullname, path,
                                       submodule_search_locations=search)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    class _Res:
        def take_current_stats(self):
            return self

        def get_resources(self):
            return {}

    stats = types.ModuleType("refstages.tools.stats")
    stats.ResourceUsage = _Res
    pkg = types.ModuleType("refstages")
    pkg.__path__ = []
    sys.modules["refstages"] = pkg
    tools = types.ModuleType("refstages.tools")
    tools.__path__ = []
    tools.stats = stats
    sys.modules["refstages.tools"] = tools
    sys.modules["refstages.tools.stats"] = stats

    stages_pkg = types.ModuleType("refstages.stages")
    stages_pkg.__path__ = []
    sys.modules["refstages.stages"] = stages_pkg

    for name in ("cirtorch", "cirtorch.utils"):
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules.setdefault(name, m)
    _load("cirtorch.utils.whiten",
          "/root/reference/mdir/external/cirtorch/utils/whiten.py")
    # two package levels so whiten.py's `from ..tools import stats` resolves
    return _load("refstages.stages.whiten", _WH)


@needs_reference
@pytest.mark.parametrize("dimensions", [None, 3, 8])
def test_paste_pca_normalize_vs_reference(ref, dimensions):
    rng = np.random.RandomState(0 if dimensions is None else dimensions)
    for trial in range(20):
        n = rng.randint(2, 30)
        parts_nd = [rng.randn(n, rng.randint(2, 12)) for _ in
                    range(rng.randint(1, 4))]
        if dimensions and sum(p.shape[1] for p in parts_nd) <= dimensions:
            continue
        _, ref_out = ref.paste_pca_normalize({"dimensions": dimensions},
                                             tuple(p.copy() for p in parts_nd))
        _, our_out = paste_pca_normalize({"dimensions": dimensions},
                                         tuple(p.T.copy() for p in parts_nd))
        ref_out = np.asarray(ref_out, dtype=np.float64)
        our_out = np.asarray(our_out, dtype=np.float64)
        # eig eigenvector sign/order is implementation-defined; the projection
        # V V^T and hence the output is unique up to fp error
        np.testing.assert_allclose(our_out, ref_out.T, rtol=1e-8, atol=1e-9,
                                   err_msg="trial %d dims %s" % (trial,
                                                                 dimensions))


@needs_reference
def test_paste_pca_normalize_empty(ref):
    _, ref_out = ref.paste_pca_normalize({"dimensions": None},
                                         (np.zeros((0,)),))
    _, our_out = paste_pca_normalize({"dimensions": None}, (np.zeros((0,)),))
    assert ref_out.shape == our_out.shape == (0,)


@needs_reference
def test_l2_normalize_vs_reference(ref):
    rng = np.random.RandomState(1)
    vals = rng.randn(10, 5)
    vals[3] = 0.0  # zero row -> NaN in both (no eps)
    _, ref_out = ref.l2_normalize({}, (vals.copy(),))
    _, our_out = l2_normalize({}, (vals.T.copy(),))
    np.testing.assert_allclose(np.asarray(our_out), np.asarray(ref_out).T,
                               rtol=1e-12)
    assert np.isnan(np.asarray(our_out)[:, 3]).all()


def test_l2_normalize_zero_column_nan_is_silent():
    """The 0/0 -> NaN on a zero descriptor column is asserted reference
    parity (output.py:143-146 NaN rows mark missing images) and must not
    surface as a numpy RuntimeWarning (advisor/VERDICT r4: silence
    deliberately so it cannot read as an accident)."""
    import warnings
    vecs = np.ones((4, 3))
    vecs[:, 1] = 0.0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, out = l2_normalize({}, (vecs,))
    assert np.isnan(out[:, 1]).all()
    np.testing.assert_allclose(out[:, 0], 0.5)


def test_whiten_stage_no_whitening_passthrough():
    vecs = np.eye(4)
    meta, out = whiten_stage({"whitening": None}, (vecs,))
    assert meta["status"] == "No whitening applied"
    np.testing.assert_array_equal(out, vecs)
