"""Differential fuzz of pooling + metric losses vs the reference's ACTUAL code.

Round-1 gap (VERDICT.md "What's weak" #8 family): `ops/pooling.py` and the
contrastive/triplet losses were tested against hand-written torch oracles, not
against the reference's own `cirtorch/layers/functional.py`. RMAC in particular
(region-grid geometry, functional.py:26-75) was only shape/range-checked. Here
we exec the reference files directly (torch CPU) and fuzz shapes/parameters.

Reference: /root/reference/mdir/external/cirtorch/layers/functional.py,
pooling.py (GeM/GeMmp/Rpool), normalization.py (L2N).
"""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from gandtr_tpu.ops import pooling as P
from gandtr_tpu.ops import losses as L
from gandtr_tpu.ops import norm as NRM

_REF_EXT = "/root/reference/mdir/external"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(_REF_EXT), reason="reference tree not mounted")

torch = pytest.importorskip("torch")


def _load_standalone(name, path):
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(name, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[name] = mod  # register BEFORE exec so intra-package imports hit it
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    # cirtorch/__init__.py drags in torchvision (absent here); load the three
    # layer files standalone under their package names instead.
    import types
    layers = os.path.join(_REF_EXT, "cirtorch", "layers")
    for pkg in ("cirtorch", "cirtorch.layers"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    LF = _load_standalone("cirtorch.layers.functional",
                          os.path.join(layers, "functional.py"))
    LN = _load_standalone("cirtorch.layers.normalization",
                          os.path.join(layers, "normalization.py"))
    LP = _load_standalone("cirtorch.layers.pooling",
                          os.path.join(layers, "pooling.py"))
    return LF, LP, LN


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2)).double()


def unpool(t):
    """(N, C, 1, 1) torch -> (N, C) numpy."""
    return t.squeeze(-1).squeeze(-1).detach().numpy()


# ---------------------------------------------------------------------------
# global poolings
# ---------------------------------------------------------------------------

@needs_reference
def test_global_poolings_fuzz(ref):
    LF, _, _ = ref
    rng = np.random.RandomState(0)
    for _ in range(40):
        n = rng.randint(1, 4)
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        c = rng.randint(1, 48)
        x = rng.randn(n, h, w, c).astype(np.float64) * rng.uniform(0.1, 4.0)
        if rng.rand() < 0.3:
            x = np.abs(x)  # post-ReLU regime (the real use)
        xt = nchw(x)

        np.testing.assert_allclose(
            np.asarray(P.mac(jnp.asarray(x))), unpool(LF.mac(xt)),
            rtol=1e-4, atol=1e-6, err_msg="mac")
        np.testing.assert_allclose(
            np.asarray(P.spoc(jnp.asarray(x))), unpool(LF.spoc(xt)),
            rtol=1e-4, atol=1e-6, err_msg="spoc")

        p = float(rng.uniform(1.0, 6.0))
        eps = float(10.0 ** rng.uniform(-8, -4))
        np.testing.assert_allclose(
            np.asarray(P.gem(jnp.asarray(x), p=p, eps=eps)),
            unpool(LF.gem(xt, p=p, eps=eps)),
            rtol=1e-4, atol=1e-6, err_msg="gem p=%r eps=%r" % (p, eps))


@needs_reference
def test_gem_per_channel_p_fuzz(ref):
    """GeMmp broadcast: p is (C,) here vs the reference's (C,1,1) parameter
    (pooling.py:49-58)."""
    _, LP, _ = ref
    rng = np.random.RandomState(1)
    for _ in range(15):
        n, h, w, c = rng.randint(1, 3), rng.randint(2, 12), rng.randint(2, 12), rng.randint(2, 32)
        x = np.abs(rng.randn(n, h, w, c)).astype(np.float64)
        pvec = rng.uniform(1.0, 5.0, size=c)
        m = LP.GeMmp(p=3.0, mp=c)
        with torch.no_grad():
            m.p.copy_(torch.from_numpy(pvec))
        m = m.double()
        got = np.asarray(P.gem(jnp.asarray(x), p=jnp.asarray(pvec)))
        want = unpool(m(nchw(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# RMAC region grid — the intricate part
# ---------------------------------------------------------------------------

def _rmac_cases():
    rng = np.random.RandomState(2)
    cases = []
    # systematic: all small square/rect shapes where the grid logic branches
    for hw in [(1, 1), (2, 2), (3, 3), (7, 7), (1, 5), (5, 1), (2, 9),
               (9, 2), (3, 10), (10, 3), (16, 16), (12, 20), (20, 12),
               (31, 17), (8, 64), (64, 8),
               # f32-vs-f64 argmin tie in the region-count selection
               # (caught by fuzz; see _rmac_regions)
               (18, 10), (10, 18), (36, 20), (9, 5)]:
        cases.append((hw[0], hw[1], 3))
    # random shapes x L
    for _ in range(30):
        cases.append((rng.randint(1, 40), rng.randint(1, 40), rng.randint(1, 5)))
    return cases


@needs_reference
@pytest.mark.parametrize("H,W,L", _rmac_cases())
def test_rmac_fuzz(ref, H, W, L):
    LF, _, _ = ref
    rng = np.random.RandomState(100 + H * 41 + W * 7 + L)
    n, c = rng.randint(1, 3), rng.randint(2, 24)
    x = np.abs(rng.randn(n, H, W, c)).astype(np.float64)
    got = np.asarray(P.rmac(jnp.asarray(x), L=L))
    want = unpool(LF.rmac(nchw(x), L=L))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@needs_reference
def test_roipool_and_rpool_fuzz(ref):
    """roipool region stack + full Rpool (L2N -> whiten -> L2N -> sum -> L2N)
    vs the reference classes (pooling.py:76-113)."""
    LF, LP, _ = ref
    rng = np.random.RandomState(3)
    for _ in range(8):
        n = rng.randint(1, 3)
        h, w = rng.randint(4, 24), rng.randint(4, 24)
        c = rng.randint(4, 24)
        L_ = rng.randint(1, 4)
        x = np.abs(rng.randn(n, h, w, c)).astype(np.float64)

        # roipool with GeM rpool
        p = float(rng.uniform(1.5, 4.0))
        got = np.asarray(P.roipool(jnp.asarray(x),
                                   lambda r: P.gem(r, p=p), L=L_))
        gem_mod = LP.GeM(p=p).double()
        want = LF.roipool(nchw(x), gem_mod, L_).squeeze(-1).squeeze(-1).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6,
                                   err_msg="roipool")

        # full Rpool with a random linear whitening head
        wmat = rng.randn(c, c) / np.sqrt(c)
        bias = rng.randn(c) * 0.01
        lin = torch.nn.Linear(c, c).double()
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(wmat))
            lin.bias.copy_(torch.from_numpy(bias))
        rp = LP.Rpool(rpool=LP.MAC(), whiten=lin, L=L_).double()
        want2 = unpool(rp(nchw(x)))
        got2 = np.asarray(P.rpool(
            jnp.asarray(x), P.mac,
            whiten_fn=lambda o: o @ jnp.asarray(wmat).T + jnp.asarray(bias),
            L=L_))
        np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-6,
                                   err_msg="rpool")


# ---------------------------------------------------------------------------
# normalization + metric losses
# ---------------------------------------------------------------------------

@needs_reference
def test_l2n_fuzz(ref):
    """Reference l2n normalizes dim=1 of (N, C, 1, 1); ours the trailing dim."""
    _, _, LN = ref
    rng = np.random.RandomState(4)
    mod = LN.L2N().double()
    for _ in range(20):
        n, c = rng.randint(1, 5), rng.randint(1, 64)
        x = rng.randn(n, c) * 10.0 ** rng.uniform(-6, 3)
        want = mod(torch.from_numpy(x)[..., None, None]).squeeze(-1).squeeze(-1).numpy()
        got = np.asarray(NRM.l2n(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@needs_reference
def test_contrastive_triplet_fuzz(ref):
    LF, _, _ = ref
    rng = np.random.RandomState(5)
    for _ in range(30):
        d = rng.randint(2, 64)
        nq = rng.randint(1, 5)
        s = rng.randint(3, 8)  # 1 query + 1 positive + (s-2) negatives
        x = rng.randn(d, nq * s).astype(np.float64)
        label = np.zeros(nq * s, dtype=np.float64)
        label[::s] = -1.0
        label[1::s] = 1.0
        xt = torch.from_numpy(x)
        lt = torch.from_numpy(label)

        margin = float(rng.uniform(0.2, 1.2))
        want = LF.contrastive_loss(xt, lt, margin=margin).item()
        got = float(L.contrastive_loss(jnp.asarray(x), jnp.asarray(label),
                                       num_tuples=nq, margin=margin))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6,
                                   err_msg="contrastive")

        margin_t = float(rng.uniform(0.05, 0.5))
        want = LF.triplet_loss(xt, lt, margin=margin_t).item()
        got = float(L.triplet_loss(jnp.asarray(x), jnp.asarray(label),
                                   num_tuples=nq, margin=margin_t))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6,
                                   err_msg="triplet")
