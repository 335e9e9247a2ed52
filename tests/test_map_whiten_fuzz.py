"""Differential fuzz: mAP + whitening vs independently transcribed oracles.

These two functions gate the headline mAP claim. The oracles below are
LITERAL transcriptions of the reference algorithms (evaluate.py:39-111 with
its while-loop junk shifting, whiten.py:4-70 with np.linalg.eig and the
jittered cholesky), exercised over randomized gnd configurations and
descriptor matrices — including empty ok sets, all-junk prefixes, kappas
beyond the db size, single queries, and degenerate covariance inputs.
"""
import numpy as np
import pytest

from gandtr_tpu.ops import ranking as R
from gandtr_tpu.ops import whiten as W


# --------------------------------------------------------------------------
# oracle transcriptions (reference logic verbatim, loops and all)
# --------------------------------------------------------------------------

def oracle_compute_ap(ranks, nres):
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in np.arange(nimgranks):
        rank = ranks[j]
        if rank == 0:
            precision_0 = 1.0
        else:
            precision_0 = float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def oracle_compute_map(ranks, gnd, kappas=()):
    """evaluate.py:39-111 verbatim (incl. the ip/ij junk-shift while loop)."""
    kappas = list(kappas)
    map_ = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    for i in np.arange(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        try:
            qgndj = np.array(gnd[i]["junk"])
        except KeyError:
            qgndj = np.empty(0)
        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]
        k = 0
        ij = 0
        if len(junk):
            ip = 0
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] = pos[ip] - k
                ip += 1
        ap = oracle_compute_ap(pos, len(qgnd))
        map_ = map_ + ap
        aps[i] = ap
        pos += 1
        for j in np.arange(len(kappas)):
            kq = min(max(pos), kappas[j])
            prs[i, j] = (pos <= kq).sum() / kq
        pr = pr + prs[i, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        map_ = map_ / (nq - nempty)
        pr = pr / (nq - nempty)
    return map_, aps, pr, prs


def oracle_cholesky(S):
    alpha = 0
    while 1:
        try:
            return np.linalg.cholesky(S + alpha * np.eye(*S.shape))
        except np.linalg.LinAlgError:
            alpha = 1e-10 if alpha == 0 else alpha * 10


def oracle_whitenlearn(X, qidxs, pidxs):
    """whiten.py:38-53 verbatim (np.linalg.eig, not eigh)."""
    m = X[:, qidxs].mean(axis=1, keepdims=True)
    df = X[:, qidxs] - X[:, pidxs]
    S = np.dot(df, df.T) / df.shape[1]
    P = np.linalg.inv(oracle_cholesky(S))
    df = np.dot(P, X - m)
    D = np.dot(df, df.T)
    eigval, eigvec = np.linalg.eig(D)
    order = eigval.argsort()[::-1]
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    P = np.dot(eigvec.T, P)
    return m, P


def oracle_pcawhitenlearn(X, shrink=None):
    N = X.shape[1]
    m = X.mean(axis=1, keepdims=True)
    Xc = X - m
    Xcov = np.dot(Xc, Xc.T)
    Xcov = (Xcov + Xcov.T) / (2 * N)
    eigval, eigvec = np.linalg.eig(Xcov)
    order = eigval.argsort()[::-1]
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    if shrink:
        b = eigval[shrink - 1]
        eigval = (1 - b) * eigval + b
    P = np.dot(np.linalg.inv(np.sqrt(np.diag(eigval))), eigvec.T)
    return m, P


def oracle_whitenapply(X, m, P, dimensions=None):
    if not dimensions:
        dimensions = P.shape[0]
    X = np.dot(P[:dimensions, :], X - m)
    return X / (np.linalg.norm(X, ord=2, axis=0, keepdims=True) + 1e-6)


# --------------------------------------------------------------------------
# gnd fuzz generation
# --------------------------------------------------------------------------

def random_gnd(rng, db_size, nq):
    """Randomized configurations incl. the edge cases that matter."""
    gnd = []
    for _ in range(nq):
        mode = rng.randint(6)
        idx = rng.permutation(db_size)
        if mode == 0:  # empty ok
            ok, junk = np.empty(0, int), idx[: rng.randint(db_size + 1)]
        elif mode == 1:  # everything ok, no junk
            ok, junk = idx, np.empty(0, int)
        elif mode == 2:  # all non-ok is junk (all-junk prefixes likely)
            n_ok = rng.randint(1, db_size + 1)
            ok, junk = idx[:n_ok], idx[n_ok:]
        elif mode == 3:  # no junk key at all (reference try/except branch)
            n_ok = rng.randint(1, db_size + 1)
            gnd.append({"ok": idx[:n_ok]})
            continue
        else:  # generic disjoint split with leftovers
            n_ok = rng.randint(1, db_size + 1)
            n_junk = rng.randint(db_size - n_ok + 1)
            ok, junk = idx[:n_ok], idx[n_ok:n_ok + n_junk]
        gnd.append({"ok": ok, "junk": junk})
    if all(len(np.asarray(g["ok"])) == 0 for g in gnd):
        # all-empty gnd raises ZeroDivisionError in the reference too
        # (evaluate.py:107 divides by nq - nempty == 0) — covered separately
        idx = rng.permutation(db_size)
        gnd[0] = {"ok": idx[:1], "junk": idx[1:2]}
    return gnd


@pytest.mark.parametrize("block", range(4))
def test_map_fuzz_vs_oracle(block):
    rng = np.random.RandomState(1234 + block)
    for _ in range(250):
        db_size = rng.randint(1, 40)
        nq = rng.randint(1, 6)
        ranks = np.stack([rng.permutation(db_size) for _ in range(nq)], axis=1)
        gnd = random_gnd(rng, db_size, nq)
        kappas = [(), (1, 5, 10), (db_size,), (db_size + 7, db_size + 20)][
            rng.randint(4)]
        with np.errstate(invalid="ignore", divide="ignore"):
            got = R.compute_map(ranks, gnd, kappas)
            want = oracle_compute_map(ranks.copy(),
                                      [dict(g) for g in gnd], kappas)
        for g, w, name in zip(got, want, ("map", "aps", "pr", "prs")):
            np.testing.assert_allclose(g, w, rtol=1e-12, atol=1e-12,
                                       equal_nan=True, err_msg=name)


def test_map_all_queries_empty_raises_like_reference():
    """gnd with zero evaluable queries divides by (nq - nempty) == 0; the
    reference's Python-float `map / 0` raises ZeroDivisionError (evaluate.py:
    107) and ours reproduces that contract rather than silently emitting 0."""
    ranks = np.stack([np.arange(5)] * 2, axis=1)
    gnd = [{"ok": [], "junk": [0, 1]}, {"ok": []}]
    with pytest.raises(ZeroDivisionError):
        oracle_compute_map(ranks, gnd, (1, 5))
    with pytest.raises(ZeroDivisionError):
        R.compute_map(ranks, gnd, (1, 5))


def test_map_protocols_vs_oracle_composition():
    """E/M/H protocol composition (evaluate.py:114-152) over random gnd."""
    rng = np.random.RandomState(7)
    for _ in range(100):
        db_size = rng.randint(3, 30)
        nq = rng.randint(1, 5)
        ranks = np.stack([rng.permutation(db_size) for _ in range(nq)], axis=1)
        gnd = []
        for qi in range(nq):
            idx = rng.permutation(db_size)
            n_e = rng.randint(db_size + 1)
            n_h = rng.randint(db_size - n_e + 1)
            n_j = rng.randint(db_size - n_e - n_h + 1)
            if qi == 0:  # keep every protocol's denominator nonzero
                n_e = min(max(n_e, 1), db_size - 1)
                n_h = min(max(n_h, 1), db_size - n_e)
            gnd.append({"easy": idx[:n_e], "hard": idx[n_e:n_e + n_h],
                        "junk": idx[n_e + n_h:n_e + n_h + n_j]})
        with np.errstate(invalid="ignore", divide="ignore"):
            metrics, _ = R.compute_map_protocols("fuzz", ranks, gnd)
            for name, ok_keys, junk_keys in (
                    ("map_easy", ["easy"], ["junk", "hard"]),
                    ("map_medium", ["easy", "hard"], ["junk"]),
                    ("map_hard", ["hard"], ["junk", "easy"])):
                gnd_t = [{"ok": np.concatenate([np.asarray(g[k]).ravel()
                                                for k in ok_keys]),
                          "junk": np.concatenate([np.asarray(g[k]).ravel()
                                                  for k in junk_keys])}
                         for g in gnd]
                want, _, _, _ = oracle_compute_map(ranks, gnd_t, [1, 5, 10])
                np.testing.assert_allclose(metrics[name], want,
                                           equal_nan=True, err_msg=name)


# --------------------------------------------------------------------------
# whitening fuzz
# --------------------------------------------------------------------------

def _sim(Xw):
    return Xw.T @ Xw


def test_whitenlearn_fuzz_vs_oracle():
    """Our eigh-based Lw vs the reference's eig-based Lw: P rows may flip
    sign / rotate within degenerate eigen-subspaces, but whitened
    SIMILARITIES (what ranking and mAP consume) must match."""
    rng = np.random.RandomState(99)
    for trial in range(200):
        D = rng.randint(2, 24)
        N = rng.randint(D + 2, D + 50)
        X = rng.randn(D, N)
        npairs = rng.randint(2, N // 2 + 2)
        qidxs = rng.choice(N, npairs, replace=False)
        pidxs = rng.choice(N, npairs, replace=True)
        if trial % 7 == 0:
            pidxs = qidxs.copy()  # zero intra-pair covariance -> jitter path
        m1, P1 = W.whitenlearn(X, qidxs, pidxs)
        m2, P2 = oracle_whitenlearn(X.astype(np.float64), qidxs, pidxs)
        np.testing.assert_allclose(m1, m2, rtol=1e-10, atol=1e-12)
        if trial % 7 == 0:
            continue  # qidxs==pidxs: S=0, inv(chol) explodes on both sides
        s1 = _sim(np.asarray(W.whitenapply(X, m1, P1)))
        s2 = _sim(oracle_whitenapply(X, m2, np.real(P2)))
        scale = max(1.0, np.abs(s2).max())
        np.testing.assert_allclose(s1 / scale, s2 / scale, atol=5e-6)


def test_pcawhitenlearn_fuzz_vs_oracle():
    rng = np.random.RandomState(5)
    for trial in range(200):
        D = rng.randint(2, 24)
        N = rng.randint(D + 2, D + 60)
        X = rng.randn(D, N) * rng.uniform(0.5, 3.0)
        shrink = None if trial % 3 else rng.randint(1, D + 1)
        m1, P1 = W.pcawhitenlearn(X, shrink=shrink)
        m2, P2 = oracle_pcawhitenlearn(X.astype(np.float64), shrink=shrink)
        np.testing.assert_allclose(m1, m2, rtol=1e-10, atol=1e-12)
        s1 = _sim(np.asarray(W.whitenapply(X, m1, P1)))
        s2 = _sim(oracle_whitenapply(X, m2, np.real(P2)))
        np.testing.assert_allclose(s1, s2, atol=5e-5)


def test_whitenapply_dimensions_vs_oracle():
    rng = np.random.RandomState(13)
    for _ in range(50):
        D = rng.randint(2, 16)
        N = rng.randint(1, 20)
        X = rng.randn(D, N)
        m = rng.randn(D, 1)
        P = rng.randn(D, D)
        dims = rng.choice([None, max(1, D // 2), D])
        got = np.asarray(W.whitenapply(X, m, P, dimensions=dims))
        want = oracle_whitenapply(X, m, P, dimensions=dims)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


# --------------------------------------------------------------------------
# the same fuzz against the reference's ACTUAL code (numpy-only files,
# loaded standalone) — closes the transcription-fidelity gap of the oracles
# --------------------------------------------------------------------------

import importlib.util as _ilu
import os as _os

_REF_UTILS = "/root/reference/mdir/external/cirtorch/utils"


def _load_ref(name):
    path = _os.path.join(_REF_UTILS, name + ".py")
    spec = _ilu.spec_from_file_location("cirtorch_ref_" + name, path)
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_reference = pytest.mark.skipif(not _os.path.isdir(_REF_UTILS),
                                     reason="reference tree not mounted")


@needs_reference
def test_map_fuzz_vs_reference_actual():
    ref = _load_ref("evaluate")
    rng = np.random.RandomState(31337)
    for _ in range(500):
        db_size = rng.randint(1, 40)
        nq = rng.randint(1, 6)
        ranks = np.stack([rng.permutation(db_size) for _ in range(nq)], axis=1)
        gnd = random_gnd(rng, db_size, nq)
        kappas = [(), (1, 5, 10), (db_size,), (db_size + 7,)][rng.randint(4)]
        with np.errstate(invalid="ignore", divide="ignore"):
            got = R.compute_map(ranks.copy(), [dict(g) for g in gnd],
                                list(kappas))
            want = ref.compute_map(ranks.copy(), [dict(g) for g in gnd],
                                   list(kappas))
        for g, w, name in zip(got, want, ("map", "aps", "pr", "prs")):
            np.testing.assert_allclose(g, w, rtol=1e-12, atol=1e-12,
                                       equal_nan=True, err_msg=name)


@needs_reference
def test_whitening_fuzz_vs_reference_actual():
    import warnings
    ref = _load_ref("whiten")
    rng = np.random.RandomState(420)
    warnings.simplefilter("ignore")  # the reference code itself warns on
    # degenerate eigenvalues (sqrt of tiny negatives); behavior is compared,
    # not warning hygiene
    for trial in range(150):
        D = rng.randint(2, 24)
        N = rng.randint(D + 2, D + 50)
        X = rng.randn(D, N)
        npairs = rng.randint(2, N // 2 + 2)
        qidxs = rng.choice(N, npairs, replace=False)
        pidxs = rng.choice(N, npairs, replace=True)
        m1, P1 = W.whitenlearn(X, qidxs, pidxs)
        m2, P2 = ref.whitenlearn(X.astype(np.float64), qidxs, pidxs)
        np.testing.assert_allclose(m1, m2, rtol=1e-10, atol=1e-12)
        s1 = _sim(np.asarray(W.whitenapply(X, m1, P1)))
        s2 = _sim(ref.whitenapply(X, m2, np.real(P2)))
        scale = max(1.0, np.abs(s2).max())
        np.testing.assert_allclose(s1 / scale, s2 / scale, atol=5e-6)

        shrink = None if trial % 3 else int(rng.randint(1, D + 1))
        m3, P3 = W.pcawhitenlearn(X, shrink=shrink)
        m4, P4 = ref.pcawhitenlearn(X.astype(np.float64), s=shrink) \
            if "s" in ref.pcawhitenlearn.__code__.co_varnames else \
            ref.pcawhitenlearn(X.astype(np.float64), shrink)
        np.testing.assert_allclose(m3, m4, rtol=1e-10, atol=1e-12)
        s3 = _sim(np.asarray(W.whitenapply(X, m3, P3)))
        s4 = _sim(ref.whitenapply(X, m4, np.real(P4)))
        np.testing.assert_allclose(s3, s4, atol=5e-5)
