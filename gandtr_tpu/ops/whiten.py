"""Descriptor whitening: learn on host (float64 numpy, matching the reference's
eigendecomposition path — /root/reference/mdir/external/cirtorch/utils/whiten.py),
apply on device as a fused matmul + L2 norm.

Descriptor matrices here follow the reference's D×N column convention.
"""
import numpy as np
import jax.numpy as jnp


def whitenapply(X, m, P, dimensions=None):
    """Project and L2-normalize: P[:d] @ (X - m), columns renormed (whiten.py:5-13).

    Works for both numpy and jax arrays; on device this is a single MXU matmul
    fused with the norm.
    """
    if not dimensions:
        dimensions = P.shape[0]
    mod = jnp if isinstance(X, jnp.ndarray) else np
    X = P[:dimensions, :] @ (X - m)
    return X / (mod.linalg.norm(X, axis=0, keepdims=True) + 1e-6)


def pcawhitenlearn(X, shrink=None):
    """PCA whitening from unannotated descriptors (whiten.py:15-36)."""
    X = np.asarray(X, dtype=np.float64)
    N = X.shape[1]
    m = X.mean(axis=1, keepdims=True)
    Xc = X - m
    Xcov = Xc @ Xc.T
    Xcov = (Xcov + Xcov.T) / (2 * N)
    eigval, eigvec = np.linalg.eigh(Xcov)
    order = eigval.argsort()[::-1]
    eigval = eigval[order]
    eigvec = eigvec[:, order]
    if shrink:
        b = eigval[shrink - 1]
        eigval = (1 - b) * eigval + b
    P = np.linalg.inv(np.sqrt(np.diag(eigval))) @ eigvec.T
    return m, P


def _jittered_cholesky(S):
    """Cholesky with growing diagonal jitter until PSD (whiten.py:55-70)."""
    alpha = 0.0
    while True:
        try:
            return np.linalg.cholesky(S + alpha * np.eye(*S.shape))
        except np.linalg.LinAlgError:
            alpha = 1e-10 if alpha == 0 else alpha * 10


def whitenlearn(X, qidxs, pidxs):
    """Learn Lw (supervised) whitening from query/positive pairs (whiten.py:38-53)."""
    X = np.asarray(X, dtype=np.float64)
    m = X[:, qidxs].mean(axis=1, keepdims=True)
    df = X[:, qidxs] - X[:, pidxs]
    S = df @ df.T / df.shape[1]
    P = np.linalg.inv(_jittered_cholesky(S))
    df = P @ (X - m)
    D = df @ df.T
    eigval, eigvec = np.linalg.eigh(D)
    order = eigval.argsort()[::-1]
    eigvec = eigvec[:, order]
    P = eigvec.T @ P
    return m, P


def whitenlearn_with_retry(X, qidxs, pidxs, max_trials=100, seed=0):
    """Retry-on-failure Lw learning: progressively subsample queries when the
    intra-pair covariance is degenerate (reference stages/whiten.py:48-67)."""
    rng = np.random.RandomState(seed)
    qidxs = np.asarray(qidxs)
    pidxs = np.asarray(pidxs)
    for trial in range(max_trials):
        keep = max(int(round(len(qidxs) * (1 - 0.95 * trial / max_trials))), 2)
        sel = np.sort(rng.choice(len(qidxs), keep, replace=False)) if trial else np.arange(len(qidxs))
        try:
            return whitenlearn(X, qidxs[sel], pidxs[sel])
        except np.linalg.LinAlgError:
            continue
    raise RuntimeError("whitenlearn failed after %d trials" % max_trials)
