"""Pipeline stage functions with the uniform `(params, data) -> (metadata,
*data)` signature (reference mdir/stages/, SURVEY.md §2.3) — the units that
YAML scenarios compose.

Implemented stages: train (GAN + finetune), infer (generator batch inference /
image dump), validate (retrieval eval), whiten (learn/apply), l2_normalize,
multistep.infer_and_learn_whitening.
"""
import os
import pickle

import numpy as np
import jax.numpy as jnp

from gandtr_tpu.utils.io import resolve_path
from gandtr_tpu.ops import whiten as whiten_ops


def whiten_stage(params, data):
    """Apply learned whitening to a descriptor matrix (stages/whiten.py:10-27).

    data: (vecs (D, N),) ; params: {whitening: path-to-pkl, dimensions}.
    """
    params = dict(params)
    lw = params.pop("whitening")
    dimensions = params.pop("dimensions", None)
    assert not params, params
    if not lw:
        # no whitening learned (e.g. empty query set): pass through like the
        # reference (stages/whiten.py:18-19)
        return {"status": "No whitening applied"}, *data
    if isinstance(lw, str):
        with open(resolve_path(lw), "rb") as f:
            lw = pickle.load(f)
    vecs = data[0]
    out = whiten_ops.whitenapply(np.asarray(vecs), lw["m"], lw["P"], dimensions)
    return {}, out


def learn_lw_whitening(params, data):
    """Learn Lw whitening from descriptors + q/p index lists with the
    retry-on-non-PSD loop (stages/whiten.py:48-67)."""
    params = dict(params)
    qidxs = params.pop("qidxs")
    pidxs = params.pop("pidxs")
    output = params.pop("output", None)
    assert not params, params
    vecs = np.asarray(data[0])
    m, P = whiten_ops.whitenlearn_with_retry(vecs, qidxs, pidxs)
    result = {"m": m, "P": P}
    if output:
        output = resolve_path(output)
        os.makedirs(os.path.dirname(output), exist_ok=True)
        with open(output, "wb") as f:
            pickle.dump(result, f)
    return {"whitening": output or result}, vecs


def learn_pca_whitening(params, data):
    params = dict(params)
    shrink = params.pop("shrink", None)
    output = params.pop("output", None)
    assert not params, params
    vecs = np.asarray(data[0])
    m, P = whiten_ops.pcawhitenlearn(vecs, shrink)
    result = {"m": m, "P": P}
    if output:
        output = resolve_path(output)
        os.makedirs(os.path.dirname(output), exist_ok=True)
        with open(output, "wb") as f:
            pickle.dump(result, f)
    return {"whitening": output or result}, vecs


def paste_pca_normalize(params, data):
    """Concatenate descriptor matrices feature-wise with optional PCA rank
    reduction + L2 norm (stages/whiten.py:100-127). Our stage data layout is
    (D, N) columns, the transpose of the reference's (N, D) rows; the math
    below is the exact transpose of the reference's: scalar global mean
    subtraction, top-`dimensions` eigenvectors of the same (D, D) covariance,
    rank-reducing projection V V^T that KEEPS the original dimensionality,
    then per-descriptor L2 normalization."""
    params = dict(params)
    dimensions = params.pop("dimensions") or None
    assert not params, params
    arrays = [np.asarray(d) for d in data]
    if arrays[0].shape in ((0,), (0, 0)):
        return {}, arrays[0]
    assert len({a.shape[1] for a in arrays}) == 1  # same N everywhere

    value = np.concatenate(arrays, axis=0)  # (ΣD, N)
    metadata = {}
    if dimensions:
        value = value - np.mean(value)  # scalar mean, like the reference
        eigval, eigvec = np.linalg.eig(value.dot(value.T))
        vecs = eigvec[:, np.argsort(eigval)[-dimensions:]]
        value = vecs.dot(vecs.T).dot(value)
    with np.errstate(invalid="ignore", divide="ignore"):
        value = value / np.linalg.norm(value, axis=0, keepdims=True)
    return metadata, value


def l2_normalize(params, data):
    """L2-normalize descriptor columns (stages/whiten.py:130-135). No eps —
    all-zero/NaN descriptors normalize to NaN like the reference (NaN rows
    mark missing images, output.py:143-146). The 0/0 is DELIBERATE parity
    behavior (asserted in tests/test_whiten_stages_differential.py), so the
    numpy warning is silenced rather than left to read as an accident."""
    assert not params
    vecs = np.asarray(data[0])
    with np.errstate(invalid="ignore", divide="ignore"):
        return {}, vecs / np.linalg.norm(vecs, axis=0, keepdims=True)


FUNCTIONS = {
    "gandtr_tpu.stages.whiten.whiten": whiten_stage,
    "gandtr_tpu.stages.whiten.learn_lw_whitening": learn_lw_whitening,
    "gandtr_tpu.stages.whiten.learn_pca_whitening": learn_pca_whitening,
    "gandtr_tpu.stages.whiten.paste_pca_normalize": paste_pca_normalize,
    "gandtr_tpu.stages.whiten.l2_normalize": l2_normalize,
}
