"""Multistep stage: infer descriptors for a whitening dataset and learn
whitening from them.

Counterpart of /root/reference/mdir/stages/multistep.py: derive image paths
from the pkl's cids (`cid[-2:]/cid[-4:-2]/cid[-6:-4]/cid`), extract
descriptors with the embedding network, learn lw/pca whitening and pickle it
to `<dir>/whitening/<type>-<name>.pkl`, skipping if it already exists.
"""
import os
import pickle

import numpy as np

from gandtr_tpu.utils.io import resolve_path
from gandtr_tpu.ops import whiten as whiten_ops


def infer_and_learn_whitening(params, data):
    assert not data or not data[0]
    params = dict(params)
    whitening = dict(params.pop("whitening"))
    assert whitening.keys() == {"type", "dataset_pkl", "directory"}, whitening.keys()

    path = None
    if whitening["directory"]:
        name = whitening["dataset_pkl"].rsplit("/", 1)[-1].split("-", 1)[0]
        path = os.path.join(resolve_path(whitening["directory"]), "whitening",
                            "%s-%s.pkl" % (whitening["type"], name))
        if os.path.exists(path):
            return ({"status": "skipped", "whitening_path": path},)
        os.makedirs(os.path.dirname(path), exist_ok=True)

    with open(resolve_path(whitening["dataset_pkl"]), "rb") as f:
        pkl = pickle.load(f)

    # nested cid paths (multistep.py:26)
    paths = ["/".join([x[-2:], x[-4:-2], x[-6:-4], x]) for x in pkl["cids"]]

    from gandtr_tpu.scenarios.infer_stage import infer
    infer_params = dict(params)
    infer_params.setdefault("output", {})["type"] = "embedding"
    (meta,) = infer(infer_params, (paths,))
    descriptors = meta.pop("vecs")  # (D, N), in `paths` order
    meta.pop("names", None)

    if whitening["type"] == "lw":
        cid_to_idx = {cid: i for i, cid in enumerate(pkl["cids"])}
        qidxs = [cid_to_idx[pkl["cids"][x]] for x in pkl["qidxs"]]
        pidxs = [cid_to_idx[pkl["cids"][x]] for x in pkl["pidxs"]]
        m, P = whiten_ops.whitenlearn_with_retry(descriptors, qidxs, pidxs)
    elif whitening["type"] == "pca":
        m, P = whiten_ops.pcawhitenlearn(descriptors)
    else:
        raise ValueError(whitening["type"])

    whit = {"m": m, "P": P}
    if path:
        with open(path, "wb") as f:
            pickle.dump(whit, f)

    return ({"infer": meta, "whitening_path": path, "whitening": None if path else whit},)
