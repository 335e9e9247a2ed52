"""Scenario stage: build a serving RetrievalIndex from an embedding network.

No reference counterpart — the reference only ranks at eval time with a host
numpy matmul (/root/reference/mdir/components/optim/score/cirscore.py:71-72).
This stage closes the train -> index -> serve loop: it extracts descriptors
for an image list (the infer stage's embedding sink) and persists an exact
on-device top-k index (`serving.index.RetrievalIndex`) that `serve_http`
attaches as a `:search` endpoint.

Config::

    build_index:
      __function__: gandtr_tpu.stages.build_index
      network: {model: {...}, path: <checkpoint>}   # infer-stage loader
      data: {image_dir: ..., transforms: ..., ...}  # infer-stage data section
      index:
        path: <index.npz>
        dimensions: 512            # descriptor dim (default 512)
        skip_if_exists: true       # idempotent re-runs (infer.py:23-27)

Image names arrive on stdin like the infer stage. Failed images (NaN
descriptor rows, output.py:143-146) are dropped from the index.
"""
import os

import numpy as np

from gandtr_tpu.utils.io import resolve_path


def build_index(params, data):
    from gandtr_tpu.scenarios.infer_stage import infer
    from gandtr_tpu.serving.index import RetrievalIndex

    params = dict(params)
    cfg = dict(params.pop("index"))
    path = resolve_path(cfg.pop("path"))
    if not path.endswith(".npz"):
        path += ".npz"
    dims = int(cfg.pop("dimensions", 512))
    skip = bool(cfg.pop("skip_if_exists", True))
    assert not cfg, f"Unused index params: {sorted(cfg)}"

    if skip and os.path.exists(path):
        idx = RetrievalIndex.load(path)
        return ({"path": path, "count": len(idx), "status": "skipped"},)

    names = list(data[0]) if data else []
    infer_params = {"network": params.pop("network"),
                    "data": params.pop("data", {}),
                    "output": {"type": "embedding", "dimensions": dims}}
    assert not params, f"Unused build_index params: {sorted(params)}"
    (meta,) = infer(infer_params, (names,))

    rows = np.asarray(meta["vecs"]).T  # (N, D), in `names` order
    keep = ~np.isnan(rows).any(axis=1)
    # the sink reports the ACTUAL descriptor dim (e.g. resnet backbones are
    # 2048-D regardless of the configured default) — index by what the model
    # produced, not the config
    if len(names) and rows.shape[1] != dims:
        dims = rows.shape[1]
    index = RetrievalIndex(dims)
    if keep.any():
        index.add([n for n, k in zip(names, keep) if k], rows[keep])
    index.save(path)
    return ({"path": path, "count": int(keep.sum()),
             "failed": int((~keep).sum())},)
