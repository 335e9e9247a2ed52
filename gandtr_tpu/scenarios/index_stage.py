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
        pq:                        # optional: product-quantized index
          m: 16                    # bytes per vector (D % m == 0)
          ksub: 256                # centroids per subspace (<= 256)
          rerank: 0                # exact re-rank depth (keeps f32 on host)
          train_size: 25600        # training subsample
          iters: 25
          opq_iters: 0             # > 0: learn the OPQ rotation (recall+)

Image names arrive on stdin like the infer stage. Failed images (NaN
descriptor rows, output.py:143-146) are dropped from the index.
"""
import os

import numpy as np

from gandtr_tpu.utils.io import resolve_path


def build_index(params, data):
    from gandtr_tpu.scenarios.infer_stage import infer
    from gandtr_tpu.serving.index import RetrievalIndex
    from gandtr_tpu.serving import load_index

    params = dict(params)
    cfg = dict(params.pop("index"))
    path = resolve_path(cfg.pop("path"))
    if not path.endswith(".npz"):
        path += ".npz"
    dims = int(cfg.pop("dimensions", 512))
    skip = bool(cfg.pop("skip_if_exists", True))
    pq_cfg = cfg.pop("pq", None)
    assert not cfg, f"Unused index params: {sorted(cfg)}"

    if skip and os.path.exists(path):
        idx = load_index(path)
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
    if pq_cfg is not None:
        from gandtr_tpu.serving.pq import PQRetrievalIndex
        pq_cfg = dict(pq_cfg)
        train_size = int(pq_cfg.pop("train_size", 25600))
        iters = int(pq_cfg.pop("iters", 25))
        opq_iters = int(pq_cfg.pop("opq_iters", 0))
        index = PQRetrievalIndex(dims, m=int(pq_cfg.pop("m", 16)),
                                 ksub=int(pq_cfg.pop("ksub", 256)),
                                 rerank=int(pq_cfg.pop("rerank", 0)))
        assert not pq_cfg, f"Unused pq params: {sorted(pq_cfg)}"
        if keep.any():
            train = rows[keep]
            if train.shape[0] > train_size:
                sel = np.random.RandomState(0).permutation(
                    train.shape[0])[:train_size]
                train = train[sel]
            index.fit(train, iters=iters, opq_iters=opq_iters)
    else:
        index = RetrievalIndex(dims)
    if keep.any():
        index.add([n for n, k in zip(names, keep) if k], rows[keep])
    index.save(path)
    return ({"path": path, "count": int(keep.sum()),
             "failed": int((~keep).sum())},)
