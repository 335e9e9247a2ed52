"""Serving: AOT model export (jax.export / StableHLO) + batching services.

The reference deploys by loading torch .pth checkpoints into a live torch
process via torch.hub (hubconf.py, mdir/hub/model.py) — there is no
ahead-of-time serving artifact and no server. The TPU-native production
path adds both:

- `serving.export` — serialize the jitted forward (weights baked) as a
  portable StableHLO artifact; a serving process runs it without the model
  zoo, flax module tree, or checkpoint importer.
- `serving.service` — micro-batching request service + a stdlib HTTP
  server (JPEG/PNG in, descriptors or translated images out) using the
  native C++ decode pipeline.
"""
import numpy as _np

from gandtr_tpu.serving.export import (  # noqa: F401
    export_hub_model, load_artifact, Servable)
from gandtr_tpu.serving.index import RetrievalIndex  # noqa: F401
from gandtr_tpu.serving.pq import PQRetrievalIndex  # noqa: F401
from gandtr_tpu.serving.service import (  # noqa: F401
    BatchingService, serve_http)


def load_index(path, devices=None):
    """Load a saved index, dispatching on its kind (exact vs PQ) by the
    arrays present in the .npz — both formats are pickle-free."""
    p = path if str(path).endswith(".npz") else str(path) + ".npz"
    with _np.load(p) as z:
        is_pq = "codes" in z.files
    cls = PQRetrievalIndex if is_pq else RetrievalIndex
    return cls.load(p, devices=devices)
