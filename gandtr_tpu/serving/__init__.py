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
from gandtr_tpu.serving.export import (  # noqa: F401
    export_hub_model, load_artifact, Servable)
from gandtr_tpu.serving.index import RetrievalIndex  # noqa: F401
from gandtr_tpu.serving.service import (  # noqa: F401
    BatchingService, serve_http)
