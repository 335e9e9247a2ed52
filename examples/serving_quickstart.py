#!/usr/bin/env python
"""Serving quickstart: export -> index -> HTTP image-to-image search.

Builds a GeM-VGG16 embedding model, exports it as an AOT StableHLO artifact,
indexes a few synthetic images (exact or product-quantized), starts the
batching HTTP server, and answers a `:search` query — all local, no
downloads, a couple of minutes on CPU. The same script runs unchanged on a
TPU chip.

    python examples/serving_quickstart.py [--workdir DIR] [--pq] [--cpu]

In production you would load trained weights via `gandtr_tpu.hub`
(pretrained=True) or the `export` scenario stage instead of random init;
see docs/SERVING.md for the full surface (sharded export, masks, buckets).
"""
import argparse
import io
import json
import os
import sys
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/gandtr_serving_quickstart")
    ap.add_argument("--pq", action="store_true",
                    help="use the product-quantized index (+OPQ rotation)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gandtr_tpu.hub import HubModel
    from gandtr_tpu.learning.network import WrappedNet
    from gandtr_tpu.models.retrieval import GemRetrievalNet
    from gandtr_tpu.serving import (export_hub_model, load_artifact,
                                    serve_http, RetrievalIndex,
                                    PQRetrievalIndex)

    os.makedirs(args.workdir, exist_ok=True)
    hw = 64

    # --- 1. a hub-shaped embedding model (random init for the demo) ---
    module = GemRetrievalNet(architecture="vgg16", pooling="gem")
    variables = dict(module.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, hw, hw, 3), jnp.float32)))
    net = WrappedNet(module=module, meta=module.meta,
                     data_params={"transforms": "pil2np | totensor | normalize",
                                  "mean_std": [[0.485, 0.456, 0.406],
                                               [0.229, 0.224, 0.225]]})
    model = HubModel(net, variables, transform=None, meta=dict(module.meta))

    # --- 2. AOT export (uint8 in, device preprocessing baked) ---
    path = os.path.join(args.workdir, "embed")
    export_hub_model(model, path, (hw, hw), batch_buckets=(1, 4),
                     from_uint8=True)
    servable = load_artifact(path)
    print("exported artifact:", path)

    # --- 3. index a synthetic database ---
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (hw, hw, 3), np.uint8) for _ in range(12)]
    descs = np.concatenate([np.asarray(servable(im[None])) for im in imgs])
    dim = descs.shape[1]
    if args.pq:
        index = PQRetrievalIndex(dim, m=16, ksub=12, rerank=8)
        index.fit(descs, opq_iters=4)
    else:
        index = RetrievalIndex(dim)
    index.add(["img%d" % i for i in range(len(imgs))], descs)
    index.save(os.path.join(args.workdir, "index.npz"))
    print("indexed %d images (%s)" % (len(index), type(index).__name__))

    # --- 4. HTTP serving + an image->image search request ---
    srv = serve_http({"embed": servable}, port=0, max_wait_ms=1.0,
                     block=False, indices={"embed": index})
    try:
        host, port = srv.server_address
        buf = io.BytesIO()
        np.save(buf, imgs[3])
        req = urllib.request.Request(
            "http://%s:%d/v1/models/embed:search?k=3" % (host, port),
            data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with urllib.request.urlopen(req) as r:
            results = json.load(r)["results"]
        print("top-3 for img3:", results)
        assert results[0]["name"] == "img3", results
        assert abs(results[0]["score"] - 1.0) < 1e-3
        print("OK: self-match at rank 1")
    finally:
        srv.shutdown()
        for e in srv.models.values():
            e.batcher.close()


if __name__ == "__main__":
    main()
