"""Validate stage: retrieval evaluation of a descriptor network.

Counterpart of /root/reference/mdir/stages/validate.py:15-39 +
optim/score/cirscore.py: loads the embedding network (with eval-time whitening
+ multiscale wrappers), evaluates each configured test dataset (roxford5k /
rparis6k / 247tokyo1k) and returns per-metric metadata.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.utils.io import resolve_path, load_pickle
from gandtr_tpu.data.transforms import initialize_transforms
from gandtr_tpu.learning.wrappers import (CirMultiscaleAggregation,
                                          CirtorchWhiten)
from gandtr_tpu.eval.retrieval import (configdataset, ShapeCachedExtractor,
                                       evaluate_dataset)


def validate(params, data):
    params = dict(params)
    net_cfg = dict(params.pop("network"))
    val_cfg = dict(params.pop("validation"))
    data_cfg = dict(params.pop("data", {}))
    params.pop("output", None)

    from gandtr_tpu.scenarios.infer_stage import _load_network

    runtime = net_cfg.pop("runtime", {}) or {}
    model, variables = _load_network(net_cfg)

    # eval wrappers: 0_cirwhiten + 1_cirmultiscale (eval.yml:8-12)
    wrappers_cfg = (runtime.get("wrappers") or {})
    eval_wrappers = []
    msp = 1.0
    if isinstance(wrappers_cfg, dict):
        for key in sorted(wrappers_cfg.get("eval", {})):
            cfg = dict(wrappers_cfg["eval"][key] or {})
            if key.endswith("cirwhiten"):
                lw = load_pickle(resolve_path(cfg["whitening"]))
                eval_wrappers.append(CirtorchWhiten(
                    P=lw["P"], m=lw["m"], dimensions=cfg.get("dimensions")))
            elif key.endswith("cirmultiscale"):
                eval_wrappers.append(CirMultiscaleAggregation(
                    scales=cfg.get("scales", True)))
                if "params" in variables and "gem_p" in variables["params"]:
                    msp = float(np.asarray(variables["params"]["gem_p"])[0])
    model.wrappers_eval = eval_wrappers

    transform = initialize_transforms(
        data_cfg.get("transforms", "pil2np | apply_clahe:1.0 | totensor | normalize"),
        data_cfg.get("mean_std", [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]))
    image_size = int(data_cfg.get("image_size", 1024))

    def forward(v, x):
        return model.apply(v, x, train=False, ctx={"msp": msp})

    extractor = ShapeCachedExtractor(forward, variables)

    metadata = {}
    datasets = val_cfg.get("datasets") or list(val_cfg.keys())
    dir_main = resolve_path(val_cfg.get("dir_main", "data/test"))
    for ds in datasets:
        if not isinstance(ds, str) or ds in ("type", "dir_main", "datasets"):
            continue
        cfg = configdataset(ds, dir_main)
        metrics, _, _, _ = evaluate_dataset(extractor, cfg, image_size, transform)
        for mk, mv in metrics.items():
            metadata[f"{ds}/validation/score_avg:{mk.replace('map_', 'map_') if mk != 'map' else 'map'}"] = mv
        print(">> %s: %s" % (ds, {k: round(100 * v, 2) for k, v in metrics.items()}))
    return (
        {"metadata": {"validation": metadata}},
    )
