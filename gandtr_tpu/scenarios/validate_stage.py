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
                                          CirtorchWhiten, multiscale_msp)
from gandtr_tpu.eval.retrieval import (configdataset, ShapeCachedExtractor,
                                       evaluate_dataset)


def validate(params, data):
    # fixed stage seed like the reference (stages/validate.py:18-19)
    np.random.seed(0)
    from gandtr_tpu.data import transforms as _T
    _T.seed_transforms(0)
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
                # shared reference rule (wrapper.py:249-252): plain GeM nets
                # only — NOT mere gem_p presence (a whitened/regional model
                # still carries gem_p but aggregates with msp=1)
                # effective model cfg: for path-only configs the model was
                # rebuilt from the checkpoint's network_params (_load_network)
                msp = multiscale_msp(getattr(model, "loaded_model_cfg", None)
                                     or net_cfg.get("model"), variables)
    model.wrappers_eval = eval_wrappers

    # transform defaults come from the network's own data params — for
    # checkpoint-loaded nets, the CHECKPOINT's runtime data (reference
    # validation.py:36 net_defaults merge into cirdatasetap); the published
    # eval pipeline as the last resort
    net_defaults = model.data_params if isinstance(model.data_params, dict) \
        else {}
    tf_str = data_cfg.get("transforms",
                          net_defaults.get(
                              "transforms",
                              "pil2np | apply_clahe:1.0 | totensor | normalize"))
    mean_std = data_cfg.get("mean_std",
                            net_defaults.get(
                                "mean_std",
                                [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]))
    transform = initialize_transforms(tf_str, mean_std)
    image_size = int(data_cfg.get("image_size", 1024))

    # Fused device preprocessing (default on): ship the decoded uint8 image
    # and run CLAHE + normalize inside the extraction graph — 4x less
    # host->device transfer and no separate per-image CLAHE dispatch, with
    # bit-identical descriptors (the CLAHE ops are cv2-bit-exact on device).
    device_pre = None
    if data_cfg.get("device_preprocess", True):
        from gandtr_tpu.data.transforms import split_device_transform
        host_tf, device_pre = split_device_transform(tf_str, mean_std)
        if device_pre is not None:
            transform = host_tf

    def pre(x, mask=None):
        if device_pre is None:
            return x
        xf = x.astype(jnp.float32)
        if x.dtype == jnp.uint8:
            xf = xf / 255.0
        return device_pre(xf, mask) if mask is not None else device_pre(xf)

    # `shape_bucket` pads images up to multiples with per-layer re-masking
    # (ops/maskprop.py): descriptors EQUAL the exact-shape protocol (incl.
    # CLAHE geometry and multiscale resize, per-image valid rectangles) with
    # far fewer compiled graphs — one per bucket instead of per aspect ratio.
    shape_bucket = data_cfg.get("shape_bucket")
    batch_size = int((data_cfg.get("loader") or {}).get("batch_size", 1))
    # data-parallel extraction over all local devices (round-robin async
    # dispatch — extraction is embarrassingly parallel across images)
    devices = None
    if data_cfg.get("parallel_extract", True) and len(jax.local_devices()) > 1:
        devices = jax.local_devices()

    if shape_bucket:
        def forward(v, x, mask):
            return model.apply(v, pre(x, mask), train=False,
                               ctx={"msp": msp}, mask=mask)

        extractor = ShapeCachedExtractor(forward, variables,
                                         shape_bucket=int(shape_bucket),
                                         devices=devices)
    else:
        def forward(v, x):
            return model.apply(v, pre(x), train=False, ctx={"msp": msp})

        extractor = ShapeCachedExtractor(forward, variables, devices=devices)

    metadata = {}
    # effective-config snapshot: record the bucket mode so compared/resumed
    # runs can't silently mix bucketed and exact-shape extraction (they are
    # numerically equal, but the record keeps provenance auditable)
    metadata["config:data.shape_bucket"] = (
        int(shape_bucket) if shape_bucket else None)
    dir_main = resolve_path(val_cfg.get("dir_main", "data/test"))
    # two accepted validation forms: the simplified {dir_main, datasets}
    # list, and the reference's MultiCriterialValidation tree of
    # SingleValidation entries with cirdatasetap criteria (parameters/
    # eval.yml in the reference repo — per-dataset image_size in the
    # criterion, optim/score/cirscore.py:38-45)
    plan = []  # (name, dataset, image_size)
    for ds in (val_cfg.get("datasets") or ()):
        plan.append((ds, ds, image_size))
    if not plan:
        for key, sub in val_cfg.items():
            if not isinstance(sub, dict):
                continue
            crit = dict(sub.get("criterion") or {})
            if crit.get("type", "cirdatasetap") != "cirdatasetap":
                raise NotImplementedError(
                    "validation criterion %r" % crit.get("type"))
            plan.append((key, crit.get("dataset", key),
                         int(crit.get("image_size", image_size))))
        if not plan:
            plan = [(ds, ds, image_size) for ds in val_cfg
                    if isinstance(ds, str)
                    and ds not in ("type", "dir_main", "datasets",
                                   "decisive_criterion")]
    for name, ds, imsize in plan:
        cfg = configdataset(ds, dir_main)
        metrics, _, _, _ = evaluate_dataset(extractor, cfg, imsize,
                                            transform, batch_size=batch_size)
        for mk, mv in metrics.items():
            metadata[f"{name}/validation/score_avg:{mk}"] = mv
        print(">> %s: %s" % (ds, {k: round(100 * v, 2) for k, v in metrics.items()}))
    return (
        {"metadata": {"validation": metadata}},
    )
