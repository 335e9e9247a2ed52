"""Scenario stage: export a trained network as an AOT serving artifact.

No reference counterpart — the reference deploys live torch.hub checkpoints
(mdir/hub/model.py); this stage is the TPU-native deployment step, chaining
after `train` in a scenario (network.path can be a `${train...}` checkpoint
reference) and producing a `serving.load_artifact`-loadable directory.

Config::

    export_serving:
      __function__: gandtr_tpu.stages.export
      network: {model: {...}, path: <checkpoint>}     # infer-stage loader
      export:
        directory: <artifact dir>
        image_hw: [256, 256]
        batch_buckets: [1, 4, 8]       # default
        from_uint8: true               # fuse device preprocess (default)
        with_mask: false               # masked-GeM aspect-preserving input
        kind: null                     # override embedding/generator detect
"""
from gandtr_tpu.utils.io import resolve_path


def export(params, data):
    from gandtr_tpu.hub import HubModel
    from gandtr_tpu.scenarios.infer_stage import _load_network
    from gandtr_tpu.serving.export import export_hub_model

    params = dict(params)
    net, variables = _load_network(params.pop("network"))
    cfg = dict(params.pop("export"))
    assert not params, f"Unused export-stage params: {sorted(params)}"

    directory = resolve_path(cfg.pop("directory"))
    image_hw = tuple(cfg.pop("image_hw"))
    model = HubModel(net, variables, transform=None,
                     meta=dict(net.meta or {}))
    meta = export_hub_model(
        model, directory, image_hw,
        batch_buckets=tuple(cfg.pop("batch_buckets", (1, 4, 8))),
        from_uint8=bool(cfg.pop("from_uint8", True)),
        with_mask=bool(cfg.pop("with_mask", False)),
        platforms=cfg.pop("platforms", None),
        kind=cfg.pop("kind", None))
    assert not cfg, f"Unused export params: {sorted(cfg)}"
    return ({"directory": directory, "kind": meta["kind"],
             "batch_buckets": meta["batch_buckets"],
             "image_hw": meta["image_hw"]},)
