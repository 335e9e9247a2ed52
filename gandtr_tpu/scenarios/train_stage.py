"""Train stage: `(params, data) -> (metadata,)`.

Counterpart of /root/reference/mdir/stages/train.py:12-47: builds the learning
from the scenario section, resumes from the latest epoch if present, runs the
epoch loop and returns the learning metadata. Dispatches on the network type:
NetworkSet → GAN families, CirSequentialNetwork → GeM fine-tune.
"""
import os

from gandtr_tpu.utils.io import resolve_path


def train(params, data):
    params = dict(params)
    # debug flag -> jax.debug_nans (the reference's autograd-anomaly analog,
    # training.py:31-33)
    if params.get("learning", {}).get("training", {}).get("debug"):
        import jax
        jax.config.update("jax_debug_nans", True)
    net_type = params.get("network", {}).get("type", "NetworkSet")
    if net_type == "NetworkSet":
        return _train_gan(params)
    if net_type in ("CirSequentialNetwork", "SequentialNetwork"):
        return _train_finetune(params)
    raise NotImplementedError("network type %s" % net_type)


def _train_gan(params):
    from gandtr_tpu.scenarios.build import build_gan_experiment

    directory = resolve_path(
        params.get("learning", {}).get("checkpoints", {}).get("directory"))
    sample_hw = int(params.pop("sample_hw", 256))
    exp = build_gan_experiment(params, sample_hw=sample_hw, directory=directory)

    training = exp["training"]
    if training is None:
        raise ValueError("train stage needs a data.train section")
    state, start_epoch = training.resume_or_start(exp["state"])
    if _notrain(training, state, start_epoch):
        return ({},)
    state = training.run(state, start_epoch=start_epoch)

    events = exp["events"]
    return (_stage_metadata(events, directory),)


def _train_finetune(params):
    from gandtr_tpu.scenarios.finetune_build import build_finetune_experiment

    directory = resolve_path(
        params.get("learning", {}).get("checkpoints", {}).get("directory"))
    exp = build_finetune_experiment(params, directory=directory)
    training = exp["training"]
    state, start_epoch = training.resume_or_start(exp["state"])
    if _notrain(training, state, start_epoch):
        return ({},)
    state = training.run(state, start_epoch=start_epoch)
    return (_stage_metadata(exp["events"], directory),)


def _notrain(training, state, start_epoch):
    """`epochs: 0` saves the off-the-shelf networks as `_notrain` shortcuts
    and skips the loop entirely, returning empty stage metadata (reference
    stages/train.py:17-20 + checkpoints.py:42-56)."""
    if training.epochs > 0 or start_epoch > 1:
        return False
    if training.checkpoints:
        training.checkpoints.save_notrain(dict(state.variables))
    return True


def _stage_metadata(events, directory):
    """Stage metadata like the reference's learning metadata property
    (learning.py:76-81): metrics + best_epoch + resources + code version.
    `metrics_series` carries the per-epoch value lists like the reference's
    `events.metadata.metadata()` (eventprocessor metadata keeper) — the
    last-epoch scalars stay under `metrics` for existing consumers."""
    from gandtr_tpu.utils.stats import CodeVersion, ResourceUsage
    series = {}
    for key, by_epoch in getattr(events.metadata, "metrics", {}).items():
        if isinstance(by_epoch, dict) and by_epoch:
            series[key] = [by_epoch[e] for e in sorted(by_epoch)]
    # "metrics" merges the last-epoch flat scalars (our original contract)
    # with the REFERENCE's metadata() key forms carrying per-epoch series
    # ("train/learning/loss:total_avg.4": [...]) so reference report
    # consumers read our stage metadata drop-in (eventprocessor.py:119-120;
    # key-form equality is asserted in the cross-engine oracles). The key
    # families cannot collide: ref_metadata() skips entries whose ref-form
    # equals the original key (once-per-epoch scores), so every key it adds
    # carries ':'+suffix and the flat last-epoch scalars stay floats.
    metrics = dict(events.history[-1]["metrics"] if events.history else {})
    if hasattr(events, "ref_metadata"):
        metrics.update(events.ref_metadata())
    return {"metrics": metrics,
            "metrics_series": series,
            "best_epoch": events.metadata.best_epoch(),
            "resource_usage": ResourceUsage().snapshot(),
            "code_version": CodeVersion().snapshot(),
            "directory": directory}
