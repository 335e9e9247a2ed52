"""Micro-train through the reference's ACTUAL parameter YAMLs.

The compatibility claim is not just "reference YAMLs parse" — a reference
user's train configs must DRIVE our builders. These tests load the
reference's own iccv23/parameters/train_*.yml (with their _gan_data.yml
template), override only sizes/paths/epochs (the knobs a user tunes anyway),
and run one real optimization epoch through the scenario train stage.

Reference: mdir/examples/iccv23/parameters/train_{cyclegan,cut,hedngan}.yml.
"""
import glob
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from gandtr_tpu.scenarios import engine
from gandtr_tpu.scenarios.train_stage import train

_REF = "/root/reference/mdir/examples/iccv23/parameters"

needs_reference = pytest.mark.skipif(not os.path.isdir(_REF),
                                     reason="reference tree not mounted")


@pytest.fixture(scope="module")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("refcfg")
    rng = np.random.RandomState(0)
    (d / "ims").mkdir()
    names = []
    for i in range(4):
        n = "i%d.jpg" % i
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)
                        ).save(d / "ims" / n)
        names.append(n)
    (d / "day.txt").write_text("\n".join(names[:2]))
    (d / "night.txt").write_text("\n".join(names[2:]))
    (d / "val").mkdir()
    Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                    ).save(d / "val" / "v0.jpg")
    return d


def _load_reference_params(name):
    with open(os.path.join(_REF, name)) as f:
        params = yaml.safe_load(f)
    return engine.load_nested_templates(params, _REF)


def _shrink(params, datadir, tmp_path, extra=()):
    """Size/path/epoch overrides — the kind of keys a user tunes anyway."""
    overrides = {
        "data.train.dataset.dataset_X": str(datadir / "day.txt"),
        "data.train.dataset.dataset_Y": str(datadir / "night.txt"),
        "data.train.dataset.image_dir": str(datadir / "ims") + "/*",
        "data.train.dataset.size": 2,
        "data.train.loader.batch_size": 2,
        "data.train.transforms": "pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
        "learning.checkpoints.directory": str(tmp_path / "exp"),
        "learning.training.epochs": 1,
        "learning.training.scheduler.generator_X.n_epochs_decay": 1,
        "learning.training.scheduler.discriminator_Y.n_epochs_decay": 1,
        "network.generator_X.model.ngf": 4,
        "network.generator_X.model.n_blocks": 1,
        "network.discriminator_Y.model.ndf": 4,
        "network.discriminator_Y.model.n_layers": 2,
        # visual validation images (reference default data/val/day_night)
        "learning.validation.visual.criterion.data.dataset.image_dir":
            str(datadir / "val"),
        "learning.validation.visual.criterion.data.transforms":
            "pil2np | downscale:32 | totensor | normalize",
    }
    overrides.update(dict(extra))
    for key, value in overrides.items():
        engine.deep_set(params, key.split("."), value)
    params["sample_hw"] = 32
    return params


def _finite(metadata):
    (meta,) = metadata
    metrics = meta.get("metadata", meta).get("metrics", {})
    vals = [v for v in metrics.values() if isinstance(v, float)]
    assert vals, metrics
    assert all(np.isfinite(v) for v in vals), metrics


@needs_reference
def test_reference_hedngan_config_trains(datadir, tmp_path):
    params = _load_reference_params("train_hedngan.yml")
    params = _shrink(params, datadir, tmp_path, extra={
        "learning.training.scheduler.detector.n_epochs_decay": 1,
        "network.detector.model.pretrained": None,
        "network.detector.model.width_mult": 0.0625,
        "network.detector_frozen.model.pretrained": None,
        "network.detector_frozen.model.width_mult": 0.0625,
    })
    _finite(train(params, ()))
    assert glob.glob(str(tmp_path / "exp" / "epochs" / "*")), "no checkpoints"


@needs_reference
def test_reference_cyclegan_config_trains(datadir, tmp_path):
    params = _load_reference_params("train_cyclegan.yml")
    params = _shrink(params, datadir, tmp_path, extra={
        "network.generator_Y.model.ngf": 4,
        "network.generator_Y.model.n_blocks": 1,
        "network.discriminator_X.model.ndf": 4,
        "network.discriminator_X.model.n_layers": 2,
        "learning.training.scheduler.generator_Y.n_epochs_decay": 1,
        "learning.training.scheduler.discriminator_X.n_epochs_decay": 1,
    })
    _finite(train(params, ()))


@needs_reference
def test_reference_cut_config_trains(datadir, tmp_path):
    params = _load_reference_params("train_cut.yml")
    params = _shrink(params, datadir, tmp_path, extra={
        "learning.training.scheduler.featdown.n_epochs_decay": 1,
        "learning.training.criterion.nce.num_patches": 16,
    })
    _finite(train(params, ()))


@needs_reference
def test_unsupported_loss_type_refused(datadir, tmp_path):
    params = _load_reference_params("train_hedngan.yml")
    params = _shrink(params, datadir, tmp_path, extra={
        "network.detector.model.pretrained": None,
        "network.detector.model.width_mult": 0.0625,
        "network.detector_frozen.model.pretrained": None,
        "network.detector_frozen.model.width_mult": 0.0625,
        "learning.training.criterion.adversarial.criterion.loss": "bce",
    })
    with pytest.raises(NotImplementedError, match="bce"):
        train(params, ())
