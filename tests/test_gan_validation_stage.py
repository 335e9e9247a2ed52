"""End-to-end GAN train with the validation section wired (the _gan_eval.yml
shape): visual validation blobs keyed by image stem, frequency gating, and
traindata sample blobs — through build_gan_experiment + Training.run, not
hand-built objects (reference train stage + validation.py + visual.py)."""
import os

import numpy as np
import pytest
from PIL import Image

from gandtr_tpu.scenarios.build import build_gan_experiment


@pytest.fixture(scope="module")
def gan_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ganval")
    imgdir = root / "ims"
    valdir = root / "val"
    imgdir.mkdir(), valdir.mkdir()
    rng = np.random.RandomState(0)
    names_x, names_y = [], []
    for i in range(4):
        n = "day%d.jpg" % i
        Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(
            imgdir / n)
        names_x.append(n)
        n = "night%d.jpg" % i
        Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(
            imgdir / n)
        names_y.append(n)
    (root / "day.txt").write_text("\n".join(names_x))
    (root / "night.txt").write_text("\n".join(names_y))
    for n in ("orloj.jpg", "tower.jpg"):
        Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(
            valdir / n)
    return root, imgdir, valdir


def _scenario(root, imgdir, valdir, frequency, exp_dir):
    return {
        "network": {
            "type": "NetworkSet",
            "generator_X": {"model": {"architecture":
                                      "official_resnet_generator",
                                      "ngf": 4, "n_blocks": 1,
                                      "norm_layer": "instance"},
                            "runtime": {"wrappers": "", "data": {
                                "transforms": "pil2np | totensor | normalize",
                                "mean_std": [[0.5] * 3, [0.5] * 3]}}},
            "detector": {"model": {"architecture": "hed_interpolation",
                                   "width_mult": 0.0625},
                         "runtime": {"wrappers": "", "data": {}}},
            "discriminator_Y": {"model": {"architecture":
                                          "official_p2p_discriminator",
                                          "ndf": 4, "n_layers": 2,
                                          "norm_layer": "instance"},
                                "runtime": {"wrappers": "", "data": {}}},
        },
        "learning": {
            "checkpoints": {},
            "training": {
                "type": "EpochTraining", "epochs": 1, "seed": 0,
                "parallel": False,
                "criterion": {"loss": "multihead_loss",
                              "weights": {"adversarial": 1, "edge": 5}},
                "optimizer": {n: {"algorithm": "adam", "lr": 2e-4,
                                  "beta1": 0.5}
                              for n in ("generator_X", "discriminator_Y")},
                "scheduler": {},
                "epoch_iteration": {"type": "SupervisedHEDGANEpoch",
                                    "data": "train", "criterion": "default"},
            },
            # the _gan_eval.yml shape (visual child of MultiCriterial)
            "validation": {
                "type": "MultiCriterialValidation",
                "decisive_criterion": "epoch",
                "visual": {
                    "type": "SingleValidation",
                    "frequency": frequency,
                    "criterion": {
                        "type": "visual",
                        "data": {
                            "dataset": {"name": "InferImageList",
                                        "image_dir": str(valdir)},
                            "transforms": "pil2np | totensor | normalize",
                            "mean_std": [[0.5] * 3, [0.5] * 3]}}},
            },
        },
        "output": {"learning": {"progress": {"print_each": 10}}},
        "data": {"train": {
            "dataset": {"name": "RandomDomainsPair",
                        "dataset_X": str(root / "day.txt"),
                        "dataset_Y": str(root / "night.txt"),
                        "image_dir": str(imgdir) + "/*",
                        "size": 2},
            "loader": {"batch_size": 2},
            "transforms": "pil2np | scalecrop:24_24:0.8_1 | totensor | normalize",
            "mean_std": [[0.5] * 3, [0.5] * 3],
        }},
    }


def _run(gan_dirs, tmp_path, frequency):
    root, imgdir, valdir = gan_dirs
    exp_dir = str(tmp_path / ("exp_f%s" % frequency))
    scenario = _scenario(root, imgdir, valdir, frequency, exp_dir)
    exp = build_gan_experiment(scenario, sample_hw=24, batch_size=2,
                               directory=exp_dir)
    exp["training"].run(exp["state"])
    blob_dir = os.path.join(exp_dir, "epochs", "blobs")
    return sorted(os.listdir(blob_dir)) if os.path.isdir(blob_dir) else []


def test_visual_validation_blobs_by_stem(gan_dirs, tmp_path):
    blobs = _run(gan_dirs, tmp_path, frequency=1)
    # visual validation outputs keyed by val image stem (visual.py:68-76)
    assert any("orloj" in b for b in blobs), blobs
    assert any("tower" in b for b in blobs), blobs
    # traindata samples from the hedgan debug dict incl. edge maps
    assert any(b.startswith("data_fake_Y_image0.rgb") for b in blobs), blobs
    assert any(b.startswith("data_fake_E_") for b in blobs), blobs


def test_visual_validation_frequency_gates(gan_dirs, tmp_path):
    # _gan_eval.yml ships frequency 5: a 1-epoch run logs NO visual blobs
    # (reference should_validate, validation.py:73-74)
    blobs = _run(gan_dirs, tmp_path, frequency=5)
    assert not any("orloj" in b for b in blobs), blobs
    # but the traindata samples (epoch 1) are still there
    assert any(b.startswith("data_real_X") for b in blobs), blobs
