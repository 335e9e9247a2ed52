"""Opt-in device-side scalecrop staging (round-5): uint8 crops at the host
chain's exact RNG draws + in-graph /255+bilinear+normalize vs the host
`pil2np | scalecrop | totensor | normalize` path.

NOT bit-exact by design: the in-graph resize evaluates cv2's INTER_LINEAR
formula in a different fp order (~1e-7 rel) — the differentials here pin
(a) the resize op against cv2's float path directly and (b) a micro GAN
train's loss stream/params across modes (SGD per the Adam ulp-flip rule).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gandtr_tpu.ops.resize import dynamic_bilinear_resize_u8

cv2 = pytest.importorskip("cv2")


def test_dynamic_resize_matches_cv2_float_path():
    rng = np.random.RandomState(0)
    pad, oh, ow = 40, 32, 32
    for _ in range(12):
        h = int(rng.randint(32, pad + 1))
        w = int(rng.randint(32, pad + 1))
        crop = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        buf = np.zeros((pad, pad, 3), np.uint8)
        buf[:h, :w] = crop
        ours = np.asarray(dynamic_bilinear_resize_u8(
            jnp.asarray(buf[None]), jnp.asarray([[h, w]], np.int32), oh, ow))[0]
        want = cv2.resize(crop.astype(np.float32) / 255.0, (ow, oh))
        np.testing.assert_allclose(ours, want, atol=2e-6, rtol=1e-5)


def test_identity_size_is_exact():
    """h == out: src coords are integers, frac 0 — the resize must be the
    identity bit-exactly (the host __call__ passes through unresized)."""
    rng = np.random.RandomState(1)
    crop = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = np.zeros((40, 40, 3), np.uint8)
    buf[:32, :32] = crop
    ours = np.asarray(dynamic_bilinear_resize_u8(
        jnp.asarray(buf[None]), jnp.asarray([[32, 32]], np.int32), 32, 32))[0]
    np.testing.assert_array_equal(ours, crop.astype(np.float32) / 255.0)


@pytest.fixture(scope="module")
def pair_corpus(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("dsc")
    rng = np.random.RandomState(3)
    names = {"day": [], "night": []}
    for dom, base in (("day", 170), ("night", 60)):
        for i in range(4):
            h, w = int(rng.randint(40, 64)), int(rng.randint(40, 64))
            arr = np.clip(base + rng.randn(h, w, 3) * 40, 0,
                          255).astype(np.uint8)
            n = "%s%d.png" % (dom, i)
            Image.fromarray(arr).save(os.path.join(str(d), n))
            names[dom].append(n)
    return str(d), names


def _scenario(root, names, device_scalecrop):
    return {
        "network": {
            "type": "NetworkSet",
            "generator_X": {"model": {"architecture":
                                      "official_resnet_generator",
                                      "ngf": 4, "n_blocks": 1,
                                      "norm_layer": "instance"},
                            "initialize": {"weights": "kaiming_p2p",
                                           "seed": 1},
                            "runtime": {"wrappers": "", "data": {
                                "transforms": "pil2np | totensor | normalize",
                                "mean_std": [[0.5] * 3, [0.5] * 3]}}},
            "detector": {"model": {"architecture": "hed_interpolation",
                                   "width_mult": 0.0625},
                         "initialize": {"weights": "normal", "seed": 2},
                         "runtime": {"wrappers": "", "data": {}}},
            "discriminator_Y": {"model": {"architecture":
                                          "official_p2p_discriminator",
                                          "ndf": 4, "n_layers": 2,
                                          "norm_layer": "instance"},
                                "initialize": {"weights": "kaiming_p2p",
                                               "seed": 3},
                                "runtime": {"wrappers": "", "data": {}}},
        },
        "learning": {
            "checkpoints": {},
            "training": {
                "type": "EpochTraining", "epochs": 1, "seed": 0,
                "parallel": False,
                "criterion": {"loss": "multihead_loss",
                              "weights": {"adversarial": 1, "edge": 5}},
                # SGD: device/host resize is a float-level variant pair and
                # Adam amplifies ulp grad noise into ±lr flips (CLAUDE.md)
                "optimizer": {n: {"algorithm": "sgd", "lr": 1e-3}
                              for n in ("generator_X", "discriminator_Y")},
                "scheduler": {},
                "epoch_iteration": {"type": "SupervisedHEDGANEpoch",
                                    "data": "train", "criterion": "default"},
            },
        },
        "data": {"train": {
            "device_scalecrop": device_scalecrop,
            "dataset": {"name": "RandomDomainsPair",
                        "dataset_X": names["day"],
                        "dataset_Y": names["night"],
                        "image_dir": root, "size": 4},
            "loader": {"batch_size": 2, "num_workers": 1},
            "transforms": "pil2np | scalecrop:32_32:0.8_1 | totensor | "
                          "normalize",
            "mean_std": [[0.5] * 3, [0.5] * 3]}},
    }


def test_device_scalecrop_train_equivalence(pair_corpus):
    """Same seed, same images: the device-staged epoch must reproduce the
    host epoch's loss stream and (SGD) params to float-variant tolerance —
    identical crops/draws, only the resize arithmetic differs."""
    from gandtr_tpu.scenarios.build import build_gan_experiment
    root, names = pair_corpus
    runs = {}
    for dev in (False, True):
        exp = build_gan_experiment(_scenario(root, names, dev), sample_hw=32)
        if dev:
            from gandtr_tpu.data.transforms import DeviceScalecrop
            assert isinstance(exp["loader"].dataset.transform,
                              DeviceScalecrop)
        state = exp["training"].run(exp["state"])
        runs[dev] = (state, exp["events"].history)
    s0, h0 = runs[False]
    s1, h1 = runs[True]
    assert h0 and h1
    for k, v in h0[-1]["metrics"].items():
        np.testing.assert_allclose(h1[-1]["metrics"][k], v, rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    d = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s0.variables["generator_X"]["params"],
        s1.variables["generator_X"]["params"])))
    assert d < 1e-5, d
