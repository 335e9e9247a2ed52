"""Determinism: identical seeds reproduce identical training trajectories
(the reference's determinism hooks, SURVEY.md §4 — fixed stage seeds,
per-epoch derived seeds)."""
import os

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp
import pytest

from gandtr_tpu.data.datasets import RandomDomainsPairDataset, Loader
from gandtr_tpu.data.transforms import initialize_transforms
from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.events import initialize_processor
from gandtr_tpu.learning.training import Training


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("det_ims")
    rng = np.random.RandomState(0)
    names = []
    for i in range(6):
        n = f"i{i}.jpg"
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(d / n)
        names.append(n)
    return str(d), names


def run_once(imgdir, names, seed):
    tf = initialize_transforms("pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
                               [[0.5] * 3, [0.5] * 3])
    ds = RandomDomainsPairDataset([], tf, names[:3], names[3:], imgdir + "/*",
                                  size=4)
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True,
                    num_workers=1, seed=seed)
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture": "official_resnet_generator",
                                     "ngf": 4, "n_blocks": 1,
                                     "norm_layer": "instance"},
                           "runtime": {"wrappers": "", "data": {}}},
           "discriminator_Y": {"model": {"architecture": "official_p2p_discriminator",
                                         "ndf": 4, "n_layers": 2,
                                         "norm_layer": "instance"},
                               "runtime": {"wrappers": "", "data": {}}},
           "detector": {"model": {"architecture": "hed_interpolation",
                                  "width_mult": 0.0625},
                        "runtime": {"wrappers": "", "data": {}}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = ms.init_all(jax.random.PRNGKey(seed), {n: x0 for n in ms.nets})
    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y")}
    state = gan_steps.make_gan_state(variables, optimizers, seed=seed)
    step = jax.jit(gan_steps.build_hedgan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5}))
    events = initialize_processor({})
    training = Training(step_fn=step, loader=loader, epochs=2, seed=seed,
                        events=events,
                        batch_to_args=lambda b: (jnp.asarray(b[0]),
                                                 jnp.asarray(b[1])))
    training.run(state)
    return [h["metrics"] for h in events.history]


def test_same_seed_same_trajectory(imgdir):
    d, names = imgdir
    a = run_once(d, names, seed=7)
    b = run_once(d, names, seed=7)
    assert len(a) == len(b) == 2
    for ma, mb in zip(a, b):
        for k in ma:
            np.testing.assert_allclose(ma[k], mb[k], rtol=1e-6,
                                       err_msg=k)


def test_different_seed_differs(imgdir):
    d, names = imgdir
    a = run_once(d, names, seed=7)
    c = run_once(d, names, seed=8)
    diffs = [abs(a[0][k] - c[0].get(k, 0)) for k in a[0]]
    assert max(diffs) > 1e-6
