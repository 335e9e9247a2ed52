"""RCF-GAN / RCF^N-GAN scenario coverage (reference iccv23/train/rcfgan.yml,
rcfngan.yml): template expansion with dotted-key overrides, RCF wrapper chain
semantics, and a one-step train with the RCF detector in the graph."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.scenarios.engine import load_yaml_scenario
from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "gandtr_tpu",
                       "scenarios", "configs", "iccv23", "train")

RCF_WRAPPERS = ("meanstd_pre:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                "[[0.0,0.0,0.0],[1.0,1.0,1.0]],rgb2bgr_pre,"
                "meanstd_pre:[[0.0,0.0,0.0],[255.0,255.0,255.0]]:"
                "[[104.00698793,116.66876762,122.67891434],[1.0,1.0,1.0]]")


def test_rcfgan_scenario_expands():
    sc = load_yaml_scenario([os.path.join(CONFIGS, "rcfgan.yml")])
    step = sc["train"]["1_train_augment"]
    net = step["network"]
    assert net["detector"]["model"]["architecture"] == "rcf"
    assert "rcf_bsds500_pascal" in net["detector"]["model"]["pretrained"]
    assert net["detector"]["runtime"]["wrappers"].startswith("meanstd_pre")
    # rcfgan inherits the HED-GAN iteration (no student distillation)
    assert step["learning"]["training"]["epoch_iteration"]["type"] == \
        "SupervisedHEDGANEpoch"
    assert net.get("detector_frozen") is None


def test_rcfngan_scenario_expands():
    sc = load_yaml_scenario([os.path.join(CONFIGS, "rcfngan.yml")])
    step = sc["train"]["1_train_augment"]
    net = step["network"]
    assert net["detector"]["model"]["architecture"] == "rcf"
    assert net["detector_frozen"]["model"]["architecture"] == "rcf"
    assert net["detector_frozen"]["runtime"]["frozen"] is True
    assert step["learning"]["training"]["epoch_iteration"]["type"] == \
        "SupervisedHEDNGANEpoch"


def test_rcf_wrapper_chain_produces_caffe_bgr():
    """The detector wrapper chain maps generator-space [-1,1] RGB to caffe
    BGR-mean-subtracted 0..255 input (reference rcfgan.yml wrapper string)."""
    from gandtr_tpu.learning.wrappers import initialize_wrappers, apply_wrapped
    w = initialize_wrappers(RCF_WRAPPERS)
    x = jnp.full((1, 2, 2, 3), 0.25)
    y = np.asarray(apply_wrapped(w, lambda t: t, x, None))
    v = (0.25 * 0.5 + 0.5) * 255.0  # unnormalize then scale
    exp = np.array([v - 104.00698793, v - 116.66876762, v - 122.67891434])
    np.testing.assert_allclose(y[0, 0, 0], exp, rtol=1e-5)


def test_rcfgan_one_step_with_rcf_detector():
    """One jitted HED-GAN-family step with the real RCF detector in-graph."""
    cfg = {"type": "NetworkSet",
           "generator_X": {"type": "SingleNetwork",
                           "model": {"architecture": "official_resnet_generator",
                                     "ngf": 8, "n_blocks": 1,
                                     "norm_layer": "batch",
                                     "no_antialias": True,
                                     "no_antialias_up": True},
                           "runtime": {"wrappers": "", "data": {}}},
           "discriminator_Y": {"type": "SingleNetwork",
                               "model": {"architecture":
                                         "official_p2p_discriminator",
                                         "ndf": 8, "n_layers": 2,
                                         "norm_layer": "batch"},
                               "runtime": {"wrappers": "", "data": {}}},
           "detector": {"type": "SingleNetwork",
                        "model": {"architecture": "rcf"},
                        "runtime": {"wrappers": RCF_WRAPPERS, "data": {}}}}
    ms, _ = build_model_set(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    variables = ms.init_all(rng, {n: x for n in ms.nets})
    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999,
            "weight_decay": 0}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y", "detector")}
    state = gan_steps.make_gan_state(variables, optimizers)
    step = jax.jit(gan_steps.build_hedgan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5}))
    real_X = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    real_Y = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 2 - 1
    new_state, metrics, _ = step(state, real_X, real_Y)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    g0 = state.variables["generator_X"]["params"]
    g1 = new_state.variables["generator_X"]["params"]
    delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g0, g1)))
    assert delta > 0
