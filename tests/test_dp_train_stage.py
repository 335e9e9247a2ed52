"""Scenario-driven data parallelism: build_gan_experiment shards the train
step over the 8-device CPU mesh by default (SURVEY §2.11 — DP first-class)
and matches the single-device step."""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.scenarios.build import build_gan_experiment


def _scenario(parallel):
    return {
        "network": {
            "type": "NetworkSet",
            "generator_X": {"model": {"architecture": "official_resnet_generator",
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
                "parallel": parallel,
                "criterion": {"loss": "multihead_loss",
                              "weights": {"adversarial": 1, "edge": 5}},
                "optimizer": {n: {"algorithm": "adam", "lr": 2e-4,
                                  "beta1": 0.5}
                              for n in ("generator_X", "discriminator_Y")},
                "scheduler": {},
                "epoch_iteration": {"type": "SupervisedHEDGANEpoch",
                                    "data": "train", "criterion": "default"},
            },
        },
    }


def _run_one(parallel, batch=8):
    exp = build_gan_experiment(_scenario(parallel), sample_hw=16,
                               batch_size=batch, data_override={})
    rng = jax.random.PRNGKey(1)
    real_X = jax.random.uniform(rng, (batch, 16, 16, 3)) * 2 - 1
    real_Y = jax.random.uniform(jax.random.PRNGKey(2), (batch, 16, 16, 3)) * 2 - 1
    state, metrics, _ = exp["step"](exp["state"], real_X, real_Y)
    return state, {k: float(v) for k, v in metrics.items()}


def test_dp_default_shards_and_matches_single_device():
    assert len(jax.devices()) == 8
    state_dp, m_dp = _run_one(parallel=True)
    state_sd, m_sd = _run_one(parallel=False)
    for k in m_sd:
        np.testing.assert_allclose(m_dp[k], m_sd[k], rtol=1e-4, atol=1e-5), k
    # parallel state is laid out across the mesh
    leaf = jax.tree_util.tree_leaves(
        state_dp.variables["generator_X"]["params"])[0]
    assert len(leaf.sharding.device_set) == 8
    # updated params agree within one Adam step (2*lr bound): the psum's
    # f32 reduction order perturbs near-zero gradients, and the normalized
    # Adam update amplifies that up to a full sign flip on exactly-cancelling
    # elements (the losses above match at rtol 1e-4 — the models agree)
    for a, b in zip(
            jax.tree_util.tree_leaves(state_dp.variables["generator_X"]["params"]),
            jax.tree_util.tree_leaves(state_sd.variables["generator_X"]["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4.5e-4)


def test_dp_disabled_on_indivisible_batch(recwarn):
    state, metrics = _run_one(parallel=True, batch=6)  # 6 % 8 != 0 -> single
    assert np.isfinite(metrics["total"])


def test_dp_step_accepts_host_resumed_state():
    """A checkpoint-resumed state arrives as host numpy arrays; the DP step
    replicates it on entry."""
    exp = build_gan_experiment(_scenario(parallel=True), sample_hw=16,
                               batch_size=8, data_override={})
    host_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, exp["state"])
    rng = jax.random.PRNGKey(3)
    real_X = jax.random.uniform(rng, (8, 16, 16, 3)) * 2 - 1
    real_Y = jax.random.uniform(jax.random.PRNGKey(4), (8, 16, 16, 3)) * 2 - 1
    state, metrics, _ = exp["step"](host_state, real_X, real_Y)
    assert np.isfinite(float(metrics["total"]))


def test_detector_optimizer_gets_hed_param_groups(monkeypatch):
    """build_gan_experiment must hand the HED per-layer lr/decay multiplier
    tables (reference hed.py:86-112 via network.py:66-72) to the detector's
    optimizer, and keep the p2p nets flat."""
    from gandtr_tpu.scenarios import build as B

    captured = {}
    real = B.initialize_optimizer

    def spy(params, group_mults=None):
        captured[len(captured)] = group_mults
        return real(params, group_mults=group_mults)

    scenario = _scenario(parallel=False)
    tr = scenario["learning"]["training"]
    tr["epoch_iteration"]["type"] = "SupervisedHEDNGANEpoch"
    tr["criterion"]["weights"]["hed"] = 1
    tr["optimizer"]["detector"] = {"algorithm": "adam", "lr": 1e-6,
                                   "beta1": 0.9, "weight_decay": 2e-4}
    scenario["network"]["detector_frozen"] = {
        "model": {"architecture": "hed_interpolation", "width_mult": 0.0625},
        "runtime": {"frozen": True, "wrappers": "", "data": {}}}

    monkeypatch.setattr(B, "initialize_optimizer", spy)
    B.build_gan_experiment(scenario, sample_hw=16, batch_size=2,
                           data_override={})
    # build iterates the optimizer config in insertion order
    by_net = dict(zip(list(tr["optimizer"]), captured.values()))
    assert by_net["generator_X"] is None
    assert by_net["discriminator_Y"] is None
    lr, wd = by_net["detector"]
    assert lr["vgg5_0"]["conv"]["kernel"] == 100.0
    assert lr["score1"]["conv"]["bias"] == 0.02
    assert wd["fusion"]["conv"]["bias"] == 0.0
