"""Frozen-teacher target cache (round 4, opt-in): content-keyed, exact.

The published iccv23 protocol cannot hit this cache (RandomDomainsPair
re-samples indices every epoch + random scalecrop — domain_datasets.py:44-46),
so it is opt-in for deterministic pipelines. These tests pin: (a) cached
trajectories equal uncached ones on repeating batches, (b) hit/miss
accounting and recompute-on-content-change, (c) the build_gan_experiment
config wiring including data parallelism."""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.teacher_cache import TeacherTargetCachingStep


def _tiny_setup():
    hed_cfg = {"model": {"architecture": "hed_interpolation",
                         "width_mult": 0.0625},
               "runtime": {"wrappers": "", "data": {}}}
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture":
                                     "official_resnet_generator",
                                     "ngf": 4, "n_blocks": 1,
                                     "norm_layer": "instance"},
                           "runtime": {"wrappers": "", "data": {}}},
           "discriminator_Y": {"model": {"architecture":
                                         "official_p2p_discriminator",
                                         "ndf": 4, "n_layers": 2,
                                         "norm_layer": "instance"},
                               "runtime": {"wrappers": "", "data": {}}},
           "detector": dict(hed_cfg),
           "detector_frozen": {**hed_cfg,
                               "runtime": {"frozen": True, "wrappers": "",
                                           "data": {}}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((2, 16, 16, 3))
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    variables["detector_frozen"] = variables["detector"]
    # SGD everywhere: Adam's first-step g/|g| normalization amplifies
    # float-level graph differences chaotically (see
    # test_multistep_golden.TestConcatStudentEquality docstring)
    sgd = {"algorithm": "sgd", "lr": 1e-3, "momentum": 0.0,
           "weight_decay": 0.0}
    optimizers = {n: initialize_optimizer(dict(sgd))[0]
                  for n in ("generator_X", "discriminator_Y", "detector")}
    weights = {"adversarial": 1, "edge": 5, "hed": 1}
    return ms, variables, optimizers, weights


def test_cached_trajectory_equals_uncached():
    ms, variables, optimizers, weights = _tiny_setup()
    plain = jax.jit(gan_steps.build_hedngan_step(ms.nets, optimizers, weights))
    internal = jax.jit(gan_steps.build_hedngan_step(
        ms.nets, optimizers, weights, emit_targets=True))
    external = jax.jit(gan_steps.build_hedngan_step(
        ms.nets, optimizers, weights, external_targets=True))
    cached = TeacherTargetCachingStep(internal, external)

    rng = np.random.RandomState(4)
    batches = [(rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1,
                rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1)
               for _ in range(2)]

    s_plain = gan_steps.make_gan_state(variables, optimizers)
    s_cache = gan_steps.make_gan_state(variables, optimizers)
    for epoch in range(3):
        for xb, yb in batches:
            s_plain, m_plain, d_plain = plain(
                s_plain, jnp.asarray(xb), jnp.asarray(yb))
            args = cached.batch_to_args((xb, yb))
            s_cache, m_cache, d_cache = cached(s_cache, *args)
            for k in m_plain:
                np.testing.assert_allclose(
                    np.asarray(m_cache[k]), np.asarray(m_plain[k]),
                    atol=1e-5, err_msg="metric %s epoch %d" % (k, epoch))
            assert "target_M" not in d_cache  # popped before blob rendering
    assert cached.misses == 2 and cached.hits == 4
    for a, b in zip(jax.tree_util.tree_leaves(s_plain.variables),
                    jax.tree_util.tree_leaves(s_cache.variables)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_content_change_recomputes():
    ms, variables, optimizers, weights = _tiny_setup()
    internal = jax.jit(gan_steps.build_hedngan_step(
        ms.nets, optimizers, weights, emit_targets=True))
    external = jax.jit(gan_steps.build_hedngan_step(
        ms.nets, optimizers, weights, external_targets=True))
    cached = TeacherTargetCachingStep(internal, external, max_items=1)
    state = gan_steps.make_gan_state(variables, optimizers)
    rng = np.random.RandomState(1)
    xb = rng.rand(2, 16, 16, 3).astype(np.float32)
    yb = rng.rand(2, 16, 16, 3).astype(np.float32)
    state, _, _ = cached(state, *cached.batch_to_args((xb, yb)))
    # same content -> hit; any changed pixel -> miss (content-keyed)
    state, _, _ = cached(state, *cached.batch_to_args((xb, yb)))
    xb2 = xb.copy()
    xb2[0, 0, 0, 0] += 1e-3
    state, _, _ = cached(state, *cached.batch_to_args((xb2, yb)))
    assert cached.hits == 1 and cached.misses == 2
    # max_items=1: the first key was evicted by the second
    state, _, _ = cached(state, *cached.batch_to_args((xb, yb)))
    assert cached.misses == 3


def test_build_experiment_wires_cache():
    from gandtr_tpu.scenarios.build import build_gan_experiment
    scenario = {
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
            "detector_frozen": {"model": {"architecture": "hed_interpolation",
                                          "width_mult": 0.0625},
                                "runtime": {"frozen": True, "wrappers": "",
                                            "data": {}}},
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
                "parallel": True,
                "criterion": {"loss": "multihead_loss",
                              "weights": {"adversarial": 1, "edge": 5,
                                          "hed": 1}},
                "optimizer": {n: {"algorithm": "adam", "lr": 2e-4,
                                  "beta1": 0.5}
                              for n in ("generator_X", "discriminator_Y",
                                        "detector")},
                "scheduler": {},
                "epoch_iteration": {"type": "SupervisedHEDNGANEpoch",
                                    "data": "train", "criterion": "default",
                                    "cache_teacher_targets": True},
            },
        },
    }
    exp = build_gan_experiment(scenario, sample_hw=16, batch_size=8,
                               data_override={})
    from gandtr_tpu.learning.teacher_cache import TeacherTargetCachingStep
    assert isinstance(exp["step"], TeacherTargetCachingStep)
    cached = exp["step"]
    rng = np.random.RandomState(2)
    xb = rng.rand(8, 16, 16, 3).astype(np.float32)
    yb = rng.rand(8, 16, 16, 3).astype(np.float32)
    st = exp["state"]
    for _ in range(2):  # second call hits; dp-sharded external step runs
        st, metrics, _ = cached(st, *cached.batch_to_args((xb, yb)))
        assert np.isfinite(float(metrics["total"]))
    assert cached.hits == 1 and cached.misses == 1
