"""Smoke + behavior tests for the jitted GAN train steps (tiny configs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.image_pool import init_pool, pool_query


ADAM = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999,
        "weight_decay": 0}


def tiny_gen(norm="instance"):
    return {"type": "SingleNetwork",
            "model": {"architecture": "official_resnet_generator", "ngf": 8,
                      "n_blocks": 1, "norm_layer": norm,
                      "no_antialias": True, "no_antialias_up": True},
            "runtime": {"wrappers": "", "data": {}}}


def tiny_disc(norm="instance"):
    return {"type": "SingleNetwork",
            "model": {"architecture": "official_p2p_discriminator", "ndf": 8,
                      "n_layers": 2, "norm_layer": norm},
            "runtime": {"wrappers": "", "data": {}}}


def param_delta(a, b):
    return max(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x, y: float(jnp.abs(x - y).max()), a, b)))


class TestImagePool:
    def test_fill_then_replace(self):
        pool = init_pool(4, (8, 8, 3))
        rng = jax.random.PRNGKey(0)
        imgs = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        pool, out = pool_query(pool, imgs, rng)
        # buffer not full: inputs returned and inserted
        np.testing.assert_allclose(out, imgs)
        assert int(pool.count) == 2
        pool, out = pool_query(pool, imgs + 100, jax.random.PRNGKey(1))
        assert int(pool.count) == 4
        # now full: queries may return history
        pool2, out2 = pool_query(pool, imgs + 999, jax.random.PRNGKey(2))
        assert int(pool2.count) == 4
        assert out2.shape == imgs.shape


def build_models(cfg):
    ms, specs = build_model_set(cfg)
    return ms


class TestHedGanFamilies:
    def _setup(self, family):
        cfg = {"type": "NetworkSet",
               "generator_X": tiny_gen("batch"),
               "discriminator_Y": tiny_disc("batch")}
        if family in ("hedgan", "hedngan"):
            hed = {"type": "SingleNetwork",
                   "model": {"architecture": "hed_interpolation", "width_mult": 0.0625},
                   "runtime": {"wrappers": "rgb2bgr_pre", "data": {}}}
            cfg["detector"] = hed
            if family == "hedngan":
                cfg["detector_frozen"] = {**hed, "runtime": {"frozen": True,
                                          "wrappers": "rgb2bgr_pre", "data": {}}}
        ms, _ = build_model_set(cfg)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 3))
        sample = {name: x for name in ms.nets}
        variables = ms.init_all(rng, sample)
        if family == "hedngan":
            # teacher initialized from the student weights (reference loads the
            # same pretrained checkpoint into both)
            variables["detector_frozen"] = variables["detector"]
        names = [n for n in ("generator_X", "discriminator_Y", "detector") if n in ms.nets]
        optimizers = {n: initialize_optimizer(dict(ADAM))[0] for n in names}
        state = gan_steps.make_gan_state(variables, optimizers)
        return ms, optimizers, state

    @pytest.mark.parametrize("family", ["hedgan", "hedngan"])
    def test_step_runs_and_updates(self, family):
        ms, optimizers, state = self._setup(family)
        build = (gan_steps.build_hedgan_step if family == "hedgan"
                 else gan_steps.build_hedngan_step)
        step = jax.jit(build(ms.nets, optimizers,
                             {"adversarial": 1, "edge": 5, "hed": 1}))
        rng = jax.random.PRNGKey(1)
        real_X = jax.random.uniform(rng, (2, 32, 32, 3)) * 2 - 1
        real_Y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1

        new_state, metrics, debug = step(state, real_X, real_Y)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # G and D moved
        assert param_delta(state.variables["generator_X"]["params"],
                           new_state.variables["generator_X"]["params"]) > 0
        assert param_delta(state.variables["discriminator_Y"]["params"],
                           new_state.variables["discriminator_Y"]["params"]) > 0
        if family == "hedngan":
            assert param_delta(state.variables["detector"]["params"],
                               new_state.variables["detector"]["params"]) > 0
            # frozen teacher untouched
            assert param_delta(state.variables["detector_frozen"]["params"],
                               new_state.variables["detector_frozen"]["params"]) == 0
        # BN stats updated
        assert param_delta(state.variables["generator_X"]["batch_stats"],
                           new_state.variables["generator_X"]["batch_stats"]) > 0
        # second step composes
        new_state2, metrics2, _ = step(new_state, real_X, real_Y)
        assert int(new_state2.step) == 2


class TestCutStep:
    def test_step_runs(self):
        cfg = {"type": "NetworkSet",
               "generator_X": tiny_gen("instance"),
               "discriminator_Y": tiny_disc("instance"),
               "featdown": {"type": "SingleNetwork",
                            "model": {"architecture": "official_p2p_mlp", "nc": 16},
                            "runtime": {"wrappers": "", "data": {}}}}
        ms, _ = build_model_set(cfg)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 3))
        nce_layers = (0, 4)
        # featdown init needs the generator's tapped features
        gvar = ms["generator_X"].init(rng, x)
        feats = ms["generator_X"].apply(gvar, x, train=False,
                                        layers=nce_layers, encode_only=True)
        variables = {
            "generator_X": dict(gvar),
            "discriminator_Y": dict(ms["discriminator_Y"].init(rng, x)),
            "featdown": dict(ms["featdown"].module.init(
                rng, feats, num_patches=16, rng=rng)),
        }
        optimizers = {n: initialize_optimizer(dict(ADAM))[0]
                      for n in ("generator_X", "discriminator_Y", "featdown")}
        state = gan_steps.make_gan_state(variables, optimizers)
        step = jax.jit(gan_steps.build_cut_step(
            ms.nets, optimizers, {"adversarial": 1, "identity": 10},
            nce_layers=nce_layers, num_patches=16))
        real_X = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
        real_Y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
        new_state, metrics, debug = step(state, real_X, real_Y)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert param_delta(state.variables["featdown"]["params"],
                           new_state.variables["featdown"]["params"]) > 0

    def test_nce_weight_scales_squared(self):
        """Reference quirk (cut_epochs.py:60-66): the nce criterion weight is
        applied per-layer inside MultilayerPatchNCELoss AND again as the
        outer w_nce factor — G_nce must scale by weight^2 (w_idt by weight).
        Regression for the review finding (was weight^1)."""
        cfg = {"type": "NetworkSet",
               "generator_X": tiny_gen("instance"),
               "discriminator_Y": tiny_disc("instance"),
               "featdown": {"type": "SingleNetwork",
                            "model": {"architecture": "official_p2p_mlp", "nc": 16},
                            "runtime": {"wrappers": "", "data": {}}}}
        ms, _ = build_model_set(cfg)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 3))
        nce_layers = (0, 4)
        gvar = ms["generator_X"].init(rng, x)
        feats = ms["generator_X"].apply(gvar, x, train=False,
                                        layers=nce_layers, encode_only=True)
        variables = {
            "generator_X": dict(gvar),
            "discriminator_Y": dict(ms["discriminator_Y"].init(rng, x)),
            "featdown": dict(ms["featdown"].module.init(
                rng, feats, num_patches=16, rng=rng)),
        }
        optimizers = {n: initialize_optimizer(dict(ADAM))[0]
                      for n in ("generator_X", "discriminator_Y", "featdown")}
        ids = [np.arange(16), np.arange(16)]
        real_X = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
        real_Y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1

        def g_nce_at(w):
            # identity weight 0 isolates the pure nce term
            state = gan_steps.make_gan_state(variables, optimizers)
            step = jax.jit(gan_steps.build_cut_step(
                ms.nets, optimizers, {"adversarial": 1, "identity": 0},
                nce_layers=nce_layers, num_patches=16, nce_weight=w,
                fixed_patch_ids=ids))
            _, metrics, _ = step(state, real_X, real_Y)
            return float(metrics["G_nce"])

        base, double = g_nce_at(1.0), g_nce_at(2.0)
        np.testing.assert_allclose(double, 4.0 * base, rtol=1e-4)


class TestCycleGanStep:
    def test_step_runs(self):
        cfg = {"type": "NetworkSet",
               "generator_X": tiny_gen("instance"),
               "generator_Y": tiny_gen("instance"),
               "discriminator_X": tiny_disc("instance"),
               "discriminator_Y": tiny_disc("instance")}
        ms, _ = build_model_set(cfg)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 3))
        variables = ms.init_all(rng, {n: x for n in ms.nets})
        optimizers = {n: initialize_optimizer(dict(ADAM))[0] for n in ms.nets}
        pools = {"fake_X_pool": init_pool(4, (32, 32, 3)),
                 "fake_Y_pool": init_pool(4, (32, 32, 3))}
        state = gan_steps.make_gan_state(variables, optimizers, pools)
        step = jax.jit(gan_steps.build_cyclegan_step(
            ms.nets, optimizers,
            {"adversarial": 1, "cycle": 10}, {"adversarial": 1, "cycle": 10}))
        real_X = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
        real_Y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
        new_state, metrics, debug = step(state, real_X, real_Y)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert int(new_state.pools["fake_X_pool"].count) == 2
        for n in ms.nets:
            assert param_delta(state.variables[n]["params"],
                               new_state.variables[n]["params"]) > 0, n
