"""Mixed precision: bf16 compute with f32 master params in the GAN step."""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps


def test_hedgan_step_bf16_compute():
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture": "official_resnet_generator",
                                     "ngf": 8, "n_blocks": 1,
                                     "norm_layer": "instance"},
                           "runtime": {"wrappers": "", "data": {},
                                       "dtype": "bfloat16"}},
           "discriminator_Y": {"model": {"architecture": "official_p2p_discriminator",
                                         "ndf": 8, "n_layers": 2,
                                         "norm_layer": "instance"},
                               "runtime": {"wrappers": "", "data": {},
                                           "dtype": "bfloat16"}},
           "detector": {"model": {"architecture": "hed_interpolation",
                                  "width_mult": 0.0625},
                        "runtime": {"wrappers": "", "data": {},
                                    "dtype": "bfloat16"}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y")}
    state = gan_steps.make_gan_state(variables, optimizers)
    step = jax.jit(gan_steps.build_hedgan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5}))
    rX = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    rY = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3)) * 2 - 1
    new_state, metrics, _ = step(state, rX, rY)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # master params stayed f32 and moved
    leaves = jax.tree_util.tree_leaves(
        new_state.variables["generator_X"]["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.variables["generator_X"]["params"],
        new_state.variables["generator_X"]["params"])))
    assert delta > 0
