"""A/B the HED^N-GAN train step with separate vs concat-batched student
forwards in the E substep (round-4 lever: same math, batch-2N VGG convs).

Harness mirrors bench.py::bench_train_step (fori_loop in ONE jit, weight-sum
fetch as the barrier — tunnel timing rules, CLAUDE.md)."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def build(concat, external=False):
    from gandtr_tpu.learning.network import build_model_set
    from gandtr_tpu.learning.optimizers import initialize_optimizer
    from gandtr_tpu.learning import gan_steps

    hed = {"model": {"architecture": "hed_interpolation"},
           "runtime": {"wrappers": "rgb2bgr_pre", "data": {},
                       "dtype": "bfloat16"}}
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture":
                                     "official_resnet_generator",
                                     "n_blocks": 9, "norm_layer": "batch",
                                     "no_antialias": True,
                                     "no_antialias_up": True},
                           "runtime": {"wrappers": "", "data": {},
                                       "dtype": "bfloat16"}},
           "detector": dict(hed),
           "detector_frozen": {**hed, "runtime": {**hed["runtime"],
                                                  "frozen": True}},
           "discriminator_Y": {"model": {"architecture":
                                         "official_p2p_discriminator",
                                         "norm_layer": "batch"},
                               "runtime": {"wrappers": "", "data": {},
                                           "dtype": "bfloat16"}}}
    ms, _ = build_model_set(cfg)
    B, hw = 10, 256
    x0 = jnp.zeros((B, hw, hw, 3), jnp.float32)
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    variables["detector_frozen"] = variables["detector"]
    adam = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers = {n: initialize_optimizer(dict(adam))[0]
                  for n in ("generator_X", "discriminator_Y", "detector")}
    state = gan_steps.make_gan_state(variables, optimizers)
    step = gan_steps.build_hedngan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5, "hed": 1},
        concat_student=concat, external_targets=external)
    return step, state, B, hw


def time_form(concat, external=False, iters=10):
    step, state, B, hw = build(concat, external)
    X = jax.random.uniform(jax.random.PRNGKey(1), (B, hw, hw, 3)) * 2 - 1
    Y = jax.random.uniform(jax.random.PRNGKey(2), (B, hw, hw, 3)) * 2 - 1
    ext = ((jnp.zeros((B, hw, hw, 1)),) if external else ())

    @jax.jit
    def timed_loop(st, x, y):
        def body(i, s):
            s2, _, _ = step(s, x + i.astype(x.dtype) * 1e-5, y, *ext)
            return s2
        out = jax.lax.fori_loop(0, iters, body, st)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(
                       out.variables["generator_X"]["params"]))

    t0 = time.time()
    assert np.isfinite(float(timed_loop(state, X, Y)))
    print("  compile+first: %.1fs" % (time.time() - t0), flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed_loop(state, X, Y))
        best = min(best, (time.perf_counter() - t0) / iters)
    print("  concat=%s external=%s: %.1f ms/step  (%.1f img/s)" %
          (concat, external, best * 1e3, B / best), flush=True)
    return best


if __name__ == "__main__":
    import sys
    print("devices:", jax.devices(), flush=True)
    if "--external-only" in sys.argv:
        t_ext = time_form(False, external=True)
        t_both = time_form(True, external=True)
    else:
        t_sep = time_form(False)
        t_cat = time_form(True)
        t_ext = time_form(False, external=True)
        t_both = time_form(True, external=True)
        print("separate %.1f ms  concat %.1f ms  speedup %.2fx" %
              (t_sep * 1e3, t_cat * 1e3, t_sep / t_cat), flush=True)
    print("external-target (cache steady-state): %.1f ms; +concat: %.1f ms"
          % (t_ext * 1e3, t_both * 1e3), flush=True)
