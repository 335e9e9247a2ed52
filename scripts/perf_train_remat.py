"""Remat ablation on the HED^N-GAN train step (batch 10 @256² bf16).

Hypothesis test: XLA cost_analysis reports 7.09 TFLOP + 92.7 GB "bytes
accessed" per step (143 ms measured). If the step were residual-traffic
bound, jax.checkpoint around the big forwards (generator VJP, HED student
applies) would trade spare MXU FLOPs for HBM traffic. Calibration on the
known generator-inference graph suggests the bytes counter overcounts ~3-4x
(counts intra-fusion operands), so the prior is "no win" — measure anyway:
the train step is the production cost center.

Variants:
  base        — gan_steps.build_hedngan_step as shipped
  remat_g     — jax.checkpoint around the generator forward (recompute the
                whole G graph during the G-step backward instead of saving
                residuals across the D/E steps)
  remat_ge    — remat_g + jax.checkpoint around the HED student applies in
                the distillation loss

MEASURED ON CHIP (2026-08-20): base 142.7 ms (70.1 img/s), remat_g 159.3 ms,
remat_ge 182.3 ms — remat LOSES; the step is not residual-traffic bound at
batch 10. REJECTED (docs/PERF.md "train-step refresh" section).
"""
import sys
import os
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build(remat_g=False, remat_e=False):
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

    class Remat:
        """Delegate WrappedNet with jax.checkpoint around apply (kwargs are
        static via closure; only variables+input are checkpoint operands)."""

        def __init__(self, inner):
            self._inner = inner

        def has_batch_stats(self, variables):
            return self._inner.has_batch_stats(variables)

        def apply(self, var, x, **kw):
            def fwd(v, z):
                return self._inner.apply(v, z, **kw)

            return jax.checkpoint(fwd)(var, x)

    nets = dict(ms.nets)
    if remat_g:
        nets["generator_X"] = Remat(nets["generator_X"])
    if remat_e:
        nets["detector"] = Remat(nets["detector"])

    state = gan_steps.make_gan_state(variables, optimizers)
    step = gan_steps.build_hedngan_step(
        nets, optimizers, {"adversarial": 1, "edge": 5, "hed": 1})
    X = jax.random.uniform(jax.random.PRNGKey(1), (B, hw, hw, 3)) * 2 - 1
    Y = jax.random.uniform(jax.random.PRNGKey(2), (B, hw, hw, 3)) * 2 - 1
    return step, state, X, Y, B


def measure(step, state, X, Y, B, iters=5, reps=3):
    @jax.jit
    def loop(st, x, y):
        def body(i, s):
            s2, _, _ = step(s, x + i.astype(x.dtype) * 1e-5, y)
            return s2
        out = jax.lax.fori_loop(0, iters, body, st)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(
                       out.variables["generator_X"]["params"]))

    assert np.isfinite(float(loop(state, X, Y)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(state, X, Y))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    for name, kw in (("base", {}),
                     ("remat_g", {"remat_g": True}),
                     ("remat_ge", {"remat_g": True, "remat_e": True})):
        step, state, X, Y, B = build(**kw)
        best = measure(step, state, X, Y, B)
        print(f"hedngan step {name:9s}: {best*1e3:6.1f} ms -> "
              f"{B/best:5.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
