"""Round-2 refresh: ResNet-101 GeM descriptor throughput @1024² (the other
published backbone) and the HED^N-GAN train step at batch 10 @256².
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def bench_loop(make_fn, args, iters, reps=3):
    loop = jax.jit(make_fn(iters))
    assert np.isfinite(float(loop(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def r101():
    from gandtr_tpu.models.retrieval import GemRetrievalNet
    model = GemRetrievalNet(architecture="resnet101", pooling="gem")
    for B in (2, 4, 8):
        x = jax.random.uniform(jax.random.PRNGKey(0), (B, 1024, 1024, 3),
                               jnp.float32)
        v = model.init(jax.random.PRNGKey(1), x[:1])

        def mk(iters):
            def fn(vv, z):
                def body(i, acc):
                    y = model.apply(vv, z + i.astype(z.dtype) * 1e-4)
                    return acc + jnp.sum(y.astype(jnp.float32))
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            return fn
        best = bench_loop(mk, (v, x), 10)
        print(f"r101 gem batch {B}: {best*1e3:.2f} ms -> {B/best:.1f} img/s",
              flush=True)


def train_step():
    from gandtr_tpu.learning.network import build_model_set
    from gandtr_tpu.learning.optimizers import initialize_optimizer
    from gandtr_tpu.learning import gan_steps

    hed = {"model": {"architecture": "hed_interpolation"},
           "runtime": {"wrappers": "rgb2bgr_pre", "data": {},
                       "dtype": "bfloat16"}}
    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture": "official_resnet_generator",
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
        ms.nets, optimizers, {"adversarial": 1, "edge": 5, "hed": 1})

    X = jax.random.uniform(jax.random.PRNGKey(1), (B, hw, hw, 3)) * 2 - 1
    Y = jax.random.uniform(jax.random.PRNGKey(2), (B, hw, hw, 3)) * 2 - 1

    @jax.jit
    def loop(st, x, y):
        def body(i, s):
            s2, _, _ = step(s, x + i.astype(x.dtype) * 1e-5, y)
            return s2
        out = jax.lax.fori_loop(0, 5, body, st)
        # reduce over updated weights: WITHOUT this the whole training
        # computation is dead code (fetching only out.step measured 4.8 ms)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(
                       out.variables["generator_X"]["params"]))

    assert np.isfinite(float(loop(state, X, Y)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(state, X, Y))
        best = min(best, (time.perf_counter() - t0) / 5)
    print(f"hedngan train step b10 bf16: {best*1e3:.1f} ms -> {B/best:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    r101()
    train_step()
