"""conv_wfold (transpose-free W-phase fold) on the hot few-channel convs.

VGG16 @1024² batch 4 bf16: conv1_2 64->64 naive is 11.5 ms (~14% MXU).
Generator @256² batch 24: head conv7 3->64 naive 1.35 ms.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.ops import fastconv as fc
from gandtr_tpu.ops.norm import instance_norm
from gandtr_tpu.models.layers import pad2d


def timeit(fn, args, iters=20, reps=3):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            pert = (a[0] + i.astype(a[0].dtype) * jnp.asarray(1e-4, a[0].dtype),) + a[1:]
            y = fn(*pert)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    assert np.isfinite(float(loop(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    # VGG conv1_2 64->64 @1024² b4
    x = jax.random.uniform(rng, (4, 1024, 1024, 64), jnp.float32).astype(bf)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.05).astype(bf)
    fl = timeit(lambda a: a, (x,))
    print(f"floor 1024x64: {fl:.3f}", flush=True)

    def naive(z):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            z, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"conv1_2 naive+relu      : {timeit(naive, (x,)) - fl:.3f} ms", flush=True)

    def wfold(z, f=2):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.nn.relu(fc.conv_wfold(zp, k, f))
    print(f"conv1_2 wfold f=2 +relu : {timeit(wfold, (x,)) - fl:.3f} ms", flush=True)
    print(f"conv1_2 wfold f=4 +relu : {timeit(lambda z: wfold(z, 4), (x,)) - fl:.3f} ms", flush=True)

    def chain_naive(z):
        return nn.max_pool(naive(z), (2, 2), strides=(2, 2))
    def chain_wfold(z):
        return nn.max_pool(wfold(z), (2, 2), strides=(2, 2))
    print(f"conv1_2+pool naive      : {timeit(chain_naive, (x,)) - fl:.3f} ms", flush=True)
    print(f"conv1_2+pool wfold      : {timeit(chain_wfold, (x,)) - fl:.3f} ms", flush=True)

    # conv1_1 3->64 @1024² (fold 16 -> 48-ch contraction)
    x3 = jax.random.uniform(rng, (4, 1024, 1024, 3), jnp.float32).astype(bf)
    k13 = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 64)) * 0.05).astype(bf)
    fl3 = timeit(lambda a: a, (x3,))
    print(f"floor 1024x3: {fl3:.3f}", flush=True)
    def c11(z):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            z, k13, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    print(f"conv1_1 naive           : {timeit(c11, (x3,)) - fl3:.3f} ms", flush=True)
    for f in (8, 16, 32):
        def cw(z, f=f):
            zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return jax.nn.relu(fc.conv_wfold(zp, k13, f))
        print(f"conv1_1 wfold f={f:<3d}     : {timeit(cw, (x3,)) - fl3:.3f} ms", flush=True)

    # generator head conv7 3->64 @256² b24 (+IN+relu epilogue)
    g = (jax.random.uniform(rng, (24, 256, 256, 3)) * 2 - 1).astype(bf)
    k7 = (jax.random.normal(jax.random.PRNGKey(3), (7, 7, 3, 64)) * 0.1).astype(bf)
    flg = timeit(lambda a: a, (g,))
    print(f"floor 256x3 b24: {flg:.3f}", flush=True)
    def hnaive(z):
        return jax.nn.relu(instance_norm(jax.lax.conv_general_dilated(
            pad2d(z, 3, "reflect"), k7, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))))
    print(f"head naive+IN+relu      : {timeit(hnaive, (g,)) - flg:.3f} ms", flush=True)
    for f in (8, 16):
        def hw(z, f=f):
            return jax.nn.relu(instance_norm(
                fc.conv_wfold(pad2d(z, 3, "reflect"), k7, f)))
        print(f"head wfold f={f:<2d}+IN+relu : {timeit(hw, (g,)) - flg:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
