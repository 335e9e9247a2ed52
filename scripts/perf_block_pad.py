"""How much do the per-block reflect pads cost? zero-pad vs reflect resblock
at batch 24, 64x64x256 bf16 — and conv-with-implicit-pad vs materialized pad.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.models.layers import pad2d
from gandtr_tpu.ops.norm import instance_norm


def timeit(fn, args, iters=30, reps=3):
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
    B = 24
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = (jax.random.uniform(rng, (B, 64, 64, 256)) * 2 - 1).astype(bf)
    k1 = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 256, 256)) * 0.05).astype(bf)
    k2 = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, 256, 256)) * 0.05).astype(bf)
    fl = timeit(lambda a: a, (x,))
    print(f"floor: {fl:.3f} ms", flush=True)

    def conv(z, k, pad_cfg):
        return jax.lax.conv_general_dilated(
            z, k, (1, 1), pad_cfg, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def block_reflect(z):
        h = conv(pad2d(z, 1, "reflect"), k1, "VALID")
        h = jax.nn.relu(instance_norm(h))
        h = conv(pad2d(h, 1, "reflect"), k2, "VALID")
        return z + instance_norm(h)

    def block_zero_implicit(z):
        h = conv(z, k1, [(1, 1), (1, 1)])
        h = jax.nn.relu(instance_norm(h))
        h = conv(h, k2, [(1, 1), (1, 1)])
        return z + instance_norm(h)

    def block_zero_materialized(z):
        h = conv(pad2d(z, 1, "zero"), k1, "VALID")
        h = jax.nn.relu(instance_norm(h))
        h = conv(pad2d(h, 1, "zero"), k2, "VALID")
        return z + instance_norm(h)

    def block_no_in(z):
        h = conv(pad2d(z, 1, "reflect"), k1, "VALID")
        h = jax.nn.relu(h)
        h = conv(pad2d(h, 1, "reflect"), k2, "VALID")
        return z + h

    print(f"block reflect (current)  : {timeit(block_reflect, (x,)) - fl:.3f} ms", flush=True)
    print(f"block zero implicit      : {timeit(block_zero_implicit, (x,)) - fl:.3f} ms", flush=True)
    print(f"block zero materialized  : {timeit(block_zero_materialized, (x,)) - fl:.3f} ms", flush=True)
    print(f"block reflect, no IN     : {timeit(block_no_in, (x,)) - fl:.3f} ms", flush=True)

    # conv alone: implicit zero pad vs materialized reflect pad
    print(f"conv implicit zero       : {timeit(lambda z: conv(z, k1, [(1, 1), (1, 1)]), (x,)) - fl:.3f} ms", flush=True)
    print(f"conv reflect pad         : {timeit(lambda z: conv(pad2d(z, 1, 'reflect'), k1, 'VALID'), (x,)) - fl:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
