"""VGG16 hot-conv reformulations at 1024², batch 4, bf16.

block1's single 64->64 3x3 conv measures 11.4 ms (27 TF/s, ~14% peak) — not
bandwidth-bound (bf16 == f32). Try dual space-to-depth (s=2: 256-channel
contraction/output, 1.78x FLOP inflation) and related forms.
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
    B = 4
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (B, 1024, 1024, 64), jnp.float32).astype(bf)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.05).astype(bf)
    fl = timeit(lambda a: a, (x,))
    print(f"floor 1024x64: {fl:.3f} ms", flush=True)

    def conv_same(z, kk):
        return jax.lax.conv_general_dilated(
            z, kk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    print(f"conv64 naive            : {timeit(lambda z: conv_same(z, k), (x,)) - fl:.3f} ms", flush=True)
    print(f"conv64 naive+relu       : {timeit(lambda z: jax.nn.relu(conv_same(z, k)), (x,)) - fl:.3f} ms", flush=True)

    def dual(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return fc.conv_dual_s2d(zp, k, 2)
    print(f"conv64 dual_s2d s=2     : {timeit(dual, (x,)) - fl:.3f} ms", flush=True)
    print(f"conv64 dual_s2d s=2+relu: {timeit(lambda z: jax.nn.relu(dual(z)), (x,)) - fl:.3f} ms", flush=True)

    def dual4(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return fc.conv_dual_s2d(zp, k, 4)
    print(f"conv64 dual_s2d s=4     : {timeit(dual4, (x,)) - fl:.3f} ms", flush=True)

    # chain: conv+relu then 2x2 maxpool (the actual block1 tail)
    def chain_naive(z):
        h = jax.nn.relu(conv_same(z, k))
        return nn.max_pool(h, (2, 2), strides=(2, 2))
    print(f"conv64+relu+pool naive  : {timeit(chain_naive, (x,)) - fl:.3f} ms", flush=True)

    def chain_dual(z):
        h = jax.nn.relu(dual(z))
        return nn.max_pool(h, (2, 2), strides=(2, 2))
    print(f"conv64+relu+pool dual   : {timeit(chain_dual, (x,)) - fl:.3f} ms", flush=True)

    print(f"maxpool alone           : {timeit(lambda z: nn.max_pool(z, (2, 2), strides=(2, 2)), (x,)) - fl:.3f} ms", flush=True)

    # conv1_1 3->64 @1024
    x3 = jax.random.uniform(rng, (B, 1024, 1024, 3), jnp.float32).astype(bf)
    k13 = (jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 64)) * 0.05).astype(bf)
    fl3 = timeit(lambda a: a, (x3,))
    print(f"floor 1024x3: {fl3:.3f} ms", flush=True)
    print(f"conv1_1 naive           : {timeit(lambda z: jax.nn.relu(conv_same(z, k13)), (x3,)) - fl3:.3f} ms", flush=True)

    def c11_dual(z, s):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.nn.relu(fc.conv_dual_s2d(zp, k13, s))
    print(f"conv1_1 dual_s2d s=4    : {timeit(lambda z: c11_dual(z, 4), (x3,)) - fl3:.3f} ms", flush=True)
    print(f"conv1_1 dual_s2d s=8    : {timeit(lambda z: c11_dual(z, 8), (x3,)) - fl3:.3f} ms", flush=True)

    # block2 conv: 128->128 @512²
    x5 = jax.random.uniform(rng, (B, 512, 512, 128), jnp.float32).astype(bf)
    k2 = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 128)) * 0.05).astype(bf)
    fl5 = timeit(lambda a: a, (x5,))
    print(f"floor 512x128: {fl5:.3f} ms", flush=True)
    print(f"conv128@512 naive       : {timeit(lambda z: jax.nn.relu(conv_same(z, k2)), (x5,)) - fl5:.3f} ms", flush=True)

    def c2_dual(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.nn.relu(fc.conv_dual_s2d(zp, k2, 2))
    print(f"conv128@512 dual s=2    : {timeit(c2_dual, (x5,)) - fl5:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
