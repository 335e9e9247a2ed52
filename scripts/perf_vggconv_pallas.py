"""Lane-folded Pallas 3x3 conv vs XLA on the VGG hot shapes (v5e chip).

Targets (docs/PERF.md round-2 profile, batch 4):
- conv1_2 64ch @1024^2: XLA 11.5 ms (14% MXU)
- conv2_x 128ch @512^2: XLA ~2 ms each (~40% MXU)
Win condition: isolated win AND full-graph composition win (the round-2
composition trap killed every XLA-level rewrite; pallas_call forces default
operand/result layouts, so composition should hold — verify anyway).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.ops import vggconv_pallas as vp


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


def conv_same(z, kk):
    return jax.lax.conv_general_dilated(
        z, kk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    B = 4
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    # ---- conv1_2: 64ch @1024^2
    x = jax.random.uniform(rng, (B, 1024, 1024, 64), jnp.float32).astype(bf)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.05).astype(bf)
    b = (jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.05).astype(jnp.float32)
    fl = timeit(lambda a: a, (x,))
    print(f"floor 1024x64: {fl:.3f} ms", flush=True)

    t_xla = timeit(lambda z: jax.nn.relu(conv_same(z, k) + b.astype(bf)), (x,)) - fl
    print(f"conv1_2 XLA +bias+relu    : {t_xla:.3f} ms", flush=True)

    t_pl = timeit(lambda z: vp.conv3x3_same(z, k, b, relu=True), (x,)) - fl
    gf = 2 * B * 1024 * 1024 * 64 * 64 * 9 / 1e9
    print(f"conv1_2 PALLAS +bias+relu : {t_pl:.3f} ms "
          f"({gf / t_pl:.0f} TF/s exact-basis)", flush=True)

    # parity on chip
    y_x = jax.nn.relu(conv_same(x, k) + b.astype(bf)).astype(jnp.float32)
    y_p = vp.conv3x3_same(x, k, b, relu=True).astype(jnp.float32)
    d = jnp.max(jnp.abs(y_x - y_p)) / (jnp.max(jnp.abs(y_x)) + 1e-9)
    print(f"conv1_2 chip rel-maxdiff  : {float(d):.2e}", flush=True)

    # chain with maxpool (block1 tail) — composition probe 1
    def chain_x(z):
        return nn.max_pool(jax.nn.relu(conv_same(z, k) + b.astype(bf)),
                           (2, 2), strides=(2, 2))
    def chain_p(z):
        return nn.max_pool(vp.conv3x3_same(z, k, b, relu=True),
                           (2, 2), strides=(2, 2))
    print(f"conv1_2+pool XLA          : {timeit(chain_x, (x,)) - fl:.3f} ms", flush=True)
    print(f"conv1_2+pool PALLAS       : {timeit(chain_p, (x,)) - fl:.3f} ms", flush=True)

    # ---- conv2_x: 128ch @512^2
    x5 = jax.random.uniform(rng, (B, 512, 512, 128), jnp.float32).astype(bf)
    k2 = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 128)) * 0.05).astype(bf)
    b2 = (jax.random.normal(jax.random.PRNGKey(4), (128,)) * 0.05).astype(jnp.float32)
    fl5 = timeit(lambda a: a, (x5,))
    print(f"floor 512x128: {fl5:.3f} ms", flush=True)
    t2x = timeit(lambda z: jax.nn.relu(conv_same(z, k2) + b2.astype(bf)), (x5,)) - fl5
    print(f"conv2 XLA +bias+relu      : {t2x:.3f} ms", flush=True)
    t2p = timeit(lambda z: vp.conv3x3_same(z, k2, b2, relu=True), (x5,)) - fl5
    gf2 = 2 * B * 512 * 512 * 128 * 128 * 9 / 1e9
    print(f"conv2 PALLAS +bias+relu   : {t2p:.3f} ms "
          f"({gf2 / t2p:.0f} TF/s exact-basis)", flush=True)
    y2x = jax.nn.relu(conv_same(x5, k2) + b2.astype(bf)).astype(jnp.float32)
    y2p = vp.conv3x3_same(x5, k2, b2, relu=True).astype(jnp.float32)
    d2 = jnp.max(jnp.abs(y2x - y2p)) / (jnp.max(jnp.abs(y2x)) + 1e-9)
    print(f"conv2 chip rel-maxdiff    : {float(d2):.2e}", flush=True)

    # block1+block2 composition: conv(64)->pool->conv(128)->conv(128)->pool
    k12 = (jax.random.normal(jax.random.PRNGKey(5), (3, 3, 64, 128)) * 0.05).astype(bf)

    def seg_x(z):
        h = nn.max_pool(jax.nn.relu(conv_same(z, k) + b.astype(bf)), (2, 2), strides=(2, 2))
        h = jax.nn.relu(conv_same(h, k12))
        h = jax.nn.relu(conv_same(h, k2) + b2.astype(bf))
        return nn.max_pool(h, (2, 2), strides=(2, 2))

    def seg_p(z):
        h = nn.max_pool(vp.conv3x3_same(z, k, b, relu=True), (2, 2), strides=(2, 2))
        h = jax.nn.relu(conv_same(h, k12))
        h = vp.conv3x3_same(h, k2, b2, relu=True)
        return nn.max_pool(h, (2, 2), strides=(2, 2))

    print(f"block1+2 XLA              : {timeit(seg_x, (x,)) - fl:.3f} ms", flush=True)
    print(f"block1+2 PALLAS           : {timeit(seg_p, (x,)) - fl:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
