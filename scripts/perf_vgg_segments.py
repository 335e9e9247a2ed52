"""Per-block timing of GeM-VGG16 descriptor extraction at the eval protocol
size (1024x1024, batch 4). Finds where the ~41%-of-peak extraction loses
time. Usage: python scripts/perf_vgg_segments.py [--batch 4] [--hw 1024]
"""
import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.retrieval import GemRetrievalNet


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


class ConvBlock(nn.Module):
    widths: tuple
    pool_first: bool

    @nn.compact
    def __call__(self, x):
        if self.pool_first:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for w in self.widths:
            x = nn.relu(nn.Conv(w, (3, 3), padding=1)(x))
        return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    B, HW = args.batch, args.hw
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(0)

    def mk(shape):
        return jax.random.uniform(rng, shape, jnp.float32).astype(dt)

    def block_fn(widths, pool_first, x):
        mod = ConvBlock(widths, pool_first)
        v = mod.init(jax.random.PRNGKey(1), x)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, v)
        return lambda z: mod.apply(v, z)

    print(f"batch={B} hw={HW} dtype={args.dtype} platform={jax.default_backend()}",
          flush=True)

    floors = {}
    def floor_for(shape):
        if shape not in floors:
            z = mk(shape)
            floors[shape] = timeit(lambda a: a, (z,))
        return floors[shape]

    segs = [
        ("conv1_1 3->64", (64,), False, (B, HW, HW, 3)),
        ("block1 rest 64->64", (64,), False, (B, HW, HW, 64)),
        ("block2 (pool,64->128,128)", (128, 128), True, (B, HW, HW, 64)),
        ("block3 (pool,128->256x3)", (256, 256, 256), True, (B, HW // 2, HW // 2, 128)),
        ("block4 (pool,256->512x3)", (512, 512, 512), True, (B, HW // 4, HW // 4, 256)),
        ("block5 (pool,512x3)", (512, 512, 512), True, (B, HW // 8, HW // 8, 512)),
    ]
    for name, widths, pf, shape in segs:
        x = mk(shape)
        fn = block_fn(widths, pf, x)
        raw = timeit(fn, (x,))
        fl = floor_for(shape)
        print(f"{name:28s} raw {raw:8.3f}  floor {fl:7.3f}  net {raw - fl:8.3f} ms",
              flush=True)

    # full descriptor net
    model = GemRetrievalNet(architecture="vgg16", pooling="gem")
    x = mk((B, HW, HW, 3))
    v = model.init(jax.random.PRNGKey(2), x[:1].astype(jnp.float32))
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, v)
    raw = timeit(lambda z: model.apply(v, z), (x,))
    fl = floor_for(x.shape)
    net = raw - fl
    print(f"{'full GeM-VGG16':28s} raw {raw:8.3f}  floor {fl:7.3f}  net {net:8.3f} ms"
          f"  -> {B / (net / 1e3):.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
