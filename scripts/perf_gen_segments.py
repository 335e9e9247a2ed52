"""Per-segment timing of the 9-block ResNet generator at batch 24, bf16, on
the real TPU chip (tunnel). In-graph fori_loop harness per docs/PERF.md:
block_until_ready returns early on the axon backend, so every measurement
runs ITERS iterations inside ONE jit and fetches a scalar.

Each segment also gets a same-shape harness floor (perturb + reduce only) so
the printed `net` column is segment time with the floor subtracted.

Usage: python scripts/perf_gen_segments.py [--iters 30] [--batch 24]
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

from gandtr_tpu.models import initialize_model
from gandtr_tpu.models.layers import Conv, ConvTranspose, pad2d
from gandtr_tpu.models.generators import ResnetBlock
from gandtr_tpu.ops.norm import instance_norm


def timeit(fn, args, iters, reps=3):
    """Steady-state sec/iter of fn(*args) via in-graph fori_loop."""
    @jax.jit
    def loop(*a):
        def body(i, acc):
            pert = (a[0] + i.astype(a[0].dtype) * jnp.asarray(1e-4, a[0].dtype),) + a[1:]
            y = fn(*pert)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    acc = float(loop(*args))
    assert np.isfinite(acc), acc
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=24)
    args = ap.parse_args()
    B, it = args.batch, args.iters
    rng = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    def mk(shape):
        return (jax.random.uniform(rng, shape, jnp.float32) * 2 - 1).astype(bf)

    def module_fn(mod, x, **kw):
        v = mod.init(jax.random.PRNGKey(1), x, **kw)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, v)
        return lambda z: mod.apply(v, z, **kw), x

    segs = []

    # full generator
    gen = initialize_model({
        "architecture": "official_resnet_generator",
        "no_antialias": True, "no_antialias_up": True,
        "input_nc": 3, "output_nc": 3, "n_blocks": 9,
        "norm_layer": "instance"})
    x0 = mk((B, 256, 256, 3))
    v = gen.init(jax.random.PRNGKey(1), x0[:1], train=False)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, v)
    segs.append(("full_generator", lambda z: gen.apply(v, z, train=False), x0))

    # head pieces
    segs.append(("pad3_reflect_3ch", lambda z: pad2d(z, 3, "reflect"), x0))
    c7 = Conv(64, 7, use_bias=True)
    fn, _ = module_fn(c7, pad2d(x0, 3, "reflect"))
    segs.append(("conv7_3to64_prepadded", fn, pad2d(x0, 3, "reflect")))

    class Head(nn.Module):
        @nn.compact
        def __call__(self, z):
            h = pad2d(z, 3, "reflect")
            h = Conv(64, 7, use_bias=True)(h)
            return nn.relu(instance_norm(h))
    fn, xx = module_fn(Head(), x0)
    segs.append(("head_pad_conv_in_relu", fn, xx))

    x64 = mk((B, 256, 256, 64))
    class Down(nn.Module):
        feat: int
        @nn.compact
        def __call__(self, z):
            h = Conv(self.feat, 3, stride=2, padding=1, use_bias=True)(z)
            return nn.relu(instance_norm(h))
    fn, _ = module_fn(Down(128), x64)
    segs.append(("down1_64to128", fn, x64))
    x128 = mk((B, 128, 128, 128))
    fn, _ = module_fn(Down(256), x128)
    segs.append(("down2_128to256", fn, x128))

    x256 = mk((B, 64, 64, 256))
    blk = ResnetBlock(256, "reflect", "instance", False, True)
    v2 = blk.init(jax.random.PRNGKey(1), x256, train=False)
    v2 = jax.tree_util.tree_map(
        lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, v2)
    segs.append(("one_resblock", lambda z: blk.apply(v2, z, train=False), x256))
    segs.append(("instance_norm_256ch", lambda z: instance_norm(z), x256))

    up1 = ConvTranspose(128, 3, stride=2, padding=1, output_padding=1)
    fn, _ = module_fn(up1, x256)
    segs.append(("up1_256to128", fn, x256))
    up2 = ConvTranspose(64, 3, stride=2, padding=1, output_padding=1)
    fn, _ = module_fn(up2, x128)
    segs.append(("up2_128to64", fn, x128))

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, z):
            h = pad2d(z, 3, "reflect")
            return jnp.tanh(Conv(3, 7, use_bias=True)(h))
    fn, _ = module_fn(Tail(), x64)
    segs.append(("tail_pad_conv7_tanh", fn, x64))

    # harness floors keyed by input shape
    floors = {}
    def floor_for(shape):
        if shape not in floors:
            z = mk(shape)
            floors[shape] = timeit(lambda a: a, (z,), it)
        return floors[shape]

    print(f"batch={B} iters={it} platform={jax.default_backend()}")
    print(f"{'segment':28s} {'raw_ms':>8s} {'floor_ms':>9s} {'net_ms':>8s}")
    for name, fn, inp in segs:
        raw = timeit(fn, (inp,), it) * 1e3
        fl = floor_for(inp.shape) * 1e3
        print(f"{name:28s} {raw:8.3f} {fl:9.3f} {raw - fl:8.3f}", flush=True)


if __name__ == "__main__":
    main()
