"""Round-3: spatial-to-batch halo fold vs the conv1_2 emitter pathology
(VERDICT r2 next #5 — the one untried reformulation family for the 14%-MXU
VGG16 conv1_2 @1024²).

Fold H into T tiles with 1-row halos into the batch axis (exact: the halo
rows reproduce SAME-padding semantics at tile seams; outer zeros = the
conv's own zero padding), run the 64→64 3×3 conv on (B*T, H/T+2, W, 64),
unfold. ~2T/H duplicated FLOPs. Measured isolated, composed with the
following maxpool, and inside the full VGG16 forward — the round-2 lesson
says isolated wins don't survive composition (conv_wfold), so the full-graph
number is the decision.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

B, H, W, C = 8, 1024, 1024, 64


def bench(fn, args, iters=10, reps=3):
    jfn = jax.jit(fn)
    out = jax.device_get(jfn(*args))
    assert np.all(np.isfinite(np.asarray(out)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def loop(body, iters=10):
    def fn(*args):
        def b(i, acc):
            return acc + body(i, *args)
        return jax.lax.fori_loop(0, iters, b, jnp.float32(0.0))
    return fn


def conv_same(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def conv_fold(x, k, b, T):
    n, h, w, c = x.shape
    th = h // T
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    tiles = jnp.concatenate(
        [xp[:, i * th:i * th + th + 2][:, None] for i in range(T)], axis=1)
    tiles = tiles.reshape(n * T, th + 2, w, c)
    y = jax.lax.conv_general_dilated(
        tiles, k, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return y.reshape(n, T, th, w, -1).reshape(n, h, w, -1)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (B, H, W, C), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, 64),
                          jnp.float32) * 0.05
    bb = jnp.zeros((64,), jnp.float32)

    # exactness first
    y0 = conv_same(x[:1, :128], k, bb)
    for T in (2, 4, 8):
        y1 = conv_fold(x[:1, :128], k, bb, T)
        md = float(jnp.abs(y1 - y0).max())
        print("fold T=%d exactness maxdiff %.2e" % (T, md), flush=True)
        assert md < 1e-5

    t = bench(loop(lambda i, z: jnp.sum(conv_same(
        z + i.astype(z.dtype) * 1e-6, k, bb))), (x,))
    print("conv1_2 naive:        %.2f ms" % (t * 1e3), flush=True)
    for T in (2, 4, 8):
        t = bench(loop(lambda i, z, T=T: jnp.sum(conv_fold(
            z + i.astype(z.dtype) * 1e-6, k, bb, T))), (x,))
        print("conv1_2 fold T=%d:     %.2f ms" % (T, t * 1e3), flush=True)

    # composed: conv + relu + maxpool (the layer's real epilogue)
    def comp_naive(i, z):
        y = nn.relu(conv_same(z + i.astype(z.dtype) * 1e-6, k, bb))
        return jnp.sum(nn.max_pool(y, (2, 2), strides=(2, 2)))

    t = bench(loop(comp_naive), (x,))
    print("conv1_2+pool naive:   %.2f ms" % (t * 1e3), flush=True)
    for T in (2, 4, 8):
        def comp_fold(i, z, T=T):
            y = nn.relu(conv_fold(z + i.astype(z.dtype) * 1e-6, k, bb, T))
            return jnp.sum(nn.max_pool(y, (2, 2), strides=(2, 2)))
        t = bench(loop(comp_fold), (x,))
        print("conv1_2+pool fold T=%d: %.2f ms" % (T, t * 1e3), flush=True)

    full_vgg()


def full_vgg():
    from gandtr_tpu.models.backbones import VGG16Features, VGG16_CFG
    from gandtr_tpu.models.layers import Conv

    class VGGFolded(nn.Module):
        fold_t: int = 4

        @nn.compact
        def __call__(self, x):
            idx = 0
            for li, item in enumerate(VGG16_CFG):
                if item == "M":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                    idx += 1
                else:
                    if li == 1:  # conv1_2: the pathological 64->64 @1024²
                        k = self.param(f"fk_{idx}", nn.initializers
                                       .lecun_normal(), (3, 3, x.shape[-1],
                                                         item))
                        b = self.param(f"fb_{idx}", nn.initializers.zeros,
                                       (item,))
                        x = conv_fold(x, k, b, self.fold_t)
                    else:
                        x = Conv(item, 3, padding=1,
                                 name=f"features_{idx}")(x)
                    x = nn.relu(x)
                    idx += 2
            return x

    xin = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), jnp.float32)
    stock = VGG16Features()
    v0 = stock.init(jax.random.PRNGKey(1), xin[:1])
    t = bench(loop(lambda i, z: jnp.sum(stock.apply(
        v0, z + i.astype(z.dtype) * 1e-6))), (xin,), iters=5)
    print("full VGG stock:       %.2f ms (%.1f img/s)"
          % (t * 1e3, B / t), flush=True)
    for T in (4, 8):
        m = VGGFolded(fold_t=T)
        v1 = m.init(jax.random.PRNGKey(1), xin[:1])
        t = bench(loop(lambda i, z, m=m, v1=v1: jnp.sum(m.apply(
            v1, z + i.astype(z.dtype) * 1e-6))), (xin,), iters=5)
        print("full VGG fold T=%d:    %.2f ms (%.1f img/s)"
              % (T, t * 1e3, B / t), flush=True)


if __name__ == "__main__":
    main()
