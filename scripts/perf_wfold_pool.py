"""conv1_2 + 2x2 maxpool in FOLDED W-space: wfold conv won alone (10.1 vs
11.5) but lost composed with a plain pool (17.6 vs 13.9) — the unfold
reshape + pool didn't fuse. Pooling in folded space (H-pool + phase-max)
never unfolds at 1024 width.
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


def conv_wfold_folded(xp, kernel, f):
    """conv_wfold without the final unfold: returns (B, H, W/f, f*Co)."""
    Kh, Kw, C, Co = kernel.shape
    B, Hp, Wp, _ = xp.shape
    W = Wp - Kw + 1
    nbw = (f + Kw - 2) // f + 1
    wb_out = W // f
    wb_in = wb_out + nbw - 1
    tgt = wb_in * f
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, max(0, tgt - Wp)), (0, 0)))[:, :, :tgt]
    xf = xp.reshape(B, Hp, wb_in, f * C)
    S = np.zeros((nbw, f, f, Kw), np.float32)
    for d in range(f):
        for u in range(Kw):
            bw, e = divmod(d + u, f)
            S[bw, d, e, u] = 1
    S = jnp.asarray(S, xp.dtype)
    Kb = jnp.einsum("wdeu,huco->hwecdo", S, kernel.astype(xp.dtype))
    Kb = Kb.reshape(Kh, nbw, f * C, f * Co)
    return fc._conv(xf, Kb)


def main():
    bf = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (4, 1024, 1024, 64), jnp.float32).astype(bf)
    k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.05).astype(bf)
    fl = timeit(lambda a: a, (x,))
    print(f"floor: {fl:.3f}", flush=True)

    def naive_chain(z):
        h = jax.nn.relu(jax.lax.conv_general_dilated(
            z, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return nn.max_pool(h, (2, 2), strides=(2, 2))

    def folded_chain(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.nn.relu(conv_wfold_folded(zp, k, 2))   # (B, 1024, 512, 128)
        y = nn.max_pool(y, (2, 1), strides=(2, 1))     # H-pool only
        B, H2, Wb, FC = y.shape
        y = y.reshape(B, H2, Wb, 2, 64)
        return jnp.max(y, axis=3)                      # phase (W) max

    # correctness
    a = np.asarray(naive_chain(x[:1, :64, :64]))
    b = np.asarray(folded_chain(x[:1, :64, :64]))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    print("correct", flush=True)

    print(f"conv1_2+pool naive  : {timeit(naive_chain, (x,)) - fl:.3f} ms", flush=True)
    print(f"conv1_2+pool folded : {timeit(folded_chain, (x,)) - fl:.3f} ms", flush=True)

    # block2 conv @512x128, wfold f=2
    x5 = jax.random.uniform(rng, (4, 512, 512, 128), jnp.float32).astype(bf)
    k2 = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 128)) * 0.05).astype(bf)
    fl5 = timeit(lambda a: a, (x5,))
    def n2(z):
        return jax.nn.relu(jax.lax.conv_general_dilated(
            z, k2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    def w2(z):
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.nn.relu(fc.conv_wfold(zp, k2, 2))
    print(f"conv128@512 naive   : {timeit(n2, (x5,)) - fl5:.3f} ms", flush=True)
    print(f"conv128@512 wfold2  : {timeit(w2, (x5,)) - fl5:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
