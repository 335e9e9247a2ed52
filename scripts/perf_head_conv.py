"""Head/tail conv variants at batch 24 bf16 on the real chip.

Head: reflect-pad3 + 7x7 conv 3->64 (+IN+relu epilogue), naive vs
conv_dual_s2d s in {2,4,8} x fold in {s2d,slice}.
Tail pieces: reflect-pad3 on 64ch, conv_s2d alone, tanh epilogue.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.ops import fastconv as fc
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
    x3 = (jax.random.uniform(rng, (B, 256, 256, 3)) * 2 - 1).astype(bf)
    k7 = (jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64)) * 0.1).astype(bf)

    fl3 = timeit(lambda a: a, (x3,))
    print(f"floor 256x3: {fl3:.3f} ms", flush=True)

    def naive(x):
        xp = pad2d(x, 3, "reflect")
        return jax.lax.conv_general_dilated(
            xp, k7, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    print(f"head naive pad+conv: {timeit(naive, (x3,)) - fl3:.3f} ms", flush=True)

    # NOTE: fold="slice" (strided-slice concat) CRASHES the tunnel's TPU
    # worker ("kernel fault") — same fusion-emitter fragility as round 1's
    # reversed-slice SIGABRT. s2d (reshape-transpose) fold only.
    for s in (4, 8, 2):
        def f(x, s=s):
            xp = pad2d(x, 3, "reflect")
            return fc.conv_dual_s2d(xp, k7, s)
        print(f"head dual_s2d s={s}: {timeit(f, (x3,)) - fl3:.3f} ms",
              flush=True)

    # with IN+relu epilogue (the real head)
    def head_naive(x):
        return jax.nn.relu(instance_norm(naive(x)))
    print(f"head naive+IN+relu: {timeit(head_naive, (x3,)) - fl3:.3f} ms", flush=True)
    for s in (4, 8):
        def f(x, s=s):
            xp = pad2d(x, 3, "reflect")
            return jax.nn.relu(instance_norm(fc.conv_dual_s2d(xp, k7, s)))
        print(f"head dual_s2d s={s}+IN+relu: {timeit(f, (x3,)) - fl3:.3f} ms",
              flush=True)

    # ---- tail pieces
    x64 = (jax.random.uniform(rng, (B, 256, 256, 64)) * 2 - 1).astype(bf)
    k7t = (jax.random.normal(jax.random.PRNGKey(2), (7, 7, 64, 3)) * 0.1).astype(bf)
    fl64 = timeit(lambda a: a, (x64,))
    print(f"floor 256x64: {fl64:.3f} ms", flush=True)
    print(f"tail pad3_reflect 64ch: {timeit(lambda x: pad2d(x, 3, 'reflect'), (x64,)) - fl64:.3f} ms", flush=True)

    def tail_now(x):
        xp = pad2d(x, 3, "reflect")
        return jnp.tanh(fc.conv_s2d(xp, k7t, 8))
    print(f"tail pad+conv_s2d8+tanh: {timeit(tail_now, (x64,)) - fl64:.3f} ms", flush=True)

    def tail_s4(x):
        xp = pad2d(x, 3, "reflect")
        return jnp.tanh(fc.conv_s2d(xp, k7t, 4))
    print(f"tail pad+conv_s2d4+tanh: {timeit(tail_s4, (x64,)) - fl64:.3f} ms", flush=True)

    def tail_reflect_few(x):
        return jnp.tanh(fc.conv_reflect_few_out(x, k7t, 3, 8))
    print(f"tail conv_reflect_few_out8+tanh: {timeit(tail_reflect_few, (x64,)) - fl64:.3f} ms", flush=True)

    def tail_zero_pad(x):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        return jnp.tanh(fc.conv_s2d(xp, k7t, 8))
    print(f"tail zeropad+conv_s2d8+tanh (approx, bound check): {timeit(tail_zero_pad, (x64,)) - fl64:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
