"""Descriptor batch sweep @1024² beyond batch 8 (round-2 follow-up).

Round-2 sweep stopped at 8 → 156 img/s and was still rising; check 10-24.
Harness identical to bench.py's descriptor loop (in-graph fori, scalar
fetch barrier).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.models.retrieval import GemRetrievalNet


def measure(batch, hw=1024, iters=10):
    model = GemRetrievalNet(architecture="vgg16", pooling="gem")
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, hw, hw, 3),
                           jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x[:1])

    @jax.jit
    def timed_loop(v, z):
        def body(i, acc):
            y = model.apply(v, z + i.astype(z.dtype) * 1e-4)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    acc = float(timed_loop(variables, x))
    assert np.isfinite(acc)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed_loop(variables, x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return batch / best


if __name__ == "__main__":
    for b in (8, 10, 12, 16, 20, 24):
        try:
            r = measure(b)
            print("batch %2d: %7.1f img/s" % (b, r), flush=True)
        except Exception as e:  # OOM expected at some point
            print("batch %2d: FAILED %s" % (b, str(e)[:200]), flush=True)
            break
