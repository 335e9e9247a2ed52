"""Head-to-head: which CONSUMPTION of lax.top_k makes the 1M-col query graph
fast (2.5 ms) vs slow (31.6 ms)? Same process, same harness, alone.

  A  out = vals + idx.astype(f32)*0 ; sum(out)         (round-1 'fast' form)
  B  sum(vals), idx unused                             (round-2 'slow' form)
  C  sum(vals) + sum(idx % 97)                         (live s32 idx)
  D  out = vals + idx.astype(f32)*1e-30 ; sum(out)     (live idx via f32)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N, D, Q, K, ITERS = 1_000_000, 512, 16, 10, 50
rng = np.random.RandomState(0)
db_d = jax.device_put(rng.randn(N, D).astype(np.float32))
q_d = jax.device_put(rng.randn(Q, D).astype(np.float32))


def bench(consume):
    @jax.jit
    def fn(db, q0):
        def body(i, carry):
            acc, q = carry
            s = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
            vals, idx = lax.top_k(s, K)
            acc = acc + consume(vals, idx)
            q = q + vals[:, :1] * 1e-9
            return acc, q
        return lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))[0]
    return fn


variants = [
    ("A vals+idxf*0", lambda v, i: (v + i.astype(jnp.float32) * 0).sum()),
    ("B vals only", lambda v, i: v.sum()),
    ("C vals+idx%97", lambda v, i: v.sum() + (i % 97).sum().astype(jnp.float32)),
    ("D vals+idxf*eps", lambda v, i: (v + i.astype(jnp.float32) * 1e-30).sum()),
]
for name, consume in variants:
    fn = bench(consume)
    fn(db_d, q_d).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(db_d, q_d))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:16s} {best / ITERS * 1e3:8.3f} ms/iter", flush=True)
