"""Chunk-size sweep for the exact two-stage top-k in the index query graph
(1M x 512 db, 16 queries, K=10). Fixed harness of perf_index_topk.py."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N, D, Q, K, ITERS = 1_000_000, 512, 16, 10, 50
rng = np.random.RandomState(0)
db_d = jax.device_put(rng.randn(N, D).astype(np.float32))
q_d = jax.device_put(rng.randn(Q, D).astype(np.float32))


def chunked(chunk):
    def step(db, q):
        s = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
        pad = (-s.shape[1]) % chunk
        if pad:
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        sc = s.reshape(Q, -1, chunk)
        v1, i1 = lax.top_k(sc, K)
        base = (jnp.arange(sc.shape[1]) * chunk)[None, :, None]
        v2, sel = lax.top_k(v1.reshape(Q, -1), K)
        idx = jnp.take_along_axis((i1 + base).reshape(Q, -1), sel, axis=1)
        return v2, idx

    @jax.jit
    def fn(db, q0):
        def body(i, carry):
            acc, q = carry
            v, idx = step(db, q)
            acc = acc + v.sum() + (idx % 97).sum().astype(jnp.float32)
            q = q + v[:, :1] * 1e-9
            return acc, q
        return lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))[0]
    return fn


for chunk in (256, 512, 1024):
    fn = chunked(chunk)
    fn(db_d, q_d).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(db_d, q_d))
        best = min(best, time.perf_counter() - t0)
    print(f"chunk {chunk:6d}  {best / ITERS * 1e3:8.3f} ms/iter", flush=True)
