"""Ablate the index query graph: full-row lax.top_k vs exact two-stage
chunked top-k (top-k per chunk, then top-k over the K*chunks candidates),
and the bare matmul as a floor. Same fori harness as perf_index.py."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, Q, K, ITERS = 512, 16, 10, 50
CHUNK = 4096

rng = np.random.RandomState(0)
db = rng.randn(N, D).astype(np.float32)
q = rng.randn(Q, D).astype(np.float32)
db_d, q_d = jax.device_put(db), jax.device_put(q)


def harness(step):
    @jax.jit
    def bench(db, q0):
        def body(i, carry):
            acc, q = carry
            out = step(db, q)
            acc = acc + out.sum()
            q = q + out[:, :1] * 1e-9
            return acc, q
        return lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))[0]
    return bench


def matmul_only(db, q):
    s = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    return s.max(axis=1, keepdims=True)  # cheap reduce, no top-k


def full_topk(db, q):
    s = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    vals, idx = lax.top_k(s, K)
    return vals + idx.astype(jnp.float32) * 0


def chunked_topk(db, q):
    s = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
    n = s.shape[1]
    pad = (-n) % CHUNK
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    sc = s.reshape(Q, -1, CHUNK)
    v1, i1 = lax.top_k(sc, K)                     # (Q, G, K) per chunk
    base = (jnp.arange(sc.shape[1]) * CHUNK)[None, :, None]
    cand_v = v1.reshape(Q, -1)
    cand_i = (i1 + base).reshape(Q, -1)
    v2, sel = lax.top_k(cand_v, K)                # exact global top-K
    idx = jnp.take_along_axis(cand_i, sel, axis=1)
    return v2 + idx.astype(jnp.float32) * 0


for name, step in [("matmul-only", matmul_only), ("full top_k", full_topk),
                   ("chunked top_k", chunked_topk)]:
    fn = harness(step)
    fn(db_d, q_d).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(db_d, q_d))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:14s} {ms:8.3f} ms/iter  ({N*D*4/ms/1e6:.0f} GB/s db read)")

# exactness check
v_full = np.asarray(full_topk(db_d, q_d))
v_chunk = np.asarray(chunked_topk(db_d, q_d))
np.testing.assert_allclose(v_full, v_chunk, rtol=0)
print("chunked == full: exact")
