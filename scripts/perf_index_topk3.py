"""Index-recovery trick: keep every BIG lax.top_k values-only (12x faster
than with live indices on the tunnel chip), recover the indices exactly:

  1. v = top_k(scores)          values-only     (~0.5 ms over (16, 1M))
  2. hit = scores >= v[:, -1:]  (>= K hits; ties included)
  3. key = where(hit, -iota, -N); top_k(key) values-only
     -> K smallest hit positions == lax.top_k's tie-breaking choice
  4. gather scores at those K positions, small (Q, K) sort

All passes after the matmul touch (Q, N) f32/i32 buffers (64 MB), never the
(N, D) database again. Compare vs live-idx top_k and measure exactness.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, Q, K, ITERS = 512, 16, 10, 50

rng = np.random.RandomState(0)
db = rng.randn(N, D).astype(np.float32)
q = rng.randn(Q, D).astype(np.float32)
db_d, q_d = jax.device_put(db), jax.device_put(q)


def harness(step):
    @jax.jit
    def bench(db, q0):
        def body(i, carry):
            acc, q = carry
            v, idx = step(db, q)
            acc = acc + v.sum() + (idx % 97).sum().astype(jnp.float32)
            q = q + v[:, :1] * 1e-9
            return acc, q
        return lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))[0]
    return bench


def scores_of(db, q):
    return jnp.dot(q, db.T, preferred_element_type=jnp.float32)


def vals_idx(db, q):
    return lax.top_k(scores_of(db, q), K)


def recovered(db, q):
    s = scores_of(db, q)
    n = s.shape[1]
    v = lax.top_k(s, K)[0]                        # values-only
    hit = s >= v[:, -1:]
    # f32 iota: exact for n < 2^24, and the f32 TopK kernel fits VMEM where
    # the s32 one OOMs ("TopKBatchMajorSmallK ... ran out of memory in vmem")
    iota = lax.iota(jnp.float32, n)[None, :]
    key = jnp.where(hit, -iota, -jnp.inf)
    pos = (-lax.top_k(key, K)[0]).astype(jnp.int32)  # K smallest hit positions
    sv = jnp.take_along_axis(s, pos, axis=1)
    order = jnp.argsort(-sv, axis=1, stable=True)     # (Q, K): tiny
    return (jnp.take_along_axis(sv, order, axis=1),
            jnp.take_along_axis(pos, order, axis=1))


for name, step in [("vals+idx", vals_idx), ("recovered-idx", recovered)]:
    fn = harness(step)
    fn(db_d, q_d).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(db_d, q_d))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:14s} {best / ITERS * 1e3:8.3f} ms/iter", flush=True)

vr, ir = jax.jit(vals_idx)(db_d, q_d)
v2, i2 = jax.jit(recovered)(db_d, q_d)
np.testing.assert_allclose(np.asarray(vr), np.asarray(v2), rtol=0)
assert (np.asarray(ir) == np.asarray(i2)).all()
# tie stress: quantized scores force many exact duplicates
db_t = jax.device_put(np.round(db[:200000] * 2) / 2)
vr, ir = jax.jit(vals_idx)(db_t, q_d)
v2, i2 = jax.jit(recovered)(db_t, q_d)
np.testing.assert_allclose(np.asarray(vr), np.asarray(v2), rtol=0)
assert (np.asarray(ir) == np.asarray(i2)).all()
print("recovered == lax.top_k exactly (values AND indices, incl. ties)")
