"""Recursive exact chunked top-k: chunk the candidate stage too, until the
row is small. Compare flat-256 vs recursive at chunk 128/256/512."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N, D, Q, K, ITERS = 1_000_000, 512, 16, 10, 50
rng = np.random.RandomState(0)
db_d = jax.device_put(rng.randn(N, D).astype(np.float32))
q_d = jax.device_put(rng.randn(Q, D).astype(np.float32))


def exact_topk(s, k, chunk, recurse):
    """(Q, n) scores -> exact (vals, idx) top-k, lax.top_k tie order."""
    n = s.shape[1]
    if n <= 4 * chunk or k > chunk:
        return lax.top_k(s, k)
    pad = (-n) % chunk
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    sc = s.reshape(s.shape[0], -1, chunk)
    v1, i1 = lax.top_k(sc, k)
    base = (jnp.arange(sc.shape[1]) * chunk)[None, :, None]
    cand_v = v1.reshape(v1.shape[0], -1)
    cand_i = (i1 + base).reshape(i1.shape[0], -1)
    if recurse:
        v2, sel = exact_topk(cand_v, k, chunk, recurse)
    else:
        v2, sel = lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, sel, axis=1)
    return v2, idx


def bench(chunk, recurse):
    @jax.jit
    def fn(db, q0):
        def body(i, carry):
            acc, q = carry
            s = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
            v, idx = exact_topk(s, K, chunk, recurse)
            acc = acc + v.sum() + (idx % 97).sum().astype(jnp.float32)
            q = q + v[:, :1] * 1e-9
            return acc, q
        return lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))[0]
    return fn


for name, chunk, recurse in [("flat-256", 256, False),
                             ("rec-128", 128, True),
                             ("rec-256", 256, True),
                             ("rec-512", 512, True)]:
    fn = bench(chunk, recurse)
    fn(db_d, q_d).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(fn(db_d, q_d))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best / ITERS * 1e3:8.3f} ms/iter", flush=True)

# exactness of the recursive form vs plain top_k (with duplicate-row ties)
s_small = jnp.asarray(np.tile(rng.randn(3, 5000).astype(np.float32), (1, 4)))
vr, ir = lax.top_k(s_small, 7)
v2, i2 = exact_topk(s_small, 7, 256, True)
np.testing.assert_allclose(np.asarray(vr), np.asarray(v2), rtol=0)
assert (np.asarray(ir) == np.asarray(i2)).all()
print("recursive exact incl. ties")
