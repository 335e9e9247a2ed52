"""Measure RetrievalIndex query throughput on the real chip.

In-graph fori-loop timing per CLAUDE.md tunnel rules: one jit runs ITERS
query top-k passes over a device-resident database, perturbing the query
each iteration (DCE guard) and reducing the top-k values to a scalar
(device_get = the only reliable barrier on the tunnel).

Run: python scripts/perf_index.py  (defaults N=100k, D=512, Q=16, k=10)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from gandtr_tpu.serving.index import RetrievalIndex

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, Q, K, ITERS = 512, 16, 10, 50
topk = RetrievalIndex(D)._exact_topk  # the production query top-k

rng = np.random.RandomState(0)
db = rng.randn(N, D).astype(np.float32)
db /= np.linalg.norm(db, axis=1, keepdims=True)
q = rng.randn(Q, D).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)

db_d = jax.device_put(db)
q_d = jax.device_put(q)


@jax.jit
def bench(db, q0):
    def body(i, carry):
        acc, q = carry
        scores = jnp.dot(q, db.T, preferred_element_type=jnp.float32)
        vals, idx = topk(scores, K)
        # fold the result back into the query so no iteration is dead code
        acc = acc + vals.sum() + idx.sum()
        q = q + vals[:, :1] * 1e-9
        return acc, q
    acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))
    return acc


print(f"db {N}x{D}, {Q} queries, top-{K}, {ITERS} iters/graph")
bench(db_d, q_d).block_until_ready()  # compile
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    jax.device_get(bench(db_d, q_d))
    best = min(best, time.perf_counter() - t0)
ms = best / ITERS * 1e3
qps = Q * ITERS / best
print(f"{ms:.3f} ms / {Q}-query batch  ->  {qps:,.0f} queries/s "
      f"({qps * N * D * 2 / 1e12:.2f} TFLOP/s effective)")
