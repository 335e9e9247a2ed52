"""Measure PQ index scan throughput on the real chip vs the exact scan.

Same in-graph fori-loop harness as perf_index.py (tunnel rules, CLAUDE.md):
the m-column gather+add + recursive top-k runs ITERS times in one jit with a
query perturbation (DCE guard) and a scalar fetch.

Run: python scripts/perf_pq.py [N] [M]   (defaults N=1M, M=16)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from gandtr_tpu.serving.index import exact_topk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
M = int(sys.argv[2]) if len(sys.argv) > 2 else 16
D, Q, K, KSUB, ITERS = 512, 16, 10, 256, 50
DSUB = D // M

rng = np.random.RandomState(0)
codes = rng.randint(0, KSUB, (N, M)).astype(np.uint8)  # production dtype
C = rng.randn(M, KSUB, DSUB).astype(np.float32)
q = rng.randn(Q, D).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)

codes_d = jax.device_put(codes)
C_d = jax.device_put(C)
q_d = jax.device_put(q)


@jax.jit
def bench(codes, C, q0):
    def body(i, carry):
        acc, q = carry
        lut = jnp.einsum("qmd,mkd->mqk", q.reshape(Q, M, DSUB), C,
                         preferred_element_type=jnp.float32)
        ci = codes.astype(jnp.int32)  # in-graph cast, like the shipped index
        scores = jnp.take(lut[0], ci[:, 0], axis=1)
        for mi in range(1, M):
            scores = scores + jnp.take(lut[mi], ci[:, mi], axis=1)
        vals, idx = exact_topk(scores, K)
        acc = acc + vals.sum() + idx.sum()
        q = q + vals[:, :1] * 1e-9
        return acc, q
    acc, _ = lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), q0))
    return acc


print(f"PQ codes {N}x{M} (ksub {KSUB}), {Q} queries, top-{K}, {ITERS} iters; "
      f"device bytes: {codes.nbytes / 1e6:.0f} MB vs exact "
      f"{N * D * 4 / 1e6:.0f} MB")
bench(codes_d, C_d, q_d).block_until_ready()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    jax.device_get(bench(codes_d, C_d, q_d))
    best = min(best, time.perf_counter() - t0)
ms = best / ITERS * 1e3
print(f"{ms:.3f} ms / {Q}-query batch  ->  {Q * ITERS / best:,.0f} queries/s")
