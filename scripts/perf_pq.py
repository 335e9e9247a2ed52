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


VARIANT = sys.argv[3] if len(sys.argv) > 3 else "gather"


def scan_gather(lut, ci):
    """The shipped index's unrolled gather+add."""
    scores = jnp.take(lut[0], ci[:, 0], axis=1)
    for mi in range(1, M):
        scores = scores + jnp.take(lut[mi], ci[:, mi], axis=1)
    return scores


def scan_onehot(lut, ci):
    """ADC via the MXU: one-hot codes per n-chunk contracted against the LUT
    (comparison iota==code fuses per tile; candidate if gathers are slow)."""
    chunk = 65536
    n = ci.shape[0]
    parts = []
    iota = jnp.arange(KSUB, dtype=jnp.int32)
    for s in range(0, n, chunk):
        cc = ci[s:s + chunk]  # (c, M)
        oh = (cc[:, :, None] == iota).astype(jnp.bfloat16)  # (c, M, K)
        parts.append(jnp.einsum("cmk,mqk->qc", oh, lut.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32))
    return jnp.concatenate(parts, axis=1)


SCAN = {"gather": scan_gather, "onehot": scan_onehot}[VARIANT]


@jax.jit
def bench(codes, C, q0):
    def body(i, carry):
        acc, q = carry
        lut = jnp.einsum("qmd,mkd->mqk", q.reshape(Q, M, DSUB), C,
                         preferred_element_type=jnp.float32)
        ci = codes.astype(jnp.int32)  # in-graph cast, like the shipped index
        scores = SCAN(lut, ci)
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
