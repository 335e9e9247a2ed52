"""Chip probe for the bench.py finetune tuple line: compile the exact
bench graph through the tunnel, print XLA cost_analysis flops (same
method that pinned the 7.09 TFLOP hedngan constant) and the measured
ms/step at T=5 — pins FINETUNE_STEP_TFLOP and sanity-checks ~255 ms.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
from perf_finetune_tuples import build_step  # noqa: E402,F401  (same graph)

T, S, HW = 5, 7, 364
step, state = build_step()

imgs = jax.random.uniform(jax.random.PRNGKey(3), (T, S, HW, HW, 3)) * 2 - 1
masks = jnp.ones((T, S, HW, HW))
labels = jnp.tile(jnp.asarray([-1.0, 1.0, 0, 0, 0, 0, 0]), (T, 1))
pmask = jnp.zeros((T, S), bool).at[:, 0].set(True)
ITERS = 5


@jax.jit
def timed_loop(st, x):
    def body(i, s):
        s2, _ = step(s, x + i.astype(x.dtype) * 1e-5, masks, labels, pmask)
        return s2
    out = jax.lax.fori_loop(0, ITERS, body, st)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in
               jax.tree_util.tree_leaves(out.variables["embed"]["params"]))


single = jax.jit(lambda st, x: step(st, x, masks, labels, pmask)[0])
try:
    cost = single.lower(state, imgs).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl = float(cost.get("flops", float("nan")))
    print("cost_analysis flops/step: %.5g (%.4f TFLOP/step, %.5f TFLOP/img)"
          % (fl, fl / 1e12, fl / 1e12 / (T * S)), flush=True)
except Exception as e:
    print("cost_analysis unavailable:", str(e)[:300], flush=True)

t0 = time.time()
assert np.isfinite(float(timed_loop(state, imgs)))
print("compile+warm %.0fs" % (time.time() - t0), flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    float(timed_loop(state, imgs))
    best = min(best, (time.perf_counter() - t0) / ITERS)
print("T=%d: %.1f ms/step  %.1f img/s" % (T, best * 1e3, T * S / best),
      flush=True)
