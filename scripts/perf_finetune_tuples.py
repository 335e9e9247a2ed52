"""Fine-tune step tuple-batch (T) sweep at the published protocol shapes.

PERF.md's 56.4 ms "tuple step" number is T=1; the shipped training path
batches loader batch_size=5 tuples per step (finetune.yml batch 5 — the
reference's optimizer.step() cadence). The descriptor/generator batch sweeps
were NON-monotonic (tiling sweet spots at 16/24), so measure T ∈ {1, 2, 5, 8}
for the full-size step: frozen 9-block generator (anchor-only) → CLAHE v3 →
bf16 GeM-VGG16 embed → contrastive → Adam, 7 images × 364² per tuple.

Harness: in-graph fori_loop; reduce over UPDATED embed weights (fetching
only the step counter DCEs the whole training graph — docs/PERF.md).
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_single_net
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import supervised

S, HW = 7, 364  # 1 anc + 1 pos + 5 neg at the generator-safe 364 bucket


def build_step():
    augment = build_single_net({
        "model": {"architecture": "official_resnet_generator", "n_blocks": 9,
                  "no_antialias": True, "no_antialias_up": True,
                  "norm_layer": "instance"},
        "runtime": {"frozen": True,
                    "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                                "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                                "clahepost:[[0.485,0.456,0.406],"
                                "[0.229,0.224,0.225]]:1.0,"
                                "cir_ratio_pass_through:0.25:anc",
                    "data": {}}})
    embed = build_single_net({
        "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                  "pooling": "gem", "local_whitening": False,
                  "whitening": False},
        "runtime": {"wrappers": "", "data": {}, "dtype": "bfloat16"}})
    models = {"augment": augment, "embed": embed}
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (S, HW, HW, 3)) * 2 - 1
    variables = {
        "augment": dict(augment.init(jax.random.PRNGKey(1), x0, train=False)),
        "embed": dict(embed.init(jax.random.PRNGKey(2), x0))}
    tx, _ = initialize_optimizer({"algorithm": "adam", "lr": 5e-7,
                                  "beta1": 0.9, "beta2": 0.999,
                                  "weight_decay": 0.0005})
    state = supervised.make_finetune_state(variables, tx)
    step = supervised.build_finetune_step(models, tx, margin=0.75,
                                          augment_positions=(0,))
    return step, state


def measure(step, state, T, iters=5):
    imgs = jax.random.uniform(jax.random.PRNGKey(3),
                              (T, S, HW, HW, 3)) * 2 - 1
    masks = jnp.ones((T, S, HW, HW))
    labels = jnp.tile(jnp.asarray([-1.0, 1.0, 0, 0, 0, 0, 0]), (T, 1))
    pmask = jnp.zeros((T, S), bool).at[:, 0].set(True)

    @jax.jit
    def timed_loop(st, x):
        def body(i, s):
            s2, _ = step(s, x + i.astype(x.dtype) * 1e-5, masks, labels,
                         pmask)
            return s2
        out = jax.lax.fori_loop(0, iters, body, st)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in
                   jax.tree_util.tree_leaves(
                       out.variables["embed"]["params"]))

    assert np.isfinite(float(timed_loop(state, imgs)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed_loop(state, imgs))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


if __name__ == "__main__":
    step, state = build_step()
    for T in (1, 2, 5, 8):
        try:
            ms = measure(step, state, T) * 1e3
            print("T=%d: %7.1f ms/step  %5.2f tuples/s  %5.1f img/s"
                  % (T, ms, T / ms * 1e3, T * S / ms * 1e3), flush=True)
        except Exception as e:
            print("T=%d: FAILED %s" % (T, str(e)[:200]), flush=True)
            break
