"""Lower the bench.py finetune graph on XLA-CPU and print cost_analysis
flops — KEPT AS A MEASURED NEGATIVE: cost_analysis reports ~1.9 TFLOP/step
(chip agrees, scripts/chip_finetune_probe.py) because it does not count
lax.scan/lax.map/while BODIES, where this step's bulk lives (fakebatch
per-image embed grads, per-image CLAHE map). bench.py's
FINETUNE_STEP_TFLOP is therefore analytic (see its comment); do NOT pin
MFU constants from cost_analysis for graphs with loop-heavy hot paths.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from gandtr_tpu.learning.network import build_single_net  # noqa: E402
from gandtr_tpu.learning.optimizers import initialize_optimizer  # noqa: E402
from gandtr_tpu.learning import supervised  # noqa: E402

T, S, HW = 5, 7, 364

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

imgs = jax.random.uniform(jax.random.PRNGKey(3), (T, S, HW, HW, 3)) * 2 - 1
masks = jnp.ones((T, S, HW, HW))
labels = jnp.tile(jnp.asarray([-1.0, 1.0, 0, 0, 0, 0, 0]), (T, 1))
pmask = jnp.zeros((T, S), bool).at[:, 0].set(True)

lowered = jax.jit(lambda st, x: step(st, x, masks, labels, pmask)[0]).lower(
    state, imgs)
cost = lowered.compile().cost_analysis()
if isinstance(cost, list):
    cost = cost[0]
flops = float(cost["flops"])
print("step flops: %.4g  (%.4f TFLOP/step, %.4f TFLOP/img at %d imgs)"
      % (flops, flops / 1e12, flops / 1e12 / (T * S), T * S))
