"""Chip sweep for the mining-extraction graphs (round-5 late: gate
partition).

Measures, with the in-graph fori-loop discipline (device_get barrier):
  1. the OLD mixed graph (augment+CLAHE on all 32, `where`-discarded — what
     the pool extraction used to dispatch),
  2. the NEW embed-only plain graph (what 'neg-pool-mine' and ~75% of
     anchors now dispatch), batch sweep 16/32/48,
  3. the gated augment graph at batch 8/16/32 (what passed anchors now
     dispatch with an all-True mask).

The partition win for the protocol pool (22k imgs) ≈ t_mixed / t_plain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_single_net

HW = 364
MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def build_models():
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
        "runtime": {"wrappers": "", "data": {}}})
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = {
        "augment": dict(augment.init(jax.random.PRNGKey(1), x0, train=False)),
        "embed": dict(embed.init(jax.random.PRNGKey(2), x0))}
    return augment, embed, variables


def masks_from(hws, B):
    rows = jnp.arange(HW)[None, :, None]
    cols = jnp.arange(HW)[None, None, :]
    return ((rows < hws[:, 0, None, None]) &
            (cols < hws[:, 1, None, None])).astype(jnp.float32)


def time_loop(fn, args, iters=10, reps=3):
    assert np.isfinite(float(fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    augment, embed, variables = build_models()
    rng = np.random.RandomState(0)
    ITERS = 10

    def inputs(B):
        u8 = jnp.asarray(rng.randint(0, 256, (B, HW, HW, 3), np.uint8))
        hws = jnp.asarray([(362, 272) if i % 2 else (272, 362)
                           for i in range(B)], jnp.int32)
        return u8, hws

    def graph(B, mode):
        # mode: "plain" (wrapped chain, generator skipped via
        # model_positions=() — the new pool dispatch), "mixed" (generator on
        # all rows, `where`-discarded — the OLD pool dispatch, pmask
        # all-False), "aug" (pmask all-True — the passed-anchor dispatch)
        pm = jnp.zeros((B,), bool) if mode != "aug" else jnp.ones((B,), bool)
        mp = {"model_positions": ()} if mode == "plain" else {}

        @jax.jit
        def timed(v, u8, hws):
            masks0 = masks_from(hws, B)

            def body(i, acc):
                x = u8.astype(jnp.float32) / 255.0 \
                    + i.astype(jnp.float32) * 1e-5
                x = (x - MEAN) / STD
                x = x * masks0[..., None]
                out = augment.apply(v["augment"], x, train=True,
                                    ctx={"pass_mask": pm}, mask=masks0, **mp)
                x2, masks = out if isinstance(out, tuple) else (out, masks0)
                y = embed.apply(v["embed"], x2, train=False, mask=masks)
                return acc + jnp.sum(y.astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        return timed

    for mode, batches in (("plain", (16, 32, 48)), ("mixed", (32,)),
                          ("aug", (8, 16, 32))):
        for B in batches:
            u8, hws = inputs(B)
            t = time_loop(graph(B, mode), (variables, u8, hws), ITERS)
            print("%6s B=%2d  %7.2f ms/batch  %7.1f img/s"
                  % (mode, B, t * 1e3, B / t), flush=True)


if __name__ == "__main__":
    main()
