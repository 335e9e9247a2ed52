"""XLA TPU flag sweep on the full 9-block generator (batch 24, bf16).

Each variant runs in a subprocess (XLA_FLAGS is read at backend init).
Usage: python scripts/perf_flag_sweep.py            # orchestrate sweep
       python scripts/perf_flag_sweep.py --child B  # one measurement
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = [
    ("default", ""),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("lhs+vmem64m", "--xla_tpu_enable_latency_hiding_scheduler=true "
                    "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("aggr_fusion", "--xla_tpu_aggressive_opt_barrier_removal=true"),
]


def child(batch):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gandtr_tpu.models import initialize_model

    gen = initialize_model({
        "architecture": "official_resnet_generator",
        "no_antialias": True, "no_antialias_up": True,
        "input_nc": 3, "output_nc": 3, "n_blocks": 9,
        "norm_layer": "instance"})
    rng = jax.random.PRNGKey(0)
    x = (jax.random.uniform(rng, (batch, 256, 256, 3)) * 2 - 1).astype(jnp.bfloat16)
    v = gen.init(jax.random.PRNGKey(1), x[:1], train=False)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    ITERS = 30

    @jax.jit
    def loop(vv, z):
        def body(i, acc):
            y = gen.apply(vv, z + i.astype(z.dtype) * jnp.asarray(1e-4, z.dtype),
                          train=False)
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    assert np.isfinite(float(loop(v, x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(v, x))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print("RESULT ms=%.3f img_s=%.1f" % (best * 1e3, batch / best))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
        return
    for name, flags in VARIANTS:
        env = dict(os.environ)
        env["XLA_FLAGS"] = flags
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--child", "24"], env=env, capture_output=True,
                           text=True, timeout=1200)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name:14s} {line[0] if line else 'FAILED rc=%d %s' % (p.returncode, p.stderr[-200:])}",
              flush=True)
    for b in (20, 28, 32):
        env = dict(os.environ)
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--child", str(b)], env=env, capture_output=True,
                           text=True, timeout=1200)
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print(f"batch{b:9d} {line[0] if line else 'FAILED'}", flush=True)


if __name__ == "__main__":
    main()
