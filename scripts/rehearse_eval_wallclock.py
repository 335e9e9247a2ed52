"""Full-protocol eval wall-clock rehearsal on a realistic synthetic census
(VERDICT r3 next #5): measure — not model — the tunnel-TPU compile wall,
steady extraction throughput, and ranking time for the bucketed eval default.

Design for the tunnel's constraints (CLAUDE.md: big uploads can wedge the
chip; 2 GB took 5-7 min + 20 min wedge):
- the COMPILE wall is per-bucket-shape, so we synthesize the FULL shape
  census (web-photo aspect distribution, longest side 1024, --n-shapes
  distinct sizes) but only --n-images images; compiles are measured exactly,
  throughput is measured on the subset and extrapolated linearly (labeled).
- images upload as uint8 (fused device preprocessing), ~0.7 MB each.

Writes the measured table to stdout; REPRODUCE.md quotes it.

Usage (defaults sized for ~15 min wall):
  PYTHONPATH=/root/repo python scripts/rehearse_eval_wallclock.py \
      --n-images 120 --n-shapes 60 --bucket 64
"""
import argparse
import collections
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_census(n_shapes, image_size=1024, seed=0):
    """Aspect ratios drawn from a web-photo-like mixture: mostly 4:3 / 3:2 /
    16:9 landscape+portrait with jitter, a few squares and panoramas."""
    rng = np.random.RandomState(seed)
    bases = [(4, 3), (3, 2), (16, 9), (1, 1), (5, 4), (2, 1)]
    probs = [0.35, 0.3, 0.15, 0.08, 0.09, 0.03]
    shapes = set()
    while len(shapes) < n_shapes:
        a, b = bases[rng.choice(len(bases), p=probs)]
        if rng.rand() < 0.45:
            a, b = b, a  # portrait
        jitter = 1.0 + rng.randn() * 0.03
        short = int(round(image_size * (b / a) * jitter))
        short = max(192, min(image_size, short))
        if short == image_size:
            shapes.add((image_size, image_size))
        elif rng.rand() < 0.5:
            shapes.add((image_size, short))
        else:
            shapes.add((short, image_size))
    return sorted(shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=120)
    ap.add_argument("--n-shapes", type=int, default=60)
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=1024)
    ap.add_argument("--arch", default="vgg16")
    ap.add_argument("--extrapolate-to", type=int, default=5000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gandtr_tpu.learning.network import build_single_net
    from gandtr_tpu.eval.retrieval import ShapeCachedExtractor
    from gandtr_tpu.data.transforms import split_device_transform
    from gandtr_tpu.ops import ranking as R

    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))
    float(x)
    print("probe ok %.1fs" % (time.time() - t0), flush=True)

    shapes = synth_census(args.n_shapes, args.image_size)
    buckets = collections.Counter()
    B = args.bucket
    for (h, w) in shapes:
        buckets[(-(-h // B) * B, -(-w // B) * B)] += 1
    print("census: %d distinct shapes -> %d buckets(%d): %s" % (
        len(shapes), len(buckets), B,
        sorted(buckets)), flush=True)

    # model + fused device preprocessing (uint8 upload), multiscale like the
    # published eval protocol (mirrors scenarios/validate_stage.py)
    net = build_single_net({
        "model": {"architecture": "cirnet", "cir_architecture": args.arch,
                  "pooling": "gem", "local_whitening": False,
                  "whitening": False, "regional": False},
        "runtime": {"wrappers": "", "data": {}}})
    var = dict(net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    host_tf, device_pre = split_device_transform(
        "pil2np | apply_clahe:1.0 | totensor | normalize",
        [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])

    from gandtr_tpu.learning.wrappers import (CirMultiscaleAggregation,
                                              multiscale_msp)
    net.wrappers_eval = [CirMultiscaleAggregation(scales=True)]
    msp = multiscale_msp({"architecture": "cirnet",
                          "cir_architecture": args.arch, "pooling": "gem",
                          "local_whitening": False, "whitening": False,
                          "regional": False}, var)

    def forward(v, xb, mask):
        xf = xb.astype(jnp.float32) / 255.0
        if device_pre is not None:
            xf = device_pre(xf, mask)
        return net.apply(v, xf, train=False, ctx={"msp": msp}, mask=mask)

    extractor = ShapeCachedExtractor(forward, var, shape_bucket=B)

    # synthetic images, round-robin over the census
    rng = np.random.RandomState(1)
    imgs = []
    for i in range(args.n_images):
        h, w = shapes[i % len(shapes)]
        imgs.append(rng.randint(0, 256, (h, w, 3), np.uint8))

    # --- phase 1: compile wall (first encounter of each bucket) ---
    compile_times = {}
    extract_times = []
    t_start = time.time()
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        key = (-(-h // B) * B, -(-w // B) * B)
        t0 = time.time()
        d = extractor(im)
        np.asarray(d)
        dt = time.time() - t0
        if key not in compile_times:
            compile_times[key] = dt
            print("  bucket %s: first image %.1fs (compile+run)" % (key, dt),
                  flush=True)
        else:
            extract_times.append(dt)
    wall = time.time() - t_start
    compile_wall = sum(compile_times.values())
    steady = np.median(extract_times) if extract_times else float("nan")
    n_steady = len(extract_times)
    print("\n== measured ==", flush=True)
    print("buckets compiled: %d; compile wall (incl. first-image run): %.1f s"
          % (len(compile_times), compile_wall), flush=True)
    print("steady extraction: median %.2f s/img over %d imgs (%.2f img/s; "
          "includes uint8 upload + host decode-free dispatch)"
          % (steady, n_steady, 1.0 / steady if steady else 0), flush=True)
    print("total wall for %d images: %.1f s" % (args.n_images, wall),
          flush=True)

    # --- phase 2: ranking + mAP on extrapolated-size matrices ---
    D = {"vgg16": 512, "resnet101": 2048}.get(args.arch, 512)
    n_db = args.extrapolate_to
    vecs = rng.randn(D, n_db).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=0, keepdims=True)
    qvecs = vecs[:, :70]
    t0 = time.time()
    ranks = np.asarray(R.rank_descriptors(vecs, qvecs))
    t_rank = time.time() - t0
    gnd = [{"ok": np.asarray([qi]), "junk": np.asarray([])}
           for qi in range(70)]
    t0 = time.time()
    try:
        m = R.compute_map(ranks, gnd)
        t_map = time.time() - t0
    except Exception as exc:
        m, t_map = ("err: %s" % exc), time.time() - t0
    print("ranking %dx%d: %.2f s; mAP protocol: %.2f s" % (
        n_db, 70, t_rank, t_map), flush=True)

    # --- extrapolation (labeled) ---
    total = compile_wall + steady * args.extrapolate_to + t_rank + t_map
    print("\n== extrapolated to %d images (linear in steady rate) =="
          % args.extrapolate_to, flush=True)
    print("compile %.1f min + extract %.1f min + rank/map %.1f min = "
          "%.1f min total" % (compile_wall / 60,
                              steady * args.extrapolate_to / 60,
                              (t_rank + t_map) / 60, total / 60), flush=True)


if __name__ == "__main__":
    main()
