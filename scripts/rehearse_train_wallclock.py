"""End-to-end GAN-train wall-clock rehearsal ON CHIP with the REAL host
input pipeline (VERDICT r4 #1).

Round 4 gave the eval chain this treatment (rehearse_eval_wallclock.py);
REPRODUCE.md's GAN-train "~2.1 h" was still step-time x steps. Round-2's
eval lesson (throughput was 9x transfer-bound until uint8 staging landed)
says the host->tunnel path can hide an order of magnitude, so this script
measures the published hedngan protocol loop exactly as a user would run
it — synthetic JPEGs on disk -> Loader threads (decode via native loader,
scalecrop, normalize) -> batch upload -> jitted step -> per-step metrics
fetch (reference hot loop mirrored: supervised_epoch.py:171-211) — and
decomposes the wall into host pipeline / upload+dispatch / device compute.

Usage (background; first step compiles ~2-4 min through the tunnel):
  PYTHONPATH=. python scripts/rehearse_train_wallclock.py \
      --images 300 --steps 40 --epochs 3 [--batch 10]

Phases printed:
  [host]   loader-only throughput (no TPU): decode+transform+collate
  [upload] batch upload + scalar-fetch RTT through the tunnel
  [train]  sustained epochs of the real loop, per-phase wall breakdown
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp  # noqa: F401  (used by the chunked phase)


def make_corpus(root, n, seed=0):
    """Synthetic JPEG corpus shaped like retrieval-SfM crops: smooth
    structure + noise, mixed sizes 340-512, quality 90."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "ims"), exist_ok=True)
    names = {"day": [], "night": []}
    for domain, base in (("day", 180), ("night", 60)):
        for i in range(n):
            h = int(rng.randint(340, 513))
            w = int(rng.randint(340, 513))
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            img = (base
                   + 60 * np.sin(yy / rng.randint(20, 80))[..., None]
                   + 40 * np.cos(xx / rng.randint(20, 80))[..., None]
                   + rng.randn(h, w, 3) * 25)
            arr = np.clip(img, 0, 255).astype(np.uint8)
            name = "%s_%04d.jpg" % (domain, i)
            Image.fromarray(arr).save(os.path.join(root, "ims", name),
                                      quality=90)
            names[domain].append(name)
    for domain in names:
        with open(os.path.join(root, "%s.txt" % domain), "w") as f:
            f.write("\n".join(names[domain]) + "\n")
    return root


def build_scenario(root, steps, batch, epochs):
    """The hedngan protocol scenario (train_hedngan.yml values) over the
    synthetic corpus; detector pretrained-URL dropped (zero egress — weight
    VALUES don't change throughput)."""
    hed_runtime = {
        "wrappers": "rgb2bgr_pre,meanstd_pre:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                    "[[0.40787054,0.45752458,0.48109378],[1.0,1.0,1.0]]",
        "data": {"transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.5] * 3, [0.5] * 3]}}
    return {
        "network": {
            "type": "NetworkSet",
            "generator_X": {
                "type": "SingleNetwork",
                "model": {"architecture": "official_resnet_generator",
                          "no_antialias": True, "no_antialias_up": True,
                          "input_nc": 3, "output_nc": 3, "n_blocks": 9,
                          "norm_layer": "batch"},
                "initialize": {"weights": "kaiming_p2p", "seed": 0},
                "runtime": {"wrappers": "", "data": {
                    "transforms": "pil2np | totensor | normalize",
                    "mean_std": [[0.5] * 3, [0.5] * 3]}}},
            "detector": {"type": "SingleNetwork",
                         "model": {"architecture": "hed_interpolation"},
                         "initialize": {"weights": "normal", "seed": 3},
                         "runtime": dict(hed_runtime)},
            "detector_frozen": {"type": "SingleNetwork",
                                "model": {"architecture": "hed_interpolation"},
                                "initialize": {"weights": "normal", "seed": 3},
                                "runtime": {**hed_runtime, "frozen": True}},
            "discriminator_Y": {
                "type": "SingleNetwork",
                "model": {"architecture": "official_p2p_discriminator",
                          "no_antialias": True, "input_nc": 3,
                          "norm_layer": "batch"},
                "initialize": {"weights": "kaiming_p2p", "seed": 0},
                "runtime": {"wrappers": "", "data": {}}}},
        "learning": {
            "type": "TrainValLearning",
            "training": {
                "type": "EpochTraining", "epochs": epochs, "seed": 0,
                "criterion": {
                    "loss": "multihead_loss",
                    "weights": {"adversarial": 1, "edge": 5, "hed": 1},
                    "normalize_weights": False,
                    "adversarial": {"loss": "discriminator_loss",
                                    "criterion": {"loss": "mse"}},
                    "edge": {"loss": "l1"}, "hed": {"loss": "l1"}},
                "optimizer": {
                    "generator_X": {"algorithm": "adam", "lr": 2e-4,
                                    "beta1": 0.5, "beta2": 0.999,
                                    "weight_decay": 0},
                    "discriminator_Y": {"algorithm": "adam", "lr": 2e-4,
                                        "beta1": 0.5, "beta2": 0.999,
                                        "weight_decay": 0},
                    "detector": {"algorithm": "adam", "lr": 1e-6,
                                 "beta1": 0.9, "beta2": 0.999,
                                 "weight_decay": 0.0002}},
                "scheduler": {},
                "epoch_iteration": {"type": "SupervisedHEDNGANEpoch",
                                    "data": "train",
                                    "criterion": "default"}},
        },
        "data": {"train": {
            "dataset": {"name": "RandomDomainsPair",
                        "dataset_X": os.path.join(root, "day.txt"),
                        "dataset_Y": os.path.join(root, "night.txt"),
                        "image_dir": os.path.join(root, "ims"),
                        "size": steps * batch},
            "loader": {"batch_size": batch},
            "transforms": "pil2np | scalecrop:256_256:0.8_1 | totensor | "
                          "normalize",
            "mean_std": [[0.5] * 3, [0.5] * 3]}},
        "output": {"learning": {"progress": {"print_each": 100}}},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=300,
                    help="jpegs per domain")
    ap.add_argument("--steps", type=int, default=40, help="steps per epoch")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--root", default="/tmp/rehearse_train")
    ap.add_argument("--skip-host", action="store_true")
    ap.add_argument("--chunk", type=int, default=0,
                    help="dispatch_chunk K: scan K steps per device dispatch")
    args = ap.parse_args()

    t0 = time.time()
    if not os.path.exists(os.path.join(args.root, "day.txt")):
        make_corpus(args.root, args.images)
    print("[corpus] %d jpegs/domain ready (%.0fs)"
          % (args.images, time.time() - t0), flush=True)

    from gandtr_tpu.scenarios.build import build_gan_experiment
    scenario = build_scenario(args.root, args.steps, args.batch, args.epochs)

    t0 = time.time()
    exp = build_gan_experiment(scenario, sample_hw=256)
    print("[build] experiment built (%.0fs; init compiles through tunnel)"
          % (time.time() - t0), flush=True)
    loader, step, state = exp["loader"], exp["step"], exp["state"]
    training = exp["training"]
    batch_to_args = training.loop.batch_to_args

    # ---- phase 1: host pipeline alone ------------------------------------
    if not args.skip_host:
        loader.dataset.prepare_epoch()
        n_img = 0
        t0 = time.perf_counter()
        for b in loader:
            n_img += len(b[0]) * 2  # X + Y images decoded+transformed
        host_wall = time.perf_counter() - t0
        print("[host] %d images in %.1fs = %.1f img/s (%.0f ms/batch of "
              "%d+%d)" % (n_img, host_wall, n_img / host_wall,
                          host_wall / args.steps * 1e3, args.batch,
                          args.batch), flush=True)

    # ---- phase 2: upload + RTT -------------------------------------------
    loader.dataset.prepare_epoch()
    batches = []
    for i, b in enumerate(loader):
        batches.append(b)
        if i >= 7:
            break
    nbytes = sum(np.asarray(x).nbytes for x in batches[0])
    fetch = jax.jit(lambda x, y: (x.ravel()[0] + y.ravel()[0]))
    a = batch_to_args(batches[0])
    float(fetch(a[0], a[1]))  # compile
    t0 = time.perf_counter()
    reps = 0
    for b in batches:
        a = batch_to_args(b)
        float(fetch(a[0], a[1]))  # forces upload + one RTT
        reps += 1
    up_wall = (time.perf_counter() - t0) / reps
    print("[upload] %.1f MB/batch, %.0f ms/batch incl. scalar RTT "
          "(%.1f MB/s)" % (nbytes / 1e6, up_wall * 1e3,
                           nbytes / 1e6 / up_wall), flush=True)

    # ---- phase 3: sustained train loop (the real thing) ------------------
    # mirrors EpochLoop.run_epoch: prepare_epoch -> loader -> batch_to_args
    # -> step -> device_get(metrics) -> events logger. With --chunk K the
    # loop mirrors EpochLoop._run_epoch_chunked (one dispatch per K steps).
    events = exp["events"]
    chunk_fn = None
    if args.chunk > 1:
        from gandtr_tpu.learning.training import build_chunk_fn
        chunk_fn = build_chunk_fn(step)
        if hasattr(loader, "prefetch"):
            loader.prefetch = max(loader.prefetch, args.chunk + 2)

        def chunk_to_args(batches):
            return (jnp.asarray(np.stack([np.asarray(b[0]) for b in batches])),
                    jnp.asarray(np.stack([np.asarray(b[1]) for b in batches])))

    t_loader = t_upload = t_step = 0.0
    steps_done = 0
    epoch_walls = []
    wall0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor
    for epoch in range(1, args.epochs + 1):
        ep_wall0 = time.perf_counter()
        logger = (events.logger("train/learning", epoch, len(loader))
                  if events else (lambda *a, **k: None))
        loader.dataset.prepare_epoch()
        if chunk_fn is not None:
            # pipelined chunk mode (mirrors EpochLoop._run_epoch_chunked):
            # upload of chunk N+1 runs in a thread while chunk N computes.
            # timers: loader-wait = chunk assembly, upload-stall = blocked
            # in fut.result() (upload NOT hidden by compute), step+fetch =
            # blocked in device_get.
            def chunks_iter():
                nonlocal t_loader
                pending = []
                t0 = time.perf_counter()
                for batch in loader:
                    pending.append(batch)
                    if len(pending) == args.chunk:
                        t_loader += time.perf_counter() - t0
                        yield pending
                        pending = []
                        t0 = time.perf_counter()
                if pending:
                    t_loader += time.perf_counter() - t0
                    yield pending

            def prepare(pending):
                if len(pending) == 1:
                    return pending, batch_to_args(pending[0])
                return pending, chunk_to_args(pending)

            i = 0
            with ThreadPoolExecutor(1) as ex:
                ci = chunks_iter()
                first = next(ci, None)
                fut = ex.submit(prepare, first) if first is not None else None
                while fut is not None:
                    t1 = time.perf_counter()
                    pending, a = fut.result()
                    t2 = time.perf_counter()
                    if len(pending) == 1:
                        out = step(state, *a)
                        stepped = 1
                    else:
                        out = chunk_fn(state, *a)
                        stepped = len(pending)
                    nxt = next(ci, None)
                    fut = ex.submit(prepare, nxt) if nxt is not None else None
                    state, metrics = out[0], out[1]
                    metrics = jax.device_get(metrics)
                    t3 = time.perf_counter()
                    for j in range(stepped):
                        for key, value in metrics.items():
                            logger(key, float(value if stepped == 1
                                              else value[j]),
                                   "scalar/loss", iteration=i + j)
                    t_upload += t2 - t1
                    t_step += t3 - t2
                    steps_done += stepped
                    i += stepped
        else:
            it = iter(loader)
            i = 0
            while True:
                t0 = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                a = batch_to_args(batch)
                t2 = time.perf_counter()
                out = step(state, *a)
                state, metrics = out[0], out[1]
                metrics = jax.device_get(metrics)
                t3 = time.perf_counter()
                for key, value in metrics.items():
                    logger(key, float(value), "scalar/loss", iteration=i)
                t_loader += t1 - t0
                t_upload += t2 - t1
                t_step += t3 - t2
                steps_done += 1
                i += 1
        epoch_walls.append(time.perf_counter() - ep_wall0)
        print("[epoch %d] cumulative: loader-wait %.1fs, upload-stall %.1fs, "
              "step+fetch %.1fs over %d steps" % (epoch, t_loader, t_upload,
                                                  t_step, steps_done),
              flush=True)
    wall = time.perf_counter() - wall0
    per_step = wall / steps_done
    img_s = args.batch / per_step
    print("[train] %d steps in %.1fs = %.0f ms/step, %.1f img/s "
          "(in-graph bound 143 ms / 69.8 img/s)"
          % (steps_done, wall, per_step * 1e3, img_s), flush=True)
    print("[train] breakdown per step: loader-wait %.0f ms, upload %.0f ms,"
          " step+fetch %.0f ms" % (t_loader / steps_done * 1e3,
                                   t_upload / steps_done * 1e3,
                                   t_step / steps_done * 1e3), flush=True)
    est = 50 * 1000 * per_step / 3600
    print("[train] published protocol extrapolation: 50 epochs x 1000 steps"
          " = %.2f h at this rate" % est, flush=True)
    if len(epoch_walls) > 1:
        # WARM steady state (epoch 1 carries the compile wall)
        warm = sum(epoch_walls[1:]) / (len(epoch_walls) - 1)
        warm_step = warm / args.steps
        print("[train] WARM steady state (epochs 2+): %.0f ms/step, "
              "%.1f img/s; protocol = %.2f h + one-time compile %.0fs"
              % (warm_step * 1e3, args.batch / warm_step,
                 50 * 1000 * warm_step / 3600,
                 epoch_walls[0] - warm), flush=True)


if __name__ == "__main__":
    main()
