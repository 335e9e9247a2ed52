"""End-to-end FINE-TUNE wall-clock rehearsal ON CHIP with the real host
pipeline (VERDICT r4 #1, second half): mining (qpool + neg-pool descriptor
extraction through the augment->embed chain @362) then tuple steps with
masked cv2-exact CLAHE — the published finetune.yml protocol shapes, scaled
down in COUNT only (pool 320 / qpool 80 / 25 tuples vs 22000/10000/2000),
then extrapolated to protocol counts at measured rates.

REPRODUCE's "~1.13 h" modeled ONLY step-time x steps; the real epoch also
pays a 32k-image mining extraction (10k qpool + 22k neg-pool) that this
script measures. Usage (background; compiles ~4-8 min through the tunnel):
  PYTHONPATH=. python scripts/rehearse_finetune_wallclock.py \
      [--images 420] [--epochs 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def make_corpus(root, n, seed=0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    imdir = os.path.join(root, "ims")
    os.makedirs(imdir, exist_ok=True)
    images = []
    for i in range(n):
        h = int(rng.randint(340, 521))
        w = int(rng.randint(340, 521))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = (120 + 70 * np.sin(yy / rng.randint(25, 90))[..., None]
               + 50 * np.cos(xx / rng.randint(25, 90))[..., None]
               + rng.randn(h, w, 3) * 20)
        name = os.path.join(imdir, "im%04d.jpg" % i)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            name, quality=90)
        images.append(name)
    return images


def protocol_params(workdir, epochs):
    """finetune.yml protocol values; counts scaled down, shapes kept."""
    return {
        "network": {
            "type": "CirSequentialNetwork",
            "sequence": "augment,embed",
            "augment": {
                "model": {"architecture": "official_resnet_generator",
                          "no_antialias": True, "no_antialias_up": True,
                          "input_nc": 3, "output_nc": 3, "n_blocks": 9,
                          "norm_layer": "batch"},
                "runtime": {
                    "frozen": True,
                    "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                                "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                                "clahepost:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:1.0,"
                                "cir_ratio_pass_through:0.25:anc",
                    "data": {"transforms": "pil2np | totensor | normalize",
                             "mean_std": [[0.5] * 3, [0.5] * 3]}},
            },
            "embed": {
                "model": {"architecture": "cirnet",
                          "cir_architecture": "vgg16",
                          "local_whitening": False, "pooling": "gem",
                          "pretrained": False, "regional": False,
                          "whitening": False},
                "runtime": {
                    "data": {"transforms":
                             "pil2np | apply_clahe:1.0 | totensor | "
                             "normalize",
                             "mean_std": [[0.485, 0.456, 0.406],
                                          [0.229, 0.224, 0.225]]},
                    "wrappers": "cirfaketuplebatch"},
            },
        },
        "learning": {
            "checkpoints": {"directory": os.path.join(workdir, "exp"),
                            "checkpoint_every": 0, "store_every": 0},
            "training": {
                "epochs": epochs, "seed": 0,
                "dispatch_chunk": 8,
                "criterion": {"loss": "contrastive", "margin": 0.75},
                "epoch_iteration": {"type": "SupervisedEpoch",
                                    "batch_average": False,
                                    "fakebatch": True,
                                    "data": "train", "criterion": "default"},
                "optimizer": {"algorithm": "adam", "lr": 5e-7, "beta1": 0.9,
                              "beta2": 0.999, "weight_decay": 0.0005},
                "scheduler": {"algorithm": "gamma", "gamma": 0.99},
            },
        },
        "output": {"learning": {"progress": {"print_each": 100}}},
        "data": {"train": {
            "dataset": {"name": "CirDiverseAnchors", "image_size": 362,
                        "neg_num": 5, "pool_size": 320, "query_size": 25,
                        "qpool_size": 80, "similar_exclude": 0.2,
                        "similar_include": 0.8, "split": "train"},
            "loader": {"batch_size": 5, "num_workers": 4},
        }},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=420)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/rehearse_finetune")
    args = ap.parse_args()

    t0 = time.time()
    images = make_corpus(args.root, args.images)
    rng = np.random.RandomState(1)
    n = len(images)
    db = {"cids": [os.path.basename(p)[:-4] for p in images],
          "cluster": [i // 2 for i in range(n)],
          "qidxs": list(range(0, n - 1, 2))[:120],
          "pidxs": list(range(1, n, 2))[:120]}
    print("[corpus] %d jpegs ready (%.0fs)" % (n, time.time() - t0),
          flush=True)

    from gandtr_tpu.scenarios.finetune_build import build_finetune_experiment
    params = protocol_params(args.root, args.epochs)
    t0 = time.time()
    exp = build_finetune_experiment(params,
                                    directory=os.path.join(args.root, "exp"),
                                    db=db, images=images)
    print("[build] experiment built (%.0fs)" % (time.time() - t0), flush=True)

    training, loader = exp["training"], exp["loader"]
    loop = training.loop
    state = exp["state"]
    dataset = exp["dataset"]

    # instrument: time prepare_epoch (mining: qpool+pool extraction +
    # selection) separately from the tuple-step loop phases
    t_mine = []
    orig_prepare = dataset.prepare_epoch

    def timed_prepare(*a, **k):
        t0 = time.perf_counter()
        out = orig_prepare(*a, **k)
        t_mine.append(time.perf_counter() - t0)
        n_ext = (len(dataset.tuples) if dataset.tuples is not None else 0)
        print("[mine] epoch mining %.1fs (%d tuples; qpool %d + pool %d "
              "extractions @362)" % (t_mine[-1],
                                     n_ext,
                                     params["data"]["train"]["dataset"]
                                     ["qpool_size"],
                                     params["data"]["train"]["dataset"]
                                     ["pool_size"]), flush=True)
        return out
    dataset.prepare_epoch = timed_prepare

    # drive the REAL loop (incl. dispatch_chunk pipelining): run_epoch calls
    # the timed prepare_epoch internally, so steps wall = epoch - mining
    steps_per_epoch = len(loader)
    epoch_walls = []
    wall0 = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        np.random.seed(epoch - 1)
        t0 = time.perf_counter()
        state, _ = loop.run_epoch(state, epoch)
        epoch_walls.append(time.perf_counter() - t0)
        training.state_hook(state, epoch, None)
        print("[epoch %d] wall %.1fs (mining %.1fs + %d steps)"
              % (epoch, epoch_walls[-1], t_mine[-1], steps_per_epoch),
              flush=True)
    wall = time.perf_counter() - wall0
    sd = max(steps_per_epoch, 1)
    step_walls = [(w - m) / sd for w, m in zip(epoch_walls, t_mine)]
    print("[steps] %d steps/epoch; ms/step per epoch: %s (in-graph bound "
          "255.5 ms T=5; epoch 1 carries the compile wall)"
          % (sd, ["%.0f" % (s * 1e3) for s in step_walls]), flush=True)

    # protocol extrapolation: per epoch = mining extraction scaled to
    # 10000 qpool + 22000 pool images + 400 steps (2000 tuples / batch 5).
    # WARM rates only — epoch 1 carries the one-time compile wall.
    ext_imgs = (params["data"]["train"]["dataset"]["qpool_size"]
                + params["data"]["train"]["dataset"]["pool_size"])
    warm_mine = t_mine[1:] if len(t_mine) > 1 else t_mine
    warm_steps = step_walls[1:] if len(step_walls) > 1 else step_walls
    mine_rate = ext_imgs / (sum(warm_mine) / len(warm_mine)) if warm_mine else 0
    step_wall = sum(warm_steps) / len(warm_steps)
    proto_epoch = 32000 / max(mine_rate, 1e-9) + 400 * step_wall
    print("[extrapolate] mining %.1f img/s -> protocol epoch = 32000/%.1f "
          "+ 400x%.2fs = %.0fs; 40 epochs = %.2f h (modeled-only figure "
          "was 1.13 h)" % (mine_rate, mine_rate, step_wall, proto_epoch,
                           proto_epoch * 40 / 3600), flush=True)
    print("[wall] rehearsal total %.1fs" % wall, flush=True)


if __name__ == "__main__":
    main()
