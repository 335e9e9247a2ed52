#!/usr/bin/env python
"""End-to-end quickstart on synthetic data — no downloads needed.

Runs the reference's full `all`-target pipeline (train a CycleGAN day→night
generator → dump translated images → GAN-augmented GeM fine-tune → learn Lw
whitening → retrieval eval) at micro scale on generated images, through the
same YAML scenario engine the real iccv23 configs use
(/root/reference/mdir/examples/iccv23/train/_train.yml target graph).

    python examples/quickstart_synthetic.py [--workdir DIR]

Finishes in a few minutes on CPU; on a TPU chip the same script runs
unchanged (JAX picks the platform). For the real experiments use the iccv23
configs instead:

    python -m gandtr_tpu.scenarios.run list \
        gandtr_tpu/scenarios/configs/iccv23/train/hedngan.yml
"""
import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def make_synthetic_data(root, hw=40, rng=None):
    """Day/night image lists, cid-structured fine-tune/whitening dbs and a
    synthetic roxford5k gnd — the same artifact layout the reference's
    download stage produces (mdir/tools/download.py:14-60)."""
    from PIL import Image
    rng = rng or np.random.RandomState(0)

    imgdir = os.path.join(root, "ims")
    os.makedirs(imgdir, exist_ok=True)
    names = []
    for i in range(8):
        # "day" images bright, "night" images dark — so the GAN has signal
        base = 0.7 if i < 4 else 0.2
        arr = np.clip(rng.rand(hw, hw, 3) * 0.3 + base, 0, 1)
        n = f"i{i}.jpg"
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(imgdir, n))
        names.append(n)
    with open(os.path.join(root, "day.txt"), "w") as f:
        f.write("\n".join(names[:4]))
    with open(os.path.join(root, "night.txt"), "w") as f:
        f.write("\n".join(names[4:]))

    cid_dir = os.path.join(root, "cids")
    cids = []
    for i in range(12):
        cid = "%040d" % (7777000 + i)
        sub = os.path.join(cid_dir, cid[-2:], cid[-4:-2], cid[-6:-4])
        os.makedirs(sub, exist_ok=True)
        Image.fromarray((rng.rand(hw, hw, 3) * 255).astype(np.uint8)).save(
            os.path.join(sub, cid), format="JPEG")
        cids.append(cid)
    train_db = {"cids": cids, "cluster": [i // 2 for i in range(12)],
                "qidxs": [0, 2, 4], "pidxs": [1, 3, 5]}
    with open(os.path.join(root, "train_db.pkl"), "wb") as f:
        pickle.dump({"train": train_db, "val": train_db}, f)
    with open(os.path.join(root, "whiten_db.pkl"), "wb") as f:
        pickle.dump({"cids": cids, "qidxs": [0, 2], "pidxs": [1, 3]}, f)

    from PIL import Image as _I
    test_dir = os.path.join(root, "test", "roxford5k")
    jpg = os.path.join(test_dir, "jpg")
    os.makedirs(jpg, exist_ok=True)
    imlist, groups = [], []
    for i in range(6):
        base = 0.15 if i < 3 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        _I.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(jpg, f"db{i}.jpg"))
        imlist.append(f"db{i}")
        groups.append(0 if i < 3 else 1)
    qimlist, gnd = [], []
    for qi, grp in enumerate([0, 1]):
        base = 0.15 if grp == 0 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        _I.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(jpg, f"q{qi}.jpg"))
        qimlist.append(f"q{qi}")
        pos = [i for i, g in enumerate(groups) if g == grp]
        gnd.append({"easy": np.asarray(pos[:2]), "hard": np.asarray(pos[2:]),
                    "junk": np.asarray([]), "bbx": [0, 0, 48, 48]})
    with open(os.path.join(test_dir, "gnd_roxford5k.pkl"), "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)
    return names


def write_scenario(root, hw=40):
    """The micro `all` target as a YAML file — the same step graph, function
    names and ${...} cross-step references as iccv23/train/_train.yml."""
    import yaml

    exp_gan = os.path.join(root, "exp_gan")
    exp_ft = os.path.join(root, "exp_ft")
    outdir = os.path.join(root, "night_out")
    gen = {"architecture": "official_resnet_generator",
           "ngf": 8, "n_blocks": 1, "norm_layer": "instance"}
    disc = {"architecture": "official_p2p_discriminator",
            "ndf": 8, "n_layers": 2, "norm_layer": "instance"}
    mean_std = [[0.5] * 3, [0.5] * 3]
    imnet = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    cir = {"architecture": "cirnet", "cir_architecture": "vgg16",
           "pooling": "gem", "local_whitening": False, "whitening": False}

    scenario = {"all": {
        "__doc__": "synthetic micro pipeline: gan -> output -> finetune -> whiten -> eval",
        "1_train_gan": {
            "__function__": "gandtr_tpu.stages.train",
            "sample_hw": 32,
            "network": {
                "type": "NetworkSet",
                "generator_X": {"model": dict(gen), "runtime": {
                    "wrappers": "", "data": {
                        "transforms": "pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
                        "mean_std": mean_std}}},
                "generator_Y": {"model": dict(gen),
                                "runtime": {"wrappers": "", "data": {}}},
                "discriminator_X": {"model": dict(disc),
                                    "runtime": {"wrappers": "", "data": {}}},
                "discriminator_Y": {"model": dict(disc),
                                    "runtime": {"wrappers": "", "data": {}}},
            },
            "learning": {
                "checkpoints": {"directory": exp_gan,
                                "store_every": 1, "checkpoint_every": 1},
                "training": {
                    "type": "EpochTraining", "epochs": 2, "seed": 0,
                    "criterion": {
                        "loss": "cycle_loss",
                        "loss_G_X": {"weights": {"adversarial": 1, "cycle": 10}},
                        "loss_G_Y": {"weights": {"adversarial": 1, "cycle": 10}},
                    },
                    "optimizer": {n: {"algorithm": "adam", "lr": 2e-4,
                                      "beta1": 0.5}
                                  for n in ("generator_X", "generator_Y",
                                            "discriminator_X",
                                            "discriminator_Y")},
                    "scheduler": {n: {"algorithm": "lambda_p2p",
                                      "n_epochs_decay": 1}
                                  for n in ("generator_X", "generator_Y",
                                            "discriminator_X",
                                            "discriminator_Y")},
                    "epoch_iteration": {"type": "SupervisedCycleGanEpoch",
                                        "pool_size": 4, "data": "train",
                                        "criterion": "default"},
                },
            },
            "output": {"learning": {"progress": {"print_each": 2}}},
            "data": {"train": {
                "dataset": {"name": "RandomDomainsPair",
                            "dataset_X": os.path.join(root, "day.txt"),
                            "dataset_Y": os.path.join(root, "night.txt"),
                            "image_dir": os.path.join(root, "ims") + "/*",
                            "size": 4},
                "loader": {"batch_size": 2, "num_workers": 1}}},
        },
        "2_output": {
            "__function__": "gandtr_tpu.stages.infer",
            "network": {
                "type": "SingleNetwork",
                "path": "${1_train_gan.parameters.learning.checkpoints"
                        ".directory}/epochs/generator_X_best.ckpt",
                "model": dict(gen),
                "runtime": {"wrappers": "", "data": {}},
            },
            "data": {"image_dir": os.path.join(root, "ims") + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": mean_std,
                     "loader": {"batch_size": 2}},
            "output": {"type": "image", "directory": outdir,
                       "structure": "flat"},
        },
        "3_finetune": {
            "__function__": "gandtr_tpu.stages.train",
            "network": {
                "type": "CirSequentialNetwork",
                "sequence": "augment,embed",
                "augment": {
                    "model": dict(gen),
                    "path": "${1_train_gan.parameters.learning.checkpoints"
                            ".directory}/epochs/generator_X_best.ckpt",
                    "runtime": {
                        "frozen": True,
                        "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                                    "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                                    "cir_ratio_pass_through:0.5:anc",
                        "data": {"transforms": "pil2np | totensor | normalize",
                                 "mean_std": mean_std}},
                },
                "embed": {"model": dict(cir),
                          "runtime": {"wrappers": "", "data": {}}},
            },
            "learning": {
                "checkpoints": {"directory": exp_ft},
                "training": {
                    "epochs": 1, "seed": 0,
                    "criterion": {"loss": "contrastive", "margin": 0.75},
                    "epoch_iteration": {"type": "SupervisedEpoch",
                                        "batch_average": False,
                                        "fakebatch": True, "data": "train",
                                        "criterion": "default"},
                    "optimizer": {"algorithm": "adam", "lr": 5e-5,
                                  "beta1": 0.9, "beta2": 0.999,
                                  "weight_decay": 0.0005},
                    "scheduler": {"algorithm": "gamma", "gamma": 0.99},
                },
            },
            "output": {"learning": {"progress": {"print_each": 2}}},
            "data": {"train": {
                "dataset": {"name": "CirDiverseAnchors",
                            "dataset_pkl": os.path.join(root, "train_db.pkl"),
                            "image_dir": os.path.join(root, "cids") + "/*",
                            "image_size": 32, "neg_num": 2, "pool_size": 10,
                            "query_size": 2, "qpool_size": 3,
                            "similar_exclude": 0.2, "similar_include": 0.8,
                            "split": "train"},
                "loader": {"batch_size": 2, "num_workers": 1}}},
        },
        "4_whitening": {
            "__function__":
                "gandtr_tpu.stages.multistep.infer_and_learn_whitening",
            "whitening": {"type": "lw",
                          "dataset_pkl": os.path.join(root, "whiten_db.pkl"),
                          "directory": "${3_finetune.parameters"
                                       ".learning.checkpoints.directory}"},
            "network": {
                "type": "SingleNetwork",
                "path": "${3_finetune.parameters.learning.checkpoints"
                        ".directory}/epochs/embed_best.ckpt",
                "model": dict(cir),
                "runtime": {"wrappers": "", "data": {}},
            },
            "data": {"image_dir": os.path.join(root, "cids") + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": imnet},
            "output": {"dimensions": 512},
        },
        "5_eval": {
            "__function__": "gandtr_tpu.stages.validate",
            "network": {
                "type": "SingleNetwork",
                "path": "${3_finetune.parameters.learning.checkpoints"
                        ".directory}/epochs/embed_best.ckpt",
                "model": dict(cir),
                "runtime": {"wrappers": {"eval": {
                    "0_cirwhiten": {
                        "whitening": "${4_whitening._output_metadata"
                                     ".whitening_path}",
                        "dimensions": None},
                    "1_cirmultiscale": {"scales": True}}}},
            },
            "data": {"image_size": 48,
                     "transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
                     "mean_std": imnet},
            "validation": {"dir_main": os.path.join(root, "test"),
                           "datasets": ["roxford5k"]},
        },
    }}
    path = os.path.join(root, "quickstart.yml")
    with open(path, "w") as f:
        yaml.safe_dump(scenario, f, sort_keys=False)
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="quickstart_out")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU platform (e.g. when the "
                             "environment pins JAX_PLATFORMS to a TPU plugin)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    root = os.path.abspath(args.workdir)
    os.makedirs(root, exist_ok=True)
    print("== generating synthetic data under %s" % root)
    names = make_synthetic_data(root)
    yml = write_scenario(root)
    print("== scenario written to %s" % yml)
    print("   (equivalent CLI: ls %s/ims | python -m gandtr_tpu.scenarios.run"
          " all %s)" % (root, yml))

    from gandtr_tpu.scenarios.engine import load_yaml_scenario
    from gandtr_tpu.scenarios.run import run_target

    scenario = load_yaml_scenario([yml])
    results = run_target(scenario, "all", "quickstart", stdin_data=names)

    print("\n== pipeline finished")
    print("   GAN losses:       %s" % {
        k: round(v, 3) for k, v in list(
            results["1_train_gan"].get("metrics", {}).items())[:4]})
    outdir = os.path.join(root, "night_out")
    print("   translated imgs:  %d under %s" % (len(os.listdir(outdir)), outdir))
    print("   whitening pkl:    %s" % results["4_whitening"]["whitening_path"])
    val = results["5_eval"]["metadata"]["validation"]
    medium = {k: round(100 * v, 2) for k, v in val.items() if "map" in k}
    print("   synthetic eval:   %s" % medium)
    return 0


if __name__ == "__main__":
    sys.exit(main())
