"""The full `all`-target chain at micro scale, in ONE run_target call:
GAN train -> generator output -> GAN-augmented fine-tune -> whitening learn
-> retrieval eval, wired with the same cross-step ${...} references as the
reference's _train.yml target graph (mdir/examples/iccv23/train/_train.yml).
Every stage consumes the previous stage's artifacts through the context.
"""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from gandtr_tpu.scenarios import run as runner


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("allchain")
    rng = np.random.RandomState(0)

    # day/night image lists for GAN training + output
    imgdir = d / "ims"
    imgdir.mkdir()
    names = []
    for i in range(4):
        n = f"i{i}.jpg"
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                        ).save(imgdir / n)
        names.append(n)
    (d / "day.txt").write_text("\n".join(names[:2]))
    (d / "night.txt").write_text("\n".join(names[2:]))

    # cid-structured images + dbs for fine-tune and whitening
    cid_dir = d / "cids"
    cids = []
    for i in range(12):
        cid = "%040d" % (7777000 + i)
        sub = cid_dir / cid[-2:] / cid[-4:-2] / cid[-6:-4]
        os.makedirs(sub, exist_ok=True)
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                        ).save(sub / cid, format="JPEG")
        cids.append(cid)
    train_db = {"cids": cids, "cluster": [i // 2 for i in range(12)],
                "qidxs": [0, 2, 4], "pidxs": [1, 3, 5]}
    with open(d / "train_db.pkl", "wb") as f:
        pickle.dump({"train": train_db, "val": train_db}, f)
    with open(d / "whiten_db.pkl", "wb") as f:
        pickle.dump({"cids": cids, "qidxs": [0, 2], "pidxs": [1, 3]}, f)

    # synthetic roxford5k for the eval stage (two brightness groups)
    test_dir = d / "test" / "roxford5k"
    jpg = test_dir / "jpg"
    jpg.mkdir(parents=True)
    imlist, groups = [], []
    for i in range(6):
        base = 0.15 if i < 3 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"db{i}.jpg")
        imlist.append(f"db{i}")
        groups.append(0 if i < 3 else 1)
    qimlist, gnd = [], []
    for qi, grp in enumerate([0, 1]):
        base = 0.15 if grp == 0 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"q{qi}.jpg")
        qimlist.append(f"q{qi}")
        pos = [i for i, g in enumerate(groups) if g == grp]
        gnd.append({"easy": np.asarray(pos[:2]), "hard": np.asarray(pos[2:]),
                    "junk": np.asarray([]), "bbx": [0, 0, 48, 48]})
    with open(test_dir / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)
    return d


def test_all_target_micro_chain(synth, tmp_path):
    d = synth
    exp_gan = str(tmp_path / "exp_gan")
    exp_ft = str(tmp_path / "exp_ft")
    outdir = str(tmp_path / "night_out")
    mean_std_gan = [[0.5] * 3, [0.5] * 3]
    gen_model = {"architecture": "official_resnet_generator",
                 "ngf": 4, "n_blocks": 1, "norm_layer": "instance"}
    disc_model = {"architecture": "official_p2p_discriminator",
                  "ndf": 4, "n_layers": 2, "norm_layer": "instance"}

    scenario = {"all": {
        "__doc__": "micro all-target chain",
        "1_train_gan": {
            "__function__": "gandtr_tpu.stages.train",
            "sample_hw": 32,
            "network": {
                "type": "NetworkSet",
                "generator_X": {"model": dict(gen_model),
                                "runtime": {"wrappers": "", "data": {
                                    "transforms": "pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
                                    "mean_std": mean_std_gan}}},
                "generator_Y": {"model": dict(gen_model),
                                "runtime": {"wrappers": "", "data": {}}},
                "discriminator_X": {"model": dict(disc_model),
                                    "runtime": {"wrappers": "", "data": {}}},
                "discriminator_Y": {"model": dict(disc_model),
                                    "runtime": {"wrappers": "", "data": {}}},
            },
            "learning": {
                "checkpoints": {"directory": exp_gan,
                                "store_every": 1, "checkpoint_every": 1},
                "training": {
                    "type": "EpochTraining", "epochs": 1, "seed": 0,
                    "criterion": {
                        "loss": "cycle_loss",
                        "loss_G_X": {"weights": {"adversarial": 1, "cycle": 10}},
                        "loss_G_Y": {"weights": {"adversarial": 1, "cycle": 10}},
                    },
                    "optimizer": {
                        n: {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5}
                        for n in ("generator_X", "generator_Y",
                                  "discriminator_X", "discriminator_Y")},
                    "scheduler": {
                        n: {"algorithm": "lambda_p2p", "n_epochs_decay": 1}
                        for n in ("generator_X", "generator_Y",
                                  "discriminator_X", "discriminator_Y")},
                    "epoch_iteration": {"type": "SupervisedCycleGanEpoch",
                                        "pool_size": 4, "data": "train",
                                        "criterion": "default"},
                },
            },
            "output": {"learning": {"progress": {"print_each": 10}}},
            "data": {"train": {
                "dataset": {"name": "RandomDomainsPair",
                            "dataset_X": str(d / "day.txt"),
                            "dataset_Y": str(d / "night.txt"),
                            "image_dir": str(d / "ims") + "/*",
                            "size": 2},
                "loader": {"batch_size": 2, "num_workers": 1}}},
        },
        # 2: dump day->night images with the trained generator (output target)
        "2_output": {
            "__function__": "gandtr_tpu.stages.infer",
            "network": {
                "type": "SingleNetwork",
                "path": "${1_train_gan.parameters.learning.checkpoints"
                        ".directory}/epochs/generator_X_best.ckpt",
                "model": dict(gen_model),
                "runtime": {"wrappers": "", "data": {}},
            },
            "data": {"image_dir": str(d / "ims") + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": mean_std_gan,
                     "loader": {"batch_size": 2}},
            "output": {"type": "image", "directory": outdir,
                       "structure": "flat"},
        },
        # 3: fine-tune the embedding with the trained generator as frozen
        # GAN augmentation (the finetune target's augment.path wiring)
        "3_finetune": {
            "__function__": "gandtr_tpu.stages.train",
            "network": {
                "type": "CirSequentialNetwork",
                "sequence": "augment,embed",
                "augment": {
                    "model": dict(gen_model),
                    "path": "${1_train_gan.parameters.learning.checkpoints"
                            ".directory}/epochs/generator_X_best.ckpt",
                    "runtime": {
                        "frozen": True,
                        "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                                    "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                                    "cir_ratio_pass_through:0.5:anc",
                        "data": {"transforms": "pil2np | totensor | normalize",
                                 "mean_std": mean_std_gan}},
                },
                "embed": {
                    "model": {"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False},
                    "runtime": {"wrappers": "", "data": {}},
                },
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
            "output": {"learning": {"progress": {"print_each": 10}}},
            "data": {"train": {
                "dataset": {"name": "CirDiverseAnchors",
                            "dataset_pkl": str(d / "train_db.pkl"),
                            "image_dir": str(d / "cids") + "/*",
                            "image_size": 32, "neg_num": 2, "pool_size": 10,
                            "query_size": 2, "qpool_size": 3,
                            "similar_exclude": 0.2, "similar_include": 0.8,
                            "split": "train"},
                "loader": {"batch_size": 2, "num_workers": 1}}},
        },
        # 4: learn Lw whitening on the fine-tuned embedding
        "4_whitening": {
            "__function__": "gandtr_tpu.stages.multistep.infer_and_learn_whitening",
            "whitening": {"type": "lw",
                          "dataset_pkl": str(d / "whiten_db.pkl"),
                          "directory": "${3_finetune.parameters"
                                       ".learning.checkpoints.directory}"},
            "network": {
                "type": "SingleNetwork",
                "path": "${3_finetune.parameters.learning.checkpoints"
                        ".directory}/epochs/embed_best.ckpt",
                "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                          "pooling": "gem", "local_whitening": False,
                          "whitening": False},
                "runtime": {"wrappers": "", "data": {}},
            },
            "data": {"image_dir": str(d / "cids") + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": [[0.485, 0.456, 0.406],
                                  [0.229, 0.224, 0.225]]},
            "output": {"dimensions": 512},
        },
        # 5: retrieval eval with the fine-tuned net + learned whitening
        "5_eval": {
            "__function__": "gandtr_tpu.stages.validate",
            "network": {
                "type": "SingleNetwork",
                "path": "${3_finetune.parameters.learning.checkpoints"
                        ".directory}/epochs/embed_best.ckpt",
                "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                          "pooling": "gem", "local_whitening": False,
                          "whitening": False},
                "runtime": {"wrappers": {"eval": {
                    "0_cirwhiten": {
                        "whitening": "${4_whitening._output_metadata"
                                     ".whitening_path}",
                        "dimensions": None},
                    "1_cirmultiscale": {"scales": True}}}},
            },
            "data": {"image_size": 48,
                     "transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
                     "mean_std": [[0.485, 0.456, 0.406],
                                  [0.229, 0.224, 0.225]]},
            "validation": {"dir_main": str(d / "test"),
                           "datasets": ["roxford5k"]},
        },
    }}

    # the output step consumes the image list from stdin, like the
    # reference's `ls day/ | perform_scenario.py output ...`
    results = runner.run_target(scenario, "all", "allchain",
                                stdin_data=[f"i{i}.jpg" for i in range(4)])

    # every stage produced its artifact
    assert "metrics" in results["1_train_gan"]
    assert os.path.isdir(outdir) and len(os.listdir(outdir)) == 4
    assert "metrics" in results["3_finetune"]
    wpath = results["4_whitening"]["whitening_path"]
    assert wpath and os.path.exists(wpath)
    metadata = results["5_eval"]["metadata"]["validation"]
    medium = [v for k, v in metadata.items()
              if "roxford5k" in k and "map_medium" in k]
    assert medium and np.isfinite(medium[0]), metadata.keys()
