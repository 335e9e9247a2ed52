"""run_target step chaining: ${step.key} / ${step.parameters.key} /
${step._output_metadata.key} references (reference perform_scenario.py:108-131)
and a micro finetune -> whitening-learn target chain on synthetic data."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from gandtr_tpu.scenarios import run as runner


def test_context_chaining(monkeypatch):
    seen = {}

    def fn_a(params, data):
        return ({"produced": "meta-a"},)

    def fn_b(params, data):
        seen.update(params)
        return ({},)

    monkeypatch.setitem(runner.FUNCTIONS, "test.fn_a", fn_a)
    monkeypatch.setitem(runner.FUNCTIONS, "test.fn_b", fn_b)

    scenario = {"t": {
        "1_a": {"__function__": "test.fn_a",
                "learning": {"checkpoints": {"directory": "exp/${SCENARIO_NAME}"}}},
        "2_b": {"__function__": "test.fn_b",
                "param_ref": "${1_a.parameters.learning.checkpoints.directory}/epochs",
                "meta_ref": "${1_a._output_metadata.produced}"},
    }}
    runner.run_target(scenario, "t", "scn")
    # .parameters refs resolve against the step's RESOLVED params (the
    # reference mutates the context entry in place, perform_scenario.py:127)
    assert seen["param_ref"] == "exp/scn/epochs"
    assert seen["meta_ref"] == "meta-a"


@pytest.fixture(scope="module")
def synthdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chain")
    imgdir = d / "ims"
    rng = np.random.RandomState(0)
    cids, paths = [], []
    for i in range(12):
        cid = "%040d" % (5555000 + i)
        sub = imgdir / cid[-2:] / cid[-4:-2] / cid[-6:-4]
        os.makedirs(sub, exist_ok=True)
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                        ).save(sub / cid, format="JPEG")
        cids.append(cid)
        paths.append(str(sub / cid))
    train_db = {"cids": cids, "cluster": [i // 2 for i in range(12)],
                "qidxs": [0, 2, 4], "pidxs": [1, 3, 5]}
    with open(d / "train_db.pkl", "wb") as f:
        pickle.dump({"train": train_db, "val": train_db}, f)
    whiten_db = {"cids": cids, "qidxs": [0, 2], "pidxs": [1, 3]}
    with open(d / "whiten_db.pkl", "wb") as f:
        pickle.dump(whiten_db, f)
    return d, imgdir


def test_micro_finetune_then_whitening_target(synthdir, tmp_path):
    """finetune-style target: train embed (1 epoch, tiny) then learn Lw
    whitening from its best checkpoint via the cross-step \\${} refs —
    the _train.yml finetune-target mechanics end-to-end."""
    d, imgdir = synthdir
    exp = str(tmp_path / "exp")
    scenario = {"finetune": {
        "1_finetune_embed": {
            "__function__": "gandtr_tpu.stages.train",
            "network": {
                "type": "CirSequentialNetwork",
                "sequence": "augment,embed",
                "augment": {
                    "model": {"architecture": "official_resnet_generator",
                              "ngf": 4, "n_blocks": 1,
                              "norm_layer": "instance"},
                    "runtime": {
                        "frozen": True,
                        "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                                    "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                                    "cir_ratio_pass_through:0.5:anc",
                        "data": {"transforms": "pil2np | totensor | normalize",
                                 "mean_std": [[0.5] * 3, [0.5] * 3]}},
                },
                "embed": {
                    "model": {"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False},
                    "runtime": {"wrappers": "", "data": {}},
                },
            },
            "learning": {
                "checkpoints": {"directory": exp},
                "training": {
                    "epochs": 1, "seed": 0,
                    "criterion": {"loss": "contrastive", "margin": 0.75},
                    "epoch_iteration": {"type": "SupervisedEpoch",
                                        "batch_average": False,
                                        "fakebatch": True,
                                        "data": "train",
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
                            "image_dir": str(imgdir),
                            "image_size": 32, "neg_num": 2, "pool_size": 10,
                            "query_size": 2, "qpool_size": 3,
                            "similar_exclude": 0.2, "similar_include": 0.8,
                            "split": "train"},
                "loader": {"batch_size": 2, "num_workers": 1},
            }},
        },
        "2_train_whitening": {
            "__function__": "gandtr_tpu.stages.multistep.infer_and_learn_whitening",
            "whitening": {"type": "lw",
                          "dataset_pkl": str(d / "whiten_db.pkl"),
                          "directory": "${1_finetune_embed.parameters"
                                       ".learning.checkpoints.directory}"},
            "network": {
                "type": "SingleNetwork",
                "path": "${1_finetune_embed.parameters.learning.checkpoints"
                        ".directory}/epochs/embed_best.ckpt",
                "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                          "pooling": "gem", "local_whitening": False,
                          "whitening": False},
                "runtime": {"wrappers": "", "data": {}},
            },
            "data": {"image_dir": str(imgdir) + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": [[0.485, 0.456, 0.406],
                                  [0.229, 0.224, 0.225]]},
            "output": {"dimensions": 512},
        },
    }}
    results = runner.run_target(scenario, "finetune", "chain")
    assert "metrics" in results["1_finetune_embed"]
    wpath = results["2_train_whitening"]["whitening_path"]
    assert wpath and os.path.exists(wpath)
    assert wpath.startswith(exp)
    with open(wpath, "rb") as f:
        lw = pickle.load(f)
    assert lw["P"].shape == (512, 512)


def test_zero_epoch_train_saves_notrain(synthdir, tmp_path):
    """`epochs: 0` stores the off-the-shelf networks as `_notrain` shortcuts
    and returns empty stage metadata without entering the epoch loop
    (reference stages/train.py:17-20 + checkpoints.py:42-56)."""
    from gandtr_tpu.scenarios.train_stage import train

    d, imgdir = synthdir
    exp = str(tmp_path / "exp_ots")
    params = {
        "network": {
            "type": "CirSequentialNetwork",
            "sequence": "augment,embed",
            "augment": {
                "model": {"architecture": "official_resnet_generator",
                          "ngf": 4, "n_blocks": 1, "norm_layer": "instance"},
                "runtime": {
                    "frozen": True,
                    "wrappers": "cir_ratio_pass_through:0.5:anc",
                    "data": {"transforms": "pil2np | totensor | normalize",
                             "mean_std": [[0.5] * 3, [0.5] * 3]}},
            },
            "embed": {
                "model": {"architecture": "cirnet",
                          "cir_architecture": "vgg16", "pooling": "gem",
                          "local_whitening": False, "whitening": False},
                "runtime": {"wrappers": "", "data": {}},
            },
        },
        "learning": {
            "checkpoints": {"directory": exp},
            "training": {
                "epochs": 0, "seed": 0,
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
                        "image_dir": str(imgdir),
                        "image_size": 32, "neg_num": 2, "pool_size": 10,
                        "query_size": 2, "qpool_size": 3,
                        "similar_exclude": 0.2, "similar_include": 0.8,
                        "split": "train"},
            "loader": {"batch_size": 2, "num_workers": 1},
        }},
    }
    (meta,) = train(params, None)
    assert meta == {}
    ed = os.path.join(exp, "epochs")
    assert os.path.isfile(os.path.join(ed, "embed_notrain.ckpt"))
    for suffix in ("_best", "_last"):
        link = os.path.join(ed, "embed" + suffix + ".ckpt")
        assert os.path.islink(link)
        assert os.path.realpath(link).endswith("embed_notrain.ckpt")
