"""Full fine-tune experiment on synthetic data: mining -> tuples -> GAN
augmentation in-loop -> contrastive updates -> checkpoints."""
import os

import numpy as np
from PIL import Image
import jax
import pytest

from gandtr_tpu.scenarios.finetune_build import build_finetune_experiment


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("ft")
    imgdir = d / "ims"
    imgdir.mkdir()
    rng = np.random.RandomState(0)
    images = []
    for i in range(16):
        n = f"im{i:02d}.jpg"
        Image.fromarray((rng.rand(48, 40, 3) * 255).astype(np.uint8)
                        ).save(imgdir / n)
        images.append(str(imgdir / n))
    db = {
        "cids": [f"im{i:02d}" for i in range(16)],
        "cluster": [i // 2 for i in range(16)],     # 8 clusters of 2
        "qidxs": [0, 2, 4, 6],
        "pidxs": [1, 3, 5, 7],
    }
    return db, images


def micro_params(tmp_path):
    return {
        "network": {
            "type": "CirSequentialNetwork",
            "sequence": "augment,embed",
            "augment": {
                "model": {"architecture": "official_resnet_generator",
                          "ngf": 4, "n_blocks": 1, "norm_layer": "instance"},
                "runtime": {
                    "frozen": True,
                    "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                                "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                                "clahepost:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:1.0,"
                                "cir_ratio_pass_through:0.5:anc",
                    "data": {"transforms": "pil2np | totensor | normalize",
                             "mean_std": [[0.5] * 3, [0.5] * 3]}},
            },
            "embed": {
                "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                          "pooling": "gem", "local_whitening": False,
                          "whitening": False},
                "runtime": {"wrappers": "", "data": {}},
            },
        },
        "learning": {
            "checkpoints": {"directory": str(tmp_path / "exp")},
            "training": {
                "epochs": 1, "seed": 0,
                "criterion": {"loss": "contrastive", "margin": 0.75},
                "epoch_iteration": {"type": "SupervisedEpoch",
                                    "batch_average": False, "fakebatch": True,
                                    "data": "train", "criterion": "default"},
                "optimizer": {"algorithm": "adam", "lr": 5e-5, "beta1": 0.9,
                              "beta2": 0.999, "weight_decay": 0.0005},
                "scheduler": {"algorithm": "gamma", "gamma": 0.99},
            },
        },
        "output": {"learning": {"progress": {"print_each": 10}}},
        "data": {"train": {
            "dataset": {"name": "CirDiverseAnchors", "image_size": 32,
                        "neg_num": 2, "pool_size": 12, "query_size": 3,
                        "qpool_size": 4, "similar_exclude": 0.2,
                        "similar_include": 0.8, "split": "train"},
            "loader": {"batch_size": 3, "num_workers": 1},
        }},
    }


def test_finetune_experiment_end_to_end(synth, tmp_path):
    db, images = synth
    exp = build_finetune_experiment(micro_params(tmp_path),
                                    directory=str(tmp_path / "exp"),
                                    db=db, images=images)
    training = exp["training"]
    assert training is not None
    state0 = exp["state"]
    state = training.run(state0)

    # embed weights moved, augment frozen
    d_embed = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state0.variables["embed"]["params"], state.variables["embed"]["params"])))
    assert d_embed > 0
    d_aug = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state0.variables["augment"]["params"], state.variables["augment"]["params"])))
    assert d_aug == 0

    # events + mining ran
    assert exp["events"].history
    assert "train/learning/total" in exp["events"].history[0]["metrics"]
    assert exp["dataset"].tuples is not None
    # negatives obey cluster dedup (no negative from the query's cluster)
    for q, p, negs in exp["dataset"].tuples:
        qc = db["cluster"][q]
        assert all(db["cluster"][n] != qc for n in negs)
    # checkpoints written
    assert os.path.isdir(tmp_path / "exp" / "epochs")


def test_embed_optimizer_gets_cirnet_param_groups(synth, tmp_path,
                                                  monkeypatch):
    """The finetune build must hand the cirnet parameter-group multipliers
    (GeM p at lr x10 / wd 0 — reference cirnet.py:11-33 via network.py:66-72)
    to the optimizer."""
    from gandtr_tpu.scenarios import finetune_build as fb

    captured = {}
    real = fb.initialize_optimizer

    def spy(params, group_mults=None):
        captured["mults"] = group_mults
        return real(params, group_mults=group_mults)

    monkeypatch.setattr(fb, "initialize_optimizer", spy)
    db, images = synth
    build_finetune_experiment(micro_params(tmp_path), db=db, images=images)
    assert captured["mults"] is not None
    lr, wd = captured["mults"]
    assert lr["gem_p"] == 10.0 and wd["gem_p"] == 0.0
    assert lr["backbone"]["features_0"]["conv"]["kernel"] == 1.0


def test_finetune_validation_uses_val_split(synth, tmp_path):
    """The validation loader must mine from data.val.dataset.split (reference
    finetune.yml sets split: val) — not silently reuse the train db."""
    import pickle

    db, images = synth
    imgdir = os.path.dirname(images[0])
    # a pkl carrying both splits in the "ids" form (filenames under image_dir)
    names = [os.path.basename(p) for p in images]
    train_db = dict(db)
    val_db = {
        "ids": names[8:16],
        "cluster": [i // 2 for i in range(8)],
        "qidxs": [0, 2], "pidxs": [1, 3],
    }
    pkl = tmp_path / "tuples.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"train": train_db, "val": val_db}, f)

    params = micro_params(tmp_path)
    params["learning"]["validation"] = {"frequency": 1}
    params["data"]["val"] = {
        "dataset": {"dataset_pkl": str(pkl), "split": "val",
                    "image_dir": imgdir, "neg_num": 2,
                    "query_size": 2, "pool_size": 8},
        "loader": {"batch_size": 1},
    }
    exp = build_finetune_experiment(params, directory=str(tmp_path / "expv"),
                                    db=db, images=images)
    vals = exp["training"].validations
    assert vals, "validation configured but not built"
    vds = vals[0].loader.dataset
    assert vds.db is not db
    assert vds.db["ids"] == val_db["ids"]
    # val images resolve under the configured image_dir
    assert all(os.path.dirname(p) == imgdir for p in vds.images)


def test_device_preprocess_staging_is_exact(synth, tmp_path):
    """uint8 staging (round-5): padded uint8 crops + per-image (h,w) with
    in-graph /255+normalize+mask must reproduce the host f32 pipeline
    EXACTLY — same mined tuples, same per-iteration losses, same extraction
    descriptors (imresize yields uint8 PIL; the transform is elementwise
    after it; the pad band re-zeroes via the mask multiply)."""
    db, images = synth
    runs = {}
    for dev in (False, True):
        params = micro_params(tmp_path)
        params["data"]["train"]["device_preprocess"] = dev
        # SGD, not Adam: staging on/off is a float-level variant comparison
        # (XLA fuses the in-graph /255+normalize differently) and Adam
        # amplifies ulp grad noise into ±lr sign flips (CLAUDE.md round-4);
        # the loss/descriptor asserts below are the value-level exactness
        # evidence, SGD lets the param assert stay tight too
        params["learning"]["training"]["optimizer"] = {
            "algorithm": "sgd", "lr": 1e-3}
        exp = build_finetune_experiment(
            params, directory=str(tmp_path / ("exp_dev%d" % dev)),
            db=db, images=images)
        assert exp["dataset"].device_preprocess == dev
        # extraction descriptors over a fixed idx set: ungated (pool) AND
        # gated (anchors, ratio 0.5 ⇒ a mixed augment/plain partition —
        # pins the u8 path's gate-partitioned dispatch against the host
        # mixed-batch graph)
        descs = exp["dataset"].extract_fn([0, 1, 2, 3, 4], label="neg-pool-mine")
        descs_anc = exp["dataset"].extract_fn(list(range(8)), label="anc-mine")
        state = exp["training"].run(exp["state"])
        hist = exp["events"].history
        runs[dev] = (descs, state, hist, descs_anc)
    d0, s0, h0, a0 = runs[False]
    d1, s1, h1, a1 = runs[True]
    np.testing.assert_allclose(d1, d0, atol=1e-6)
    np.testing.assert_allclose(a1, a0, atol=1e-6)
    assert len(h0) == len(h1)
    for e0, e1 in zip(h0, h1):
        for k, v in e0["metrics"].items():
            np.testing.assert_allclose(e1["metrics"][k], v, rtol=1e-5,
                                       atol=1e-6, err_msg=k)
    dmax = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s0.variables["embed"]["params"], s1.variables["embed"]["params"])))
    assert dmax < 1e-5, dmax
