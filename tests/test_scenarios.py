"""Scenario engine + CLI: overlay/template/variable semantics, validity of our
iccv23 configs, parse-compatibility with the reference's scenario YAMLs, and a
micro end-to-end `train` target run."""
import os
import glob

import numpy as np
import pytest
import yaml
from PIL import Image

from gandtr_tpu.scenarios import engine
from gandtr_tpu.scenarios import run as runner


CONFIGS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "gandtr_tpu", "scenarios", "configs", "iccv23")
REFERENCE_EXAMPLES = "/root/reference/mdir/examples/iccv23"


class TestEngine:
    def test_overlay_operators(self):
        a = {"x": {"l": [1, 2], "k": 1}, "keep": "yes"}
        b = {"x": {"l*": [3], "k": 2, "new": 5}}
        out = engine.dict_deep_overlay(a, b)
        assert out["x"]["l"] == [3]
        assert out["x"]["k"] == 2
        assert out["x"]["new"] == 5
        assert out["keep"] == "yes"

    def test_append_operator(self):
        out = engine.dict_deep_overlay({"l": [1]}, {"l+": [2]})
        assert out["l"] == [1, 2]

    def test_list_merge_raises(self):
        with pytest.raises(ValueError):
            engine.dict_deep_overlay({"l": [1]}, {"l": [2]})

    def test_variables(self):
        data = {"a": "${b.c}", "d": "prefix_${SCENARIO_NAME}"}
        ref = {"b": {"c": 42}, "SCENARIO_NAME": "exp1", **data}
        out = engine.resolve_variables(data, ref)
        assert out["a"] == 42
        assert out["d"] == "prefix_exp1"

    def test_templates(self, tmp_path):
        (tmp_path / "base.yml").write_text("x:\n  y: 1\n  z: 2\n")
        (tmp_path / "main.yml").write_text(
            "section:\n  __template__: base.yml\n  x.y: 9\n")
        out = engine.load_yaml_scenario([str(tmp_path / "main.yml")])
        assert out["section"]["x"]["y"] == 9
        assert out["section"]["x"]["z"] == 2

    def test_cli_override(self, tmp_path):
        (tmp_path / "s.yml").write_text("a:\n  b: 1\n")
        out = engine.load_yaml_scenario([str(tmp_path / "s.yml"), "a.b=7"])
        assert out["a"]["b"] == 7


class TestOurConfigs:
    def test_configs_validate(self):
        ymls = glob.glob(os.path.join(CONFIGS, "train", "*.yml")) +             [p for p in glob.glob(os.path.join(CONFIGS, "eval", "*.yml"))
             if not os.path.basename(p).startswith("_")]
        assert ymls, "no scenario configs found"
        for path in ymls:
            scenario = engine.load_yaml_scenario([path])
            targets = [k for k, v in scenario.items() if isinstance(v, dict)]
            runner.parse_targets(scenario, targets)

    def test_eval_config_resolves_checkpoint_urls(self):
        path = os.path.join(CONFIGS, "eval", "hedngan.yml")
        s = engine.load_yaml_scenario([path])
        net = s["eval"]["1_evaluate"]["network"]
        assert net["path"].endswith("hedngan_embed_vgg16.pth")
        assert s["eval_r101"]["1_evaluate"]["network"]["model"][
            "cir_architecture"] == "resnet101"

    def test_list_action(self, capsys):
        path = os.path.join(CONFIGS, "train", "hedngan.yml")
        runner.main(["list", path])
        out = capsys.readouterr().out
        assert "train" in out and "eval" in out


@pytest.mark.skipif(not os.path.isdir(REFERENCE_EXAMPLES),
                    reason="reference not mounted")
class TestReferenceCompat:
    """The reference's own scenario YAMLs load + every step function resolves
    through OUR engine/registry (the reference scenario-validity test,
    test_scenario_validity.py:13-23, pointed at our implementation)."""

    def test_reference_scenarios_parse(self):
        ymls = [p for p in glob.glob(os.path.join(REFERENCE_EXAMPLES, "*", "*.yml"))
                if not os.path.basename(p).startswith("_")
                and "parameters" not in p]
        assert len(ymls) >= 8, ymls
        for path in ymls:
            scenario = engine.load_yaml_scenario([path])
            targets = [k for k, v in scenario.items() if isinstance(v, dict)]
            runner.parse_targets(scenario, targets)


class TestEndToEndScenario:
    def test_micro_train_target(self, tmp_path):
        """A micro GAN scenario runs start-to-finish through the CLI path."""
        imgdir = tmp_path / "ims"
        imgdir.mkdir()
        rng = np.random.RandomState(0)
        names = []
        for i in range(4):
            n = f"i{i}.jpg"
            Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                            ).save(imgdir / n)
            names.append(n)
        (tmp_path / "day.txt").write_text("\n".join(names[:2]))
        (tmp_path / "night.txt").write_text("\n".join(names[2:]))

        scenario = {
            "train": {
                "__doc__": "micro",
                "1_train": {
                    "__function__": "gandtr_tpu.stages.train",
                    "sample_hw": 32,
                    "network": {
                        "type": "NetworkSet",
                        "generator_X": {"model": {
                            "architecture": "official_resnet_generator",
                            "ngf": 4, "n_blocks": 1, "norm_layer": "instance"},
                            "runtime": {"wrappers": "", "data": {
                                "transforms": "pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
                                "mean_std": [[0.5] * 3, [0.5] * 3]}}},
                        "generator_Y": {"model": {
                            "architecture": "official_resnet_generator",
                            "ngf": 4, "n_blocks": 1, "norm_layer": "instance"},
                            "runtime": {"wrappers": "", "data": {}}},
                        "discriminator_X": {"model": {
                            "architecture": "official_p2p_discriminator",
                            "ndf": 4, "n_layers": 2, "norm_layer": "instance"},
                            "runtime": {"wrappers": "", "data": {}}},
                        "discriminator_Y": {"model": {
                            "architecture": "official_p2p_discriminator",
                            "ndf": 4, "n_layers": 2, "norm_layer": "instance"},
                            "runtime": {"wrappers": "", "data": {}}},
                    },
                    "learning": {
                        "checkpoints": {"directory": str(tmp_path / "exp"),
                                        "store_every": 2, "checkpoint_every": 1},
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
                                                "pool_size": 4,
                                                "data": "train",
                                                "criterion": "default"},
                        },
                    },
                    "output": {"learning": {"progress": {"print_each": 10}}},
                    "data": {"train": {
                        "dataset": {"name": "RandomDomainsPair",
                                    "dataset_X": str(tmp_path / "day.txt"),
                                    "dataset_Y": str(tmp_path / "night.txt"),
                                    "image_dir": str(imgdir) + "/*",
                                    "size": 2},
                        "loader": {"batch_size": 2, "num_workers": 1},
                        "transforms": "pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
                        "mean_std": [[0.5] * 3, [0.5] * 3],
                    }},
                },
            },
        }
        results = runner.run_target(scenario, "train", "micro")
        meta = results["1_train"]
        assert "metrics" in meta and "train/learning/total" in meta["metrics"]
        assert os.path.isdir(tmp_path / "exp" / "epochs")


def test_doctor_command(capsys):
    from gandtr_tpu.scenarios.run import main
    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "jit probe: OK" in out and out.strip().endswith("OK")
