"""CLI/config semantics pinned by review: SCENARIO_NAME derivation
(reference perform_scenario.py:116), key+ overrides through scalar
intermediates (tools/utils.py:27-34 deep-overlay semantics), and the
cirtorch-format subnet extraction."""
import os
import pickle

import numpy as np

from gandtr_tpu.scenarios.run import derive_scenario_name
from gandtr_tpu.scenarios.engine import load_yaml_scenario


class TestScenarioName:
    def test_last_yaml_wins(self):
        # overlay chains are named after the most-derived file (paths[-1])
        assert derive_scenario_name(["base.yml", "conf/rcfgan.yml"]) == "rcfgan"

    def test_overrides_do_not_count(self):
        assert derive_scenario_name(
            ["base.yml", "dir/cut.yml", "train.epochs=3"]) == "cut"

    def test_single(self):
        assert derive_scenario_name(["a/b/hedngan.yml"]) == "hedngan"


class TestOverrideThroughScalar:
    def test_append_through_scalar_replaces(self, tmp_path):
        # `beta.x+=[1]` over `beta: day`: the scalar intermediate is replaced
        # by the override subtree (deep-overlay semantics), not a crash
        p = tmp_path / "s.yml"
        p.write_text("beta: day\n")
        out = load_yaml_scenario([str(p), "beta.x+=[1]"])
        assert out["beta"]["x"] == [1]

    def test_append_to_existing_list(self, tmp_path):
        p = tmp_path / "s.yml"
        p.write_text("beta:\n  x: [0]\n")
        out = load_yaml_scenario([str(p), "beta.x+=[1]"])
        assert out["beta"]["x"] == [0, 1]


class TestConvertContainedNet:
    def _write_ckpt(self, path, variables):
        import flax.serialization
        with open(path, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(variables))

    def test_extracts_named_subnet(self, tmp_path):
        from gandtr_tpu.scenarios.cirtorch_format_stage import \
            convert_contained_net
        sub = {"params": {"whiten": {
            "kernel": np.ones((4, 2), np.float32),
            "bias": np.zeros((2,), np.float32)}}}
        ckpt = str(tmp_path / "multi.msgpack")
        self._write_ckpt(ckpt, {"embed": sub, "augment": {"params": {}}})
        out = str(tmp_path / "out" / "cir.pkl")
        (meta,) = convert_contained_net(
            {"input_path": ckpt, "output_path": out, "network": "embed"}, ())
        assert meta["keys"] == 2
        with open(out, "rb") as f:
            st = pickle.load(f)["state_dict"]
        assert set(st) == {"whiten.weight", "whiten.bias"}
        assert st["whiten.weight"].shape == (2, 4)  # torch (out, in)

    def test_missing_subnet_errors(self, tmp_path):
        from gandtr_tpu.scenarios.cirtorch_format_stage import \
            convert_contained_net
        ckpt = str(tmp_path / "multi.msgpack")
        self._write_ckpt(ckpt, {"other": {"params": {}}})
        try:
            convert_contained_net({"input_path": ckpt,
                                   "output_path": str(tmp_path / "o.pkl"),
                                   "network": "embed"}, ())
        except KeyError as exc:
            assert "embed" in str(exc)
        else:
            raise AssertionError("missing subnet must raise, not write an "
                                 "empty state_dict")
