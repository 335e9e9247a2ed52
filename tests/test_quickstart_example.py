"""Smoke test for examples/quickstart_synthetic.py.

The all-target chain semantics are pinned by tests/test_all_target_chain.py;
this additionally covers what only the example exercises: the YAML
round-trip (write_scenario -> yaml.safe_dump -> engine loader) and the
user-facing entry function.
"""
import os
import sys

import numpy as np

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(EXAMPLES))


def test_quickstart_end_to_end(tmp_path, capsys):
    import quickstart_synthetic as qs

    root = str(tmp_path / "qs")
    os.makedirs(root)
    names = qs.make_synthetic_data(root, hw=32)
    yml = qs.write_scenario(root, hw=32)
    assert os.path.exists(yml)

    from gandtr_tpu.scenarios.engine import load_yaml_scenario
    from gandtr_tpu.scenarios.run import run_target

    scenario = load_yaml_scenario([yml])
    assert sorted(scenario["all"])[:2] == ["1_train_gan", "2_output"]
    results = run_target(scenario, "all", "quickstart_test", stdin_data=names)

    assert os.path.isdir(os.path.join(root, "night_out"))
    assert len(os.listdir(os.path.join(root, "night_out"))) == len(names)
    wpath = results["4_whitening"]["whitening_path"]
    assert wpath and os.path.exists(wpath)
    val = results["5_eval"]["metadata"]["validation"]
    medium = [v for k, v in val.items() if "map_medium" in k]
    assert medium and np.isfinite(medium[0])
