"""Synthetic dry-run of the published-mAP reproduction command
(docs/REPRODUCE.md): the REAL iccv23 eval scenario YAML, driven end-to-end
with only path overrides — a reference-format checkpoint fixture, a synthetic
Lw pkl, and a synthetic roxford5k directory. Proves the one-command flow so
that with real data/weights the same command reproduces README.md:223-235.
"""
import os
import pickle
import json

import numpy as np
import pytest
from PIL import Image

from gandtr_tpu.scenarios.run import run_target, FUNCTIONS
from gandtr_tpu.scenarios.engine import load_yaml_scenario

from test_hub_pretrained_fixture import _vgg16_gem_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL_YML = os.path.join(REPO, "gandtr_tpu", "scenarios", "configs", "iccv23",
                        "eval", "hedngan.yml")


@pytest.fixture(scope="module")
def synth_roxford(tmp_path_factory):
    root = tmp_path_factory.mktemp("repro_data")
    ds = root / "roxford5k"
    jpg = ds / "jpg"
    jpg.mkdir(parents=True)
    rng = np.random.RandomState(0)
    imlist, groups = [], []
    for i in range(6):
        name = f"db{i}"
        base = 0.15 if i < 3 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"{name}.jpg")
        imlist.append(name)
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
    with open(ds / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)
    return str(root)


def test_eval_scenario_dryrun_cli_form(tmp_path, synth_roxford, monkeypatch):
    """Exactly the REPRODUCE.md command shape: the real hedngan eval yml plus
    `key=value` overrides pointing at local stand-ins."""
    _, _, _, _, ckpt, lw = _vgg16_gem_fixture(tmp_path)
    # well-conditioned whitening (identity + jitter) so the synthetic
    # brightness separation survives the projection
    rng = np.random.RandomState(1)
    with open(lw, "wb") as f:
        pickle.dump({"m": np.zeros((512, 1)),
                     "P": np.eye(512) + rng.randn(512, 512) * 1e-3}, f)

    # zero-egress: the download step becomes a no-op (data already staged)
    import gandtr_tpu.utils.download as dl
    monkeypatch.setattr(dl, "roxf5k_rpar6k_247tokyo1k", lambda d: None)

    scenario = load_yaml_scenario([
        EVAL_YML,
        "eval.1_evaluate.network.path=%s" % json.dumps(str(ckpt)),
        "eval.1_evaluate.network.runtime.wrappers.eval.0_cirwhiten.whitening=%s"
        % json.dumps(str(lw)),
        "eval.1_evaluate.validation.dir_main=%s" % json.dumps(synth_roxford),
        'eval.1_evaluate.validation.datasets*=["roxford5k"]',
        "eval.1_evaluate.data.image_size=64",
    ])
    results = run_target(scenario, "eval", "hedngan")

    metadata = results["1_evaluate"]["metadata"]["validation"]
    medium = [v for k, v in metadata.items()
              if "roxford5k" in k and "map_medium" in k]
    assert medium, metadata.keys()
    # real weights + brightness-separable groups: far above chance
    assert medium[0] > 0.6, medium
    # print_scores step consumed the metadata without error
    assert "2_print_scores" in results
