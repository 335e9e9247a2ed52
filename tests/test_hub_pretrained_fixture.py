"""Reference-format checkpoint fixtures for hub `pretrained=True` + the
scenario `load_network` path.

The reference's published `.pth` checkpoints carry a specific nested
structure (mdir/learning/network.py:212-219: {"net": {"type", "frozen",
"network_params", "model_state"}}) written by torch.save; the hub builds the
`.transform` from the checkpoint's runtime data params with a
transforms->augmentations rename (mdir/hub/model.py:38-42). These tests
synthesize byte-faithful checkpoints from the torch oracles, drive the full
pretrained pipeline against local files, and assert the importer maps 100%
of model params (ImportCoverageError otherwise).
"""
import pickle

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp
from PIL import Image

from test_models_parity import (build_torch_resnet_generator,
                                build_torch_vgg16_features, seq_state)

from gandtr_tpu import hub
from gandtr_tpu.utils import torch_import as ti


def _save_reference_checkpoint(path, model_state, network_params, frozen=False):
    """Write a checkpoint byte-faithful to Checkpoints.save_epoch's per-net
    FILES (reference checkpoints.py:58-107 + network.py:212-219): the file
    stores the FLAT dict; the "net" wrapper is added at LOAD time
    (checkpoints.py:209-220 — pinned by the cross-engine oracle, which loads
    this very fixture through the reference's own Checkpoints.load_network)."""
    state = {
        "type": "SingleNetwork",
        "frozen": frozen,
        "network_params": network_params,
        "model_state": {k: torch.as_tensor(np.asarray(v))
                        for k, v in model_state.items()},
    }
    torch.save(state, str(path))


def _vgg16_gem_fixture(tmp_path, gem_p=2.89):
    """Torch oracle vgg16-GeM net + reference-format .pth + Lw pkl."""
    torch.manual_seed(11)
    tm = build_torch_vgg16_features().eval()
    model_state = seq_state(tm, prefix="features.")
    model_state["pool.p"] = np.array([gem_p], np.float32)

    network_params = {
        "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                  "local_whitening": False, "pooling": "gem",
                  "pretrained": False, "regional": False, "whitening": False},
        "runtime": {
            "data": {"transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
                     "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
            "wrappers": "cirfaketuplebatch"},
    }
    ckpt = tmp_path / "hedngan_embed_vgg16.pth"
    _save_reference_checkpoint(ckpt, model_state, network_params)

    rng = np.random.RandomState(3)
    m = rng.randn(512, 1).astype(np.float64) * 0.01
    P = rng.randn(512, 512).astype(np.float64) * 0.05
    lw = tmp_path / "hedngan_embed_vgg16_lw.pkl"
    with open(lw, "wb") as f:
        pickle.dump({"m": m, "P": P}, f)
    return tm, gem_p, m, P, ckpt, lw


class TestEmbeddingPretrained:
    def test_full_pipeline_vs_torch_oracle(self, tmp_path):
        """pretrained=True against a local reference-format checkpoint:
        transform -> features -> GeM -> L2N -> Lw whitening, single scale."""
        tm, p, m, P, ckpt, lw = _vgg16_gem_fixture(tmp_path)
        model = hub._embedding("vgg16", str(ckpt), str(lw), pretrained=True,
                               multiscale=False)

        img = Image.fromarray(
            (np.random.RandomState(0).rand(70, 90, 3) * 255).astype(np.uint8))
        inp = np.asarray(model.transform(img))  # (H, W, 3), CLAHE+normalized
        desc = np.asarray(model(inp[None]))[0]  # (512,)

        with torch.no_grad():
            f = tm(torch.from_numpy(np.transpose(inp[None], (0, 3, 1, 2))))
            pooled = F.avg_pool2d(f.clamp(min=1e-6).pow(p),
                                  (f.size(-2), f.size(-1))).pow(1.0 / p)
            vec = pooled.squeeze(-1).squeeze(-1)
            vec = (vec / (vec.norm(dim=1, keepdim=True) + 1e-6)).numpy().T
        w = P @ (vec - m)
        w = w / np.linalg.norm(w, axis=0, keepdims=True)
        oracle = w[:, 0]

        cos = float(np.dot(desc, oracle) /
                    (np.linalg.norm(desc) * np.linalg.norm(oracle)))
        assert cos > 0.999, cos
        np.testing.assert_allclose(desc, oracle, rtol=1e-3, atol=1e-4)

    def test_transform_follows_checkpoint_data_params(self, tmp_path):
        """The checkpoint's runtime data params (not the built-in defaults)
        drive `.transform` — incl. the transforms->augmentations rename."""
        tm, p, m, P, ckpt, lw = _vgg16_gem_fixture(tmp_path)
        state = torch.load(str(ckpt), weights_only=False)
        data = state["network_params"]["runtime"]["data"]
        # rename as the reference runtime would carry post-hub fixup, and use
        # a distinctive pipeline (no CLAHE) + mean_std
        data["augmentations"] = data.pop("transforms")
        data["augmentations"] = "pil2np | totensor | normalize"
        data["mean_std"] = [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
        torch.save(state, str(ckpt))

        model = hub._embedding("vgg16", str(ckpt), str(lw), pretrained=True,
                               multiscale=False)
        img = Image.fromarray(np.full((8, 8, 3), 128, np.uint8))
        out = np.asarray(model.transform(img))
        # mean 0 / std 1: output is exactly the [0,1] image, no CLAHE shift
        np.testing.assert_allclose(out, np.full((8, 8, 3), 128 / 255.0,
                                                np.float32), atol=1e-6)

    def test_multiscale_pretrained_runs(self, tmp_path):
        tm, p, m, P, ckpt, lw = _vgg16_gem_fixture(tmp_path)
        model = hub._embedding("vgg16", str(ckpt), str(lw), pretrained=True,
                               multiscale=True)
        x = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
        desc = np.asarray(model(x[None]))[0]
        assert desc.shape == (512,)
        assert np.isfinite(desc).all()
        np.testing.assert_allclose(np.linalg.norm(desc), 1.0, atol=1e-4)

    def test_wrong_layout_raises_coverage_error(self, tmp_path):
        """A checkpoint whose model_state keys don't match the expected
        layout (e.g. 'module.'-prefixed) must fail loudly, not silently
        produce random-weight descriptors."""
        tm, p, m, P, ckpt, lw = _vgg16_gem_fixture(tmp_path)
        state = torch.load(str(ckpt), weights_only=False)
        state["model_state"] = {
            "module." + k: v for k, v in state["model_state"].items()}
        bad = tmp_path / "bad.pth"
        torch.save(state, str(bad))
        with pytest.raises(ti.ImportCoverageError):
            hub._embedding("vgg16", str(bad), str(lw), pretrained=True,
                           multiscale=False)


class TestGeneratorPretrained:
    def test_generator_vs_torch_oracle(self, tmp_path):
        """Full-size official 9-block generator checkpoint loads through the
        hub and matches the torch oracle forward."""
        torch.manual_seed(5)
        tg = build_torch_resnet_generator(n_blocks=9, norm="instance",
                                          ngf=64).eval()
        network_params = {
            "model": {"architecture": "official_resnet_generator",
                      "no_antialias": True, "no_antialias_up": True,
                      "input_nc": 3, "output_nc": 3, "n_blocks": 9,
                      "norm_layer": "instance"},
            "runtime": {"wrappers": "",
                        "data": {"transforms": "pil2np | totensor | normalize",
                                 "mean_std": [[0.5, 0.5, 0.5],
                                              [0.5, 0.5, 0.5]]}},
        }
        ckpt = tmp_path / "cyclegan_generator_X.pth"
        _save_reference_checkpoint(ckpt, seq_state(tg, prefix="model."),
                                   network_params, frozen=True)

        model = hub._generator("instance", str(ckpt), pretrained=True)
        x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
        out = np.asarray(model(x))
        with torch.no_grad():
            ref = tg(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    def test_scenario_load_network_reference_format(self, tmp_path):
        """The scenario-side loader (_load_network) drives the same
        reference-format file with full-coverage conversion."""
        from gandtr_tpu.scenarios.infer_stage import _load_network
        torch.manual_seed(6)
        tg = build_torch_resnet_generator(n_blocks=2, norm="instance",
                                          ngf=8).eval()
        ckpt = tmp_path / "generator_X_epoch_best.pth"
        _save_reference_checkpoint(
            ckpt, seq_state(tg, prefix="model."),
            {"model": {"architecture": "official_resnet_generator"},
             "runtime": {"wrappers": ""}})
        net, variables = _load_network({
            "path": str(ckpt),
            "model": {"architecture": "official_resnet_generator",
                      "no_antialias": True, "no_antialias_up": True,
                      "input_nc": 3, "output_nc": 3, "n_blocks": 2, "ngf": 8,
                      "norm_layer": "instance"},
            "runtime": {"wrappers": "", "data": {}}})
        x = np.random.RandomState(4).rand(1, 32, 32, 3).astype(np.float32)
        out = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
        with torch.no_grad():
            ref = tg(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(out, np.transpose(ref.numpy(), (0, 2, 3, 1)),
                                   rtol=1e-3, atol=1e-4)


class TestBuildPretrainedLoading:
    """scenarios/build._load_pretrained_into: unreachable checkpoints keep
    random init with a warning (zero-egress tolerance), but a PRESENT
    checkpoint that fills less than 100% of the model must fail loudly —
    never silently degrade to random weights."""

    def _hed_cfg(self, url):
        return {"architecture": "hed_interpolation", "width_mult": 0.0625,
                "pretrained": url}

    def _hed_variables(self):
        import jax
        import jax.numpy as jnp
        from gandtr_tpu.models import initialize_model
        m = initialize_model({"architecture": "hed_interpolation",
                              "width_mult": 0.0625})
        return m, dict(m.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 3), jnp.float32)))

    def test_unreachable_checkpoint_warns_and_keeps_init(self, tmp_path):
        import warnings
        from gandtr_tpu.scenarios.build import _load_pretrained_into
        _, variables = self._hed_variables()
        cfg = self._hed_cfg(str(tmp_path / "missing.pth"))
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = _load_pretrained_into(variables, cfg, "detector")
        assert out is variables
        assert any("Could not fetch" in str(x.message) for x in w)

    def test_partial_checkpoint_raises_not_warns(self, tmp_path):
        import torch
        from gandtr_tpu.scenarios.build import _load_pretrained_into
        from gandtr_tpu.utils.torch_import import ImportCoverageError
        model, variables = self._hed_variables()
        # a present checkpoint with a single bogus tensor: ~0% coverage
        path = tmp_path / "partial.pth"
        torch.save({"nonexistent.weight": torch.zeros(3)}, str(path))
        with pytest.raises(ImportCoverageError):
            _load_pretrained_into(variables, self._hed_cfg(str(path)),
                                  "detector")
