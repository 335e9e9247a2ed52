"""Differential test of weight initialization vs the reference's ACTUAL
weight_initialization.py (loaded standalone; torch CPU).

Deterministic facts are compared exactly (he_normal bias 0.01, p2p conv bias
0, BN bias 0, untouched norm params for simple schemes); the random draws are
compared statistically on large tensors (std/mean within a few percent).

Pinned reference behaviors:
- `normal` / `uniform` randomize the CONV/LINEAR BIAS too (N(0,1) / U(0,1)),
  and leave norm-layer params untouched (weight_initialization.py:6-20);
- he_normal: std sqrt(2/fan_in), bias 0.01 (lines 22-46);
- *_p2p: conv N(0, init_gain) / kaiming fan_in, bias 0, BatchNorm scale
  N(1, init_gain) bias 0 (lines 54-76);
- the DEFAULT init_gain is 0.2, not pix2pix's 0.02: initialize_weights
  substitutes {"init_gain": 0.2} when the config has none (lines 81-85) —
  which the iccv23 scenario configs never set.
"""
import os
import sys
import importlib.util as ilu

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

_WI = "/root/reference/mdir/components/model/weight_initialization.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_WI),
                                     reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_wi():
    spec = ilu.spec_from_file_location("ref_weight_init", _WI)
    mod = ilu.module_from_spec(spec)
    sys.modules["ref_weight_init"] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_model():
    torch.manual_seed(0)
    return tnn.Sequential(
        tnn.Conv2d(32, 64, 3, padding=1),
        tnn.BatchNorm2d(64),
        tnn.Linear(64, 128),
    )


def _jax_params():
    rng = np.random.RandomState(0)
    return {
        "conv": {"kernel": np.zeros((3, 3, 32, 64), np.float32),
                 "bias": np.zeros((64,), np.float32)},
        "bn": {"scale": np.full((64,), 7.0, np.float32),
               "bias": np.full((64,), 7.0, np.float32)},
        "dense": {"kernel": np.zeros((64, 128), np.float32),
                  "bias": np.zeros((128,), np.float32)},
    }


def _ours(weights, **kw):
    import jax
    from gandtr_tpu.models.init import initialize_weights
    return initialize_weights(_jax_params(), jax.random.PRNGKey(3),
                              weights=weights, **kw)


@needs_reference
class TestSimpleSchemes:
    def test_normal_randomizes_weight_and_bias_std1(self, ref_wi):
        m = _torch_model()
        m.apply(ref_wi.initialize_weights("normal", None))
        ref_w = m[0].weight.detach().numpy()
        ref_b = m[0].bias.detach().numpy()
        assert abs(ref_w.std() - 1.0) < 0.05 and abs(ref_b.std() - 1.0) < 0.3
        got = _ours("normal")
        assert abs(np.std(got["conv"]["kernel"]) - 1.0) < 0.05
        assert abs(np.std(got["conv"]["bias"]) - 1.0) < 0.3
        assert abs(np.std(got["dense"]["kernel"]) - 1.0) < 0.05
        # norm params untouched (torch classname matches neither Conv nor
        # Linear) — the reference leaves BN at its own init
        np.testing.assert_array_equal(np.asarray(got["bn"]["scale"]), 7.0)
        np.testing.assert_array_equal(np.asarray(got["bn"]["bias"]), 7.0)
        assert float(m[1].weight.detach().min()) == 1.0  # BN untouched

    def test_uniform_is_0_1_on_weight_and_bias(self, ref_wi):
        m = _torch_model()
        m.apply(ref_wi.initialize_weights("uniform", None))
        ref_w = m[0].weight.detach().numpy()
        assert 0.0 <= ref_w.min() and ref_w.max() <= 1.0
        assert 0.0 <= float(m[0].bias.detach().min())
        got = _ours("uniform")
        w = np.asarray(got["conv"]["kernel"])
        b = np.asarray(got["conv"]["bias"])
        assert 0.0 <= w.min() and w.max() <= 1.0
        assert 0.0 <= b.min() and b.max() <= 1.0
        assert abs(w.mean() - ref_w.mean()) < 0.02

    def test_he_normal_std_and_bias_const(self, ref_wi):
        m = _torch_model()
        m.apply(ref_wi.initialize_weights("he_normal", None))
        ref_w = m[0].weight.detach().numpy()
        fan_in = 32 * 9
        assert abs(ref_w.std() - np.sqrt(2.0 / fan_in)) < 0.005
        np.testing.assert_allclose(m[0].bias.detach().numpy(), 0.01,
                                   rtol=1e-6)
        got = _ours("he_normal")
        assert abs(np.std(got["conv"]["kernel"]) - np.sqrt(2.0 / fan_in)) < 0.005
        np.testing.assert_allclose(np.asarray(got["conv"]["bias"]), 0.01,
                                   rtol=1e-6)
        # dense fan_in is its input dim
        assert abs(np.std(got["dense"]["kernel"]) - np.sqrt(2.0 / 64)) < 0.01


@needs_reference
class TestP2PSchemes:
    def test_default_init_gain_is_0_2(self, ref_wi):
        """The reference substitutes init_gain=0.2 when the config carries
        none — NOT the upstream pix2pix 0.02."""
        m = _torch_model()
        m.apply(ref_wi.initialize_weights("normal_p2p", None))
        ref_w = m[0].weight.detach().numpy()
        assert abs(ref_w.std() - 0.2) < 0.01
        # BN gamma ~ N(1, 0.2), beta 0
        assert abs(m[1].weight.detach().numpy().std() - 0.2) < 0.08
        assert abs(float(m[1].weight.detach().numpy().mean()) - 1.0) < 0.1
        np.testing.assert_array_equal(m[1].bias.detach().numpy(), 0.0)
        np.testing.assert_array_equal(m[0].bias.detach().numpy(), 0.0)

        got = _ours("normal_p2p")
        assert abs(np.std(got["conv"]["kernel"]) - 0.2) < 0.01
        assert abs(np.std(got["bn"]["scale"]) - 0.2) < 0.08
        assert abs(float(np.mean(got["bn"]["scale"])) - 1.0) < 0.1
        np.testing.assert_array_equal(np.asarray(got["bn"]["bias"]), 0.0)
        np.testing.assert_array_equal(np.asarray(got["conv"]["bias"]), 0.0)

    def test_explicit_init_gain_respected(self, ref_wi):
        m = _torch_model()
        m.apply(ref_wi.initialize_weights("normal_p2p", {"init_gain": 0.02}))
        assert abs(m[0].weight.detach().numpy().std() - 0.02) < 0.002
        got = _ours("normal_p2p", init_gain=0.02)
        assert abs(np.std(got["conv"]["kernel"]) - 0.02) < 0.002

    def test_kaiming_p2p_fan_in(self, ref_wi):
        m = _torch_model()
        m.apply(ref_wi.initialize_weights("kaiming_p2p", None))
        ref_w = m[0].weight.detach().numpy()
        assert abs(ref_w.std() - np.sqrt(2.0 / (32 * 9))) < 0.005
        got = _ours("kaiming_p2p")
        assert abs(np.std(got["conv"]["kernel"])
                   - np.sqrt(2.0 / (32 * 9))) < 0.005
