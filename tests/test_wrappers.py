"""Wrapper parity tests: multiscale aggregation vs a torch oracle, whitening
wrapper vs numpy, pad-divisible round trip, md5 gating determinism."""
import hashlib

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gandtr_tpu.learning import wrappers as W


class TestMultiscale:
    def test_aggregation_matches_torch_oracle(self):
        """3-scale GeM-p power-mean aggregation (wrapper.py:224-260)."""
        torch.manual_seed(0)
        D = 16
        msp = 2.5
        scales = [1, 1 / np.sqrt(2), 1 / 2]
        descs_t = [torch.rand(D) + 0.1 for _ in scales]

        # torch oracle (aggregate_tensor, wrapper.py:237-248)
        v = torch.zeros(D)
        for s in descs_t:
            v += s.pow(msp)
        v = (v / len(scales)).pow(1.0 / msp)
        ref = (v / v.norm()).numpy()

        agg = W.CirMultiscaleAggregation(scales=True)
        descs_j = [jnp.asarray(s.numpy())[None] for s in descs_t]
        out = agg.post(descs_j, {"msp": msp}, None)
        np.testing.assert_allclose(np.asarray(out)[0], ref, rtol=1e-5)

    def test_pre_produces_torch_scale_sizes(self):
        torch.manual_seed(1)
        x_t = torch.randn(1, 3, 100, 140)
        agg = W.CirMultiscaleAggregation(scales=True)
        outs, _ = agg.pre(jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1)), {})
        for o, s in zip(outs, agg.scales):
            if s == 1:
                ref_shape = x_t.shape[2:]
            else:
                ref = F.interpolate(x_t, scale_factor=s, mode="bilinear",
                                    align_corners=False)
                ref_shape = ref.shape[2:]
            assert tuple(o.shape[1:3]) == tuple(ref_shape), s

    def test_scale_sets(self):
        assert W.CirMultiscaleAggregation("ss").scales == [1]
        assert len(W.CirMultiscaleAggregation("sms5").scales) == 5


class TestWhitenWrapper:
    def test_matches_numpy_whitenapply(self):
        from gandtr_tpu.ops.whiten import whitenapply
        rng = np.random.RandomState(0)
        D = 8
        P = rng.randn(D, D)
        m = rng.randn(D, 1)
        x = rng.randn(3, D).astype(np.float32)
        ref = whitenapply(x.T.astype(np.float64), m, P)  # (D, N)
        wr = W.CirtorchWhiten(P=P, m=m)
        out = wr.post(jnp.asarray(x), {}, None)
        np.testing.assert_allclose(np.asarray(out), ref.T, rtol=1e-4, atol=1e-5)

    def test_dimension_reduction(self):
        rng = np.random.RandomState(1)
        wr = W.CirtorchWhiten(P=rng.randn(8, 8), m=rng.randn(8, 1), dimensions=4)
        out = wr.post(jnp.asarray(rng.randn(2, 8).astype(np.float32)), {}, None)
        assert out.shape == (2, 4)


class TestPadDivisible:
    def test_round_trip(self):
        w = W.ReflectPadMakeDivisible(16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 37, 53, 3).astype(np.float32))
        padded, meta = w.pre(x, {})
        assert padded.shape[1] % 16 == 0 and padded.shape[2] % 16 == 0
        back = w.post(padded, {}, meta)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestHashGating:
    def test_matches_reference_md5_formula(self):
        name = "some_image_0042.jpg"
        rand = int(hashlib.md5(name.encode()).hexdigest()[-4:], 16) / 16 ** 4
        assert W.cir_hash_passthrough(name, 1.0) is True
        assert W.cir_hash_passthrough(name, 0.0) is False
        assert W.cir_hash_passthrough(name, rand + 1e-9) is True
        assert W.cir_hash_passthrough(name, rand - 1e-9) is False

    def test_mask_for_label_regex(self):
        w = W.CirRatioPassThrough(1.0, "anc")
        mask = w.mask_for(["a.jpg", "b.jpg", "c.jpg"],
                          ["anc", "anc-easy", "neg"])
        np.testing.assert_array_equal(mask, [True, True, False])


class TestNamedWrappers:
    def test_all_reference_labels_present(self):
        """All 11 reference wrapper labels resolve (wrapper.py:367-381)."""
        for label in ("reflectpad_divisible", "random_pass_through",
                      "cir_ratio_pass_through", "meanstd_post", "meanstd_pre",
                      "cirmultiscale", "fakebatch", "cirfaketuplebatch",
                      "cirwhiten", "clahepost", "rgb2bgr_pre"):
            assert label in W.WRAPPERS_LABELS, label

    def test_meanstd_roundtrip(self):
        pre = W.MeanStdPre("[[0.5,0.5,0.5],[0.5,0.5,0.5]]",
                           "[[0.485,0.456,0.406],[0.229,0.224,0.225]]")
        x = jnp.asarray(np.random.RandomState(2).rand(1, 4, 4, 3).astype(np.float32))
        out, _ = pre.pre(x, {})
        # unnormalize with output stats == renormalized input
        mean = np.array([0.485, 0.456, 0.406]); std = np.array([0.229, 0.224, 0.225])
        back = np.asarray(out) * std + mean
        orig = np.asarray(x) * 0.5 + 0.5
        np.testing.assert_allclose(back, orig, rtol=1e-4, atol=1e-5)


def test_metadata_name_matches_reference_convention():
    """The md5 gate hashes basename WITHOUT extension (the reference's
    metadata['name'], datahelpers.py:44) — .jpg lists would diverge with
    the extension left on."""
    assert W.metadata_name("/a/b/photo01.jpg") == "photo01"
    assert W.metadata_name("dir/0a1b2c3d") == "0a1b2c3d"  # cid: unchanged
    assert W.metadata_name("x.tar.gz") == "x.tar"  # rsplit('.', 1), like ref
    # lazy h5 paths hash the per-image KEY, not the store basename — else
    # the 25% md5 augmentation gate collapses to ONE draw for the whole
    # dataset (reference keeps per-cid names, traindataset.py:67-70)
    assert W.metadata_name("/data/ims.h5#0a1b2c3d") == "0a1b2c3d"
    assert W.metadata_name("/data/ims.h5#0a1b") != W.metadata_name(
        "/data/ims.h5#ffee")
