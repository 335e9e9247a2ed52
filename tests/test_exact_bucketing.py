"""Bucketed (zero-pad + per-layer re-masking) forward EQUALS exact-shape.

The reference computes every image at its exact shape
(/root/reference/mdir/external/cirtorch/datasets/genericdataset.py:66-102,
imageretrievalnet.py:312-339). Our TPU static-shape strategy pads into
buckets; ops/maskprop.py re-zeroes the invalid band at every layer so the
padded forward is the SAME computation — these tests pin that equality for
the full descriptor nets, pooling variants, and gradients, and quantify how
far the pre-round-3 edge-pad/pooling-only-mask approximation was off.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gandtr_tpu.models.retrieval import GemRetrievalNet, GemRetrievalNetAttention
from gandtr_tpu.ops import maskprop


def _bucketed_inputs(imgs, B):
    xb = np.zeros((len(imgs), B, B, 3), np.float32)
    mb = np.zeros((len(imgs), B, B), np.float32)
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        xb[i, :h, :w] = im
        mb[i, :h, :w] = 1.0
    return jnp.asarray(xb), jnp.asarray(mb)


SHAPES = [(37, 51), (64, 33), (48, 64), (29, 29), (64, 64), (17, 61)]


@pytest.mark.parametrize("arch,pooling,tol", [
    ("vgg16", "gem", 1e-6),
    ("vgg16", "mac", 1e-6),
    ("vgg16", "spoc", 1e-6),
    ("vgg16", "gemmp", 1e-6),
    ("resnet101", "gem", 1e-6),
])
def test_bucketed_equals_exact(arch, pooling, tol):
    rng = np.random.RandomState(7)
    net = GemRetrievalNet(architecture=arch, pooling=pooling)
    var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    imgs = [rng.randn(h, w, 3).astype(np.float32) for h, w in SHAPES]
    exact = [np.asarray(net.apply(var, jnp.asarray(im)[None])[0])
             for im in imgs]
    xb, mb = _bucketed_inputs(imgs, 64)
    got = np.asarray(net.apply(var, xb, mask=mb))
    for i, e in enumerate(exact):
        assert np.abs(got[i] - e).max() < tol, (SHAPES[i],
                                                np.abs(got[i] - e).max())


def test_bucketed_equals_exact_attention():
    rng = np.random.RandomState(3)
    net = GemRetrievalNetAttention(architecture="vgg16")
    var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    imgs = [rng.randn(h, w, 3).astype(np.float32)
            for h, w in [(33, 48), (48, 21)]]
    exact = [np.asarray(net.apply(var, jnp.asarray(im)[None])[0])
             for im in imgs]
    xb, mb = _bucketed_inputs(imgs, 48)
    got = np.asarray(net.apply(var, xb, mask=mb))
    for i, e in enumerate(exact):
        assert np.abs(got[i] - e).max() < 1e-6


def test_bucketed_whitened_net():
    # model whitening head + local whitening: Dense layers after pooling are
    # shape-independent; the band only matters up to pooling
    rng = np.random.RandomState(11)
    net = GemRetrievalNet(architecture="vgg16", whitening=True,
                          local_whitening=True)
    var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
    imgs = [rng.randn(h, w, 3).astype(np.float32)
            for h, w in [(35, 48), (48, 48)]]
    exact = [np.asarray(net.apply(var, jnp.asarray(im)[None])[0])
             for im in imgs]
    xb, mb = _bucketed_inputs(imgs, 48)
    got = np.asarray(net.apply(var, xb, mask=mb))
    for i, e in enumerate(exact):
        assert np.abs(got[i] - e).max() < 1e-6


def test_bucketed_gradients_equal_exact():
    """Fine-tuning backpropagates through the bucketed forward — parameter
    gradients must match the exact-shape computation too."""
    rng = np.random.RandomState(5)
    net = GemRetrievalNet(architecture="vgg16")
    var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    im = rng.randn(23, 32, 3).astype(np.float32)
    tgt = rng.randn(512).astype(np.float32)

    def loss_exact(v):
        d = net.apply(v, jnp.asarray(im)[None])[0]
        return jnp.sum((d - tgt) ** 2)

    xb, mb = _bucketed_inputs([im], 32)

    def loss_bucketed(v):
        d = net.apply(v, xb, mask=mb)[0]
        return jnp.sum((d - tgt) ** 2)

    ge = jax.grad(loss_exact)(var)
    gb = jax.grad(loss_bucketed)(var)
    flat_e, _ = ravel_pytree(ge)
    flat_b, _ = ravel_pytree(gb)
    scale = jnp.abs(flat_e).max()
    assert float(jnp.abs(flat_b - flat_e).max()) < 1e-5 * float(scale) + 1e-7


def test_edge_pad_approximation_was_wrong():
    """Quantify the pre-round-3 approximation (edge-pad + pooling-only mask):
    it diverges from exact by orders of magnitude more than the exact path —
    recorded so round-2 results can be judged (VERDICT r2 weak #1)."""
    rng = np.random.RandomState(9)
    net = GemRetrievalNet(architecture="vgg16")
    var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    im = rng.randn(37, 51, 3).astype(np.float32)
    exact = np.asarray(net.apply(var, jnp.asarray(im)[None])[0])

    # old path: edge-pad, pooling-only mask (stride-subsampled input mask)
    B = 64
    from gandtr_tpu.models.backbones import VGG16Features
    padded = np.pad(im, ((0, B - 37), (0, B - 51), (0, 0)), mode="edge")
    feats = VGG16Features().apply(
        {"params": var["params"]["backbone"],
         "batch_stats": var.get("batch_stats", {}).get("backbone", {})},
        jnp.asarray(padded)[None])
    fh, fw = feats.shape[1], feats.shape[2]
    sub = np.zeros((B, B), np.float32)
    sub[:37, :51] = 1.0
    fm = jnp.asarray(sub[::B // fh, ::B // fw][:fh, :fw][None])
    from gandtr_tpu.ops import pooling as pool_ops
    from gandtr_tpu.ops.norm import l2n
    p = var["params"]["gem_p"][0]
    old = np.asarray(l2n(pool_ops.gem(feats, p=p, mask=fm))[0])

    old_err = np.abs(old - exact).max()
    xb, mb = _bucketed_inputs([im], B)
    new_err = np.abs(np.asarray(net.apply(var, xb, mask=mb))[0] - exact).max()
    # the old approximation's error is real (border contamination); the new
    # path is exact. Document the measured gap.
    assert old_err > 1e-3, old_err
    assert new_err < 1e-6, new_err


class TestMaskProp:
    def test_sizes_roundtrip(self):
        m = np.zeros((2, 16, 20), np.float32)
        m[0, :7, :13] = 1
        m[1, :16, :20] = 1
        h, w = maskprop.sizes_from_mask(jnp.asarray(m))
        assert list(np.asarray(h)) == [7, 16]
        assert list(np.asarray(w)) == [13, 20]
        back = maskprop.mask_from_sizes((h, w), 16, 20)
        assert np.array_equal(np.asarray(back), m)

    @pytest.mark.parametrize("k,s,p", [(3, 1, 1), (2, 2, 0), (3, 2, 1),
                                       (7, 2, 3), (1, 2, 0)])
    def test_conv_out_sizes_match_torch_formula(self, k, s, p):
        for n in range(max(k - 2 * p, 1), 40):
            h = jnp.asarray([n])
            h2, _ = maskprop.conv_out_sizes((h, h), k, s, p)
            expect = (n + 2 * p - k) // s + 1
            assert int(h2[0]) == expect, (n, k, s, p)

    def test_masked_reflect_pad_matches_exact(self):
        rng = np.random.RandomState(1)
        im = rng.randn(9, 12, 2).astype(np.float32)
        buf = np.zeros((1, 16, 16, 2), np.float32)
        buf[0, :9, :12] = im
        st = maskprop.MaskState((jnp.asarray([9]), jnp.asarray([12])))
        out, st2 = maskprop.masked_reflect_pad(jnp.asarray(buf), st, 3)
        expect = np.pad(im, ((3, 3), (3, 3), (0, 0)), mode="reflect")
        got = np.asarray(out[0, :15, :18])
        assert np.abs(got - expect).max() == 0.0
        h2, w2 = st2.hw
        assert int(h2[0]) == 15 and int(w2[0]) == 18

    def test_masked_instance_norm_matches_exact(self):
        rng = np.random.RandomState(2)
        from gandtr_tpu.ops.norm import instance_norm
        im = rng.randn(1, 10, 13, 4).astype(np.float32)
        buf = np.zeros((1, 16, 16, 4), np.float32)
        buf[:, :10, :13] = im
        st = maskprop.MaskState((jnp.asarray([10]), jnp.asarray([13])))
        out = maskprop.masked_instance_norm(jnp.asarray(buf), st)
        expect = np.asarray(instance_norm(jnp.asarray(im)))
        assert np.abs(np.asarray(out[:, :10, :13]) - expect).max() < 1e-5
        # band stays zero
        assert np.abs(np.asarray(out[:, 10:, :])).max() == 0.0


class TestFinetunePipelineExact:
    """Full finetune forward — generator + meanstd/clahe/ratio wrappers +
    embed — on a padded bucket EQUALS the per-image exact-shape pipeline
    (reference semantics: each tuple image computed at its own shape,
    traindataset.py/wrapper.py chains)."""

    def _nets(self):
        from gandtr_tpu.learning.network import build_single_net
        aug = build_single_net({
            "model": {"architecture": "official_resnet_generator",
                      "ngf": 8, "n_blocks": 2, "input_nc": 3, "output_nc": 3,
                      "no_antialias": True, "no_antialias_up": True,
                      "norm_layer": "instance"},
            "runtime": {
                "frozen": True,
                "wrappers": "meanstd_post:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:"
                            "[[0.485,0.456,0.406],[0.229,0.224,0.225]],"
                            "clahepost:[[0.5,0.5,0.5],[0.5,0.5,0.5]]:1.0,"
                            "cir_ratio_pass_through:0.25:anc"}})
        emb = build_single_net({
            "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                      "pooling": "gem"}})
        return aug, emb

    def test_bucketed_chain_equals_exact(self):
        import jax.numpy as jnp
        aug, emb = self._nets()
        rng = np.random.RandomState(21)
        B = 96
        avar = dict(aug.init(jax.random.PRNGKey(0), jnp.zeros((1, B, B, 3)),
                             train=False))
        evar = dict(emb.init(jax.random.PRNGKey(1), jnp.zeros((1, B, B, 3))))
        shapes = [(96, 77), (61, 96), (96, 96)]
        gates = [True, False, True]
        imgs = [np.clip(rng.rand(h, w, 3), 0, 1).astype(np.float32) * 2 - 1
                for h, w in shapes]  # 0.5-normalized space

        # exact per-image pipeline. The reference's ratio gate is HOST
        # control flow (wrapper.py:120-146): gated images continue with the
        # generator OUTPUT (whose shape is the 4-multiple arithmetic of the
        # input), ungated with the original — then clahe + meanstd either
        # way (post chain runs innermost-first)
        clahe_w, meanstd_w = aug.wrappers_train[1], aug.wrappers_train[0]
        exact = []
        for im, g in zip(imgs, gates):
            x = jnp.asarray(im)[None]
            if g:
                y = aug.module.apply(avar, x, train=False)
            else:
                y = x
            y = clahe_w.post(y, {}, None)
            y = meanstd_w.post(y, {}, None)
            d = emb.apply(evar, y, train=False)
            exact.append(np.asarray(d[0]))

        # bucketed batch with masks through the SAME nets
        xb = np.zeros((len(imgs), B, B, 3), np.float32)
        mb = np.zeros((len(imgs), B, B), np.float32)
        for i, im in enumerate(imgs):
            h, w = im.shape[:2]
            xb[i, :h, :w] = im
            mb[i, :h, :w] = 1.0
        out = aug.apply(avar, jnp.asarray(xb), train=True,
                        ctx={"pass_mask": jnp.asarray(gates)},
                        mask=jnp.asarray(mb))
        assert isinstance(out, tuple)
        y, out_mask = out
        got = np.asarray(emb.apply(evar, y, train=False, mask=out_mask))
        for i, e in enumerate(exact):
            md = np.abs(got[i] - e).max()
            assert md < 5e-5, (shapes[i], gates[i], md)

    def test_ratio_gate_mask_blend(self):
        """Pass-through rows keep the ORIGINAL valid rectangle; augmented
        rows get the generator-output one (4-multiple arithmetic)."""
        import jax.numpy as jnp
        aug, _ = self._nets()
        B = 64
        avar = dict(aug.init(jax.random.PRNGKey(0), jnp.zeros((1, B, B, 3)),
                             train=False))
        rng = np.random.RandomState(3)
        im = (rng.rand(45, 57, 3).astype(np.float32)) * 2 - 1
        xb = np.zeros((2, B, B, 3), np.float32)
        mb = np.zeros((2, B, B), np.float32)
        for i in range(2):
            xb[i, :45, :57] = im
            mb[i, :45, :57] = 1.0
        y, om = aug.apply(avar, jnp.asarray(xb), train=True,
                          ctx={"pass_mask": jnp.asarray([True, False])},
                          mask=jnp.asarray(mb))
        from gandtr_tpu.ops.maskprop import sizes_from_mask
        h, w = sizes_from_mask(np.asarray(om))
        assert (int(h[0]), int(w[0])) == (48, 60)   # generator 4-multiples
        assert (int(h[1]), int(w[1])) == (45, 57)   # original


class TestMaskedMultiscale:
    """Bucketed multiscale aggregation EQUALS the exact-shape protocol —
    masked_scale_resize reproduces F.interpolate(scale_factor=s) per valid
    rectangle bit-for-bit (static grid, dynamic boundary clamp)."""

    def test_masked_scale_resize_exact(self):
        from gandtr_tpu.ops.resize import scale_resize, masked_scale_resize
        rng = np.random.RandomState(0)
        for (h, w) in [(100, 73), (64, 64), (47, 101)]:
            im = rng.rand(h, w, 3).astype(np.float32)
            for s in [0.5, 1 / np.sqrt(2), np.sqrt(2)]:
                ex = np.asarray(scale_resize(jnp.asarray(im)[None], s)[0])
                B = 128
                buf = np.zeros((1, B, B, 3), np.float32)
                buf[0, :h, :w] = im
                st = maskprop.MaskState((jnp.asarray([h], jnp.int32),
                                         jnp.asarray([w], jnp.int32)))
                out, st2 = masked_scale_resize(jnp.asarray(buf), st, s)
                eh, ew = ex.shape[:2]
                assert (int(st2.hw[0][0]), int(st2.hw[1][0])) == (eh, ew)
                assert np.abs(np.asarray(out[0, :eh, :ew]) - ex).max() == 0.0

    def test_bucketed_multiscale_eval_equals_exact(self):
        from gandtr_tpu.learning.network import build_single_net
        from gandtr_tpu.learning.wrappers import CirMultiscaleAggregation
        net = build_single_net({"model": {"architecture": "cirnet",
                                          "cir_architecture": "vgg16",
                                          "pooling": "gem"}})
        net.wrappers_eval = [CirMultiscaleAggregation(scales=True)]
        var = dict(net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
        msp = float(np.asarray(var["params"]["gem_p"])[0])
        rng = np.random.RandomState(2)
        for (h, w) in [(96, 67), (53, 96)]:
            im = rng.rand(h, w, 3).astype(np.float32)
            ex = np.asarray(net.apply(var, jnp.asarray(im)[None],
                                      ctx={"msp": msp})[0])
            buf = np.zeros((1, 96, 96, 3), np.float32)
            buf[0, :h, :w] = im
            mb = np.zeros((1, 96, 96), np.float32)
            mb[0, :h, :w] = 1.0
            got = np.asarray(net.apply(var, jnp.asarray(buf),
                                       ctx={"msp": msp},
                                       mask=jnp.asarray(mb))[0])
            assert np.abs(got - ex).max() < 1e-5

    def test_device_preprocess_masked_clahe(self):
        """split_device_transform's in-graph CLAHE uses per-image valid
        geometry in bucketed mode — equal to host cv2 on the exact shape."""
        from gandtr_tpu.data.transforms import (split_device_transform,
                                                initialize_transforms)
        tf_str = "pil2np | apply_clahe:1.0 | totensor | normalize"
        ms = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
        host_tf = initialize_transforms(tf_str, ms)
        _, device_pre = split_device_transform(tf_str, ms)
        rng = np.random.RandomState(5)
        from PIL import Image
        h, w = 83, 127
        raw = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        exact = host_tf(Image.fromarray(raw))
        buf = np.zeros((1, 160, 160, 3), np.float32)
        buf[0, :h, :w] = raw.astype(np.float32) / 255.0
        mb = np.zeros((1, 160, 160), np.float32)
        mb[0, :h, :w] = 1.0
        got = np.asarray(device_pre(jnp.asarray(buf), jnp.asarray(mb)))
        # host numpy vs jitted device differ at float-assoc level in the
        # [0,1] conversion chain (amplified by /std); the uint8 CLAHE level
        # is bit-exact (ops/clahe.py fuzz). 5e-5 is far below the 1/255
        # quantum after normalization (~1.7e-2).
        assert np.abs(got[0, :h, :w] - exact).max() < 5e-5


def test_bucketed_equals_exact_attention_resnet():
    """Attention takes spatial maxima over the WHOLE feature map — pins the
    final band re-zero in ResNetFeatures (blocks leave garbage in the band
    after the per-block re-zero cut; a pooling-only mask would not catch
    normalize_max contamination)."""
    rng = np.random.RandomState(13)
    net = GemRetrievalNetAttention(architecture="resnet50")
    var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    imgs = [rng.randn(h, w, 3).astype(np.float32)
            for h, w in [(45, 64), (64, 37)]]
    exact = [np.asarray(net.apply(var, jnp.asarray(im)[None])[0])
             for im in imgs]
    xb, mb = _bucketed_inputs(imgs, 64)
    got = np.asarray(net.apply(var, xb, mask=mb))
    for i, e in enumerate(exact):
        assert np.abs(got[i] - e).max() < 1e-5


def test_masked_clahe_onehot_interp_matches_gather():
    """The TPU interpolation form (one-hot MXU matmul selection) agrees with
    the CPU gather form within the documented ±1 u8 tie class — both are
    exact LUT selections; only the lerp's vectorization layout differs
    (docs/PERF.md round-3 one-hot section). Forced on CPU so CI covers the
    branch the backend dispatch hides."""
    from gandtr_tpu.ops.clahe import clahe_u8_masked
    rng = np.random.RandomState(4)
    H = W = 192
    worst = 0
    for (h, w) in [(155, 120), (120, 184), (160, 96)]:
        img = rng.randint(0, 256, (h, w), np.uint8)
        buf = np.zeros((H, W), np.uint8)
        buf[:h, :w] = img
        a = np.asarray(clahe_u8_masked(jnp.asarray(buf),
                                       (jnp.int32(h), jnp.int32(w)), 1.0,
                                       (8, 8), interp="gather"))[:h, :w]
        b = np.asarray(clahe_u8_masked(jnp.asarray(buf),
                                       (jnp.int32(h), jnp.int32(w)), 1.0,
                                       (8, 8), interp="onehot"))[:h, :w]
        d = np.abs(a.astype(int) - b.astype(int))
        worst = max(worst, int(d.max()))
        # ties are rare: the overwhelming majority of pixels must be equal
        assert (d > 0).mean() < 1e-3
    assert worst <= 1, worst
