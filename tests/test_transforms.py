"""Tests for the host-side transform DSL pipeline."""
import numpy as np
from PIL import Image

from gandtr_tpu.data import transforms as T


RNG = np.random.RandomState(0)


def make_pil(h=40, w=50):
    return Image.fromarray((RNG.rand(h, w, 3) * 255).astype(np.uint8))


class TestDSL:
    def test_hub_embedding_pipeline(self):
        """The exact pipeline of hub embedding models
        (embedding.yml: pil2np | apply_clahe:1.0 | totensor | normalize)."""
        tf = T.initialize_transforms(
            "pil2np | apply_clahe:1.0 | totensor | normalize",
            [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])
        out = tf(make_pil(64, 64))
        assert out.shape == (64, 64, 3)
        assert out.dtype == np.float32
        # normalized: values outside [0,1]
        assert out.min() < 0

    def test_generator_pipeline(self):
        tf = T.initialize_transforms(
            "pil2np | totensor | normalize", [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
        out = tf(make_pil())
        assert -1.0 <= out.min() and out.max() <= 1.0

    def test_scalecrop_dsl(self):
        tf = T.initialize_transforms("pil2np | scalecrop:256_256:0.8_1 | totensor",
                                     [[0.5] * 3, [0.5] * 3])
        out = tf(make_pil(300, 400))
        assert out.shape == (256, 256, 3)

    def test_multi_image_threading(self):
        tf = T.Compose([T.Pil2Numpy(), T.RandomCrop("32_32")])
        a, b = tf(make_pil(64, 64), make_pil(64, 64))
        assert a.shape == (32, 32, 3) and b.shape == (32, 32, 3)


class TestCrops:
    def test_center_crop(self):
        x = RNG.rand(41, 53, 3).astype(np.float32)
        out = T.CenterCrop("32_20")(x)[0]
        assert out.shape == (20, 32, 3)  # size is (w, h) reversed like reference

    def test_square_crop(self):
        x = RNG.rand(41, 53, 3).astype(np.float32)
        out = T.SquareCrop()(x)[0]
        assert out.shape == (41, 41, 3)

    def test_downscale_keeps_aspect(self):
        out = T.Downscale("32")(make_pil(60, 90))[0]
        assert max(out.size) == 32

    def test_mirror_deterministic_seed(self):
        x = RNG.rand(8, 8, 3).astype(np.float32)
        T.seed_transforms(123)
        a = [np.array(T.RandomHorizontalFlip(0.5)(x)[0]) for _ in range(8)]
        T.seed_transforms(123)
        b = [np.array(T.RandomHorizontalFlip(0.5)(x)[0]) for _ in range(8)]
        for ai, bi in zip(a, b):
            np.testing.assert_array_equal(ai, bi)

    def test_random_scale_crop_bounds(self):
        T.seed_transforms(0)
        x = RNG.rand(300, 280, 3).astype(np.float32)
        out = T.RandomScaleCrop("128_128", "0.5_0.8")(x)[0]
        assert out.shape == (128, 128, 3)

    def test_skip_when_exact_size(self):
        x = RNG.rand(128, 128, 3).astype(np.float32)
        out = T.RandomScaleCrop("128_128", "0.5_0.8")(x)
        assert out[0] is x


class TestChannels:
    def test_add_const(self):
        x = RNG.rand(8, 8, 3).astype(np.float32)
        out = T.AddConstantChannel("0.5")(x)[0]
        assert out.shape == (8, 8, 4)
        assert (out[..., 3] == 0.5).all()

    def test_chanselect(self):
        x = RNG.rand(8, 8, 3).astype(np.float32)
        out = T.NpChanSelector(1, 3)(x)[0]
        np.testing.assert_array_equal(out, x[..., 1:3])
        out = T.NpChanSelector("2")(x)[0]
        np.testing.assert_array_equal(out, x[..., 2:])

    def test_gaussian_noise_first_only(self):
        T.seed_transforms(1)
        x = np.full((8, 8, 3), 0.5, np.float32)
        y = np.full((8, 8, 3), 0.5, np.float32)
        a, b = T.AdditiveGaussianNoise("0.1")(x, y)
        assert not np.array_equal(a, x)
        np.testing.assert_array_equal(b, y)


class TestHistogram:
    def test_match_histogram_named(self):
        x = RNG.rand(32, 32, 3).astype(np.float32)
        out = T.MatchHistogram("f3d_lab")(x)[0]
        assert out.shape == x.shape
        assert np.isfinite(out).all()

    def test_gamma_equalize_shifts_mean(self):
        x = (RNG.rand(64, 64, 3) * 0.3).astype(np.float32)  # dark image
        out = T.GammaEqualize("0.5", "lab")(x)[0]
        # lightness mean should move toward target
        from gandtr_tpu.ops import colorspace as cs
        import jax.numpy as jnp
        L_in = float(np.mean(np.asarray(cs.rgb2normspace(jnp.asarray(x), "lab"))[..., 0]))
        L_out = float(np.mean(np.asarray(cs.rgb2normspace(jnp.asarray(out), "lab"))[..., 0]))
        assert abs(L_out - 0.5) < abs(L_in - 0.5)
