"""Golden tests vs OpenCV: colorspace conversions and CLAHE bit-exactness."""
import numpy as np
import cv2
import pytest
import jax
import jax.numpy as jnp

from gandtr_tpu.ops import colorspace as cs
from gandtr_tpu.ops import clahe


RNG = np.random.RandomState(42)
IMG = RNG.rand(37, 53, 3).astype(np.float32)


class TestColorspace:
    @pytest.mark.parametrize("space,code,atol", [
        ("lab", cv2.COLOR_RGB2LAB, 2e-3),
        ("luv", cv2.COLOR_RGB2LUV, 5e-3),
        ("hsv", cv2.COLOR_RGB2HSV, 2e-3),
        ("gray", cv2.COLOR_RGB2GRAY, 1e-5),
    ])
    def test_forward_vs_cv2(self, space, code, atol):
        ours = np.asarray(cs.rgb2normspace(jnp.asarray(IMG), space))
        ref = cv2.cvtColor(IMG, code)
        if space == "lab":
            ref = (ref + np.array([0, 128, 128], np.float32)) / np.array([100, 255, 255], np.float32)
        elif space == "luv":
            ref = (ref + np.array([0, 134, 140], np.float32)) / np.array([100, 354, 262], np.float32)
        elif space == "hsv":
            ref = ref / np.array([360, 1, 1], np.float32)
        elif space == "gray":
            ref = ref[..., None]
        np.testing.assert_allclose(ours, ref, atol=atol)

    def test_lsh_vs_cv2(self):
        ours = np.asarray(cs.rgb2normspace(jnp.asarray(IMG), "lsh"))
        hls = cv2.cvtColor(IMG, cv2.COLOR_RGB2HLS) / np.array([360, 1, 1], np.float32)
        ref = np.stack([hls[..., 1], hls[..., 2], hls[..., 0]], axis=2)
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    @pytest.mark.parametrize("space", ["lab", "luv", "hsv", "lsh", "rgb"])
    def test_roundtrip(self, space):
        fwd = cs.rgb2normspace(jnp.asarray(IMG), space)
        back = np.asarray(cs.normspace2rgb(fwd, space))
        np.testing.assert_allclose(back, IMG, atol=2e-3)

    def test_backward_lab_vs_cv2(self):
        lab = cv2.cvtColor(IMG, cv2.COLOR_RGB2LAB)
        norm = (lab + np.array([0, 128, 128], np.float32)) / np.array([100, 255, 255], np.float32)
        ours = np.asarray(cs.normspace2rgb(jnp.asarray(norm), "lab"))
        ref = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        np.testing.assert_allclose(ours, ref, atol=2e-3)


class TestClahe:
    # Bit-exactness caveat: the algorithm is exact f32 (verified below with
    # jit disabled, where XLA CPU cannot contract mul+add into FMA). Under CPU
    # jit, LLVM FMA contraction can flip round-half-even ties by ±1 on ~0.1% of
    # pixels; TPU (Mosaic) executes the ops unfused and stays bit-exact.

    @pytest.mark.parametrize("clip,grid,shape", [
        (4.0, 8, (64, 64)),      # divisible
        (1.0, 8, (64, 64)),      # reference descriptor-model config
        (4.0, 8, (61, 67)),      # non-divisible -> reflect-101 padding
        (2.5, 4, (37, 53)),
        (40.0, 8, (128, 96)),    # heavy clipping
    ])
    def test_bit_exact_vs_cv2(self, clip, grid, shape):
        rng = np.random.RandomState(7)
        img = (rng.rand(*shape) * 256).astype(np.uint8)
        ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(grid, grid)).apply(img)
        with jax.disable_jit():
            ours = np.asarray(clahe.clahe_u8(jnp.asarray(img), clip, (grid, grid)))
        mismatch = (ours != ref).mean()
        assert mismatch == 0.0, f"mismatch fraction {mismatch}"
        # jitted: FMA ties only — ±1 on a tiny fraction of pixels
        ours_jit = np.asarray(clahe.clahe_u8(jnp.asarray(img), clip, (grid, grid)))
        diff = np.abs(ours_jit.astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff != 0).mean() < 3e-3

    def test_bit_exact_natural_image(self):
        # piecewise-smooth image closer to natural statistics
        y, x = np.mgrid[0:96, 0:80]
        img = ((np.sin(x / 9.0) + np.cos(y / 13.0) + 2) / 4 * 255).astype(np.uint8)
        ref = cv2.createCLAHE(clipLimit=1.0, tileGridSize=(8, 8)).apply(img)
        with jax.disable_jit():
            ours = np.asarray(clahe.clahe_u8(jnp.asarray(img), 1.0, (8, 8)))
        np.testing.assert_array_equal(ours, ref)

    def test_image_clahe_vs_reference_pipeline(self):
        """Full ApplyClahe path (lab colorspace) vs the cv2-composed reference:
        small tolerance from the analytic-vs-spline gamma in Lab conversion
        (sub-LSB L differences can flip a uint8 bin, moving the output by one
        LUT step — so compare on a realistically-sized image where tiles are
        large and LUT steps small)."""
        y, x = np.mgrid[0:256, 0:320].astype(np.float32)
        base = (np.sin(x / 23.0) + np.cos(y / 17.0) + 2.0) / 4.0
        img = np.stack([base, base * 0.8 + 0.1, base * 0.6 + 0.2], axis=2).astype(np.float32)
        img += RNG.rand(256, 320, 3).astype(np.float32) * 0.05
        img = np.clip(img, 0, 1)
        # reference pipeline (functional.py:140-168 semantics, built from cv2)
        lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
        norm = (lab + np.array([0, 128, 128], np.float32)) / np.array([100, 255, 255], np.float32)
        cl = cv2.createCLAHE(clipLimit=1.0, tileGridSize=(8, 8))
        L = cl.apply((norm[..., 0] * 255).astype(np.uint8)).astype(np.float32) / 255.0
        norm[..., 0] = L
        ref = cv2.cvtColor(norm * np.array([100, 255, 255], np.float32)
                           - np.array([0, 128, 128], np.float32), cv2.COLOR_LAB2RGB)
        ours = np.asarray(clahe.image_clahe(jnp.asarray(img), 1.0, 8, "lab"))
        # uint8 quantization boundaries may flip ±1/255 on a small fraction of
        # pixels (analytic-vs-spline Lab gamma); each flip moves RGB by ≲3e-2
        close = np.abs(ours - ref) < 3e-2
        assert close.mean() > 0.985
        np.testing.assert_allclose(ours, ref, atol=1e-1)


class TestDivF32Correct:
    """Round-4 tie-source fix: XLA-TPU's f32 divide is a reciprocal
    approximation (1 ulp off on ~34% of integer operands — the ONLY source
    of the masked-CLAHE ±1 u8 tie class). The Dekker-corrected division must
    equal correctly-rounded division everywhere; on CPU (already correct)
    that means exact agreement with the plain op."""

    def test_matches_plain_division_on_cpu(self):
        import jax
        import jax.numpy as jnp
        from gandtr_tpu.ops.clahe import _div_f32_correct
        rng = np.random.RandomState(0)
        b = np.unique(rng.randint(16, 70000, 20000)).astype(np.float32)
        for a in (255.0, 1.0):
            got = np.asarray(jax.jit(
                lambda bb, aa=a: _div_f32_correct(jnp.float32(aa), bb))(
                    jnp.asarray(b)))
            ref = (np.float32(a) / b).astype(np.float32)
            assert (got != ref).sum() == 0

    def test_non_integer_operands(self):
        import jax
        import jax.numpy as jnp
        from gandtr_tpu.ops.clahe import _div_f32_correct
        rng = np.random.RandomState(1)
        a = rng.rand(5000).astype(np.float32) * 1000 + 1e-3
        b = rng.rand(5000).astype(np.float32) * 1000 + 1e-3
        got = np.asarray(jax.jit(_div_f32_correct)(jnp.asarray(a),
                                                   jnp.asarray(b)))
        ref = (a / b).astype(np.float32)
        assert (got != ref).sum() == 0
