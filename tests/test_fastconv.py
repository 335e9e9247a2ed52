"""fastconv space-to-depth rewrites: exact equivalence with the naive
lax.conv lowering, dispatch heuristics, and Conv-layer integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gandtr_tpu.ops import fastconv as fc


def ref_conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestRewrites:
    @pytest.mark.parametrize("K,C,Co,s,H", [
        (7, 64, 3, 8, 32),   # generator final conv shape (small H)
        (7, 3, 64, 2, 16),   # generator first conv
        (3, 8, 4, 4, 16),
        (1, 16, 2, 8, 16),   # 1x1 few-channel
        (5, 6, 3, 8, 24),
    ])
    def test_conv_s2d_matches_lax(self, K, C, Co, s, H):
        rng = np.random.RandomState(0)
        xp = jnp.asarray(rng.randn(2, H + K - 1, H + K - 1, C)
                         .astype(np.float32))
        k = jnp.asarray(rng.randn(K, K, C, Co).astype(np.float32))
        a = ref_conv(xp, k)
        b = fc.conv_s2d(xp, k, s)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-4)

    @pytest.mark.parametrize("Hp", [34, 35, 33])
    def test_conv_stride_s2d_matches_lax(self, Hp):
        rng = np.random.RandomState(1)
        xp = jnp.asarray(rng.randn(2, Hp, Hp, 16).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 16, 24).astype(np.float32))
        a = ref_conv(xp, k, 2)
        b = fc.conv_stride_s2d(xp, k, 2)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("K,pl,pr", [(3, 1, 2), (4, 2, 2)])
    def test_conv_transpose_d2s_matches_lax(self, K, pl, pr):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 9, 9, 8).astype(np.float32))
        k = jnp.asarray(rng.randn(K, K, 8, 6).astype(np.float32))
        a = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((pl, pr), (pl, pr)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = fc.conv_transpose_d2s(x, k, 2, pl, pr)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    def test_s2d_roundtrip(self):
        x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32
                       ).reshape(2, 16, 16, 3)
        for s in (2, 4, 8):
            np.testing.assert_array_equal(
                np.asarray(fc.depth_to_space(fc.space_to_depth(x, s), s)),
                np.asarray(x))

    def test_reflect_pad_exact(self):
        rng = np.random.RandomState(3)
        for shape, pad in [((2, 10, 12, 5), (3, 3, 3, 3)),
                           ((2, 7, 7, 4), (3, 5, 3, 5)),
                           ((1, 6, 6, 1), (0, 3, 1, 0))]:
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            t, b, l, r = pad
            a = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(fc.reflect_pad(x, pad)))


class TestDispatch:
    def test_dispatch_targets_few_output_channels_only(self):
        rng = np.random.RandomState(4)
        xp = jnp.asarray(rng.randn(1, 38, 38, 64).astype(np.float32))
        k3 = jnp.asarray(rng.randn(7, 7, 64, 3).astype(np.float32))
        assert fc.dispatch_conv(xp, k3, 1) is not None
        # many output channels -> naive
        k64 = jnp.asarray(rng.randn(7, 7, 64, 64).astype(np.float32))
        assert fc.dispatch_conv(xp, k64, 1) is None
        # strided -> naive (near-roofline already)
        assert fc.dispatch_conv(xp, k3, 2) is None
        # misaligned spatial size -> naive
        xodd = jnp.asarray(rng.randn(1, 37, 37, 64).astype(np.float32))
        assert fc.dispatch_conv(xodd, k3, 1) is None

    def test_disable_flag(self):
        rng = np.random.RandomState(5)
        xp = jnp.asarray(rng.randn(1, 38, 38, 64).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 64, 3).astype(np.float32))
        fc.set_enabled(False)
        try:
            assert fc.dispatch_conv(xp, k, 1) is None
        finally:
            fc.set_enabled(True)


class TestConvLayerIntegration:
    def test_conv_layer_fast_equals_naive(self):
        """models/layers.py Conv: fast path output == naive for the
        generator's final-conv geometry, same params either way."""
        from gandtr_tpu.models.layers import Conv

        model = Conv(features=3, kernel_size=7, stride=1, padding=3,
                     pad_mode="reflect")
        x = jnp.asarray(np.random.RandomState(6)
                        .randn(2, 32, 32, 64).astype(np.float32))
        var = model.init(jax.random.PRNGKey(0), x)
        y_fast = model.apply(var, x)
        fc.set_enabled(False)
        try:
            y_naive = model.apply(var, x)
        finally:
            fc.set_enabled(True)
        assert y_fast.shape == y_naive.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_naive),
                                   rtol=2e-5, atol=2e-5)
        # param tree matches the nn.Conv naming convention
        assert set(var["params"]["conv"]) == {"kernel", "bias"}
        assert var["params"]["conv"]["kernel"].shape == (7, 7, 64, 3)

    def test_conv_layer_rank3_input(self):
        # unbatched input (padding handled only for NHWC, so padding=0 here)
        from gandtr_tpu.models.layers import Conv
        model = Conv(features=4, kernel_size=3, stride=1, padding=0)
        x = jnp.ones((8, 8, 2), jnp.float32)
        var = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(var, x).shape == (6, 6, 4)


def test_conv_reflect_few_out_matches_pad_conv():
    """Fused reflect+conv (zero-pad conv + border bands) is exact. Not
    dispatched by default (a wash in the full generator, see PERF.md) but
    kept correct for isolated-tail use."""
    rng = np.random.RandomState(7)
    for H, K, p, s, C, Co in [(32, 7, 3, 8, 16, 3), (16, 3, 1, 8, 8, 2),
                              (24, 5, 2, 4, 6, 8)]:
        x = jnp.asarray(rng.randn(2, H, H, C).astype(np.float32))
        k = jnp.asarray(rng.randn(K, K, C, Co).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect"),
            k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = fc.conv_reflect_few_out(x, k, p, s)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=2e-5, atol=1e-4)


def test_conv_dual_s2d_matches_naive():
    """Dual space-to-depth (input-phase fold + output-phase expansion) for
    few-INPUT-channel stride-1 convs is exact. Measured on v5e: wins isolated
    (1.01 vs 1.52 ms for the generator head conv) but LOSES once the IN+relu
    epilogue is attached (d2s breaks producer fusion, 3.9 vs 2.5 ms), so it
    is not dispatched; kept as the measured record (docs/PERF.md)."""
    rng = np.random.RandomState(11)
    for K, C, Co, H, s in [(7, 3, 64, 32, 4), (7, 3, 64, 32, 8),
                           (3, 3, 8, 24, 2), (5, 2, 16, 40, 4)]:
        x = jnp.asarray(rng.randn(2, H + K - 1, H + K - 1, C).astype(np.float32))
        k = jnp.asarray(rng.randn(K, K, C, Co).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for fold in ("s2d", "slice"):
            got = fc.conv_dual_s2d(x, k, s, fold=fold)
            np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                       rtol=2e-5, atol=2e-4, err_msg=fold)


def test_conv_wfold_matches_naive():
    """Transpose-free W-phase fold for few-input-channel convs — exact."""
    rng = np.random.RandomState(5)
    for Kh, Kw, C, Co, H, W, f in [(3, 3, 64, 64, 12, 64, 2),
                                   (7, 7, 3, 64, 16, 64, 8),
                                   (3, 3, 3, 64, 10, 128, 8),
                                   (5, 5, 4, 32, 9, 40, 4)]:
        x = jnp.asarray(rng.randn(2, H + Kh - 1, W + Kw - 1, C).astype(np.float32))
        k = jnp.asarray(rng.randn(Kh, Kw, C, Co).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = fc.conv_wfold(x, k, f)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=2e-5, atol=2e-4)


def test_conv_layer_does_not_dispatch_wfold():
    """wfold is intentionally NOT dispatched (full-generator regression:
    21.2 -> 24.2 ms, layout composition trap — docs/PERF.md); the Conv layer
    must produce the naive path's exact result."""
    from gandtr_tpu.models.layers import Conv
    x = jnp.asarray(np.random.RandomState(0).randn(2, 70, 70, 3).astype(np.float32))
    model = Conv(features=64, kernel_size=7, stride=1, padding=0)
    var = model.init(jax.random.PRNGKey(0), x)
    y_fast = model.apply(var, x)
    assert y_fast.shape == (2, 64, 64, 64)
    fc.set_enabled(False)
    try:
        y_naive = model.apply(var, x)
    finally:
        fc.set_enabled(True)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_naive))
