"""Parity tests for the lane-folded Pallas 3x3 conv (ops/vggconv_pallas.py).

Run in interpret mode on the CPU mesh; the kernel's bf16-operand/f32-acc
numerics are compared against the identical-precision XLA conv.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gandtr_tpu.ops import vggconv_pallas


def _xla_ref(x, w, b, relu, out_dtype):
    bf = jnp.bfloat16
    y = jax.lax.conv_general_dilated(
        x.astype(bf), w.astype(bf), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


@pytest.mark.parametrize("C,H,W", [(64, 16, 20), (64, 12, 14), (128, 16, 10),
                                   (128, 12, 9), (64, 10, 8)])
@pytest.mark.parametrize("relu", [False, True])
def test_conv3x3_parity(C, H, W, relu):
    rng = np.random.RandomState(C + H + W + relu)
    x = jnp.asarray(rng.randn(2, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, C) / np.sqrt(9 * C), jnp.float32)
    b = jnp.asarray(rng.randn(C), jnp.float32)
    got = vggconv_pallas.conv3x3_same(x, w, b, relu=relu, interpret=True)
    want = _xla_ref(x, w, b, relu, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv3x3_no_bias_bf16_out():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 12, 64), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) / 24.0, jnp.float32)
    got = vggconv_pallas.conv3x3_same(x, w, None, out_dtype=jnp.bfloat16,
                                      interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _xla_ref(x, w, None, False, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("relu,bias", [(True, True), (False, False)])
def test_conv3x3_grads(relu, bias):
    rng = np.random.RandomState(7 + relu)
    x = jnp.asarray(rng.randn(2, 8, 10, 64), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) / 24.0, jnp.float32)
    b = jnp.asarray(rng.randn(64), jnp.float32) if bias else None
    co = jnp.asarray(rng.randn(2, 8, 10, 64), jnp.float32)

    vggconv_pallas.set_force_interpret(True)
    try:
        # The kernel's bwd masks by ITS OWN (bf16-compute) forward; an f32
        # reference disagrees on near-zero preactivations. Impose the Pallas
        # forward's mask on the reference (stop_gradient) so XLA autodiff
        # independently checks the backward formulas under the same mask.
        mask = None
        if relu:
            y_p = vggconv_pallas.conv3x3_same(
                x, w, b, relu=True, interpret=True)
            mask = jax.lax.stop_gradient(y_p > 0)

        def f_pl(*args):
            bb = args[2] if bias else None
            return jnp.vdot(vggconv_pallas.conv3x3_same_ad(
                args[0], args[1], bb, relu=relu), co)
        def f_ref(*args):
            bb = args[2] if bias else None
            y = jax.lax.conv_general_dilated(
                args[0], args[1], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bb is not None:
                y = y + bb
            if relu:
                y = jnp.where(mask, y, 0.0)
            return jnp.vdot(y, co)
        args = (x, w, b) if bias else (x, w)
        g_pl = jax.grad(f_pl, argnums=tuple(range(len(args))))(*args)
        g_ref = jax.grad(f_ref, argnums=tuple(range(len(args))))(*args)
        for a, e in zip(g_pl, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-2, atol=2e-2)
    finally:
        vggconv_pallas.set_force_interpret(False)


def test_eligibility_gates():
    el = vggconv_pallas.eligible
    # dispatch is disabled by default (measured-and-rejected kernel)
    assert not el((4, 1024, 1024, 64), 64, 64, 3, 1, 1)
    vggconv_pallas.set_force_interpret(True)
    vggconv_pallas.set_enabled(True)
    try:
        assert el((4, 1024, 1024, 64), 64, 64, 3, 1, 1)
        assert el((4, 512, 512, 128), 128, 128, 3, 1, 1)
        assert not el((4, 1024, 1024, 64), 64, 128, 3, 1, 1)  # cin != cout
        assert not el((4, 1024, 1024, 256), 256, 256, 3, 1, 1)
        assert not el((4, 1024, 1024, 64), 64, 64, 3, 2, 1)  # stride
        assert not el((4, 1024, 1024, 64), 64, 64, 5, 1, 1)  # kernel
        assert not el((4, 1023, 1024, 64), 64, 64, 3, 1, 1)  # H % 2
        assert not el((4, 1024, 1023, 64), 64, 64, 3, 1, 1)  # W odd, fold 2
    finally:
        vggconv_pallas.set_force_interpret(False)
        vggconv_pallas.set_enabled(False)
    assert not el((4, 1024, 1024, 64), 64, 64, 3, 1, 1)
