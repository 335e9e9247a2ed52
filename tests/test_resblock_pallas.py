"""Fused Pallas ResNet-block kernel (ops/resblock_pallas.py): numerics vs the
f32 reference block and vs the XLA bf16 path, parameter-tree equality of the
dispatched generator, and dispatch eligibility rules."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gandtr_tpu.ops import resblock_pallas as rp


def _ref_block_f32(x, w1, b1, w2, b2, eps=1e-5):
    def conv(h, w, b):
        hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            hp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b.reshape(1, 1, 1, -1)

    def inorm(h):
        m = jnp.mean(h, axis=(1, 2), keepdims=True)
        v = jnp.var(h, axis=(1, 2), keepdims=True)
        return (h - m) / jnp.sqrt(v + eps)

    h = jnp.maximum(inorm(conv(x, w1, b1)), 0)
    return x + inorm(conv(h, w2, b2))


def _random_case(seed, N=2, H=16, W=16, C=256):
    rng = np.random.RandomState(seed)
    x = (rng.randn(N, H, W, C) * 0.5).astype(np.float32)
    w1 = (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)
    w2 = (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)
    b1 = (rng.randn(C) * 0.1).astype(np.float32)
    b2 = (rng.randn(C) * 0.1).astype(np.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("H,W", [(16, 16), (16, 24)])
def test_fused_matches_f32_reference(H, W):
    x, w1, b1, w2, b2 = _random_case(0, H=H, W=W)
    ref = np.asarray(_ref_block_f32(jnp.asarray(x), jnp.asarray(w1),
                                    jnp.asarray(b1), jnp.asarray(w2),
                                    jnp.asarray(b2)))
    out = np.asarray(rp.fused_resblock(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), interpret=True)).astype(np.float32)
    # bf16 operand precision through two convs + INs: ~3% of unit scale
    assert np.abs(out - ref).max() < 0.06
    assert np.abs(out - ref).mean() < 0.01


def test_fused_no_less_accurate_than_xla_bf16():
    """The kernel's f32 IN statistics should not be worse than the XLA bf16
    elementwise chain (both measured against the f32 reference)."""
    x, w1, b1, w2, b2 = _random_case(1)

    def bf16_block(x, w1, b1, w2, b2, eps=1e-5):
        bf = jnp.bfloat16
        x = x.astype(bf)
        h = x
        for w, b, relu in ((w1, b1, True), (w2, b2, False)):
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            y = jax.lax.conv_general_dilated(
                hp, jnp.asarray(w, bf), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + jnp.asarray(b, bf).reshape(1, 1, 1, -1)
            m = jnp.mean(y, axis=(1, 2), keepdims=True)
            v = jnp.var(y, axis=(1, 2), keepdims=True)
            y = (y - m) / jnp.sqrt(v + jnp.asarray(eps, bf))
            h = jnp.maximum(y, 0) if relu else y
        return x + h

    ref = np.asarray(_ref_block_f32(jnp.asarray(x), jnp.asarray(w1),
                                    jnp.asarray(b1), jnp.asarray(w2),
                                    jnp.asarray(b2)))
    xla = np.asarray(bf16_block(x, w1, b1, w2, b2)).astype(np.float32)
    out = np.asarray(rp.fused_resblock(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), jnp.asarray(b1),
        jnp.asarray(w2), jnp.asarray(b2), interpret=True)).astype(np.float32)
    assert np.abs(out - ref).max() <= np.abs(xla - ref).max() * 1.5


def test_generator_dispatch_same_tree_and_output():
    """bf16 generator with the fused path (forced interpret): identical param
    tree + init values, outputs within bf16 noise of the unfused path."""
    from gandtr_tpu.models import initialize_model
    gen = initialize_model({"architecture": "official_resnet_generator",
                            "no_antialias": True, "no_antialias_up": True,
                            "input_nc": 3, "output_nc": 3, "n_blocks": 2,
                            "norm_layer": "instance"})
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 2 - 1
    v = gen.init(jax.random.PRNGKey(1), x, train=False)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    vb, xb = cast(v), x.astype(jnp.bfloat16)
    y_unfused = np.asarray(gen.apply(vb, xb, train=False)).astype(np.float32)
    rp.set_enabled(True)
    rp.set_force_interpret(True)
    try:
        v2 = gen.init(jax.random.PRNGKey(1), xb, train=False)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(v2))
        for a, b in zip(jax.tree_util.tree_leaves(v),
                        jax.tree_util.tree_leaves(v2)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32))
        y_fused = np.asarray(gen.apply(vb, xb, train=False)).astype(np.float32)
    finally:
        rp.set_enabled(False)
        rp.set_force_interpret(False)
    assert np.abs(y_fused - y_unfused).max() < 0.06  # tanh output in [-1, 1]


def test_eligibility_rules():
    shp = (2, 64, 64, 256)
    base = dict(train=False, use_dropout=False, padding_type="reflect",
                norm_type="instance", use_bias=True)
    # dispatch is off by default — the kernel measured slower than XLA
    assert not rp.eligible(shp, jnp.bfloat16, **base)
    rp.set_enabled(True)
    rp.set_force_interpret(True)
    try:
        assert rp.eligible(shp, jnp.bfloat16, **base)
        assert not rp.eligible(shp, jnp.float32, **base)
        assert not rp.eligible(shp, jnp.bfloat16, **{**base, "train": True})
        assert not rp.eligible(shp, jnp.bfloat16,
                               **{**base, "use_dropout": True})
        assert not rp.eligible(shp, jnp.bfloat16,
                               **{**base, "norm_type": "batch"})
        assert not rp.eligible(shp, jnp.bfloat16,
                               **{**base, "padding_type": "zero"})
        assert not rp.eligible((2, 91, 91, 256), jnp.bfloat16, **base)
        assert not rp.eligible((2, 64, 64, 192), jnp.bfloat16, **base)
        rp.set_enabled(False)
        assert not rp.eligible(shp, jnp.bfloat16, **base)
    finally:
        rp.set_enabled(False)
        rp.set_force_interpret(False)
