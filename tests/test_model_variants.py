"""Smoke + oracle tests for the extended model families: UNet variants, RCF,
patch discriminator, cirnet attention/preprocessing, extra layers."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.models import initialize_model
from gandtr_tpu.models import extra_layers


RNG = jax.random.PRNGKey(0)


@pytest.mark.parametrize("arch,kw,hw", [
    ("orig_unet", {"in_channels": 3, "out_channels": 3, "nested_levels": 2,
                   "min_channels": 4}, 32),
    ("p2p_unet", {"in_channels": 3, "out_channels": 3, "nested_levels": 2}, 32),
    ("shallow_p2p_unet", {"in_channels": 3, "out_channels": 3,
                          "nested_levels": 2}, 32),
    ("outconv_unet", {"in_channels": 3, "out_channels": 3, "nested_levels": 2}, 32),
    ("outconv_dynint_unet", {"in_channels": 3, "out_channels": 3,
                             "nested_levels": 2}, 32),
    ("inconv_p2p_unet", {"in_channels": 3, "out_channels": 3,
                         "nested_levels": 2}, 32),
    ("aligned_p2p_unet", {"in_channels": 3, "out_channels": 3,
                          "nested_levels": 2}, 32),
    ("official_patch_discriminator", {"ndf": 4, "n_layers": 2}, 32),
    ("normalization_l2", {}, 8),
])
def test_variant_forward(arch, kw, hw):
    import inspect
    model = initialize_model({"architecture": arch, **kw})
    x = jax.random.uniform(RNG, (1, hw, hw, 3))
    call_kw = {}
    if "train" in inspect.signature(type(model).__call__).parameters:
        call_kw["train"] = False  # eval mode: frozen BN stats
    var = model.init(RNG, x, **call_kw)
    out = model.apply(var, x, **call_kw)
    assert np.isfinite(np.asarray(out)).all()
    if arch != "official_patch_discriminator":
        assert out.shape[0] == 1


def test_rcf_forward_shapes():
    model = initialize_model({"architecture": "rcf"})
    x = jax.random.uniform(RNG, (1, 32, 48, 3))
    var = model.init(RNG, x)
    out = model.apply(var, x)
    assert out.shape == (1, 32, 48, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
    pre = model.apply(var, x, no_sigmoid=True)
    assert not ((np.asarray(pre) >= 0).all() and (np.asarray(pre) <= 1).all())


def test_rcf_bilinear_filter_matches_torch():
    from gandtr_tpu.models.rcf import _bilinear_filter, _fixed_deconv
    for size in (4, 8, 16):
        f = np.asarray(_bilinear_filter(size))
        # torch oracle
        factor = (size + 1) // 2
        center = factor - 1 if size % 2 == 1 else factor - 0.5
        og = np.ogrid[:size, :size]
        ref = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
        np.testing.assert_allclose(f, ref, rtol=1e-6)
    # deconv output matches torch conv_transpose2d with no padding
    x = torch.randn(1, 1, 5, 7)
    w = torch.from_numpy(np.asarray(_bilinear_filter(4)))[None, None].float()
    ref = F.conv_transpose2d(x, w, stride=2)
    out = _fixed_deconv(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 4, 2)
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref.numpy()[:, 0],
                               rtol=1e-4, atol=1e-5)


def test_cirnet_attention_unit_norm():
    model = initialize_model({"architecture": "cirnet_attention",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "attention": {"type": "l2norm"}})
    x = jax.random.uniform(RNG, (1, 64, 64, 3))
    var = model.init(RNG, x)
    out = np.asarray(model.apply(var, x))
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-4)


def test_edgefilter_matches_torch_formula():
    x = np.abs(np.random.RandomState(0).rand(1, 8, 8, 1)).astype(np.float32)
    ef = extra_layers.EdgeFilter()
    var = ef.init(RNG, jnp.asarray(x))
    out = np.asarray(ef.apply(var, jnp.asarray(x)))
    # torch formula oracle with p=0.5, tau=0.1
    xt = np.clip(x, 1e-6, None)
    ref = (10.0 * xt ** 0.5) / (np.exp(np.clip(-500.0 * (x - 0.1), None, 50.0)) + 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4)


def test_geometric_median_converges_to_median():
    # cluster of points + one outlier: median stays near the cluster
    x = np.zeros((1, 1, 5, 2), np.float32)
    x[0, 0, :4] = [1.0, 1.0]
    x[0, 0, 4] = [100.0, 100.0]
    med = extra_layers.geometric_median_weiszfeld(jnp.asarray(x), iterations=20)
    assert np.abs(np.asarray(med)[0, 0, 0] - 1.0).max() < 1.5


def test_horde_output_shapes():
    m = extra_layers.HordeCascadedKOrder(dim=8, order=3, high_order_dims=16)
    x = jax.random.uniform(RNG, (2, 6, 6, 8))
    var = m.init(RNG, x)
    outs = m.apply(var, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (2, 8)
