"""Golden tests: bilinear/nearest resize vs torch F.interpolate."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from gandtr_tpu.ops import resize


@pytest.mark.parametrize("scale", [0.5, 1.0 / np.sqrt(2), 2.0, 0.37])
def test_scale_resize_matches_torch(scale):
    torch.manual_seed(0)
    x_t = torch.randn(2, 3, 40, 56)
    ref = F.interpolate(x_t, scale_factor=scale, mode="bilinear", align_corners=False)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = resize.scale_resize(x_j, scale)
    assert out.shape[1:3] == ref.shape[2:4]
    np.testing.assert_allclose(out, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("size", [(17, 31), (100, 80)])
def test_size_resize_matches_torch(size):
    torch.manual_seed(1)
    x_t = torch.randn(1, 4, 24, 36)
    ref = F.interpolate(x_t, size=size, mode="bilinear", align_corners=False)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = resize.bilinear_resize(x_j, *size)
    np.testing.assert_allclose(out, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_nearest_matches_torch():
    torch.manual_seed(2)
    x_t = torch.randn(1, 2, 10, 14)
    ref = F.interpolate(x_t, scale_factor=2, mode="nearest")
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    out = resize.nearest_resize(x_j, 20, 28)
    np.testing.assert_allclose(out, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-6)
