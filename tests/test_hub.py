"""Hub API: all 6 entrypoints instantiate with pretrained=False (the
reference hub init test, test_hub_init.py:16-25, minus network access) and the
embedding pipeline produces unit-norm multiscale descriptors."""
import numpy as np
import pytest
from PIL import Image

from gandtr_tpu import hub


RNG = np.random.RandomState(0)


def make_img(h=96, w=112):
    return Image.fromarray((RNG.rand(h, w, 3) * 255).astype(np.uint8))


@pytest.mark.parametrize("entry", [
    hub.cyclegan, hub.hedngan, hub.gem_vgg16_cyclegan, hub.gem_vgg16_hedngan])
def test_entrypoints_initialize(entry):
    model = entry(pretrained=False)
    assert model is not None
    assert model.transform is not None


def test_resnet101_entrypoints_initialize():
    # resnet101 init is heavy; only one of the two variants (same code path)
    model = hub.gem_resnet101_hedngan(pretrained=False)
    assert model is not None


def test_generator_forward_shape():
    model = hub.cyclegan(pretrained=False)
    inp = model.transform(make_img(64, 64))
    out = np.asarray(model(inp))
    assert out.shape == (1, 64, 64, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_embedding_forward_multiscale_unit_norm():
    model = hub.gem_vgg16_cyclegan(pretrained=False)
    inp = model.transform(make_img(64, 80))
    out = np.asarray(model(inp))
    assert out.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-4)
    # reference column layout
    assert model.forward_cols(inp).shape == (512, 1)
