"""Hub entrypoints at the repo root, mirroring the reference's hubconf.py
(/root/reference/hubconf.py) so migrating users find the same surface:

    import hubconf  # or torch.hub-style repo loading
    model = hubconf.gem_vgg16_hedngan(pretrained=True)
    vec = model(model.transform(img))

The models are JAX/flax (gandtr_tpu.hub); `pretrained=True` downloads the
reference's published .pth checkpoints and imports them with 100%-coverage
key mapping (utils/torch_import.py).
"""
from gandtr_tpu.hub import (  # noqa: F401
    gem_vgg16_cyclegan, gem_vgg16_hedngan,
    gem_resnet101_cyclegan, gem_resnet101_hedngan,
    hedngan, cyclegan)

dependencies = ["jax", "flax", "numpy"]
