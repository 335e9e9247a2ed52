"""CNN feature extractors for descriptor networks (flax.linen, NHWC).

Architectures mirror torchvision's vgg16.features (minus last maxpool) and
resnet101 (minus avgpool/fc) exactly as sliced by the reference's init_network
(/root/reference/mdir/external/cirtorch/networks/imageretrievalnet.py:185-196).
Param names track torch module paths (features_<i>, layer<l>_<b>, ...) for 1:1
.pth import, including caffe-converted weights from the cirtorch model zoo.

BatchNorm runs with frozen (running) statistics even in training — the
reference keeps descriptor-net BN in eval mode during fine-tuning
(/root/reference/mdir/components/model/network/cirnet.py:36-45).

Padded-bucket exactness: with `mask`, inputs are zero-padded top-left
rectangles and the forward propagates the valid region per-layer
(ops/maskprop.py) so valid features EQUAL the exact-shape forward — the zero
band at the valid border is indistinguishable from the exact compute's own
zero `SAME` padding. The call then returns `(features, feat_mask)` with the
exact floor-semantics downsampled mask.
"""
from typing import Tuple

import flax.linen as nn

from gandtr_tpu.models.layers import Conv, BatchNorm
from gandtr_tpu.ops.maskprop import MaskState, masked_max_pool


VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512)  # last maxpool dropped

OUTPUT_DIM = {"vgg16": 512, "resnet50": 2048, "resnet101": 2048, "resnet152": 2048}


class VGG16Features(nn.Module):
    """torchvision vgg16.features[:-1]: conv-relu stacks with 4 maxpools."""

    @nn.compact
    def __call__(self, x, mask=None):
        ms = MaskState.maybe(mask)
        x = ms.apply(x)  # re-zero the (normalized) pad band at the input
        idx = 0
        for li, item in enumerate(VGG16_CFG):
            if item == "M":
                x, ms = masked_max_pool(x, ms, 2, 2)
                idx += 1
            else:
                x = Conv(item, 3, padding=1, name=f"features_{idx}")(x)
                x = nn.relu(x)
                # bias makes the band nonzero; re-zero so the next 3x3 conv
                # sees exact-shape zero-padding at the valid border. SKIP
                # when a pool follows: masked_max_pool -inf-masks the band
                # itself, so the extra HBM pass buys nothing (measured 2x
                # masked-forward cost before this cut, docs/PERF.md)
                nxt = VGG16_CFG[li + 1] if li + 1 < len(VGG16_CFG) else None
                if nxt != "M":
                    x = ms.apply(x)
                idx += 2
        if mask is None:
            return x
        return x, ms.mask(x.shape[1], x.shape[2], x.dtype)


class Bottleneck(nn.Module):
    """torchvision resnet Bottleneck: 1x1 reduce, 3x3 (stride), 1x1 expand."""
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, ms=None):
        bare = ms is None  # direct calls get the plain tensor back
        ms = ms if ms is not None else MaskState(None)
        identity = x
        h = Conv(self.planes, 1, use_bias=False, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, use_running_average=True)
        # BN shift makes the band nonzero — re-zero before the 3x3 conv
        h = ms.apply(nn.relu(h))
        h = Conv(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                 name="conv2")(h)
        out_ms = ms.downsample(3, self.stride, 1)
        h = BatchNorm(name="bn2")(h, use_running_average=True)
        h = nn.relu(h)
        h = Conv(self.planes * 4, 1, use_bias=False, name="conv3")(h)
        h = BatchNorm(name="bn3")(h, use_running_average=True)
        if self.downsample:
            identity = Conv(self.planes * 4, 1, stride=self.stride, use_bias=False,
                            name="downsample_0")(x)
            identity = BatchNorm(name="downsample_1")(identity, use_running_average=True)
        # NO band re-zero here: the next block's only spatial op (conv2) is
        # preceded by ms.apply, its 1x1 convs don't mix spatially, and the
        # strided downsample 1x1 maps band positions to band positions — the
        # valid region stays exact while the band carries (finite) garbage.
        # ResNetFeatures re-zeroes once at the end for feature consumers.
        out = nn.relu(h + identity)
        return out if bare else (out, out_ms)


RESNET_LAYERS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3),
                 "resnet152": (3, 8, 36, 3)}


class ResNetFeatures(nn.Module):
    """torchvision resnet (minus avgpool/fc): conv1 → bn → relu → maxpool →
    4 bottleneck stages."""
    arch: str = "resnet101"

    @nn.compact
    def __call__(self, x, mask=None):
        ms = MaskState.maybe(mask)
        x = ms.apply(x)
        blocks = RESNET_LAYERS[self.arch]
        h = Conv(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        ms = ms.downsample(7, 2, 3)
        h = BatchNorm(name="bn1")(h, use_running_average=True)
        h = ms.apply(nn.relu(h))
        # torch maxpool k3 s2 p1 (window straddles the valid border: the
        # masked variant uses -inf like torch's implicit max-pool padding)
        h, ms = masked_max_pool(h, ms, 3, 2, 1)
        for li, (planes, nblocks) in enumerate(zip((64, 128, 256, 512), blocks), start=1):
            for bi in range(nblocks):
                stride = 2 if (li > 1 and bi == 0) else 1
                downsample = bi == 0  # layer1 downsamples too (channel expand)
                h, ms = Bottleneck(planes, stride=stride, downsample=downsample,
                                   name=f"layer{li}_{bi}")(h, ms)
        if mask is None:
            return h
        # blocks leave (finite) garbage in the band (see Bottleneck note);
        # consumers like attention take spatial maxima over the whole map, so
        # re-zero ONCE here — the single pass the per-block cut saved 30x of
        h = ms.apply(h)
        return h, ms.mask(h.shape[1], h.shape[2], h.dtype)


def make_features(architecture, name=None):
    if architecture.startswith("vgg16"):
        return VGG16Features(name=name), OUTPUT_DIM["vgg16"]
    if architecture.startswith("resnet"):
        return ResNetFeatures(arch=architecture, name=name), OUTPUT_DIM[architecture]
    raise ValueError("Unsupported architecture: %s" % architecture)
