"""HED edge detector (flax.linen, NHWC).

Re-implementation of HedInterpolation
(/root/reference/mdir/components/model/network/hed.py:20-87): 5 VGG16 blocks,
per-block 1×1 score heads bilinearly upsampled to input size, 1×1 fusion,
optional pre-sigmoid output for distillation. Param names mirror the torch
module names (vgg<i>_<j>, score<i>, fusion) for weight import.
"""
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.layers import Conv
from gandtr_tpu.ops.resize import bilinear_resize


_BLOCKS = ((3, (64, 64)), (64, (128, 128)), (128, (256, 256, 256)),
           (256, (512, 512, 512)), (512, (512, 512, 512)))


class HedInterpolation(nn.Module):
    meta = {"in_channels": 3, "out_channels": 1}
    width_mult: float = 1.0  # test-scale knob; 1.0 = the reference VGG widths

    @nn.compact
    def __call__(self, x, no_sigmoid=False, train=True):
        H, W = x.shape[1], x.shape[2]
        h = x
        scores = []
        for bi, (_, widths) in enumerate(_BLOCKS, start=1):
            if bi > 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for ci, w in enumerate(widths):
                w = max(int(w * self.width_mult), 4)
                h = Conv(w, 3, padding=1, name=f"vgg{bi}_{ci}")(h)
                h = nn.relu(h)
            s = Conv(1, 1, name=f"score{bi}")(h)
            scores.append(bilinear_resize(s, H, W))
        fused = Conv(1, 1, name="fusion")(jnp.concatenate(scores, axis=-1))
        if no_sigmoid:
            return fused
        return nn.sigmoid(fused)
