"""RCF edge detector (flax.linen, NHWC).

Re-implementation of /root/reference/mdir/components/model/network/rcf.py:
VGG16-style 13 convs (conv5 dilated), 21-channel side outputs summed per
stage, 1×1 scores, fixed-bilinear transposed-conv upsampling with the
reference's crop offsets, 1×1 fusion, optional pre-sigmoid output. The
reference hardcodes `.cuda()` for its deconv weights (rcf.py:69-72); here they
are jit-constant arrays — device-agnostic by construction.
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.layers import Conv


def _bilinear_filter(size):
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    og = np.ogrid[:size, :size]
    filt = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    return jnp.asarray(filt, jnp.float32)


def _fixed_deconv(x, size, stride):
    """conv_transpose2d with a fixed bilinear kernel, no padding (rcf.py:143-146)."""
    k = _bilinear_filter(size)[:, :, None, None]  # HWIO, 1->1 channel
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=((size - 1, size - 1), (size - 1, size - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ceil_pool(x, stride):
    """MaxPool2d(2, stride, ceil_mode=True) (rcf.py:43-46)."""
    H, W = x.shape[1], x.shape[2]
    outH = -(-max(H - 2, 0) // stride) + 1
    outW = -(-max(W - 2, 0) // stride) + 1
    padH = (outH - 1) * stride + 2 - H
    padW = (outW - 1) * stride + 2 - W
    if padH or padW:
        x = jnp.pad(x, ((0, 0), (0, padH), (0, padW), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(stride, stride))


_STAGES = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
           (512, 512, 512))


class RCF(nn.Module):
    meta = {"in_channels": 3, "out_channels": 1}

    @nn.compact
    def __call__(self, x, no_sigmoid=False, train=True):
        H, W = x.shape[1], x.shape[2]
        h = x
        scores = []
        for si, widths in enumerate(_STAGES, start=1):
            if si > 1:
                h = _ceil_pool(h, 1 if si == 5 else 2)
            downs = []
            for ci, width in enumerate(widths, start=1):
                dilation = 2 if si == 5 else 1
                h = Conv(width, 3, padding=dilation, dilation=dilation,
                         name=f"conv{si}_{ci}")(h)
                h = nn.relu(h)
                downs.append(Conv(21, 1, name=f"conv{si}_{ci}_down")(h))
            s = Conv(1, 1, name=f"score_dsn{si}")(sum(downs))
            scores.append(s)

        out1 = scores[0]
        out2 = _fixed_deconv(scores[1], 4, 2)[:, 1:1 + H, 1:1 + W, :]
        out3 = _fixed_deconv(scores[2], 8, 4)[:, 2:2 + H, 2:2 + W, :]
        out4 = _fixed_deconv(scores[3], 16, 8)[:, 4:4 + H, 4:4 + W, :]
        out5 = _fixed_deconv(scores[4], 16, 8)[:, 0:H, 0:W, :]

        fuse = Conv(1, 1, name="score_fuse")(
            jnp.concatenate([out1, out2, out3, out4, out5], axis=-1))
        return fuse if no_sigmoid else nn.sigmoid(fuse)


def rcf_key_map(path):
    """flax path -> torch RCF state key (every conv — dilated conv5 included —
    nests its kernel under layers.Conv's 'conv' submodule, so torch_import's
    OIHW layout rule applies uniformly)."""
    leaf = {"kernel": "weight", "bias": "bias"}[path[-1]]
    return f"{path[0]}.{leaf}"
