"""U-Net family variants (flax.linen, NHWC).

Re-implementations of /root/reference/mdir/components/model/network/unet.py:
OrigUNet (classic double-conv U-Net), P2pUNet (pix2pix-style), ShallowP2pUNet,
OutconvP2pUNet, OutconvP2pUNetDynamicInterpolate (resize-up instead of
convT), InconvP2pUNet, AlignedP2pUNet (stride-1, fully aligned).
"""
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.layers import Conv, ConvTranspose, BatchNorm
from gandtr_tpu.ops.resize import bilinear_resize, nearest_resize


class _DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.features, 3, padding=1, name="conv1")(x))
        return nn.relu(Conv(self.features, 3, padding=1, name="conv2")(x))


class OrigUNet(nn.Module):
    """Classic U-Net (unet.py:6-45): double-conv blocks, maxpool down,
    2×2-stride convT up with skip concat."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 4
    min_channels: int = 64

    @nn.compact
    def __call__(self, x, train=True):
        def block(h, level):
            ch = self.min_channels * 2 ** level
            h1 = _DoubleConv(ch, name=f"down_{level}")(h)
            if level == self.nested_levels - 1:
                inner = _DoubleConv(ch * 2, name="inner")(
                    nn.max_pool(h1, (2, 2), strides=(2, 2)))
            else:
                inner = block(nn.max_pool(h1, (2, 2), strides=(2, 2)), level + 1)
            up = ConvTranspose(ch, 2, stride=2, padding=0, output_padding=0,
                               name=f"up_{level}")(inner)
            return _DoubleConv(ch, name=f"upconv_{level}")(
                jnp.concatenate([h1, up], axis=-1))

        h = block(x, 0)
        return Conv(self.out_channels, 1, name="outconv")(h)


class _P2pSkip(nn.Module):
    """pix2pix skip block (unet.py:52-81): conv-[(bn)-lrelu-nested]-convT-(bn)
    -(dropout)-relu, concat with input."""
    outer: int
    inter: int
    nested: nn.Module = None
    batchnorm: bool = True
    dropout: float = 0.0
    #: P2pUNet's conv_opts carry bias=False (unet.py:50); the Outconv/Inconv/
    #: Aligned variants' conv_opts omit it -> torch default bias=True
    #: (unet.py:177,292,322)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        h = Conv(self.inter, 4, stride=2, padding=1, use_bias=self.use_bias,
                 name="down")(x)
        if self.nested is not None:
            if self.batchnorm:
                h = BatchNorm(name="bn_down")(h, use_running_average=not train)
            h = nn.leaky_relu(h, 0.2)
            h = self.nested(h, train=train)
        else:
            h = nn.relu(h)
        h = ConvTranspose(self.outer, 4, stride=2, padding=1, output_padding=0,
                          use_bias=self.use_bias, name="up")(h)
        if self.batchnorm:
            h = BatchNorm(name="bn_up")(h, use_running_average=not train)
        if self.dropout:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(h)
        return jnp.concatenate([x, h], axis=-1)


def _p2p_blocks(nested_levels, base=((64, 128), (128, 256), (256, 512), (512, 512))):
    blocks = list(base[:nested_levels])
    while len(blocks) < nested_levels:
        blocks.append((512, 512))
    return blocks


class P2pUNet(nn.Module):
    """pix2pix U-Net (unet.py:48-110)."""
    in_channels: int = 3
    out_channels: int = 3
    dropout: float = 0.0
    batchnorm: bool = True
    nested_levels: int = 7

    @nn.compact
    def __call__(self, x, train=True):
        base = [(64, 128), (128, 256), (256, 512), (512, 512)][:self.nested_levels]
        blocks = base + [(512, 512, True)] * (self.nested_levels - len(base))
        inner = None
        for li, blk in enumerate(reversed(blocks)):
            cin, cout = blk[:2]
            use_dropout = len(blk) == 3  # only the deep extra blocks (unet.py:93-94)
            inner = _P2pSkip(cin, cout, inner, self.batchnorm,
                             self.dropout if use_dropout else 0.0,
                             name=f"skip_{len(blocks) - 1 - li}")
        h = Conv(64, 4, stride=2, padding=1, use_bias=False, name="inconv")(x)
        h = nn.leaky_relu(h, 0.2)
        h = inner(h, train=train)
        h = ConvTranspose(self.out_channels, 4, stride=2, padding=1,
                          output_padding=0, name="outconvT")(h)
        return jnp.tanh(h)


class ShallowP2pUNet(nn.Module):
    """Shallow variant with 1×1 refinements (unet.py:113-176)."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 4

    @nn.compact
    def __call__(self, x, train=True):
        blocks = _p2p_blocks(self.nested_levels,
                             ((64, 128), (128, 256), (256, 512)))

        def skip(h, idx):
            cin, cout = blocks[idx]
            h1 = nn.relu(Conv(cout, 4, stride=2, padding=1, name=f"d_{idx}")(h))
            h1 = nn.relu(Conv(cout, 1, name=f"d1_{idx}")(h1))
            if idx + 1 < len(blocks):
                h1 = skip(h1, idx + 1)
            h1 = nn.relu(ConvTranspose(cin, 4, stride=2, padding=1,
                                       output_padding=0, name=f"u_{idx}")(h1))
            h1 = nn.relu(Conv(cin, 1, name=f"u1_{idx}")(h1))
            return jnp.concatenate([h, h1], axis=-1)

        h = nn.relu(Conv(64, 4, stride=2, padding=1, name="inconv")(x))
        h = nn.relu(Conv(64, 1, name="inconv1")(h))
        h = skip(h, 0)
        h = nn.relu(ConvTranspose(64, 4, stride=2, padding=1, output_padding=0,
                                  name="outconvT")(h))
        h = nn.relu(Conv(64, 1, name="outconv1")(h))
        return Conv(self.out_channels, 1, name="outconv")(h)


class OutconvP2pUNet(nn.Module):
    """P2pUNet with a smooth conv head instead of tanh (unet.py:179-213)."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7
    outconv_channels: int = 32
    outconv_kernel: int = 3
    batchnorm: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        blocks = _p2p_blocks(self.nested_levels, ((64, 128), (128, 256), (256, 512)))
        inner = None
        for li, (cin, cout) in enumerate(reversed(blocks)):
            inner = _P2pSkip(cin, cout, inner, self.batchnorm, self.dropout,
                             use_bias=True,
                             name=f"skip_{len(blocks) - 1 - li}")
        h = Conv(64, 4, stride=2, padding=1, name="inconv")(x)
        h = nn.leaky_relu(h, 0.2)
        if inner is not None:
            h = inner(h, train=train)
        h = nn.relu(ConvTranspose(self.outconv_channels, 4, stride=2, padding=1,
                                  output_padding=0, name="outconvT")(h))
        return Conv(self.out_channels, self.outconv_kernel,
                    padding=self.outconv_kernel // 2, name="outconv")(h)


class OutconvP2pUNetDynamicInterpolate(nn.Module):
    """Resize-based upsampling variant (unet.py:216-287): down convs, then
    F.interpolate back to the input size + conv head — handles any input size."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7
    upsample: str = "bilinear"
    outconv_channels: int = 32
    outconv_kernel: int = 3
    batchnorm: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        blocks = _p2p_blocks(self.nested_levels, ((64, 128), (128, 256), (256, 512)))

        def resize(h, size):
            fn = bilinear_resize if self.upsample == "bilinear" else nearest_resize
            return fn(h, *size)

        def skip(h, idx):
            cin, cout = blocks[idx]
            size = h.shape[1:3]
            h1 = Conv(cout, 4, stride=2, padding=1, name=f"d_{idx}")(h)
            if self.batchnorm:
                h1 = BatchNorm(name=f"bnd_{idx}")(h1, use_running_average=not train)
            h1 = nn.leaky_relu(h1, 0.2)
            if idx + 1 < len(blocks):
                h1 = skip(h1, idx + 1)
            h1 = resize(h1, size)
            h1 = Conv(cin, 3, stride=1, padding=1, name=f"u_{idx}")(h1)
            if self.batchnorm:
                h1 = BatchNorm(name=f"bnu_{idx}")(h1, use_running_average=not train)
            if self.dropout:
                h1 = nn.Dropout(self.dropout, deterministic=not train)(h1)
            h1 = nn.relu(h1)
            return jnp.concatenate([h, h1], axis=-1)

        size = x.shape[1:3]
        h = Conv(64, 4, stride=2, padding=1, name="inconv")(x)
        h = nn.leaky_relu(h, 0.2)
        h = skip(h, 0)
        h = resize(h, size)
        h = nn.relu(Conv(self.outconv_channels, 3, stride=1, padding=1,
                         name="up0")(h))
        return Conv(self.out_channels, self.outconv_kernel,
                    padding=self.outconv_kernel // 2, name="outconv")(h)


class InconvP2pUNet(nn.Module):
    """P2pUNet with a 1×1 input adapter (unet.py:290-316)."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7

    @nn.compact
    def __call__(self, x, train=True):
        blocks = _p2p_blocks(self.nested_levels, ((64, 128), (128, 256), (256, 512)))
        inner = None
        for li, (cin, cout) in enumerate(reversed(blocks)):
            inner = _P2pSkip(cin, cout, inner, batchnorm=False, use_bias=True,
                             name=f"skip_{len(blocks) - 1 - li}")
        h = nn.leaky_relu(Conv(64, 1, name="inconv1x1")(x), 0.2)
        h = nn.leaky_relu(Conv(64, 4, stride=2, padding=1, name="inconv")(h), 0.2)
        h = inner(h, train=train)
        h = ConvTranspose(self.out_channels, 4, stride=2, padding=1,
                          output_padding=0, name="outconvT")(h)
        return jnp.tanh(h)


class AlignedP2pUNet(nn.Module):
    """Fully-aligned variant: stride-1 3×3 head/tail (unet.py:319-349)."""
    in_channels: int = 3
    out_channels: int = 3
    nested_levels: int = 7

    @nn.compact
    def __call__(self, x, train=True):
        blocks = _p2p_blocks(self.nested_levels, ((64, 128), (128, 256), (256, 512)))
        inner = None
        for li, (cin, cout) in enumerate(reversed(blocks)):
            inner = _P2pSkip(cin, cout, inner, batchnorm=False, use_bias=True,
                             name=f"skip_{len(blocks) - 1 - li}")
        h = nn.relu(Conv(64, 3, padding=1, name="in1")(x))
        h = nn.relu(Conv(64, 3, padding=1, name="in2")(h))
        h = inner(h, train=train)
        h = nn.relu(Conv(64, 3, padding=1, name="out1")(h))
        h = nn.relu(Conv(64, 3, padding=1, name="out2")(h))
        return Conv(self.out_channels, 3, padding=1, name="outconv")(h)
