"""PatchGAN discriminators (flax.linen, NHWC).

Re-implementation of NLayerDiscriminator / PatchDiscriminator
(/root/reference/mdir/components/model/network/p2p_networks.py:559-607) with
torch-Sequential param naming (`model_<i>`) for 1:1 weight import.
"""
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.layers import Conv, make_norm, BlurDownsample


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    kw: int = 4
    norm_type: str = "batch"
    no_antialias: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        norm_ctor, norm_params, use_bias = make_norm(self.norm_type)
        idx = [0]

        def conv(h, feats, stride, bias=True):
            m = Conv(feats, self.kw, stride=stride, padding=1, use_bias=bias,
                     name=f"model_{idx[0]}")
            idx[0] += 1
            return m(h)

        def norm(h):
            if norm_ctor is None:
                return h
            if norm_params:
                h = norm_ctor(name=f"model_{idx[0]}")(h, use_running_average=not train)
            else:
                h = norm_ctor()(h)
            idx[0] += 1
            return h

        def lrelu(h):
            idx[0] += 1
            return nn.leaky_relu(h, 0.2)

        if self.no_antialias:
            h = conv(x, self.ndf, 2)
            h = lrelu(h)
        else:
            h = conv(x, self.ndf, 1)
            h = lrelu(h)
            h = BlurDownsample()(h)
            idx[0] += 1

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            if self.no_antialias:
                h = conv(h, self.ndf * nf_mult, 2, bias=use_bias)
                h = norm(h)
                h = lrelu(h)
            else:
                h = conv(h, self.ndf * nf_mult, 1, bias=use_bias)
                h = norm(h)
                h = lrelu(h)
                h = BlurDownsample()(h)
                idx[0] += 1

        nf_mult = min(2 ** self.n_layers, 8)
        h = conv(h, self.ndf * nf_mult, 1, bias=use_bias)
        h = norm(h)
        h = lrelu(h)
        h = conv(h, 1, 1)
        return h


class PatchDiscriminator(nn.Module):
    """16×16-tiling PatchGAN (p2p_networks.py:580-597): the image is cut into
    16px tiles which are scored independently by a 2-layer NLayerDiscriminator."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 2
    norm_type: str = "batch"
    no_antialias: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        B, H, W, C = x.shape
        size = 16
        Y, X = H // size, W // size
        h = x.reshape(B, Y, size, X, size, C)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B * Y * X, size, size, C)
        return NLayerDiscriminator(
            self.input_nc, self.ndf, self.n_layers, 4, self.norm_type,
            self.no_antialias, name="d")(h, train=train)
