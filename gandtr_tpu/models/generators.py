"""Image-to-image generators (flax.linen, NHWC).

TPU-native re-implementations of the reference generator family
(/root/reference/mdir/components/model/network/p2p_networks.py): ResnetGenerator
(CycleGAN/CUT 9-block), ResnetEncoder/Decoder, UnetGenerator. Parameter names
mirror the torch Sequential indices (`model_<i>`) so reference .pth checkpoints
map 1:1, and `layers=`/`encode_only=` feature taps use the same indices as the
torch forward (p2p_networks.py:318-337) for CUT's PatchNCE.
"""
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.layers import (
    Conv, ConvTranspose, make_norm, pad2d, BlurDownsample, BlurUpsample)
from gandtr_tpu.ops import resblock_pallas
from gandtr_tpu.ops.maskprop import (
    MaskState, masked_reflect_pad, masked_instance_norm)


class _ConvParams(nn.Module):
    """Declares the same conv/{kernel,bias} params as Conv->_RawConv (same
    path, shapes, initializers — so the fused-block path below shares one
    parameter tree with the unfused path) and returns them as arrays."""
    features: int
    kernel_size: int
    in_ch: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        K = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (K, K, self.in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class _BlockConvParams(nn.Module):
    features: int
    kernel_size: int
    in_ch: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        return _ConvParams(self.features, self.kernel_size, self.in_ch,
                           self.use_bias, name="conv")()


class ResnetBlock(nn.Module):
    """Residual block: pad-conv-norm-relu-[dropout]-pad-conv-norm + skip.

    Submodule names track the torch conv_block Sequential indices.

    Runs through XLA's conv emitter. A fused Pallas block kernel was built
    and REJECTED on measurement (ops/resblock_pallas.py, dispatch-disabled:
    44% vs 81% MXU — docs/PERF.md "fused ResNet-block"); XLA's emitter wins
    here.
    """
    dim: int
    padding_type: str = "reflect"
    norm_type: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train=True, ms=None):
        masked = ms is not None and ms.active
        if not masked and resblock_pallas.eligible(
                x.shape, x.dtype, train=train, use_dropout=self.use_dropout,
                padding_type=self.padding_type, norm_type=self.norm_type,
                use_bias=self.use_bias):
            idx = 1  # reflect padding => torch Sequential indices 1 and 5
            k1, b1 = _BlockConvParams(self.dim, 3, x.shape[-1],
                                      name=f"conv_block_{idx}")()
            k2, b2 = _BlockConvParams(self.dim, 3, self.dim,
                                      name=f"conv_block_{idx + 4}")()
            return resblock_pallas.fused_resblock(x, k1, b1, k2, b2)

        norm_ctor, norm_params, _ = make_norm(self.norm_type)
        p = 1 if self.padding_type == "zero" else 0
        idx = 0 if self.padding_type == "zero" else 1

        def norm(h, i):
            if norm_ctor is None:
                return h if not masked else ms.apply(h)
            if norm_params:
                if masked and train:
                    raise NotImplementedError(
                        "masked generator requires frozen (eval-mode) BN")
                h = norm_ctor(name=f"conv_block_{i}")(
                    h, use_running_average=not train)
                return ms.apply(h) if masked else h
            if masked:
                return masked_instance_norm(h, ms)
            return norm_ctor(name=f"conv_block_{i}")(h)

        def padded(h):
            if p != 0:
                return h, ms
            if masked:
                return masked_reflect_pad(h, ms, 1)
            return pad2d(h, 1, self.padding_type), ms

        h = x
        h, _ = padded(h)
        h = Conv(self.dim, 3, padding=p, use_bias=self.use_bias,
                 name=f"conv_block_{idx}")(h)
        # after a p0 conv over the 1-padded buffer the valid rect is back to
        # the block's own; norms re-zero the bias band (`ms.apply` for
        # none/batch, the mask-aware IN itself otherwise)
        h = norm(h, idx + 1)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        idx2 = idx + 3 + (1 if self.use_dropout else 0) + (0 if p else 1)
        h, _ = padded(h)
        h = Conv(self.dim, 3, padding=p, use_bias=self.use_bias,
                 name=f"conv_block_{idx2}")(h)
        h = norm(h, idx2 + 1)
        return x + h


class ResnetGenerator(nn.Module):
    """9-block ResNet generator (p2p_networks.py:239-337).

    `layers` selects torch-Sequential-index feature taps; with `encode_only`
    the forward stops at the last requested tap and returns only the features —
    both matching the reference forward for CUT.
    """
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 9
    padding_type: str = "reflect"
    no_antialias: bool = True
    no_antialias_up: bool = True

    @nn.compact
    def __call__(self, x, layers=(), encode_only=False, train=True, mask=None):
        norm_ctor, norm_params, use_bias = make_norm(self.norm_type)
        masked = mask is not None
        if masked and not (self.no_antialias and self.no_antialias_up):
            raise NotImplementedError(
                "masked generator requires no_antialias blur-pool-free form")
        steps = []  # (torch_idx, fn(h, ms) -> (h, ms), is_inplace_relu)
        idx = [0]

        def add(fn, inplace_relu=False):
            steps.append((idx[0], fn, inplace_relu))
            idx[0] += 1

        def add_ew(fn, inplace_relu=False):
            # elementwise step: fn(0) == 0 for relu/tanh so the band stays
            # zero and the mask state is untouched
            add(lambda h, ms, f=fn: (f(h), ms), inplace_relu)

        def norm_step(i):
            if norm_ctor is None:
                add(lambda h, ms: (ms.apply(h), ms))
            elif norm_params:
                if masked and train:
                    raise NotImplementedError(
                        "masked generator requires frozen (eval-mode) BN")
                mod = norm_ctor(name=f"model_{i}")
                add(lambda h, ms, m=mod: (
                    ms.apply(m(h, use_running_average=not train)), ms))
            else:
                mod = norm_ctor()
                add(lambda h, ms, m=mod: (
                    (masked_instance_norm(h, ms), ms) if ms.active
                    else (m(h), ms)))

        def reflect_step(pad):
            def fn(h, ms):
                if ms.active:
                    return masked_reflect_pad(h, ms, pad)
                return pad2d(h, pad, "reflect"), ms
            add(fn)

        def conv_step(mod, k, s, p):
            add(lambda h, ms, m=mod: (m(h), ms.downsample(k, s, p)))

        ngf = self.ngf
        reflect_step(3)
        conv_step(Conv(ngf, 7, use_bias=use_bias, name="model_1"), 7, 1, 0)
        norm_step(2)
        add_ew(nn.relu, inplace_relu=True)

        n_downsampling = 2
        for i in range(n_downsampling):
            mult = 2 ** i
            if self.no_antialias:
                m = Conv(ngf * mult * 2, 3, stride=2, padding=1, use_bias=use_bias,
                         name=f"model_{idx[0]}")
                conv_step(m, 3, 2, 1)
                norm_step(idx[0])
                add_ew(nn.relu, inplace_relu=True)
            else:
                m = Conv(ngf * mult * 2, 3, stride=1, padding=1, use_bias=use_bias,
                         name=f"model_{idx[0]}")
                conv_step(m, 3, 1, 1)
                norm_step(idx[0])
                add_ew(nn.relu, inplace_relu=True)
                d = BlurDownsample()
                add_ew(lambda h, m=d: m(h))

        mult = 2 ** n_downsampling
        for i in range(self.n_blocks):
            blk = ResnetBlock(ngf * mult, self.padding_type, self.norm_type,
                              self.use_dropout, use_bias, name=f"model_{idx[0]}")
            add(lambda h, ms, m=blk: (m(h, train=train, ms=ms), ms))

        for i in range(n_downsampling):
            mult = 2 ** (n_downsampling - i)
            if self.no_antialias_up:
                m = ConvTranspose(int(ngf * mult / 2), 3, stride=2, padding=1,
                                  output_padding=1, use_bias=use_bias,
                                  name=f"model_{idx[0]}")
                # torch ConvTranspose2d(k3, s2, p1, op1): out = 2*in; zero
                # band inputs contribute nothing, bias band re-zeroed by norm
                add(lambda h, ms, m=m: (m(h), ms.upsample(2)))
                norm_step(idx[0])
                add_ew(nn.relu, inplace_relu=True)
            else:
                u = BlurUpsample()
                add_ew(lambda h, m=u: m(h))
                m = Conv(int(ngf * mult / 2), 3, stride=1, padding=1,
                         use_bias=use_bias, name=f"model_{idx[0]}")
                conv_step(m, 3, 1, 1)
                norm_step(idx[0])
                add_ew(nn.relu, inplace_relu=True)

        reflect_step(3)
        final = Conv(self.output_nc, 7, name=f"model_{idx[0]}")

        def final_step(h, ms, m=final):
            ms2 = ms.downsample(7, 1, 0)
            return ms2.apply(m(h)), ms2  # no norm follows: re-zero bias band
        add(final_step)
        add_ew(jnp.tanh)

        layers = list(layers)
        if -1 in layers:
            layers.append(len(steps))

        ms0 = MaskState.maybe(mask)
        x = ms0.apply(x)

        if layers:
            # torch uses ReLU(inplace=True): a stored tap whose *next* step is
            # an inplace relu is mutated before the caller sees it — replicate
            # by storing the relu'd value (p2p_networks.py:318-331 semantics).
            # EXCEPT the tap that triggers the encode_only early return: the
            # reference returns at `layer_id == layers[-1]` BEFORE the next
            # module runs (p2p_networks.py:330-332), so that tap escapes the
            # inplace mutation — found by the CUT cross-engine oracle (the
            # r3 golden's torch composition ran all layers and entrenched the
            # mutated value; the real CUT NCE path feeds the PRE-relu tap).
            feat, ms = x, ms0
            feats = []
            for si, (layer_id, fn, _) in enumerate(steps):
                feat, ms = fn(feat, ms)
                if layer_id in layers:
                    mutated = feat
                    if si + 1 < len(steps) and steps[si + 1][2] and not (
                            encode_only and layer_id == layers[-1]):
                        mutated = nn.relu(feat)
                    feats.append(mutated)
                if layer_id == layers[-1] and encode_only:
                    return feats
            return feat, feats

        h, ms = x, ms0
        for _, fn, _ in steps:
            h, ms = fn(h, ms)
        if masked:
            # image-transforming modules return (y, out_mask) when masked:
            # the valid rectangle changes (4·ceil(h/4)-style arithmetic, like
            # the reference generator's output shape on exact inputs)
            return h, ms.mask(h.shape[1], h.shape[2], h.dtype)
        return h


class ResnetEncoder(nn.Module):
    """Downsampling half + blocks (p2p_networks.py:402-472)."""
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 6
    padding_type: str = "reflect"
    no_antialias: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        norm_ctor, norm_params, use_bias = make_norm(self.norm_type)
        idx = [0]

        def norm_apply(h):
            if norm_ctor is None:
                return h
            if norm_params:
                return norm_ctor(name=f"model_{idx[0]}")(h, use_running_average=not train)
            return norm_ctor()(h)

        h = pad2d(x, 3, "reflect"); idx[0] += 1
        h = Conv(self.ngf, 7, use_bias=use_bias, name=f"model_{idx[0]}")(h); idx[0] += 1
        h = norm_apply(h); idx[0] += 1
        h = nn.relu(h); idx[0] += 1
        for i in range(2):
            mult = 2 ** i
            h = Conv(self.ngf * mult * 2, 3, stride=2, padding=1, use_bias=use_bias,
                     name=f"model_{idx[0]}")(h); idx[0] += 1
            h = norm_apply(h); idx[0] += 1
            h = nn.relu(h); idx[0] += 1
        mult = 4
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, self.padding_type, self.norm_type,
                            self.use_dropout, use_bias, name=f"model_{idx[0]}")(h, train=train)
            idx[0] += 1
        return h


class ResnetDecoder(nn.Module):
    """Blocks + upsampling half (p2p_networks.py:341-398)."""
    input_nc: int = 3
    output_nc: int = 3
    ngf: int = 64
    norm_type: str = "instance"
    use_dropout: bool = False
    n_blocks: int = 6
    padding_type: str = "reflect"
    no_antialias: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        norm_ctor, norm_params, use_bias = make_norm(self.norm_type)
        idx = [0]

        def norm_apply(h):
            if norm_ctor is None:
                return h
            if norm_params:
                return norm_ctor(name=f"model_{idx[0]}")(h, use_running_average=not train)
            return norm_ctor()(h)

        h = x
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.padding_type, self.norm_type,
                            self.use_dropout, use_bias, name=f"model_{idx[0]}")(h, train=train)
            idx[0] += 1
        for i in range(2):
            mult = 2 ** (2 - i)
            h = ConvTranspose(int(self.ngf * mult / 2), 3, stride=2, padding=1,
                              output_padding=1, use_bias=use_bias,
                              name=f"model_{idx[0]}")(h); idx[0] += 1
            h = norm_apply(h); idx[0] += 1
            h = nn.relu(h); idx[0] += 1
        h = pad2d(h, 3, "reflect"); idx[0] += 1
        h = Conv(self.output_nc, 7, name=f"model_{idx[0]}")(h); idx[0] += 1
        return jnp.tanh(h)


class UnetSkipBlock(nn.Module):
    """Recursive U-Net block (p2p_networks.py:168-239)."""
    outer_nc: int
    inner_nc: int
    input_nc: int = None
    submodule: nn.Module = None
    outermost: bool = False
    innermost: bool = False
    norm_type: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        norm_ctor, norm_params, use_bias = make_norm(self.norm_type)

        def norm_apply(h, name):
            if norm_ctor is None:
                return h
            if norm_params:
                return norm_ctor(name=name)(h, use_running_average=not train)
            return norm_ctor()(h)

        input_nc = self.input_nc if self.input_nc is not None else self.outer_nc

        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        h = Conv(self.inner_nc, 4, stride=2, padding=1,
                 use_bias=use_bias, name="downconv")(h)
        if not self.outermost and not self.innermost:
            h = norm_apply(h, "downnorm")
        if self.submodule is not None:
            h = self.submodule(h, train=train)
        h = nn.relu(h)
        h = ConvTranspose(self.outer_nc, 4, stride=2, padding=1, output_padding=0,
                          use_bias=use_bias or self.outermost, name="upconv")(h)
        if self.outermost:
            return jnp.tanh(h)
        h = norm_apply(h, "upnorm")
        if self.use_dropout and not self.innermost:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    """U-Net generator (p2p_networks.py:133-165)."""
    input_nc: int = 3
    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm_type: str = "batch"
    use_dropout: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        ngf = self.ngf
        block = UnetSkipBlock(ngf * 8, ngf * 8, innermost=True,
                              norm_type=self.norm_type, name="inner")
        for i in range(self.num_downs - 5):
            block = UnetSkipBlock(ngf * 8, ngf * 8, submodule=block,
                                  norm_type=self.norm_type,
                                  use_dropout=self.use_dropout, name=f"mid_{i}")
        block = UnetSkipBlock(ngf * 4, ngf * 8, submodule=block,
                              norm_type=self.norm_type, name="up4")
        block = UnetSkipBlock(ngf * 2, ngf * 4, submodule=block,
                              norm_type=self.norm_type, name="up2")
        block = UnetSkipBlock(ngf, ngf * 2, submodule=block,
                              norm_type=self.norm_type, name="up1")
        block = UnetSkipBlock(self.output_nc, ngf, input_nc=self.input_nc,
                              submodule=block, outermost=True,
                              norm_type=self.norm_type, name="outer")
        return block(x, train=train)
