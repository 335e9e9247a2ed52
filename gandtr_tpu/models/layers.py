"""Building-block layers with torch-equivalent numerics (NHWC, flax.linen).

These re-create the exact semantics of the reference's torch layers so that
imported .pth weights produce matching outputs:
- Conv with zero/reflect/replicate padding (p2p_networks.py conv stacks)
- ConvTranspose matching torch ConvTranspose2d(k, s, p, output_padding)
- InstanceNorm (affine=False) / BatchNorm with torch momentum semantics
- antialiased blur-pool Downsample/Upsample (p2p_networks.py:72-130)
"""
from typing import Callable, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.ops import fastconv
from gandtr_tpu.ops.norm import instance_norm


def pad2d(x, pad, mode="zero"):
    """Pad spatial dims of NHWC tensor. pad: int or (top, bottom, left, right)."""
    if isinstance(pad, int):
        pad = (pad, pad, pad, pad)
    t, b, l, r = pad
    cfg = ((0, 0), (t, b), (l, r), (0, 0))
    if mode in ("zero", "constant"):
        return jnp.pad(x, cfg)
    if mode in ("reflect", "refl"):
        # NOTE: fastconv.reflect_pad (zero-pad + border patches) wins 4x in
        # isolation but LOSES in-graph: the DUS chain blocks producer fusion
        # that XLA's native reflect lowering keeps (docs/PERF.md).
        return jnp.pad(x, cfg, mode="reflect")
    if mode in ("replicate", "repl"):
        return jnp.pad(x, cfg, mode="edge")
    raise NotImplementedError("pad mode %s" % mode)


class _RawConv(nn.Module):
    """nn.Conv-compatible conv (identical param names/shapes/initializers and
    RNG stream, identical dtype promotion) that routes MXU-hostile shapes
    through ops/fastconv.py's exact space-to-depth rewrite. Numerically equal
    to nn.Conv up to float summation order."""
    features: int
    kernel_size: int
    stride: int
    use_bias: bool

    reflect_pad: int = 0  # fold a 'SAME' reflect pad into the fast path
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (K, K, x.shape[-1], self.features))
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        y = None
        if self.reflect_pad:
            y = fastconv.dispatch_conv_reflect(x, kernel, self.reflect_pad,
                                               stride=self.stride,
                                               dilation=self.dilation)
            if y is None:
                x = pad2d(x, self.reflect_pad, "reflect")
        if y is None and x.ndim == 4 and self.dilation == 1:
            y = fastconv.dispatch_conv(x, kernel, self.stride)
        if y is None:
            y = jax.lax.conv_general_dilated(
                x, kernel, (self.stride, self.stride), "VALID",
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if squeeze:
            y = y[0]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(dt)
        return y


class Conv(nn.Module):
    """Conv2d with torch-style integer padding (zero) done explicitly."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    pad_mode: str = "zero"
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        # NOTE: folding a SAME-reflect pad into the fast path
        # (fastconv.conv_reflect_few_out) wins ~2 ms on an isolated tail but
        # is a wash in the full generator — XLA fuses the reflect lowering
        # with its producer there (docs/PERF.md), so the plain pad stays.
        if self.padding:
            x = pad2d(x, self.padding, self.pad_mode)
        return _RawConv(self.features, self.kernel_size, self.stride,
                        self.use_bias, dilation=self.dilation,
                        name="conv")(x)


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(kernel, stride, padding, output_padding) equivalent.

    The kernel parameter is stored in (kh, kw, in, out) layout holding the torch
    weight transposed (torch shape is (in, out, kh, kw)); the spatial flip
    required by the transposed convolution happens at call time.
    """
    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=(0, 1, 3), out_axis=2),
            (k, k, in_ch, self.features))
        kf = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
        pad = (k - 1 - p, k - 1 - p + op)
        y = jax.lax.conv_general_dilated(
            x, kf, window_strides=(1, 1), padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=False): no params, per-sample spatial norm."""
    epsilon: float = 1e-5

    def __call__(self, x):
        return instance_norm(x, eps=self.epsilon)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch semantics: biased batch variance for
    normalization, unbiased for the running-stat update, momentum 0.1."""
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: bool = None

    @nn.compact
    def __call__(self, x, use_running_average=None):
        use_ra = nn.merge_param("use_running_average",
                                self.use_running_average, use_running_average)
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            if not self.is_initializing():
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


def make_norm(norm_type):
    """Norm factory mirroring get_norm_layer (p2p_networks.py:23-35).

    Returns (module_ctor_or_None, has_params, use_bias_for_convs).
    """
    if norm_type == "instance":
        return InstanceNorm, False, True
    if norm_type == "batch":
        return BatchNorm, True, False
    if norm_type == "none":
        return None, False, True
    raise NotImplementedError("normalization layer [%s] is not found" % norm_type)


def _binomial_filter(size):
    a = {1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0], 4: [1.0, 3.0, 3.0, 1.0],
         5: [1.0, 4.0, 6.0, 4.0, 1.0], 6: [1.0, 5.0, 10.0, 10.0, 5.0, 1.0],
         7: [1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0]}[size]
    f = np.outer(a, a)
    return (f / f.sum()).astype(np.float32)


class BlurDownsample(nn.Module):
    """Antialiased downsample (p2p Downsample, p2p_networks.py:72-96):
    reflect-pad + depthwise binomial blur with stride."""
    filt_size: int = 3
    stride: int = 2
    pad_type: str = "reflect"
    pad_off: int = 0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        fs = self.filt_size
        ps = [(fs - 1) // 2, int(np.ceil((fs - 1) / 2.0))]
        pad = (ps[0] + self.pad_off, ps[1] + self.pad_off,
               ps[0] + self.pad_off, ps[1] + self.pad_off)
        if fs == 1:
            if self.pad_off == 0:
                return x[:, ::self.stride, ::self.stride, :]
            x = pad2d(x, pad, self.pad_type)
            return x[:, ::self.stride, ::self.stride, :]
        x = pad2d(x, pad, self.pad_type)
        filt = jnp.asarray(_binomial_filter(fs))[:, :, None, None]
        filt = jnp.tile(filt, (1, 1, 1, C))  # HWIO with I=1, grouped
        return jax.lax.conv_general_dilated(
            x, filt, window_strides=(self.stride, self.stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


class BlurUpsample(nn.Module):
    """Antialiased upsample (p2p Upsample, p2p_networks.py:107-130): depthwise
    transposed conv with binomial filter scaled by stride²."""
    filt_size: int = 4
    stride: int = 2
    pad_type: str = "repl"

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        fs = self.filt_size
        filt_odd = fs % 2 == 1
        pad_size = (fs - 1) // 2
        filt = jnp.asarray(_binomial_filter(fs)) * (self.stride ** 2)
        x = pad2d(x, (1, 1, 1, 1), self.pad_type)
        # torch: conv_transpose2d(pad(x), filt, stride, padding=1+pad_size,
        #        groups=C)[:, :, 1:, 1:]
        k = fs
        p = 1 + pad_size
        kf = jnp.flip(filt, axis=(0, 1))[:, :, None, None]
        kf = jnp.tile(kf, (1, 1, 1, C))
        pp = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x, kf, window_strides=(1, 1), padding=((pp, pp), (pp, pp)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
        y = y[:, 1:, 1:, :]
        if not filt_odd:
            y = y[:, :-1, :-1, :]
        return y
