"""Numerical parity: flax models with imported torch weights vs torch oracles.

The torch modules here are compact independent constructions of the same
architectures (CycleGAN ResNet generator, PatchGAN discriminator, HED, VGG16/
ResNet101 GeM nets) used as golden references for weight import + forward.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gandtr_tpu.models.generators import ResnetGenerator, UnetGenerator
from gandtr_tpu.models.discriminators import NLayerDiscriminator
from gandtr_tpu.models.hed import HedInterpolation
from gandtr_tpu.models.backbones import VGG16Features, ResNetFeatures
from gandtr_tpu.models.retrieval import GemRetrievalNet
from gandtr_tpu.models.layers import ConvTranspose
from gandtr_tpu.utils import torch_import as ti


def nchw(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def seq_state(tm, prefix="model."):
    """state_dict of a bare Sequential oracle, renamed as the reference's
    `self.model = nn.Sequential(...)` attribute would name it."""
    return {prefix + k: v for k, v in ti.torch_state_to_numpy(tm.state_dict()).items()}


def from_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# torch oracle builders
# ---------------------------------------------------------------------------

def torch_norm(kind, ch):
    if kind == "instance":
        return tnn.InstanceNorm2d(ch, affine=False)
    if kind == "batch":
        return tnn.BatchNorm2d(ch, affine=True, track_running_stats=True)
    return tnn.Identity()


class TorchResnetBlock(tnn.Module):
    def __init__(self, dim, norm, use_bias):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3, bias=use_bias),
            torch_norm(norm, dim), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3, bias=use_bias),
            torch_norm(norm, dim))

    def forward(self, x):
        return x + self.conv_block(x)


def build_torch_resnet_generator(n_blocks=3, norm="instance", ngf=16):
    use_bias = norm == "instance"
    layers = [tnn.ReflectionPad2d(3), tnn.Conv2d(3, ngf, 7, bias=use_bias),
              torch_norm(norm, ngf), tnn.ReLU(True)]
    for i in range(2):
        mult = 2 ** i
        layers += [tnn.Conv2d(ngf * mult, ngf * mult * 2, 3, 2, 1, bias=use_bias),
                   torch_norm(norm, ngf * mult * 2), tnn.ReLU(True)]
    for _ in range(n_blocks):
        layers += [TorchResnetBlock(ngf * 4, norm, use_bias)]
    for i in range(2):
        mult = 2 ** (2 - i)
        layers += [tnn.ConvTranspose2d(ngf * mult, ngf * mult // 2, 3, 2, 1,
                                       output_padding=1, bias=use_bias),
                   torch_norm(norm, ngf * mult // 2), tnn.ReLU(True)]
    layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 3, 7), tnn.Tanh()]
    return tnn.Sequential(*layers)


def build_torch_discriminator(ndf=16, n_layers=3, norm="batch"):
    use_bias = norm == "instance"
    seq = [tnn.Conv2d(3, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
    nf = 1
    for n in range(1, n_layers):
        prev, nf = nf, min(2 ** n, 8)
        seq += [tnn.Conv2d(ndf * prev, ndf * nf, 4, 2, 1, bias=use_bias),
                torch_norm(norm, ndf * nf), tnn.LeakyReLU(0.2, True)]
    prev, nf = nf, min(2 ** n_layers, 8)
    seq += [tnn.Conv2d(ndf * prev, ndf * nf, 4, 1, 1, bias=use_bias),
            torch_norm(norm, ndf * nf), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * nf, 1, 4, 1, 1)]
    return tnn.Sequential(*seq)


class TorchHed(tnn.Module):
    def __init__(self):
        super().__init__()
        def block(cin, widths, first=False):
            acc = [] if first else [tnn.MaxPool2d(2, 2)]
            for w in widths:
                acc += [tnn.Conv2d(cin, w, 3, padding=1), tnn.ReLU(True)]
                cin = w
            return tnn.Sequential(*acc)
        self.vgg1 = block(3, [64, 64], first=True)
        self.vgg2 = block(64, [128, 128])
        self.vgg3 = block(128, [256, 256, 256])
        self.vgg4 = block(256, [512, 512, 512])
        self.vgg5 = block(512, [512, 512, 512])
        for i, c in zip(range(1, 6), [64, 128, 256, 512, 512]):
            setattr(self, f"score{i}", tnn.Conv2d(c, 1, 1))
        self.fusion = tnn.Sequential(tnn.Conv2d(5, 1, 1))

    def forward(self, x, no_sigmoid=False):
        feats = []
        h = x
        for i in range(1, 6):
            h = getattr(self, f"vgg{i}")(h)
            s = getattr(self, f"score{i}")(h)
            feats.append(F.interpolate(s, size=x.shape[2:], mode="bilinear",
                                       align_corners=False))
        out = self.fusion(torch.cat(feats, 1))
        return out if no_sigmoid else torch.sigmoid(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestConvTranspose:
    @pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0)])
    def test_matches_torch(self, k, s, p, op):
        torch.manual_seed(0)
        m = tnn.ConvTranspose2d(8, 5, k, s, p, output_padding=op)
        x = torch.randn(2, 8, 9, 11)
        ref = m(x)
        mod = ConvTranspose(5, k, stride=s, padding=p, output_padding=op)
        var = mod.init(jax.random.PRNGKey(0), nchw(x))
        state = ti.torch_state_to_numpy(m.state_dict())
        var = ti.convert_torch_state(var, state, key_map=lambda p_: {
            "kernel": "weight", "bias": "bias"}[p_[-1]])
        out = mod.apply(var, nchw(x))
        np.testing.assert_allclose(from_nhwc(out), ref.detach().numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestResnetGenerator:
    @pytest.mark.parametrize("norm", ["instance", "batch"])
    def test_forward_parity(self, norm):
        torch.manual_seed(1)
        tm = build_torch_resnet_generator(n_blocks=3, norm=norm, ngf=16).eval()
        x = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            ref = tm(x)
        fm = ResnetGenerator(ngf=16, n_blocks=3, norm_type=norm)
        var = fm.init(jax.random.PRNGKey(0), nchw(x), train=False)
        var = ti.convert_torch_state(var, seq_state(tm))
        out = fm.apply(var, nchw(x), train=False)
        np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-3, atol=2e-5)

    def test_feature_taps(self):
        """encode_only taps match running the torch Sequential partially."""
        torch.manual_seed(2)
        tm = build_torch_resnet_generator(n_blocks=3, norm="instance", ngf=16).eval()
        x = torch.randn(1, 3, 32, 32)
        taps = [0, 4, 8, 10]
        feats_t = []
        h = x
        with torch.no_grad():
            for i, layer in enumerate(tm):
                h = layer(h)
                if i in taps:
                    feats_t.append(h)
        fm = ResnetGenerator(ngf=16, n_blocks=3, norm_type="instance")
        var = fm.init(jax.random.PRNGKey(0), nchw(x), train=False)
        var = ti.convert_torch_state(var, seq_state(tm))
        feats = fm.apply(var, nchw(x), layers=taps, encode_only=True, train=False)
        assert len(feats) == len(feats_t)
        for f, ft in zip(feats, feats_t):
            np.testing.assert_allclose(from_nhwc(f), ft.numpy(), rtol=1e-3, atol=2e-5)


class TestDiscriminator:
    @pytest.mark.parametrize("norm", ["instance", "batch"])
    def test_forward_parity(self, norm):
        torch.manual_seed(3)
        tm = build_torch_discriminator(ndf=16, n_layers=3, norm=norm).eval()
        x = torch.randn(2, 3, 64, 64)
        with torch.no_grad():
            ref = tm(x)
        fm = NLayerDiscriminator(ndf=16, n_layers=3, norm_type=norm)
        var = fm.init(jax.random.PRNGKey(0), nchw(x), train=False)
        var = ti.convert_torch_state(var, seq_state(tm))
        out = fm.apply(var, nchw(x), train=False)
        np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-3, atol=2e-5)


class TestHed:
    def test_forward_parity(self):
        torch.manual_seed(4)
        tm = TorchHed().eval()
        x = torch.rand(1, 3, 64, 80)
        with torch.no_grad():
            ref = tm(x)
            ref_ns = tm(x, no_sigmoid=True)
        fm = HedInterpolation()
        var = fm.init(jax.random.PRNGKey(0), nchw(x))
        var = ti.convert_torch_state(var, ti.torch_state_to_numpy(tm.state_dict()),
                                     key_map=ti.hed_key_map)
        out = fm.apply(var, nchw(x))
        out_ns = fm.apply(var, nchw(x), no_sigmoid=True)
        np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(from_nhwc(out_ns), ref_ns.numpy(), rtol=1e-3, atol=1e-4)


def build_torch_vgg16_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512]
    seq, cin = [], 3
    for item in cfg:
        if item == "M":
            seq.append(tnn.MaxPool2d(2, 2))
        else:
            seq += [tnn.Conv2d(cin, item, 3, padding=1), tnn.ReLU(True)]
            cin = item
    return tnn.Sequential(*seq)


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + idt)


def build_torch_resnet_features(blocks=(2, 2, 2, 2)):
    """Small bottleneck resnet with torchvision naming (via Sequential index)."""
    mods = [tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
            tnn.ReLU(True), tnn.MaxPool2d(3, 2, 1)]
    cin = 64
    for li, (planes, n) in enumerate(zip((64, 128, 256, 512), blocks), 1):
        layer = []
        for bi in range(n):
            stride = 2 if (li > 1 and bi == 0) else 1
            layer.append(TorchBottleneck(cin, planes, stride, downsample=bi == 0))
            cin = planes * 4
        mods.append(tnn.Sequential(*layer))
    return tnn.Sequential(*mods)


class TestBackbones:
    def test_vgg16_parity(self):
        torch.manual_seed(5)
        tm = build_torch_vgg16_features().eval()
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            ref = tm(x)
        fm = VGG16Features()
        var = fm.init(jax.random.PRNGKey(0), nchw(x))
        var = ti.convert_torch_state(
            var, seq_state(tm, prefix="features."),
            key_map=lambda p: f"{p[0].replace('_', '.')}." +
                              {"kernel": "weight", "bias": "bias"}[p[-1]])
        out = fm.apply(var, nchw(x))
        np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_resnet_bottleneck_parity(self):
        """Small 4-stage bottleneck net exercises the full ResNet101 block logic."""
        torch.manual_seed(6)
        tm = build_torch_resnet_features((2, 2, 2, 2)).eval()
        # randomize running stats so BN parity is meaningful
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.5)
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            ref = tm(x)

        from gandtr_tpu.models.backbones import Bottleneck
        import flax.linen as nn

        class SmallResNet(nn.Module):
            @nn.compact
            def __call__(self, h):
                from gandtr_tpu.models.layers import Conv, BatchNorm
                h = Conv(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(h)
                h = BatchNorm(name="bn1")(h, use_running_average=True)
                h = nn.relu(h)
                h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
                for li, planes in enumerate((64, 128, 256, 512), 1):
                    for bi in range(2):
                        stride = 2 if (li > 1 and bi == 0) else 1
                        h = Bottleneck(planes, stride=stride, downsample=bi == 0,
                                       name=f"layer{li}_{bi}")(h)
                return h

        fm = SmallResNet()
        var = fm.init(jax.random.PRNGKey(0), nchw(x))

        def key_map(path):
            head = path[0]
            leaf = {"kernel": "weight", "scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}[path[-1]]
            if head == "conv1":
                return f"0.{leaf}"
            if head == "bn1":
                return f"1.{leaf}"
            lnum = int(head[5])
            bnum = int(head.split("_")[1])
            inner = path[1]
            if inner.startswith("downsample_"):
                inner = "downsample." + inner.split("_")[1]
            return f"{3 + lnum}.{bnum}.{inner}.{leaf}"

        var = ti.convert_torch_state(var, ti.torch_state_to_numpy(tm.state_dict()),
                                     key_map=key_map)
        out = fm.apply(var, nchw(x))
        np.testing.assert_allclose(from_nhwc(out), ref.numpy(), rtol=1e-3, atol=1e-3)


class TestRetrievalNet:
    def test_vgg16_gem_descriptor(self):
        """Full descriptor pipeline: features -> GeM -> L2N vs torch oracle."""
        torch.manual_seed(7)
        tm = build_torch_vgg16_features().eval()
        x = torch.randn(2, 3, 96, 128)
        p = 2.7
        with torch.no_grad():
            f = tm(x)
            pooled = F.avg_pool2d(f.clamp(min=1e-6).pow(p), (f.size(-2), f.size(-1))
                                  ).pow(1.0 / p).squeeze(-1).squeeze(-1)
            ref = pooled / (pooled.norm(dim=1, keepdim=True) + 1e-6)

        fm = GemRetrievalNet(architecture="vgg16")
        var = fm.init(jax.random.PRNGKey(0), nchw(x))
        state = seq_state(tm, prefix="features.")
        state["pool.p"] = np.array([p], np.float32)
        var = ti.convert_torch_state(var, state, key_map=ti.retrieval_key_map)
        out = fm.apply(var, nchw(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4)
        # cosine similarity — the BASELINE.json criterion (>0.999)
        cos = (np.asarray(out) * ref.numpy()).sum(1)
        assert (cos > 0.999).all()
