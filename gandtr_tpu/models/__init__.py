"""Model registry — string-keyed constructors mirroring the reference's
MODEL_LABELS (/root/reference/mdir/components/model/network/__init__.py:6-48).
"""
import flax.linen as nn

from gandtr_tpu.models.generators import (
    ResnetGenerator, ResnetEncoder, ResnetDecoder, UnetGenerator)
from gandtr_tpu.models import unet as unet_mod
from gandtr_tpu.models.rcf import RCF
from gandtr_tpu.models.discriminators import NLayerDiscriminator, PatchDiscriminator
from gandtr_tpu.models.patchsample import PatchSampleF
from gandtr_tpu.models.hed import HedInterpolation
from gandtr_tpu.models.retrieval import (
    GemRetrievalNet, GemRetrievalNetPreprocessing, GemRetrievalNetAttention)


class Identity(nn.Module):
    meta = {"in_channels": 3, "out_channels": 3}

    def __call__(self, x):
        return x


def _resnet_generator(**kw):
    # reference default is BATCH norm (p2p_networks.py:245); every iccv23
    # config sets norm_layer: instance explicitly
    kw.setdefault("norm_type", kw.pop("norm_layer", "batch"))
    kw.pop("track_running_stats", None)
    return ResnetGenerator(**kw)


def _unet_generator(**kw):
    kw.setdefault("norm_type", kw.pop("norm_layer", "batch"))
    return UnetGenerator(**kw)


def _discriminator(**kw):
    kw.setdefault("norm_type", kw.pop("norm_layer", "batch"))
    kw.pop("track_running_stats", None)
    return NLayerDiscriminator(**kw)


def _patch_discriminator(**kw):
    kw.setdefault("norm_type", kw.pop("norm_layer", "batch"))
    return PatchDiscriminator(**kw)


def _mlp(**kw):
    kw.pop("init_type", None), kw.pop("init_gain", None)
    kw.pop("input_nc", None), kw.pop("nce_layers", None)
    return PatchSampleF(**kw)


def _cirnet(**kw):
    arch = kw.pop("cir_architecture", None) or kw.pop("architecture", "vgg16")
    pooling = kw.pop("pooling", "gem")
    pooling_params = None
    if isinstance(pooling, dict):
        # dict-configured pooling override, e.g.
        # {type: GeometricMedianWeiszfeld, iterations: 3, ...} (cirnet.py:61-63)
        pooling = dict(pooling)
        pooling_params = pooling
        pooling = pooling_params.pop("type")
    return GemRetrievalNet(
        architecture=arch,
        pooling=pooling,
        pooling_params=pooling_params,
        local_whitening=bool(kw.pop("local_whitening", False)),
        whitening=bool(kw.pop("whitening", False)),
        regional=bool(kw.pop("regional", False)),
    )


def _cirnet_inchan(inputs=None, **kw):
    """cirnet with input-channel handling + preprocessing (cirnet.py:85-105);
    grayscale collapse is a weight-import concern in the functional design."""
    inputs = inputs or {}
    pre = inputs.get("preprocessing")
    if pre:
        pre = dict(pre)
        return GemRetrievalNetPreprocessing(
            architecture=kw.pop("cir_architecture", "vgg16"),
            pooling=kw.pop("pooling", "gem"),
            preprocessing=pre.pop("type", "edgefilter"),
            preprocessing_params=pre,
            # whitening config survives the wrapper (cirnet.py:96-104)
            local_whitening=bool(kw.pop("local_whitening", False)),
            whitening=bool(kw.pop("whitening", False)),
            regional=bool(kw.pop("regional", False)))
    return _cirnet(**kw)


def _cirnet_attention(attention=None, **kw):
    att = dict(attention or {"type": "l2norm"})
    return GemRetrievalNetAttention(
        architecture=kw.pop("cir_architecture", "vgg16"),
        pooling=kw.pop("pooling", "gem"),
        attention=att.pop("type", "l2norm"),
        normalize_max=bool(att.pop("normalize_max", True)))


class NormalizationL2(nn.Module):
    """L2N single layer (single_layer.py:7-13)."""
    meta = {"in_channels": 3, "out_channels": 3}

    def __call__(self, x):
        from gandtr_tpu.ops.norm import l2n
        return l2n(x)


MODEL_LABELS = {
    "identity": Identity,
    "orig_unet": lambda **kw: unet_mod.OrigUNet(**kw),
    "p2p_unet": lambda **kw: unet_mod.P2pUNet(**kw),
    "outconv_unet": lambda **kw: unet_mod.OutconvP2pUNet(**kw),
    "outconv_dynint_unet": lambda **kw: unet_mod.OutconvP2pUNetDynamicInterpolate(**kw),
    "shallow_p2p_unet": lambda **kw: unet_mod.ShallowP2pUNet(**kw),
    "inconv_p2p_unet": lambda **kw: unet_mod.InconvP2pUNet(**kw),
    "aligned_p2p_unet": lambda **kw: unet_mod.AlignedP2pUNet(**kw),
    "official_p2p_unet_generator": _unet_generator,
    "cirnet_inchan": _cirnet_inchan,
    "cirnet_attention": _cirnet_attention,
    "normalization_l2": lambda **kw: NormalizationL2(),
    "rcf": lambda **kw: RCF(),
    "official_resnet_generator": _resnet_generator,
    "official_resnet_encoder": lambda **kw: ResnetEncoder(**kw),
    "official_resnet_decoder": lambda **kw: ResnetDecoder(**kw),
    "official_unet_generator": _unet_generator,
    "official_p2p_discriminator": _discriminator,
    "official_patch_discriminator": _patch_discriminator,
    "official_p2p_mlp": _mlp,
    "hed_interpolation": lambda **kw: HedInterpolation(width_mult=float(kw.get("width_mult", 1.0))),
    "cirnet": _cirnet,
    "gem_retrieval": lambda **kw: GemRetrievalNet(**kw),
}


def initialize_model(params):
    """Build a model from a config dict with an `architecture` key (consumes it,
    reference-style destructive pop)."""
    params = dict(params)
    architecture = params.pop("architecture")
    return MODEL_LABELS[architecture](**params)
