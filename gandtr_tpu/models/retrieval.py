"""GeM descriptor network (flax.linen, NHWC).

Functional re-design of cirtorch's ImageRetrievalNet
(/root/reference/mdir/external/cirtorch/networks/imageretrievalnet.py:90-123):
features → (local whiten) → pool → L2N → (whiten → L2N). The descriptor matrix
is returned as (N, D); use `.T` where the reference's D×N column layout is
required (losses, whitening).
"""

import jax.numpy as jnp
import flax.linen as nn

from gandtr_tpu.models.backbones import make_features
from gandtr_tpu.ops import pooling as pool_ops
from gandtr_tpu.ops.norm import l2n


class GemRetrievalNet(nn.Module):
    architecture: str = "vgg16"
    pooling: str = "gem"
    local_whitening: bool = False
    whitening: bool = False
    regional: bool = False
    gem_p_init: float = 3.0
    # extra kwargs for dict-configured pooling overrides (cirnet.py:61-63),
    # e.g. {"iterations": 3, "intermediate_gradients": False} for
    # GeometricMedianWeiszfeld
    pooling_params: dict = None

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (N, H, W, C) normalized images -> (N, D) L2-normalized descriptors.

        `mask` (N, H, W) marks valid pixels when inputs are padded to a bucket
        shape; it is downsampled to the feature stride for masked pooling.
        """
        features, dim = make_features(self.architecture, name="backbone")
        feat_mask = None
        if mask is not None:
            # exact per-layer mask propagation (ops/maskprop.py): valid
            # features equal the exact-shape forward, and feat_mask is the
            # floor-semantics downsampled valid rectangle
            o, feat_mask = features(x, mask=mask)
        else:
            o = features(x)

        if self.local_whitening:
            lw = nn.Dense(dim, name="lwhiten")
            N, H, W, C = o.shape
            o = lw(o.reshape(-1, C)).reshape(N, H, W, dim)

        if self.regional:
            # Rpool (cirtorch layers/pooling.py:76-113): per-region pooling +
            # learnable regional whitening + sum aggregation
            if feat_mask is not None:
                raise ValueError("mask is not supported with regional pooling")
            if self.pooling == "gem":
                p = self.param("gem_p", nn.initializers.constant(self.gem_p_init), (1,))
                rp = lambda f: pool_ops.gem(f, p=p[0])
            else:
                rp = pool_ops.POOLINGS[self.pooling]
            rwhiten = nn.Dense(dim, name="rwhiten")
            o = pool_ops.rpool(o, rp, whiten_fn=rwhiten)
        elif self.pooling == "gem":
            p = self.param("gem_p", nn.initializers.constant(self.gem_p_init), (1,))
            o = pool_ops.gem(o, p=p[0], mask=feat_mask)
        elif self.pooling == "gemmp":
            p = self.param("gem_p", nn.initializers.constant(self.gem_p_init), (dim,))
            o = pool_ops.gem(o, p=p, mask=feat_mask)
        elif self.pooling in ("mac", "spoc"):
            o = pool_ops.POOLINGS[self.pooling](o, mask=feat_mask)
        elif self.pooling == "GeometricMedianWeiszfeld":
            # dict-configured pooling override (reference cirnet.py:61-63 +
            # layers/pooling.py:44-68)
            if feat_mask is not None:
                raise ValueError(
                    "mask is not supported with pooling %r" % self.pooling)
            from gandtr_tpu.models.extra_layers import geometric_median_weiszfeld
            pp = dict(self.pooling_params or {})
            o = geometric_median_weiszfeld(
                o, iterations=int(pp.get("iterations", 3)),
                intermediate_gradients=bool(
                    pp.get("intermediate_gradients", False)))
            o = o.reshape(o.shape[0], -1)
        elif self.pooling == "HordeCascadedKOrder":
            # listed in the reference POOLINGS registry, but its forward
            # returns a LIST of high-order embeddings — the reference's own
            # CirRetrievalNet.forward cannot consume it as a pooling override
            # either; use models.extra_layers.HordeCascadedKOrder directly as
            # a training regularizer instead
            raise NotImplementedError(
                "HordeCascadedKOrder is a regularizer, not a pooling override")
        else:
            # never ignore a caller's mask silently: a padded-bucket input
            # would pool over pad pixels and produce a wrong descriptor
            if feat_mask is not None:
                raise ValueError(
                    "mask is not supported with pooling %r" % self.pooling)
            o = pool_ops.POOLINGS[self.pooling](o)

        o = l2n(o)

        if self.whitening:
            o = nn.Dense(dim, name="whiten")(o)
            o = l2n(o)

        return o

    @property
    def meta(self):  # noqa: D401
        _, dim = make_features(self.architecture)
        return {
            "architecture": self.architecture,
            "pooling": self.pooling,
            "local_whitening": self.local_whitening,
            "regional": False,
            "whitening": self.whitening,
            "in_channels": 3,
            "out_channels": dim,
            "mean": [0.485, 0.456, 0.406],
            "std": [0.229, 0.224, 0.225],
        }


class GemRetrievalNetPreprocessing(nn.Module):
    """cirnet with a learnable preprocessing layer before the backbone
    (CirRetrievalNetPreprocessing, /root/reference/mdir/components/model/
    network/cirnet.py:70-104). Currently: EdgeFilter edge-map preprocessing."""
    architecture: str = "vgg16"
    pooling: str = "gem"
    preprocessing: str = "edgefilter"
    preprocessing_params: dict = None
    # the reference wraps the FULLY-configured net (cirnet.py:96-104) —
    # whitening layers must survive the preprocessing wrapper
    local_whitening: bool = False
    whitening: bool = False
    regional: bool = False
    gem_p_init: float = 3.0

    @nn.compact
    def __call__(self, x, mask=None):
        from gandtr_tpu.models.extra_layers import EdgeFilter
        assert self.preprocessing == "edgefilter", self.preprocessing
        x = EdgeFilter(**(self.preprocessing_params or {}), name="preprocessing")(x)
        return GemRetrievalNet(self.architecture, self.pooling,
                               local_whitening=self.local_whitening,
                               whitening=self.whitening,
                               regional=self.regional,
                               gem_p_init=self.gem_p_init,
                               name="net")(x, mask=mask)


class GemRetrievalNetAttention(nn.Module):
    """cirnet with spatial attention before pooling (CirRetrievalNetAttention,
    cirnet.py:109-137): features are weighted by an L2-norm attention map."""
    architecture: str = "vgg16"
    pooling: str = "gem"
    attention: str = "l2norm"
    normalize_max: bool = True
    gem_p_init: float = 3.0

    @nn.compact
    def __call__(self, x, mask=None):
        from gandtr_tpu.models.extra_layers import ATTENTIONS
        from gandtr_tpu.models.backbones import make_features
        features, dim = make_features(self.architecture, name="backbone")
        feat_mask = None
        if mask is not None:
            o, feat_mask = features(x, mask=mask)
        else:
            o = features(x)
        att = ATTENTIONS[self.attention](o, normalize_max=self.normalize_max)
        o = o * att
        if self.pooling == "gem":
            p = self.param("gem_p", nn.initializers.constant(self.gem_p_init), (1,))
            o = pool_ops.gem(o, p=p[0], mask=feat_mask)
        elif self.pooling in ("mac", "spoc"):
            o = pool_ops.POOLINGS[self.pooling](o, mask=feat_mask)
        elif feat_mask is not None:
            raise ValueError(
                "mask is not supported with pooling %r" % self.pooling)
        else:
            o = pool_ops.POOLINGS[self.pooling](o)
        return l2n(o)
