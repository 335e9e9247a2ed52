"""Pretrained-artifact URL tables + loaders: the cirtorch `init_network`
bootstrap (external/cirtorch/networks/imageretrievalnet.py:19-67,237-275)
re-built on the flax GemRetrievalNet.

- FEATURES: caffe-converted ImageNet backbone weights (:19-24) — the starting
  point of every reference fine-tune.
- L_WHITENING / R_WHITENING / WHITENING: precomputed whitening parameter
  files for common architecture-pooling combos (:28-67).

Loaders accept an explicit local path/URL override so everything works from a
file cache in zero-egress environments (utils/io.fetch sha-validates and
caches downloads).
"""
import numpy as np

_CIR = "http://cmp.felk.cvut.cz/cnnimageretrieval/data"

FEATURES = {
    "vgg16": f"{_CIR}/networks/imagenet/imagenet-caffe-vgg16-features-d369c8e.pth",
    "resnet50": f"{_CIR}/networks/imagenet/imagenet-caffe-resnet50-features-ac468af.pth",
    "resnet101": f"{_CIR}/networks/imagenet/imagenet-caffe-resnet101-features-10a101d.pth",
    "resnet152": f"{_CIR}/networks/imagenet/imagenet-caffe-resnet152-features-1011020.pth",
}

_W = f"{_CIR}/whiten/retrieval-SfM-120k/retrieval-SfM-120k"

L_WHITENING = {
    "resnet101": f"{_W}-resnet101-lwhiten-9f830ef.pth",
}

R_WHITENING = {
    "alexnet-gem-r": f"{_W}-alexnet-gem-r-rwhiten-c8cf7e2.pth",
    "vgg16-gem-r": f"{_W}-vgg16-gem-r-rwhiten-19b204e.pth",
    "resnet101-mac-r": f"{_W}-resnet101-mac-r-rwhiten-7f1ed8c.pth",
    "resnet101-gem-r": f"{_W}-resnet101-gem-r-rwhiten-adace84.pth",
}

WHITENING = {
    "alexnet-gem": f"{_W}-alexnet-gem-whiten-454ad53.pth",
    "alexnet-gem-r": f"{_W}-alexnet-gem-r-whiten-4c9126b.pth",
    "vgg16-gem": f"{_W}-vgg16-gem-whiten-eaa6695.pth",
    "vgg16-gem-r": f"{_W}-vgg16-gem-r-whiten-83582df.pth",
    "resnet50-gem": f"{_W}-resnet50-gem-whiten-f15da7b.pth",
    "resnet101-mac-r": f"{_W}-resnet101-mac-r-whiten-9df41d3.pth",
    "resnet101-gem": f"{_W}-resnet101-gem-whiten-22ab0c1.pth",
    "resnet101-gem-r": f"{_W}-resnet101-gem-r-whiten-b379c0a.pth",
    "resnet101-gemmp": f"{_W}-resnet101-gemmp-whiten-770f53c.pth",
    "resnet152-gem": f"{_W}-resnet152-gem-whiten-abe7b93.pth",
    "densenet121-gem": f"{_W}-densenet121-gem-whiten-79e3eea.pth",
    "densenet169-gem": f"{_W}-densenet169-gem-whiten-6b2a76a.pth",
    "densenet201-gem": f"{_W}-densenet201-gem-whiten-22ea45c.pth",
}


def load_backbone_features(variables, architecture, path_or_url=None):
    """Fill the GemRetrievalNet backbone from a caffe FEATURES checkpoint
    (imageretrievalnet.py:237-246: a bare `features` Sequential state dict
    with '0.weight'-style keys). Returns new variables."""
    from gandtr_tpu.utils.io import load_torch_checkpoint
    from gandtr_tpu.utils import torch_import as ti
    src = path_or_url or FEATURES[architecture]
    state = load_torch_checkpoint(src)
    state = {k if k.startswith("features.") else "features." + k: v
             for k, v in state.items()}
    # a FEATURES checkpoint is backbone-only by design (no pool.p/whiten), so
    # full coverage is impossible — but the backbone dominates the leaf count,
    # so 0.9 still catches a key-map mismatch (0 matched) loudly
    return ti.convert_torch_state(variables, state,
                                  key_map=ti.retrieval_key_map, strict=False,
                                  min_coverage=0.9)


def load_whitening(key_or_path, table=WHITENING):
    """Load a precomputed whitening file -> {'m': (D,1), 'P': (D,D)}
    (imageretrievalnet.py:257-261 consumption)."""
    from gandtr_tpu.utils.io import load_torch_checkpoint, load_pickle
    src = table.get(key_or_path, key_or_path)
    try:
        w = load_torch_checkpoint(src)
    except Exception:
        w = load_pickle(src)
    return {"m": np.asarray(w["m"], np.float64).reshape(-1, 1),
            "P": np.asarray(w["P"], np.float64)}


def init_network(params=None, **kw):
    """`init_network` equivalent: build a GemRetrievalNet from an option dict
    (architecture/pooling/local_whitening/whitening/regional/pretrained,
    imageretrievalnet.py:90-141) and return (model, variables).

    With pretrained=True the backbone is filled from the caffe FEATURES
    table; pass `features_path` to use a local copy. Precomputed whitening is
    NOT folded into the net (the reference stores it in meta); fetch it with
    `load_whitening` and apply via ops.whiten.whitenapply.
    """
    import jax
    import jax.numpy as jnp
    from gandtr_tpu.models import initialize_model

    params = dict(params or {}, **kw)
    pretrained = params.pop("pretrained", False)
    features_path = params.pop("features_path", None)
    params.setdefault("architecture", "cirnet")
    arch = params.get("cir_architecture", "vgg16")
    model = initialize_model(params)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3), jnp.float32)))
    if pretrained:
        variables = load_backbone_features(variables, arch, features_path)
    return model, variables
