"""Public model API — the counterpart of the reference torch.hub entrypoints
(/root/reference/hubconf.py, /root/reference/mdir/hub/model.py): `cyclegan`,
`hedngan`, `gem_vgg16_cyclegan`, `gem_vgg16_hedngan`, `gem_resnet101_cyclegan`,
`gem_resnet101_hedngan` — each `(pretrained=True) -> HubModel` with an attached
`.transform` preprocessing pipeline built from the checkpoint's data params.

Pretrained weights load from the reference's published checkpoint URLs
(torch .pth, converted on host via gandtr_tpu.utils.torch_import); the learned
whitening pkl loads into the eval-time CirtorchWhiten wrapper, and eval runs
multiscale by default — matching embedding.yml's pretrained runtime
(/root/reference/mdir/hub/embedding.yml:18-25).
"""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.data.transforms import initialize_transforms
from gandtr_tpu.learning.network import WrappedNet
from gandtr_tpu.learning.wrappers import (
    CirMultiscaleAggregation, CirtorchWhiten, initialize_wrappers)
from gandtr_tpu.models import initialize_model
from gandtr_tpu.models.init import initialize_weights
from gandtr_tpu.utils import torch_import as ti
from gandtr_tpu.utils.io import load_torch_checkpoint, load_pickle
from gandtr_tpu.utils.compile_cache import enable_from_env as _cc_env

_cc_env()  # persistent XLA compile cache, opt-in via GANDTR_TPU_COMPILE_CACHE

BASE_URL = "http://ptak.felk.cvut.cz/personal/jenicto2/download/iccv23_gan/"

EMBEDDING_DATA = {
    "transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
    "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
}
GENERATOR_DATA = {
    "transforms": "pil2np | totensor | normalize",
    "mean_std": [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]],
}


class HubModel:
    """A jit-compiled model + preprocessing transform.

    `model(model.transform(img)[None])` -> descriptors (N, D) for embedding
    nets / images (N, H, W, C) for generators. `forward_cols` returns the
    reference's D×N column layout.
    """

    def __init__(self, net: WrappedNet, variables, transform, meta=None):
        self.net = net
        self.variables = variables
        self.transform = transform
        self.meta = meta or {}
        self._jit_cache = {}

    def __call__(self, images, **kwargs):
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        key = (images.shape, tuple(sorted(kwargs)))
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda v, x: self.net.apply(v, x, train=False,
                                            ctx={"msp": self.meta.get("msp", 1.0)},
                                            **kwargs))
        return self._jit_cache[key](self.variables, images)

    def forward_cols(self, images, **kwargs):
        return self(images, **kwargs).T


def _checkpoint_net_state(state):
    """Validate + unwrap a loaded network checkpoint. Real reference FILES
    store the FLAT {"type", "frozen", "network_params", "model_state"} dict
    (Checkpoints.load_network adds the "net" wrapper at load time,
    checkpoints.py:209-220); utils/io.normalize_network_checkpoint handles
    flat, wrapped, and plain-state-dict layouts."""
    from gandtr_tpu.utils.io import normalize_network_checkpoint
    net = normalize_network_checkpoint(state)["net"]
    missing = {"model_state"} - set(net)
    if missing:
        raise KeyError(f"Checkpoint 'net' entry missing {missing}; "
                       f"has {sorted(net)}")
    return net


def _checkpoint_data_params(net_state, default):
    """Pull the runtime data params (transform DSL + mean_std) out of the
    checkpoint, mirroring the reference's use of the checkpoint's own data
    config for `.transform` (hub/model.py:38-42, incl. the
    transforms->augmentations rename)."""
    runtime = (net_state.get("network_params") or {}).get("runtime") or {}
    data = runtime.get("data") or {}
    out = dict(default)
    tf = data.get("transforms", data.get("augmentations"))
    if tf:
        out["transforms"] = tf
    if data.get("mean_std"):
        out["mean_std"] = data["mean_std"]
    return out


def _embedding(architecture, checkpoint=None, whitening=None, pretrained=True,
               multiscale=True):
    module = initialize_model({
        "architecture": "cirnet", "cir_architecture": architecture,
        "pooling": "gem", "local_whitening": False, "whitening": False})
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(module.init(jax.random.PRNGKey(0), x0))

    eval_wrappers = []
    data_params = dict(EMBEDDING_DATA)
    if pretrained:
        state = load_torch_checkpoint(checkpoint)
        net_state = _checkpoint_net_state(state)
        # every flax leaf must be filled from the checkpoint — a silent
        # partial import would produce random-weight descriptors
        # (reference loads strictly via load_state_dict, network.py:178)
        variables = ti.convert_torch_state(variables, net_state["model_state"],
                                           key_map=ti.retrieval_key_map,
                                           strict=False, min_coverage=1.0)
        data_params = _checkpoint_data_params(net_state, data_params)
        if whitening:
            lw = load_pickle(whitening)
            eval_wrappers.append(CirtorchWhiten(P=lw["P"], m=lw["m"]))
    if multiscale:
        eval_wrappers.append(CirMultiscaleAggregation(scales=True))

    net = WrappedNet(module=module, wrappers_train=[],
                     wrappers_eval=eval_wrappers,
                     meta=module.meta, data_params=dict(data_params))
    transform = initialize_transforms(data_params["transforms"],
                                      data_params["mean_std"])
    # GeM-p power mean applies when the MODEL's pooling is gem without
    # model-internal whitening/regional (wrapper.py:245-248 checks
    # outputmodel.meta — the eval-time whitening *wrapper* doesn't disable it)
    msp = 1.0
    if multiscale:
        msp = float(np.asarray(variables["params"]["gem_p"])[0])
    return HubModel(net, variables, transform,
                    meta={**module.meta, "msp": msp})


def _generator(norm_layer="instance", checkpoint=None, pretrained=True,
               init_weights="normal_p2p", seed=0):
    module = initialize_model({
        "architecture": "official_resnet_generator",
        "no_antialias": True, "no_antialias_up": True,
        "input_nc": 3, "output_nc": 3, "n_blocks": 9,
        "norm_layer": norm_layer})
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(module.init(jax.random.PRNGKey(seed), x0, train=False))
    if pretrained:
        state = load_torch_checkpoint(checkpoint)
        net_state = _checkpoint_net_state(state)
        variables = ti.convert_torch_state(variables, net_state["model_state"],
                                           strict=False, min_coverage=1.0)
    else:
        variables["params"] = initialize_weights(
            variables["params"], jax.random.PRNGKey(seed), weights=init_weights)
    net = WrappedNet(module=module, meta=getattr(module, "meta", {}),
                     data_params=dict(GENERATOR_DATA))
    transform = initialize_transforms(GENERATOR_DATA["transforms"],
                                      GENERATOR_DATA["mean_std"])
    return HubModel(net, variables, transform, meta={"in_channels": 3,
                                                     "out_channels": 3})


def gem_vgg16_cyclegan(pretrained=True):
    """GeM VGG16 descriptor net fine-tuned with CycleGAN augmentation + CLAHE."""
    return _embedding("vgg16", f"{BASE_URL}cyclegan_embed_vgg16.pth",
                      f"{BASE_URL}cyclegan_embed_vgg16_lw.pkl", pretrained)


def gem_vgg16_hedngan(pretrained=True):
    """GeM VGG16 descriptor net fine-tuned with HED^N-GAN augmentation + CLAHE."""
    return _embedding("vgg16", f"{BASE_URL}hedngan_embed_vgg16.pth",
                      f"{BASE_URL}hedngan_embed_vgg16_lw.pkl", pretrained)


def gem_resnet101_cyclegan(pretrained=True):
    """GeM ResNet-101 descriptor net fine-tuned with CycleGAN augmentation."""
    return _embedding("resnet101", f"{BASE_URL}cyclegan_embed_resnet101.pth",
                      f"{BASE_URL}cyclegan_embed_resnet101_lw.pkl", pretrained)


def gem_resnet101_hedngan(pretrained=True):
    """GeM ResNet-101 descriptor net fine-tuned with HED^N-GAN augmentation."""
    return _embedding("resnet101", f"{BASE_URL}hedngan_embed_resnet101.pth",
                      f"{BASE_URL}hedngan_embed_resnet101_lw.pkl", pretrained)


def cyclegan(pretrained=True):
    """ResNet CycleGAN day→night generator."""
    return _generator("instance", f"{BASE_URL}cyclegan_generator_X.pth",
                      pretrained)


def hedngan(pretrained=True):
    """ResNet HED^N-GAN day→night generator."""
    return _generator("instance" if pretrained else "batch",
                      f"{BASE_URL}hedngan_generator_X.pth", pretrained,
                      init_weights="kaiming_p2p")
