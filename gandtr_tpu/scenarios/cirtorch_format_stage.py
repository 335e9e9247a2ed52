"""Legacy cirtorch-format checkpoint stages.

Counterpart of /root/reference/mdir/stages/cirtorch_format/test.py: work with
checkpoints in the ORIGINAL cirtorch layout (`state['state_dict']` +
`state['meta']`) — embed images, learn whitening from them, and convert
between our checkpoint format and the cirtorch one.
"""
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.models import initialize_model
from gandtr_tpu.utils import torch_import as ti
from gandtr_tpu.utils.io import resolve_path, load_torch_checkpoint
from gandtr_tpu.ops import whiten as whiten_ops


def load_cirtorch_network(path):
    """Build a GemRetrievalNet from an original-cirtorch checkpoint
    (test.py:17-60): {'state_dict', 'meta': {architecture, pooling, ...}}."""
    state = load_torch_checkpoint(resolve_path(path))
    meta = state.get("meta", {})
    arch = meta.get("architecture", "vgg16")
    pooling = meta.get("pooling", "gem")
    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": arch, "pooling": pooling,
        "local_whitening": bool(meta.get("local_whitening", False)),
        "whitening": bool(meta.get("whitening", False))})
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), x0))
    variables = ti.convert_torch_state(variables, state["state_dict"],
                                       key_map=ti.retrieval_key_map,
                                       strict=False)
    return model, variables, meta


def embed(params, data):
    """Embed a list of images with a cirtorch-format network (test.py:17-85)."""
    params = dict(params)
    net_path = params.pop("network_path")
    image_size = int(params.pop("image_size", 1024))
    image_dir = resolve_path(params.pop("image_dir", ""))
    output = params.pop("output", None)

    model, variables, meta = load_cirtorch_network(net_path)

    from gandtr_tpu.eval.retrieval import ShapeCachedExtractor, extract_vectors
    from gandtr_tpu.data.transforms import initialize_transforms
    from gandtr_tpu.data.datasets import path_join

    transform = initialize_transforms(
        params.pop("transforms", "pil2np | totensor | normalize"),
        params.pop("mean_std", [meta.get("mean", [0.485, 0.456, 0.406]),
                                meta.get("std", [0.229, 0.224, 0.225])]))
    extractor = ShapeCachedExtractor(lambda v, x: model.apply(v, x), variables)
    names = list(data[0]) if data else []
    paths = [path_join(image_dir, n) for n in names]
    vecs = extract_vectors(extractor, paths, image_size, transform)
    if output:
        output = resolve_path(output)
        os.makedirs(os.path.dirname(output), exist_ok=True)
        with open(output, "wb") as f:
            pickle.dump({"names": names, "vecs": vecs}, f)
    return ({"count": len(names), "vecs": vecs},)


def learn_whitening(params, data):
    """Learn Lw whitening from embedded q/p pairs (test.py:88-150)."""
    params = dict(params)
    output = params.pop("output", None)
    vecs = np.asarray(data[0])
    qidxs, pidxs = params.pop("qidxs"), params.pop("pidxs")
    m, P = whiten_ops.whitenlearn_with_retry(vecs, qidxs, pidxs)
    whit = {"m": m, "P": P}
    if output:
        output = resolve_path(output)
        os.makedirs(os.path.dirname(output), exist_ok=True)
        with open(output, "wb") as f:
            pickle.dump(whit, f)
    return ({"whitening": output or whit},)


def convert_contained_net(params, data):
    """Convert one of our multi-net checkpoints into the cirtorch single-net
    format (test.py:153-245): extract the named subnet's variables and store a
    torch-layout state_dict pickle with cirtorch meta."""
    params = dict(params)
    in_path = resolve_path(params.pop("input_path"))
    out_path = resolve_path(params.pop("output_path"))
    net_name = params.pop("network", "embed")
    meta = dict(params.pop("meta", {}))

    import flax.serialization
    with open(in_path, "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())

    state_dict = {}

    def emit(path, leaf):
        try:
            key = ti.retrieval_key_map(path)
        except KeyError:
            return
        if key is None:
            return
        v = np.asarray(leaf)
        if v.ndim == 4:  # HWIO -> OIHW
            v = v.transpose(3, 2, 0, 1)
        elif v.ndim == 2 and path[-1] == "kernel":
            v = v.transpose(1, 0)
        state_dict[key] = v

    def walk(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                emit(prefix + (k,), v)

    # multi-net container checkpoints nest per subnet ({name: {params: ...}});
    # select the named subnet before walking (reference test.py:153-245
    # extracts the embedding net from an mdir container)
    if "params" not in variables and "batch_stats" not in variables:
        if net_name not in variables:
            raise KeyError(
                "checkpoint has no top-level params and no subnet %r "
                "(has: %s)" % (net_name, sorted(variables)))
        variables = variables[net_name]

    for collection in ("params", "batch_stats"):
        if collection in variables:
            walk(variables[collection])
    if not state_dict:
        raise ValueError("convert_contained_net produced an empty state_dict "
                         "for network %r — key map matched nothing" % net_name)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump({"state_dict": state_dict, "meta": meta}, f)
    return ({"output_path": out_path, "keys": len(state_dict)},)
