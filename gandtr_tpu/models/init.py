"""Weight-initialization schemes mirroring the reference
(/root/reference/mdir/components/model/weight_initialization.py): normal /
uniform / he_normal / pix2pix-style (normal|kaiming + BN γ~N(1, gain)).

Applied as a post-init transformation over a flax params pytree (the functional
equivalent of torch's module.apply(init_fn)).
"""
import jax
import jax.numpy as jnp
import numpy as np


def _is_conv_or_dense_kernel(path, leaf):
    return path[-1].key == "kernel" and leaf.ndim in (2, 4)


def _fan_in(leaf):
    if leaf.ndim == 4:  # HWIO
        return leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
    return leaf.shape[0]


def init_weights_p2p(params, rng, init_type="normal", gain=0.02, batch_stats=None):
    """pix2pix init (weight_initialization.py:54-76): conv/linear kernels from
    N(0, gain) (or kaiming), biases 0; BatchNorm scale ~ N(1, gain), bias 0."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    new_leaves = []
    keys = jax.random.split(rng, len(leaves))
    for (path, leaf), key in zip(leaves, keys):
        name = path[-1].key
        parent = path[-2].key if len(path) > 1 else ""
        if name == "kernel" and leaf.ndim in (2, 4):
            if init_type == "normal":
                new = gain * jax.random.normal(key, leaf.shape, leaf.dtype)
            elif init_type == "kaiming":
                std = np.sqrt(2.0 / _fan_in(leaf))
                new = std * jax.random.normal(key, leaf.shape, leaf.dtype)
            elif init_type == "xavier":
                fan_out = leaf.shape[-1] * (leaf.shape[0] * leaf.shape[1] if leaf.ndim == 4 else 1)
                std = gain * np.sqrt(2.0 / (_fan_in(leaf) + fan_out))
                new = std * jax.random.normal(key, leaf.shape, leaf.dtype)
            else:
                raise NotImplementedError("init [%s] not implemented" % init_type)
        elif name == "scale":  # batch norm gamma ~ N(1, gain)
            new = 1.0 + gain * jax.random.normal(key, leaf.shape, leaf.dtype)
        elif name == "bias":
            new = jnp.zeros_like(leaf)
        else:
            new = leaf
        new_leaves.append(new)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [l for l in new_leaves])


def init_weights_simple(params, rng, scheme="normal"):
    """normal/uniform/he_normal (weight_initialization.py:6-46), exactly like
    the reference touches torch Conv/Linear modules:
    - normal: weight AND bias ~ N(0, 1) (std 1, unscaled);
    - uniform: weight AND bias ~ U(0, 1);
    - he_normal: weight ~ N(0, sqrt(2/fan_in)), bias = 0.01 const.
    Norm-layer scale/bias params are left untouched (their torch classnames
    match neither Conv nor Linear)."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    conv_dense = {tuple(str(e) for e in p[:-1]) for p, l in leaves
                  if getattr(p[-1], "key", None) == "kernel"
                  and l.ndim in (2, 4)}
    new_leaves = []
    keys = jax.random.split(rng, len(leaves))
    for (path, leaf), key in zip(leaves, keys):
        name = path[-1].key
        parent = tuple(str(e) for e in path[:-1])
        if name == "kernel" and leaf.ndim in (2, 4):
            if scheme == "normal":
                new = jax.random.normal(key, leaf.shape, leaf.dtype)
            elif scheme == "uniform":
                new = jax.random.uniform(key, leaf.shape, leaf.dtype)
            elif scheme == "he_normal":
                std = np.sqrt(2.0 / _fan_in(leaf))
                new = std * jax.random.normal(key, leaf.shape, leaf.dtype)
            else:
                raise NotImplementedError(scheme)
        elif name == "bias" and parent in conv_dense:
            if scheme == "normal":
                new = jax.random.normal(key, leaf.shape, leaf.dtype)
            elif scheme == "uniform":
                new = jax.random.uniform(key, leaf.shape, leaf.dtype)
            else:  # he_normal: "better than 0 if relu follows"
                new = jnp.full_like(leaf, 0.01)
        else:
            new = leaf
        new_leaves.append(new)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), new_leaves)


def initialize_weights(params, rng, weights="normal_p2p", seed=None, **kwargs):
    """Dispatcher mirroring weight_initialization.py:79-94. NOTE the
    reference's default init_gain for the *_p2p schemes is 0.2 (NOT the
    upstream pix2pix 0.02): its initialize_weights substitutes
    {"init_gain": 0.2} whenever the scenario's `initialize:` dict carries no
    init_gain — which the iccv23 configs never do."""
    if seed is not None:
        rng = jax.random.PRNGKey(seed)
    if weights.endswith("_p2p"):
        gain = float(kwargs.get("init_gain", kwargs.get("gain", 0.2)))
        return init_weights_p2p(params, rng, weights.rsplit("_", 1)[0], gain)
    if weights in ("normal", "uniform", "he_normal"):
        if kwargs:
            # the reference refuses parameters for the simple schemes
            # (weight_initialization.py:86 `assert not params`) — a config
            # carrying e.g. a gain here is an error, not a silent no-op
            raise TypeError("weight scheme %r takes no parameters, got %r"
                            % (weights, sorted(kwargs)))
        return init_weights_simple(params, rng, weights)
    raise NotImplementedError("weights scheme %s" % weights)
