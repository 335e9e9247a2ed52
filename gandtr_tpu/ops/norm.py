"""Normalization ops.

Matches reference semantics of l2n / powerlaw
(/root/reference/mdir/external/cirtorch/layers/functional.py:131-139) and
torch InstanceNorm2d(affine=False) as used by the generators
(/root/reference/mdir/components/model/network/p2p_networks.py:23-35),
but in NHWC layout over the channel-last axis.
"""
import jax.numpy as jnp


def l2n(x, eps=1e-6, axis=-1):
    """x / (||x||_2 + eps) along `axis` (channel-last by default)."""
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def powerlaw(x, eps=1e-6):
    x = x + eps
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


def instance_norm(x, eps=1e-5, gamma=None, beta=None):
    """Per-sample, per-channel spatial normalization. x: (N, H, W, C).

    Equivalent to torch InstanceNorm2d (biased variance, eps inside sqrt).
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps)
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def batch_norm_inference(x, mean, var, gamma, beta, eps=1e-5):
    """Frozen-eval batch norm (reference trains BN in eval mode for cirnets,
    cirnet.py:36-45). x: (..., C); stats are (C,)."""
    return (x - mean) / jnp.sqrt(var + eps) * gamma + beta
