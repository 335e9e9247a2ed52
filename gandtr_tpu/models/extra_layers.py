"""Extra model layers: high-order pooling regularizers, geometric-median
pooling, attention maps, edge-map preprocessing.

Re-implementations of /root/reference/mdir/components/model/layers/
{pooling,attention,preprocessing}.py in flax/NHWC.
"""
import jax
import jax.numpy as jnp
import flax.linen as nn


class HordeCascadedKOrder(nn.Module):
    """HORDE cascaded high-order pooling regularizer (layers/pooling.py:6-41):
    K-order feature products through 1×1 projections, average-pooled, embedded
    back to `dim`. Returns a list of (N, dim) high-order embeddings."""
    dim: int
    order: int
    high_order_dims: int

    @nn.compact
    def __call__(self, x):
        if self.order <= 1:
            return []
        projections = [nn.Conv(self.high_order_dims, (1, 1), use_bias=False,
                               name=f"proj_{i}")(x)
                       for i in range(self.order)]
        projected = [projections[0] * projections[1]]
        for p in projections[2:]:
            projected.append(projected[-1] * p)
        out = []
        for i, h in enumerate(projected):
            pooled = jnp.mean(h, axis=(1, 2))
            out.append(nn.Dense(self.dim, use_bias=False,
                                name=f"embed_{i}")(pooled))
        return out


def geometric_median_weiszfeld(x, iterations=3, intermediate_gradients=False):
    """Weiszfeld iterative geometric-median pooling (layers/pooling.py:44-68).

    x: (N, H, W, C) -> (N, 1, 1, C). Iterations run with detached features
    unless intermediate_gradients.
    """
    N, H, W, C = x.shape
    weights = jnp.ones((1, H, W, 1), x.dtype)
    eff = x if intermediate_gradients else jax.lax.stop_gradient(x)

    def body(_, w):
        median = jnp.sum(eff * w, axis=(1, 2), keepdims=True) / jnp.sum(w)
        w = 1.0 / jnp.sqrt(jnp.sum((eff - median) ** 2, axis=-1,
                                   keepdims=True) + 1e-10)
        return w

    for _ in range(iterations):
        weights = body(None, weights)
    return jnp.sum(x * weights, axis=(1, 2), keepdims=True) / jnp.sum(weights)


def weighted_geometric_median_weiszfeld(x, attention_map, iterations=3,
                                        intermediate_gradients=False):
    """Weighted variant (layers/pooling.py:71-95); attention_map: (N, H, W, 1)."""
    eff = x if intermediate_gradients else jax.lax.stop_gradient(x)
    weights = attention_map
    for _ in range(iterations):
        median = jnp.sum(eff * weights, axis=(1, 2), keepdims=True) / jnp.sum(weights)
        weights = attention_map / jnp.sqrt(
            jnp.sum((eff - median) ** 2, axis=-1, keepdims=True) + 1e-10)
    return jnp.sum(x * weights, axis=(1, 2), keepdims=True) / jnp.sum(weights)


def l2norm_attention(x, normalize_max=True):
    """Spatial L2-norm attention map (layers/attention.py:4-15).
    x: (N, H, W, C) -> (N, H, W, 1)."""
    m = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + 1e-10)
    if normalize_max:
        m = m / jnp.max(m, axis=(1, 2, 3), keepdims=True)
    return m


class EdgeFilter(nn.Module):
    """Learnable edge-map filter with clamped τ, p (layers/preprocessing.py:9-29):
    w·clamp(x,eps)^p / (exp(clamp(-β(x-τ), max=50)) + 1)."""
    w: float = 10.0
    p_init: float = 0.5
    beta: float = 500.0
    tau_init: float = 0.1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        p = self.param("p", nn.initializers.constant(self.p_init), (1,))
        tau = self.param("tau", nn.initializers.constant(self.tau_init), (1,))
        tau = jnp.clip(tau, 0.01, 0.9)  # functional analog of the in-place clamp
        num = self.w * jnp.clip(x, min=self.eps) ** p
        den = jnp.exp(jnp.clip(-self.beta * (x - tau), max=50.0)) + 1.0
        return num / den


ATTENTIONS = {"l2norm": l2norm_attention}
