"""Global pooling ops for descriptor networks.

TPU-native re-design of the reference pooling functional
(/root/reference/mdir/external/cirtorch/layers/functional.py:12-75): NHWC layout,
pure functions over static shapes so XLA fuses the elementwise power/clamp chain
into the reduction. `p` may be a scalar (GeM) or per-channel vector (GeMmp).
"""
import math

import numpy as np
import jax
import jax.numpy as jnp


def mac(x, mask=None):
    """Max pooling over spatial dims. x: (N, H, W, C) -> (N, C).

    `mask` (N, H, W) marks valid positions when images are padded to a static
    bucket shape (TPU static-shape strategy, SURVEY.md §5.7)."""
    if mask is not None:
        x = jnp.where(mask[..., None] > 0, x, -jnp.inf)
    return jnp.max(x, axis=(1, 2))


def spoc(x, mask=None):
    """Average (sum) pooling over spatial dims. x: (N, H, W, C) -> (N, C)."""
    if mask is not None:
        m = mask[..., None]
        return jnp.sum(x * m, axis=(1, 2)) / jnp.sum(m, axis=(1, 2))
    return jnp.mean(x, axis=(1, 2))


def gem(x, p=3.0, eps=1e-6, mask=None):
    """Generalized-mean pooling: mean(clamp(x, eps)^p)^(1/p) over H, W.

    Matches reference `gem` (functional.py:21-23). x: (N, H, W, C) -> (N, C).
    p broadcasts: scalar or (C,) for the per-channel GeMmp variant. With
    `mask` (N, H, W), the mean runs over valid positions only (padded-bucket
    extraction mode)."""
    p = jnp.asarray(p, dtype=x.dtype)
    x = jnp.clip(x, min=eps)
    if mask is not None:
        m = mask[..., None]
        pooled = jnp.sum((x ** p) * m, axis=(1, 2)) / jnp.sum(m, axis=(1, 2))
        return pooled ** (1.0 / p)
    return jnp.mean(x ** p, axis=(1, 2)) ** (1.0 / p)


def _rmac_regions(W, H, L=3):
    """Static R-MAC region grid (y, x, size) matching functional.py:26-75.

    Region geometry depends only on the (static) spatial shape, so it is
    computed in Python at trace time — XLA sees a fixed set of slices.
    """
    # The reference does this arithmetic in torch FLOAT32 tensors
    # (functional.py:28,37 — `steps` is a torch.Tensor); the region-count
    # argmin has exact ties (e.g. H=18, W=10: |0.6-0.1b| at b=8 vs b=4) that
    # f32 and f64 break differently, changing the region COUNT. Mirror the
    # f32 arithmetic bit-for-bit (found by differential fuzz,
    # tests/test_cirtorch_pooling_differential.py).
    f32 = np.float32
    ovr = f32(0.4)
    steps = np.arange(2, 8, dtype=np.float32)
    w = min(W, H)
    b = f32(max(H, W) - w) / (steps - f32(1))
    val = np.abs((f32(w * w) - f32(w) * b) / f32(w * w) - ovr)
    idx = int(np.argmin(val))  # first minimum, like torch.min
    Wd = idx + 1 if H < W else 0
    Hd = idx + 1 if H > W else 0

    regions = []
    for l in range(1, L + 1):
        wl = math.floor(2 * w / (l + 1))
        wl2 = math.floor(wl / 2 - 1)
        if wl == 0:
            continue
        # centers: torch multiplies an f32 iota by the python-float step
        # (cast to f32), adds wl2 in f32, floors in f32 (functional.py:58,63)
        bW = 0.0 if l + Wd == 1 else (W - wl) / (l + Wd - 1)
        cenW = np.floor(f32(wl2) + np.arange(l - 1 + Wd + 1, dtype=np.float32)
                        * f32(bW)).astype(np.int64) - wl2
        bH = 0.0 if l + Hd == 1 else (H - wl) / (l + Hd - 1)
        cenH = np.floor(f32(wl2) + np.arange(l - 1 + Hd + 1, dtype=np.float32)
                        * f32(bH)).astype(np.int64) - wl2
        for i_ in cenH:
            for j_ in cenW:
                regions.append((int(i_), int(j_), wl))
    return regions


def rmac(x, L=3, eps=1e-6):
    """Regional MAC: sum of L2-normalized per-region max-pools (functional.py:26-75).

    x: (N, H, W, C) -> (N, C). Region set is static given the input shape.
    """
    N, H, W, C = x.shape
    v = mac(x)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)
    for (i, j, wl) in _rmac_regions(W, H, L):
        r = jax.lax.dynamic_slice(x, (0, i, j, 0), (N, wl, wl, C))
        vt = mac(r)
        vt = vt / (jnp.linalg.norm(vt, axis=-1, keepdims=True) + eps)
        v = v + vt
    return v


def roipool(x, rpool_fn, L=3):
    """Per-region pooled vectors (functional.py:78-126): global + R-MAC grid
    regions, each pooled by `rpool_fn`. x: (N, H, W, C) -> (N, R, C)."""
    N, H, W, C = x.shape
    vecs = [rpool_fn(x)]
    for (i, j, wl) in _rmac_regions(W, H, L):
        r = jax.lax.dynamic_slice(x, (0, i, j, 0), (N, wl, wl, C))
        vecs.append(rpool_fn(r))
    return jnp.stack(vecs, axis=1)


def rpool(x, rpool_fn, whiten_fn=None, L=3, eps=1e-6):
    """Regional pooling with optional per-region whitening + sum aggregation
    (cirtorch Rpool, layers/pooling.py:76-113). x: (N, H, W, C) -> (N, C)."""
    o = roipool(x, rpool_fn, L)  # (N, R, C)
    o = o / (jnp.linalg.norm(o, axis=-1, keepdims=True) + eps)
    if whiten_fn is not None:
        o = whiten_fn(o)
        o = o / (jnp.linalg.norm(o, axis=-1, keepdims=True) + eps)
    agg = jnp.sum(o, axis=1)
    return agg / (jnp.linalg.norm(agg, axis=-1, keepdims=True) + eps)


POOLINGS = {
    "mac": mac,
    "spoc": spoc,
    "gem": gem,
    "rmac": rmac,
}
