"""Exact valid-region mask propagation for padded-bucket forwards.

TPU static-shape strategy (SURVEY.md §5.7): variable-resolution images are
zero-padded into a static bucket so one XLA graph serves every shape. The
reference computes each image at its EXACT shape
(/root/reference/mdir/external/cirtorch/datasets/genericdataset.py:66-102,
imageretrievalnet.py:312-339); this module makes the padded forward produce
bit-compatible features on the valid region, so bucketing is a pure compile
-count optimization, not an approximation.

The invariant: every image occupies the top-left (h, w) rectangle of the
buffer and the band outside it is ZERO at the input of every spatial op.
Then a conv with zero `SAME`-style padding sees, at the valid border, exactly
the zeros the exact-shape compute's own implicit padding provides — so valid
-region outputs match the exact forward to float-assoc noise. Ops that break
the invariant (bias add, BatchNorm shift, InstanceNorm, reflect padding,
plain max-pool windows that straddle the border) are given masked variants
here.

Masks are per-image top-left rectangles, represented by their traced sizes
``hw = (h, w)`` with shape (N,) int32 each — materialized into (N, H, W)
{0,1} arrays only where a spatial multiply is needed. Size arithmetic follows
torch's floor convention ``out = (in + 2p - k) // s + 1``.
"""
import jax
import jax.numpy as jnp


def sizes_from_mask(mask):
    """(N, H, W) {0,1} top-left rectangle mask -> traced (h, w), each (N,) int32.

    Row 0 / column 0 of a non-empty top-left rectangle always intersect it,
    so the first column counts h and the first row counts w."""
    h = jnp.sum((mask[:, :, 0] > 0).astype(jnp.int32), axis=1)
    w = jnp.sum((mask[:, 0, :] > 0).astype(jnp.int32), axis=1)
    return h, w


def mask_from_sizes(hw, H, W, dtype=jnp.float32):
    """Materialize (N, H, W) {0,1} mask from traced sizes hw=(h, w)."""
    h, w = hw
    rows = jnp.arange(H, dtype=jnp.int32)[None, :] < h[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :] < w[:, None]
    return (rows[:, :, None] & cols[:, None, :]).astype(dtype)


def conv_out_sizes(hw, kernel, stride, padding, dilation=1):
    """Valid-region sizes after a conv/pool with torch floor semantics."""
    h, w = hw
    keff = dilation * (kernel - 1) + 1
    h2 = (h + 2 * padding - keff) // stride + 1
    w2 = (w + 2 * padding - keff) // stride + 1
    return jnp.maximum(h2, 0), jnp.maximum(w2, 0)


def upsample_sizes(hw, factor=2):
    """Valid-region sizes after 2x upsampling (transpose conv k3 s2 p1 op1,
    or nearest/blur upsample): out = in * factor."""
    h, w = hw
    return h * factor, w * factor


class MaskState:
    """Tracks the valid rectangle through a network forward.

    Holds traced sizes plus a cached materialized mask per static spatial
    shape, so repeated re-zeroing at one resolution reuses one mask array.
    ``None``-safe: construct via ``MaskState.maybe(mask)`` and every method
    is a no-op when inactive, so model code stays branch-free.
    """

    def __init__(self, hw=None):
        self.hw = hw
        self._cache = {}

    @classmethod
    def maybe(cls, mask):
        """From an (N, H, W) mask array or None."""
        if mask is None:
            return cls(None)
        return cls(sizes_from_mask(mask))

    @property
    def active(self):
        return self.hw is not None

    def mask(self, H, W, dtype=jnp.float32):
        """Materialized (N, H, W) mask at a static resolution (cached)."""
        key = (H, W, jnp.dtype(dtype).name)
        if key not in self._cache:
            self._cache[key] = mask_from_sizes(self.hw, H, W, dtype)
        return self._cache[key]

    def apply(self, x):
        """Re-zero the invalid band of an (N, H, W, C) tensor."""
        if not self.active:
            return x
        return x * self.mask(x.shape[1], x.shape[2], x.dtype)[..., None]

    def downsample(self, kernel, stride, padding, dilation=1):
        """New MaskState after a conv/pool window (torch floor semantics)."""
        if not self.active:
            return self
        return MaskState(conv_out_sizes(self.hw, kernel, stride, padding,
                                        dilation))

    def upsample(self, factor=2):
        if not self.active:
            return self
        return MaskState(upsample_sizes(self.hw, factor))


def masked_max_pool(x, state, window, strides, padding=0):
    """Max pool that matches exact-shape torch semantics on the valid region.

    Invalid positions are -inf during the reduction (torch pads max-pool
    windows with -inf), and outputs are re-zeroed on the new invalid band.
    Returns (pooled, new_state)."""
    if isinstance(window, int):
        window = (window, window)
    if isinstance(strides, int):
        strides = (strides, strides)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if state is None or not state.active:
        import flax.linen as fnn
        return fnn.max_pool(x, window, strides=strides, padding=padding), state
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    m = state.mask(x.shape[1], x.shape[2], jnp.float32)[..., None] > 0
    xm = jnp.where(m, x, neg)
    import flax.linen as fnn
    out = fnn.max_pool(xm, window, strides=strides, padding=padding)
    new_state = state.downsample(window[0], strides[0], padding[0][0])
    zero = jnp.zeros((), out.dtype)
    om = new_state.mask(out.shape[1], out.shape[2], jnp.float32)[..., None] > 0
    return jnp.where(om, out, zero), new_state


def masked_reflect_pad(x, state, pad):
    """Reflect-pad at the VALID boundary of each image, not the buffer edge.

    Exact-shape compute reflects row h-2 into row h; a zero band cannot
    reproduce that, so rows/cols are gathered with per-image reflected
    indices: i -> -i for i < 0, 2h-2-i for i >= h (clamped — deep-band
    garbage is fine, it lands outside the new valid rectangle and callers
    re-zero after the following conv). Falls back to plain reflect padding
    when the state is inactive. Returns (padded, padded_state) where the new
    valid rectangle is (h + 2*pad, w + 2*pad) anchored at the new origin.
    """
    if state is None or not state.active:
        from gandtr_tpu.models.layers import pad2d
        return pad2d(x, pad, mode="reflect"), state
    N, H, W, C = x.shape
    h, w = state.hw

    def reflect_idx(n_out, size):
        # output coordinate j in [-pad, H+pad) relative to the old origin
        j = jnp.arange(n_out, dtype=jnp.int32)[None, :] - pad
        s = size[:, None]
        j = jnp.where(j < 0, -j, j)
        j = jnp.where(j >= s, 2 * s - 2 - j, j)
        return jnp.clip(j, 0, n_out - 2 * pad - 1 if n_out - 2 * pad > 0 else 0)

    ih = reflect_idx(H + 2 * pad, h)          # (N, H+2p)
    iw = reflect_idx(W + 2 * pad, w)          # (N, W+2p)
    out = jnp.take_along_axis(x, ih[:, :, None, None], axis=1)
    out = jnp.take_along_axis(out, iw[:, None, :, None], axis=2)
    new_state = MaskState((h + 2 * pad, w + 2 * pad))
    return out, new_state


def masked_instance_norm(x, state, eps=1e-5):
    """InstanceNorm (affine=False) over the valid region only.

    Exact-shape IN averages over h*w pixels; the padded buffer must do the
    same or the statistics are globally contaminated. x: (N, H, W, C)."""
    if state is None or not state.active:
        from gandtr_tpu.ops.norm import instance_norm
        return instance_norm(x, eps=eps)
    m = state.mask(x.shape[1], x.shape[2], x.dtype)[..., None]
    cnt = jnp.sum(m, axis=(1, 2), keepdims=True)
    mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / cnt
    var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2), keepdims=True) / cnt
    return (x - mean) * m * jax.lax.rsqrt(var + eps)
