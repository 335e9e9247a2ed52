"""Bilinear resize matching torch F.interpolate(mode='bilinear',
align_corners=False, antialias=False) exactly — the op behind the reference's
multiscale descriptor aggregation (/root/reference/mdir/components/data/
wrapper.py:224-233) whose numerics feed published mAPs.

jax.image.resize antialias behaviour differs from torch on downscaling, hence
this explicit gather-based implementation. NHWC layout.
"""
import numpy as np
import jax.numpy as jnp


def _source_coords(out_size, in_size, scale=None):
    # torch semantics: with an explicit scale_factor the mapping uses
    # 1/scale_factor, otherwise in/out (aten area_pixel_compute_scale)
    if scale is None:
        scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, None)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    w1 = jnp.clip(src - i0.astype(jnp.float32), 0.0, 1.0)
    return i0, i1, w1


def bilinear_resize(x, out_h, out_w, scale=None):
    """x: (N, H, W, C) -> (N, out_h, out_w, C), torch-bilinear semantics.

    Pass `scale` when mimicking F.interpolate(scale_factor=...) — torch then
    maps coordinates with 1/scale_factor instead of in/out.
    """
    N, H, W, C = x.shape
    y0, y1, wy = _source_coords(out_h, H, None if scale is None else 1.0 / scale)
    x0, x1, wx = _source_coords(out_w, W, None if scale is None else 1.0 / scale)

    top = x[:, y0, :, :] * (1 - wy)[None, :, None, None] + x[:, y1, :, :] * wy[None, :, None, None]
    out = top[:, :, x0, :] * (1 - wx)[None, None, :, None] + top[:, :, x1, :] * wx[None, None, :, None]
    return out


def scale_resize(x, scale):
    """F.interpolate(scale_factor=scale): output size floor(in * scale)."""
    N, H, W, C = x.shape
    return bilinear_resize(x, int(H * scale), int(W * scale), scale=scale)


def masked_scale_resize(x, state, scale):
    """Per-image torch-bilinear scale resize of valid top-left rectangles
    (exact padded-bucket multiscale, ops/maskprop.py).

    F.interpolate(scale_factor=s) semantics per image: output rect
    (floor(h*s), floor(w*s)), sampling grid (i+0.5)/s - 0.5 — the grid is
    STATIC (scale-factor form does not depend on the image size); only the
    boundary clamp to h-1/w-1 is per-image, so two dynamic gathers per axis
    reproduce the exact-shape resize bit-for-bit on the valid region.

    x: (N, H, W, C); state: MaskState. Returns (y, new_state) with y
    (N, floor(H*s), floor(W*s), C); band values are garbage (outside the new
    valid rect — downstream maskers re-zero).
    """
    from gandtr_tpu.ops.maskprop import MaskState
    N, H, W, C = x.shape
    out_h, out_w = int(H * scale), int(W * scale)
    h, w = state.hw

    def coords(out_n):
        src = (np.arange(out_n, dtype=np.float32) + 0.5) \
            * np.float32(1.0 / scale) - np.float32(0.5)
        src = np.clip(src, 0.0, None)
        i0 = np.floor(src).astype(np.int32)
        frac = np.clip((src - i0).astype(np.float32), 0.0, 1.0)
        return jnp.asarray(i0), jnp.asarray(frac)

    y0s, wy = coords(out_h)
    x0s, wx = coords(out_w)
    y0 = jnp.minimum(y0s[None, :], (h - 1)[:, None])       # (N, out_h)
    y1 = jnp.minimum(y0s[None, :] + 1, (h - 1)[:, None])
    x0 = jnp.minimum(x0s[None, :], (w - 1)[:, None])
    x1 = jnp.minimum(x0s[None, :] + 1, (w - 1)[:, None])

    gy = lambda idx: jnp.take_along_axis(x, idx[:, :, None, None], axis=1)
    top = gy(y0) * (1 - wy)[None, :, None, None] \
        + gy(y1) * wy[None, :, None, None]
    gx = lambda idx: jnp.take_along_axis(top, idx[:, None, :, None], axis=2)
    out = gx(x0) * (1 - wx)[None, None, :, None] \
        + gx(x1) * wx[None, None, :, None]
    # output size floor(h*s): f32 product floor (torch computes in double;
    # ±1 only if f32 rounds h*s across an integer — impossible for the
    # shipped scales 1/2 and 1/sqrt(2) at image sizes)
    h2 = jnp.floor(h.astype(jnp.float32) * np.float32(scale)).astype(jnp.int32)
    w2 = jnp.floor(w.astype(jnp.float32) * np.float32(scale)).astype(jnp.int32)
    return out, MaskState((jnp.minimum(h2, out_h), jnp.minimum(w2, out_w)))


def nearest_resize(x, out_h, out_w):
    """torch F.interpolate(mode='nearest'): src = floorf(dst * in/out) —
    computed in FLOAT32 like torch's nearest_neighbor_compute_source_index
    (exact integer floor differs by one where the f32 product rounds across
    an integer boundary)."""
    N, H, W, C = x.shape

    def src(out_n, in_n):
        scale = np.float32(in_n) / np.float32(out_n)
        idx = np.floor(np.arange(out_n, dtype=np.float32) * scale)
        return jnp.asarray(np.clip(idx.astype(np.int64), 0, in_n - 1))

    return x[:, src(out_h, H), :, :][:, :, src(out_w, W), :]


def dynamic_bilinear_resize_u8(imgs_u8, hws, out_h, out_w):
    """Per-image half-pixel bilinear resize of the valid (h, w) top-left
    rect of padded uint8 buffers to a static (out_h, out_w), computed in
    f32 on /255-scaled values — the in-graph form of the train chain's
    `cv2.resize(crop_f32, (w, h))` (INTER_LINEAR default,
    augmentation_transforms.py:138). Same formula and clamping as cv2's
    float path; only the fp evaluation order differs (~1e-7 rel —
    differential-tested in tests/test_device_scalecrop.py).

    imgs_u8: (N, Hp, Wp, C) uint8; hws: (N, 2) int32 valid sizes.
    Gathers stay inside [0, h)×[0, w), so the pad band never contaminates.
    """
    def one(img, hw):
        x = img.astype(jnp.float32) / 255.0
        h = hw[0]
        w = hw[1]

        def coords(out_size, in_size):
            scale = in_size.astype(jnp.float32) / out_size
            src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
            src = jnp.clip(src, 0.0, None)
            i0 = jnp.floor(src).astype(jnp.int32)
            i0 = jnp.clip(i0, 0, in_size - 1)
            i1 = jnp.clip(i0 + 1, 0, in_size - 1)
            frac = jnp.clip(src - i0.astype(jnp.float32), 0.0, 1.0)
            return i0, i1, frac

        y0, y1, wy = coords(out_h, h)
        x0, x1, wx = coords(out_w, w)
        top = (x[y0, :, :] * (1 - wy)[:, None, None]
               + x[y1, :, :] * wy[:, None, None])
        out = (top[:, x0, :] * (1 - wx)[None, :, None]
               + top[:, x1, :] * wx[None, :, None])
        return out

    import jax
    return jax.vmap(one)(imgs_u8, hws)
