"""CLAHE (Contrast-Limited Adaptive Histogram Equalization) in pure JAX,
bit-exact vs cv2.createCLAHE on uint8 inputs.

This is the hot preprocessing op of the reference: every descriptor-model input
goes through LAB-CLAHE (clip 1.0, grid 8×8) and the fine-tune loop applies it
between generator and embedding net per augmented image on the CPU
(/root/reference/mdir/components/data/wrapper.py:325-348,
 /root/reference/mdir/components/data/transform/functional.py:140-168).
Here it is a fused on-device op staged inside the same jit as the models.

Algorithm (OpenCV clahe.cpp semantics):
  1. pad right/bottom with BORDER_REFLECT_101 so H, W divide the tile grid
  2. per-tile 256-bin histogram
  3. clip at max(int(clip_limit * tile_area / 256), 1); redistribute the excess
     floor-uniformly, remainder to every (256//residual)-th bin
  4. LUT per tile: round_half_even(cumsum * 255 / tile_area)
  5. per-pixel bilinear interpolation between the 4 neighbouring tile LUTs with
     half-pixel tile coordinates, round-half-even to uint8
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.ops import colorspace as cs


def _clip_histogram(hist, clip_limit):
    """Clip histogram at integer clip_limit and redistribute excess (per tile).

    hist: (..., 256) int32; clip_limit: scalar int.
    """
    clipped = jnp.sum(jnp.maximum(hist - clip_limit, 0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip_limit)
    redist = clipped // 256
    residual = clipped - redist * 256  # (..., 1), in [0, 255]
    hist = hist + redist
    # residual distributed to bins i*step, step = max(256//residual, 1):
    # bin j gets +1 iff j % step == 0 and j // step < residual
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bins = jnp.arange(256)
    bonus = (bins % step == 0) & (bins // step < residual)
    return hist + bonus.astype(hist.dtype)


def _round_half_even_u8(x):
    """cv::saturate_cast<uchar>(float): round-half-to-even then clamp."""
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def _div_f32_correct(a, b):
    """Correctly-rounded f32 division a/b (round-4 tie-source fix).

    XLA-TPU lowers f32 division to a reciprocal approximation that can be 1
    ulp off (measured: 255/2070 -> 0.12318841 vs the correctly-rounded
    0.123188406) — the ONLY source of the masked-CLAHE ±1 u8 tie class (LUT
    scale shifts; CDF, coords, and the Pallas lerp are exact). One Newton
    correction with an exact Dekker two-product residual repairs it using
    only f32 ops: hi+lo == q0*b exactly (split halves multiply exactly), so
    r = a - q0*b is exact and q0 + r/b rounds to the nearest f32.
    """
    bar = jax.lax.optimization_barrier  # each step must round separately —
    # FMA contraction of the split/products would break their exactness
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    q0 = bar(a / b)
    # Dekker split (f32: 24-bit mantissa -> 12+12)
    c = jnp.float32(4097.0)  # 2^12 + 1

    def split(x):
        t = bar(c * x)
        hi = bar(t - bar(t - x))
        return hi, bar(x - hi)

    q_hi, q_lo = split(q0)
    b_hi, b_lo = split(b)
    p = bar(q0 * b)
    err = bar(bar(bar(bar(q_hi * b_hi) - p) + bar(q_hi * b_lo))
              + bar(q_lo * b_hi)) + bar(q_lo * b_lo)
    r = bar(bar(a - p) - bar(err))   # exact residual a - q0*b
    return q0 + r / b


@partial(jax.jit, static_argnames=("clip_limit", "grid_size"))
def clahe_u8(img, clip_limit=4.0, grid_size=(8, 8)):
    """CLAHE on a single-channel uint8 image. img: (H, W) uint8 -> (H, W) uint8.

    Bit-exact vs cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=grid_size).
    """
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    H, W = img.shape
    ty, tx = grid_size

    # pad right/bottom to tile multiple with BORDER_REFLECT_101. cv2 skips
    # padding only when BOTH dims divide; otherwise copyMakeBorder pads
    # `tiles - (size % tiles)` on each axis — a FULL extra tile on an axis
    # that already divides (clahe.cpp calcLut setup)
    if H % ty == 0 and W % tx == 0:
        pad_h = pad_w = 0
    else:
        pad_h = ty - (H % ty)
        pad_w = tx - (W % tx)
    tile_h = (H + pad_h) // ty
    tile_w = (W + pad_w) // tx
    padded = jnp.pad(img, ((0, pad_h), (0, pad_w)), mode="reflect")

    tile_area = tile_h * tile_w
    if clip_limit > 0:
        climit = max(int(clip_limit * tile_area / 256.0), 1)
    else:
        climit = tile_area  # no clipping

    # per-tile histograms via segment-sum on combined (tile, value) ids
    tiles = padded.reshape(ty, tile_h, tx, tile_w).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(ty * tx, tile_area)
    tile_ids = jnp.arange(ty * tx, dtype=jnp.int32)[:, None]
    ids = (tile_ids * 256 + tiles.astype(jnp.int32)).reshape(-1)
    hist = jax.ops.segment_sum(jnp.ones_like(ids), ids,
                               num_segments=ty * tx * 256).reshape(ty * tx, 256)

    hist = _clip_histogram(hist, climit)
    lut_scale = 255.0 / tile_area
    lut = _round_half_even_u8(jnp.cumsum(hist, axis=-1) * lut_scale)
    lut = lut.reshape(ty, tx, 256)

    # bilinear interpolation over the original (unpadded) extent.
    # Coordinates depend only on static shapes, so they are computed host-side
    # with numpy float32 — bit-identical to cv2's `x * (1/tileW) - 0.5` chain
    # (XLA constant folding would evaluate the same graph in excess precision).
    def tile_coords(n, tsize, tcount):
        inv = np.float32(1.0) / np.float32(tsize)
        f = np.arange(n, dtype=np.float32) * inv - np.float32(0.5)
        i1 = np.floor(f).astype(np.int32)
        a = (f - i1).astype(np.float32)
        i2 = np.clip(i1 + 1, 0, tcount - 1)
        i1 = np.clip(i1, 0, tcount - 1)
        return jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(a)

    ty1, ty2, ya = tile_coords(H, tile_h, ty)
    tx1, tx2, xa = tile_coords(W, tile_w, tx)

    v = img.astype(jnp.int32)
    # gather the 4 neighbouring LUT values per pixel
    l11 = lut[ty1[:, None], tx1[None, :], v].astype(jnp.float32)
    l12 = lut[ty1[:, None], tx2[None, :], v].astype(jnp.float32)
    l21 = lut[ty2[:, None], tx1[None, :], v].astype(jnp.float32)
    l22 = lut[ty2[:, None], tx2[None, :], v].astype(jnp.float32)

    xa_ = xa[None, :]
    ya_ = ya[:, None]
    # cv2 evaluates this chain as individually-rounded f32 mul/add; XLA's fuser
    # would contract mul+add into FMA, flipping round-half-even ties by 1 ulp.
    # optimization_barrier pins each product to a separately-rounded f32 value.
    b = lambda v: jax.lax.optimization_barrier(v)
    top = b(l11 * (1 - xa_)) + b(l12 * xa_)
    bot = b(l21 * (1 - xa_)) + b(l22 * xa_)
    res = b(top * (1 - ya_)) + b(bot * ya_)
    return _round_half_even_u8(res)


def clahe_u8_masked(img, hw, clip_limit=4.0, grid_size=(8, 8),
                    interp="auto", hist_form="band"):
    """CLAHE of the valid top-left (h, w) rectangle of a padded buffer,
    exactly as cv2 would compute it on the EXACT (h, w) image.

    Tile geometry, histograms, clip limits, LUT scales, and interpolation
    coordinates are all computed from the traced valid sizes — band pixels
    contribute nothing (histogram weights) and receive undefined values
    (callers re-mask). Matches cv2's f32 arithmetic op-for-op: f32 division
    for lutScale, truncating int cast for the clip limit, barriered mul/sub
    so XLA cannot FMA-contract the coordinate chain.

    img: (H, W) uint8; hw: traced (h, w) int32 scalars. Images smaller than
    one tile row/col (h < grid or w < grid) take multi-bounce REFLECT_101
    paths cv2 resolves differently — callers should not bucket such images.
    """
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    H, W = img.shape
    ty, tx = grid_size
    h, w = hw
    h = jnp.asarray(h, jnp.int32)
    w = jnp.asarray(w, jnp.int32)
    # cv2 pads only when some dim doesn't divide — and then pads
    # `tiles - (size % tiles)` on BOTH axes, a full extra tile on an axis
    # that already divides (clahe.cpp calcLut setup)
    both_div = ((h % ty) == 0) & ((w % tx) == 0)
    pad_h = jnp.where(both_div, 0, ty - (h % ty))
    pad_w = jnp.where(both_div, 0, tx - (w % tx))
    tile_h = (h + pad_h) // ty
    tile_w = (w + pad_w) // tx
    ph = h + pad_h  # dynamic padded extent, <= H + ty
    pw = w + pad_w

    def tid_of(ys, xs):
        return (jnp.clip(ys // tile_h, 0, ty - 1) * tx
                + jnp.clip(xs // tile_w, 0, tx - 1))

    if hist_form == "band":
        # round-4: the cv2 pad is at most one GRID cell (ty/tx <= 8 rows/
        # cols, `tiles - size%tiles`), so instead of materializing the
        # (H+ty, W+tx) virtual reflected image with a full 2-D gather, the
        # histogram sums four partitions of the padded rect: the valid
        # region (no gather at all) + an <=ty-row reflected band + an
        # <=tx-col reflected band + the <=ty*tx corner. Same ids/weights
        # element-for-element as the virtual-image form (bit-identical
        # histograms); kills the dominant gather (chip-measured,
        # docs/PERF.md round-4 CLAHE histogram).
        yv = jnp.arange(H, dtype=jnp.int32)
        xv = jnp.arange(W, dtype=jnp.int32)
        # (1) valid region: every pixel at its own position
        w_main = ((yv[:, None] < h) & (xv[None, :] < w))
        ids_main = (tid_of(yv[:, None], xv[None, :]) * 256
                    + img.astype(jnp.int32)).reshape(-1)
        # (2) bottom band: positions (h+j, x), x < w, j < pad_h
        jb = jnp.arange(ty, dtype=jnp.int32)
        ry_b = jnp.clip(h - 2 - jb, 0, H - 1)
        band_b = img[ry_b, :]                                # (ty, W) gather
        w_b = ((jb[:, None] < pad_h) & (xv[None, :] < w))
        ids_b = (tid_of((h + jb)[:, None], xv[None, :]) * 256
                 + band_b.astype(jnp.int32)).reshape(-1)
        # (3) right band: positions (y, w+k), y < h, k < pad_w
        kb = jnp.arange(tx, dtype=jnp.int32)
        rx_b = jnp.clip(w - 2 - kb, 0, W - 1)
        band_r = img[:, rx_b]                                # (H, tx) gather
        w_r = ((yv[:, None] < h) & (kb[None, :] < pad_w))
        ids_r = (tid_of(yv[:, None], (w + kb)[None, :]) * 256
                 + band_r.astype(jnp.int32)).reshape(-1)
        # (4) corner: positions (h+j, w+k), j < pad_h, k < pad_w
        corner = img[ry_b[:, None], rx_b[None, :]]           # (ty, tx)
        w_c = ((jb[:, None] < pad_h) & (kb[None, :] < pad_w))
        ids_c = (tid_of((h + jb)[:, None], (w + kb)[None, :]) * 256
                 + corner.astype(jnp.int32)).reshape(-1)
        ids = jnp.concatenate([ids_main, ids_b, ids_r, ids_c])
        wgt = jnp.concatenate([w_main.reshape(-1), w_b.reshape(-1),
                               w_r.reshape(-1), w_c.reshape(-1)])
        hist = jax.ops.segment_sum(
            wgt.astype(jnp.int32), ids,
            num_segments=ty * tx * 256).reshape(ty * tx, 256)
    else:
        # virtual BORDER_REFLECT_101-padded image on a static buffer
        HV, WV = H + ty, W + tx
        yv = jnp.arange(HV, dtype=jnp.int32)
        xv = jnp.arange(WV, dtype=jnp.int32)
        ry = jnp.clip(jnp.where(yv < h, yv, 2 * h - 2 - yv), 0, H - 1)
        rx = jnp.clip(jnp.where(xv < w, xv, 2 * w - 2 - xv), 0, W - 1)
        virt = img[ry[:, None], rx[None, :]]
        wgt = (yv[:, None] < ph) & (xv[None, :] < pw)
        tid = (jnp.clip(yv // tile_h, 0, ty - 1)[:, None] * tx
               + jnp.clip(xv // tile_w, 0, tx - 1)[None, :])
        ids = (tid * 256 + virt.astype(jnp.int32)).reshape(-1)
        hist = jax.ops.segment_sum(
            wgt.astype(jnp.int32).reshape(-1), ids,
            num_segments=ty * tx * 256).reshape(ty * tx, 256)

    area = tile_h * tile_w
    areaf = area.astype(jnp.float32)
    if clip_limit > 0:
        # cv2: int cast truncates; exact in f32 for the shipped clip limits
        # (1.0, 4.0 — power-of-two multiples of 1/256)
        climit = jnp.maximum((jnp.float32(clip_limit) * areaf
                              / 256.0).astype(jnp.int32), 1)
    else:
        climit = area
    hist = _clip_histogram(hist, climit)
    # correctly-rounded f32 division (XLA-TPU's approx divide was the ±1 u8
    # tie source — _div_f32_correct docstring); multiply+round are exact
    lut_scale = _div_f32_correct(jnp.float32(255.0), areaf)
    lut = _round_half_even_u8(
        jnp.cumsum(hist, axis=-1).astype(jnp.float32) * lut_scale)
    lut = lut.reshape(ty, tx, 256)

    b = jax.lax.optimization_barrier

    def tile_coords(n, tsize, tcount):
        # correctly-rounded reciprocal (defensive — measured exact for the
        # diagnostic shape, but the approx divide is the known tie source)
        inv = _div_f32_correct(jnp.float32(1.0), tsize.astype(jnp.float32))
        f = b(jnp.arange(n, dtype=jnp.float32) * inv) - jnp.float32(0.5)
        i1 = jnp.floor(f).astype(jnp.int32)
        a = (f - i1.astype(jnp.float32)).astype(jnp.float32)
        i2 = jnp.clip(i1 + 1, 0, tcount - 1)
        i1 = jnp.clip(i1, 0, tcount - 1)
        return i1, i2, a

    ty1, ty2, ya = tile_coords(H, tile_h, ty)
    tx1, tx2, xa = tile_coords(W, tile_w, tx)

    v = img.astype(jnp.int32)
    if interp == "auto":
        try:
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
        except Exception:
            on_tpu = False
        interp = "onehot" if on_tpu else "gather"
    if interp == "pallas":
        # round-4 dynamic-geometry Pallas interp kernel — kept as a measured
        # REJECTION for dispatch: 5.44 vs the one-hot form's 4.30 ms/img
        # @384² on chip, and the tie-exactness it was built for turned out
        # to live upstream (_div_f32_correct fixed the real source, making
        # the one-hot form bit-exact too — docs/PERF.md round-4 CLAHE)
        from gandtr_tpu.ops.clahe_pallas import masked_interp_pallas
        return masked_interp_pallas(
            img, lut.reshape(ty * tx, 256).astype(jnp.float32),
            tile_h, tile_w, (ty, tx))
    if interp == "onehot":
        # TPU: per-pixel LUT lookups as an exact one-hot MXU matmul + one-hot
        # corner selection — 2.6x faster than the XLA gather form on chip
        # (10.6 -> 4.1 ms/img) and BIT-EXACT vs cv2 since round 4: the ±1 u8
        # tie class all TPU forms shared came from XLA-TPU's approximate f32
        # divide in the LUT scale (not the lerp) and is fixed by
        # _div_f32_correct — 8-shape chip fuzz worst 0 (docs/PERF.md). The
        # CPU branch below keeps the gather form, bit-exact under CPU jit
        # (40-shape fuzz, worst 0) — the one-hot lerp layout can flip rare
        # ties ±1 under XLA-CPU's FMA contraction.
        lutf = lut.reshape(ty * tx, 256)
        onehot = (v.reshape(-1)[:, None]
                  == jnp.arange(256, dtype=jnp.int32)[None, :]) \
            .astype(jnp.bfloat16)
        # u8 LUT values <= 255 are exact in bf16; one-hot products select a
        # single exact term under f32 accumulation
        P = jnp.dot(onehot, lutf.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)       # (HW, 64)
        tiles = jnp.arange(ty * tx, dtype=jnp.int32)[None, :]

        def corner(tyi, txi):
            t = (tyi[:, None] * tx + txi[None, :]).reshape(-1)
            oh = (t[:, None] == tiles).astype(jnp.float32)
            return jnp.sum(P * oh, axis=1)

        l11 = corner(ty1, tx1)
        l12 = corner(ty1, tx2)
        l21 = corner(ty2, tx1)
        l22 = corner(ty2, tx2)
        xa_ = jnp.broadcast_to(xa[None, :], img.shape).reshape(-1)
        ya_ = jnp.broadcast_to(ya[:, None], img.shape).reshape(-1)
        top = b(l11 * (1 - xa_)) + b(l12 * xa_)
        bot = b(l21 * (1 - xa_)) + b(l22 * xa_)
        res = b(top * (1 - ya_)) + b(bot * ya_)
        return _round_half_even_u8(res).reshape(img.shape)

    l11 = lut[ty1[:, None], tx1[None, :], v].astype(jnp.float32)
    l12 = lut[ty1[:, None], tx2[None, :], v].astype(jnp.float32)
    l21 = lut[ty2[:, None], tx1[None, :], v].astype(jnp.float32)
    l22 = lut[ty2[:, None], tx2[None, :], v].astype(jnp.float32)
    xa_ = xa[None, :]
    ya_ = ya[:, None]
    top = b(l11 * (1 - xa_)) + b(l12 * xa_)
    bot = b(l21 * (1 - xa_)) + b(l22 * xa_)
    res = b(top * (1 - ya_)) + b(bot * ya_)
    return _round_half_even_u8(res)


def channel_clahe_masked(chan, hw, clip_limit, grid_size):
    u8 = (jnp.clip(chan, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    out = clahe_u8_masked(u8, hw, clip_limit, grid_size)
    return out.astype(jnp.float32) / 255.0


def image_clahe_masked(img, hw, clip_limit=4.0, grid_size=8, colorspace="lab"):
    """image_clahe of the valid (h, w) rectangle of a padded (H, W, 3) buffer;
    colorspace conversions are per-pixel so only the CLAHE channel needs the
    valid-region geometry. Band pixels are undefined (callers re-mask)."""
    spc = cs.rgb2normspace(img, colorspace)
    L = channel_clahe_masked(spc[..., 0], hw, clip_limit, grid_size)
    spc = spc.at[..., 0].set(L)
    return cs.normspace2rgb(spc, colorspace)


def clahe_u8_dispatch(u8, clip_limit, grid_size):
    """Backend dispatch: the Pallas kernels on TPU (the XLA gather graph is
    pathological for Mosaic/XLA-TPU compile times), the XLA path elsewhere.
    Both are bit-exact vs cv2 (tests/test_clahe_pallas.py)."""
    import jax
    try:
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        on_tpu = False
    if on_tpu:
        from gandtr_tpu.ops.clahe_pallas import clahe_u8_pallas
        if isinstance(grid_size, int):
            grid_size = (grid_size, grid_size)
        return clahe_u8_pallas(u8, float(clip_limit), tuple(grid_size))
    return clahe_u8(u8, clip_limit, grid_size)


def channel_clahe(chan, clip_limit, grid_size):
    """Reference ChannelClahe.apply (functional.py:147-151): float[0,1] channel
    -> truncate to uint8 at 255 -> CLAHE -> /255 float."""
    u8 = (jnp.clip(chan, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return clahe_u8_dispatch(u8, clip_limit, grid_size).astype(jnp.float32) / 255.0


def image_clahe(img, clip_limit=4.0, grid_size=8, colorspace="lab"):
    """Reference ImageClahe.apply: CLAHE on the lightness channel of `colorspace`,
    back to RGB. img: (H, W, 3) float RGB in [0,1]."""
    spc = cs.rgb2normspace(img, colorspace)
    L = channel_clahe(spc[..., 0], clip_limit, grid_size)
    spc = spc.at[..., 0].set(L)
    return cs.normspace2rgb(spc, colorspace)


def image_colorspace_clahe(img, clip_limit=4.0, grid_size=8, colorspace="lab"):
    """Reference ImageColorspaceClahe.apply: like image_clahe but stays in the
    normalized colorspace (no conversion back)."""
    spc = cs.rgb2normspace(img, colorspace)
    L = channel_clahe(spc[..., 0], clip_limit, grid_size)
    return spc.at[..., 0].set(L)
