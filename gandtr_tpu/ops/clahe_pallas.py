"""Pallas TPU kernel for CLAHE.

The hot preprocessing op (every descriptor-model input, and the in-loop
fine-tune augmentation) as two Pallas kernels instead of the XLA gather graph
in ops/clahe.py:

1. LUT build — grid over tiles; per-tile 256-bin histogram accumulated with
   VPU compares (rows × (256 × tile_w) one-hot sums), clip + floor-uniform
   redistribution, cumsum, round-half-even LUT. All in VMEM.
2. Interpolation — grid over (tile_row_band, tile_col) pixel blocks. Within a
   block all pixels share the same 4 neighbouring tile LUTs, so the per-pixel
   lookup becomes a one-hot weighted lane-sum over (R, band_w, 256) row
   blocks (TPU vector memory has no efficient per-element gather; the 3-D
   block form is ~2x the per-row matvec loop, which was iteration-bound).

Semantics match ops/clahe.py (cv2-bit-exact algorithm); grid sizes must divide
the image (the public wrapper pads with reflect-101 first, like cv2).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prefix_sum_256(hist):
    """Inclusive prefix sum over (1, 256) as 8 shifted adds (Mosaic has no
    cumsum primitive; counts stay < 2^24 so f32 adds are exact)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    c = hist
    for s in (1, 2, 4, 8, 16, 32, 64, 128):
        shifted = pltpu.roll(c, s, axis=1)
        c = c + jnp.where(idx >= s, shifted, 0.0)
    return c


def _hist_rows(read_rows, n_rows, width, chunk=16):
    """Σ one-hot histogram over `n_rows` rows of `width` pixels, chunked: the
    3-D broadcast compare (R, width, 256) counts a whole row block per
    iteration (a per-row loop is iteration-overhead-bound — v2 ran ~18x off
    the VPU roofline). `read_rows(start, R)` loads (R, width) int32."""
    hist = jnp.zeros((1, 256), jnp.float32)

    def block(start, R, hist):
        rows = read_rows(start, R)
        bins = jax.lax.broadcasted_iota(jnp.int32, (R, width, 256), 2)
        oh = (rows.reshape(R, width, 1) == bins).astype(jnp.float32)
        return hist + jnp.sum(oh, axis=(0, 1), keepdims=True).reshape(1, 256)

    n_full = n_rows // chunk
    if n_full:
        def chunk_body(c, h):
            return block(c * chunk, chunk, h)
        hist = jax.lax.fori_loop(0, n_full, chunk_body, hist)
    if n_rows % chunk:
        hist = block(n_full * chunk, n_rows % chunk, hist)
    return hist


def _lut_kernel(tiles_ref, lut_ref, *, tile_h, tile_w, climit, group):
    """tiles_ref: (group, tile_h, tile_w) int32 -> lut_ref (group, 256) f32.

    Groups of 8 tiles per grid step satisfy Mosaic's (8, 128) output tiling;
    the 256-bin axis stays on lanes."""
    for g in range(group):
        hist = _hist_rows(lambda s, R: tiles_ref[g, pl.ds(s, R), :],
                          tile_h, tile_w)

        # clip + redistribute (integer semantics in f32: counts < 2^24)
        climit_f = jnp.float32(climit)
        clipped = jnp.sum(jnp.maximum(hist - climit_f, 0.0), axis=1,
                          keepdims=True)                    # (1, 1)
        hist = jnp.minimum(hist, climit_f)
        redist = jnp.floor(clipped / 256.0)
        residual = clipped - redist * 256.0
        hist = hist + redist
        step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
        b = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1).astype(jnp.float32)
        bonus = ((jnp.mod(b, step) == 0) & (jnp.floor(b / step) < residual))
        hist = hist + bonus.astype(jnp.float32)

        lut_scale = jnp.float32(255.0 / (tile_h * tile_w))
        cdf = _prefix_sum_256(hist) * lut_scale
        lut_ref[pl.ds(g, 1), :] = jnp.clip(jnp.round(cdf), 0.0, 255.0)


def _interp_kernel(img_ref, luts_ref, ya_ref, xa_ref, tix_ref, out_ref, *,
                   band_h, band_w, tiles_x):
    """One (band_h, band_w) pixel block: interpolate between its 4 tile LUTs.

    img_ref: (band_h, band_w) int32 pixel values
    luts_ref: (tiles_total, 256) f32 — all LUTs resident in VMEM
    ya_ref: (band_h, 1) f32 row weights; xa_ref: (1, band_w) f32 col weights
    tix_ref: (1, 4) int32 — LUT row indices (y1x1, y1x2, y2x1, y2x2) in SMEM

    Row blocks of 16: the (R, band_w, 256) one-hot selects each pixel's LUT
    entry via a weighted lane-sum per corner (chunk 32 is ~7% faster but 13x
    slower to Mosaic-compile — and CLAHE compiles per eval image shape).
    """
    # the 4 corner LUTs as (1, 1, 256) broadcasts: each lookup is a one-hot
    # weighted lane-sum over a whole row block (exact single-value selection,
    # same values as a gather)
    luts = [luts_ref[pl.ds(tix_ref[0, i], 1), :].reshape(1, 1, 256)
            for i in range(4)]
    xa = xa_ref[:, :]                            # (1, band_w)

    CHUNK = 16

    def block(start, R):
        rows = img_ref[pl.ds(start, R), :]       # (R, band_w)
        bins = jax.lax.broadcasted_iota(jnp.int32, (R, band_w, 256), 2)
        oh = (rows.reshape(R, band_w, 1) == bins).astype(jnp.float32)
        v11 = jnp.sum(oh * luts[0], axis=2)      # (R, band_w)
        v12 = jnp.sum(oh * luts[1], axis=2)
        v21 = jnp.sum(oh * luts[2], axis=2)
        v22 = jnp.sum(oh * luts[3], axis=2)
        ya = ya_ref[pl.ds(start, R), :]          # (R, 1)
        top = v11 * (1.0 - xa) + v12 * xa
        bot = v21 * (1.0 - xa) + v22 * xa
        res = top * (1.0 - ya) + bot * ya
        out_ref[pl.ds(start, R), :] = jnp.clip(jnp.round(res), 0.0, 255.0) \
            .astype(jnp.int32)

    def chunk_body(c, _):
        block(c * CHUNK, CHUNK)
        return 0

    n_full = band_h // CHUNK
    if n_full:  # static guard: tracing the body needs >= CHUNK rows
        jax.lax.fori_loop(0, n_full, chunk_body, 0)
    if band_h % CHUNK:
        block(n_full * CHUNK, band_h % CHUNK)


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid_size",
                                             "interpret"))
def clahe_u8_pallas(img, clip_limit=4.0, grid_size=(8, 8), interpret=False):
    """CLAHE via Pallas kernels. img: (H, W) uint8, H/W divisible by grid after
    reflect-101 padding (applied here, cropped after). Returns (H, W) uint8."""
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    H, W = img.shape
    ty, tx = grid_size
    # cv2 pads only when some dim doesn't divide — and then pads a FULL
    # extra tile on an axis that already divides (clahe.cpp calcLut setup)
    if H % ty == 0 and W % tx == 0:
        pad_h = pad_w = 0
    else:
        pad_h = ty - (H % ty)
        pad_w = tx - (W % tx)
    tile_h = (H + pad_h) // ty
    tile_w = (W + pad_w) // tx
    padded = jnp.pad(img, ((0, pad_h), (0, pad_w)), mode="reflect").astype(jnp.int32)

    tile_area = tile_h * tile_w
    climit = max(int(clip_limit * tile_area / 256.0), 1) if clip_limit > 0 \
        else tile_area

    # ---- phase 1: per-tile LUTs (8 tiles per grid step) ----
    tiles = padded.reshape(ty, tile_h, tx, tile_w).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(ty * tx, tile_h, tile_w)
    n_tiles = ty * tx
    group = min(8, n_tiles)
    n_groups = -(-n_tiles // group)
    if n_groups * group != n_tiles:  # pad tile count to a group multiple
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((n_groups * group - n_tiles, tile_h, tile_w),
                              tiles.dtype)], axis=0)
    luts = pl.pallas_call(
        functools.partial(_lut_kernel, tile_h=tile_h, tile_w=tile_w,
                          climit=climit, group=group),
        out_shape=jax.ShapeDtypeStruct((n_groups * group, 256), jnp.float32),
        grid=(n_groups,),
        in_specs=[pl.BlockSpec((group, tile_h, tile_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tiles)[:n_tiles]

    # ---- phase 2: interpolation over bands ----
    # band = the rows of one tile row-band × one tile column; all pixels in a
    # band share ty1/ty2 and tx1/tx2 (host-computed per band, cv2 f32 coords
    # computed like ops/clahe.py: numpy f32, bit-matching cv2)
    def coords(n, ts, tc):
        inv = np.float32(1.0) / np.float32(ts)
        f = np.arange(n, dtype=np.float32) * inv - np.float32(0.5)
        i1 = np.floor(f).astype(np.int32)
        a = (f - i1).astype(np.float32)
        return np.clip(i1, 0, tc - 1), np.clip(i1 + 1, 0, tc - 1), a

    Hp, Wp = padded.shape
    y1, y2, ya = coords(Hp, tile_h, ty)
    x1, x2, xa = coords(Wp, tile_w, tx)

    def bands_from(i1, i2):
        """Group consecutive positions sharing the same (i1, i2) tile pair —
        derived from the f32 coords themselves so band edges match cv2
        bit-for-bit."""
        bands, s = [], 0
        for r in range(1, len(i1) + 1):
            if r == len(i1) or (i1[r], i2[r]) != (i1[s], i2[s]):
                bands.append((s, r - s, int(i1[s]), int(i2[s])))
                s = r
        return bands

    row_bands = bands_from(y1, y2)
    col_bands = bands_from(x1, x2)

    out = jnp.zeros((Hp, Wp), jnp.int32)
    for (rs, rl, by1, by2) in row_bands:
        rl_pad = -(-rl // 8) * 8  # kernel processes rows in chunks of 8
        for (cs, cl, bx1, bx2) in col_bands:
            block = jax.lax.dynamic_slice(padded, (rs, cs), (rl, cl))
            if rl_pad != rl:
                block = jnp.pad(block, ((0, rl_pad - rl), (0, 0)))
            tix_blk = jnp.asarray([[by1 * tx + bx1, by1 * tx + bx2,
                                    by2 * tx + bx1, by2 * tx + bx2]], jnp.int32)
            ya_blk = jnp.zeros((rl_pad,), np.float32).at[:rl].set(
                jnp.asarray(ya[rs:rs + rl]))[:, None]
            xa_blk = jnp.asarray(xa[cs:cs + cl])[None, :]
            res = pl.pallas_call(
                functools.partial(_interp_kernel, band_h=rl_pad, band_w=cl,
                                  tiles_x=tx),
                out_shape=jax.ShapeDtypeStruct((rl_pad, cl), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(block, luts, ya_blk, xa_blk, tix_blk)
            out = jax.lax.dynamic_update_slice(out, res[:rl], (rs, cs))

    return out[:H, :W].astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Round-4: dynamic-geometry masked interpolation (the bucketed CLAHE path).
#
# All of the per-image geometry (cv2 recomputes tile sizes from each image's
# exact (h, w)) enters through TWO traced scalars — the kernel itself is
# shape-static over the padded bucket buffer, so one compiled kernel serves
# every image in a bucket. Per-pixel LUT lookup is a one-hot MXU matmul
# (u8 LUT values <= 255 are exact in bf16; a one-hot row selects a single
# exact term under f32 accumulation) followed by a one-hot corner selection,
# and the bilinear chain is explicit mul/add — Mosaic does not FMA-contract
# it (the static kernel above is bit-exact vs cv2 on chip, tpu_smoke), which
# kills the XLA path's ±1 round-half-even tie class.
# ---------------------------------------------------------------------------


def _div_f32_correct_kernel(a, b):
    """Correctly-rounded f32 division for Mosaic (no barriers needed — the
    Mosaic backend does not FMA-contract; see ops/clahe._div_f32_correct for
    the XLA version and the measured TPU approx-divide tie source)."""
    q0 = a / b
    c = jnp.float32(4097.0)

    def split(x):
        t = c * x
        hi = t - (t - x)
        return hi, x - hi

    q_hi, q_lo = split(q0)
    b_hi, b_lo = split(b)
    p = q0 * b
    err = ((q_hi * b_hi - p) + q_hi * b_lo + q_lo * b_hi) + q_lo * b_lo
    r = (a - p) - err
    return q0 + r / b


def _coords_dyn(pos, tsize_f32, tcount):
    """cv2's f32 coordinate chain for dynamic tile sizes: x*(1/ts) - 0.5,
    floor/frac, clip — all single-rounded f32 ops (no FMA in Mosaic)."""
    inv = _div_f32_correct_kernel(jnp.float32(1.0), tsize_f32)
    f = pos.astype(jnp.float32) * inv - jnp.float32(0.5)
    i1 = jnp.floor(f)
    a = f - i1
    i1 = i1.astype(jnp.int32)
    i2 = jnp.clip(i1 + 1, 0, tcount - 1)
    i1 = jnp.clip(i1, 0, tcount - 1)
    return i1, i2, a


def _masked_interp_kernel(geom_ref, img_ref, luts_ref, out_ref, *,
                          bh, bw, ty, tx):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_h = geom_ref[0, 0]
    tile_w = geom_ref[0, 1]
    T = ty * tx

    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, 1), 0) + i * bh
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1) + j * bw
    y1, y2, ya = _coords_dyn(rows, tile_h.astype(jnp.float32), ty)
    x1, x2, xa = _coords_dyn(cols, tile_w.astype(jnp.float32), tx)

    vals = img_ref[:, :]                                   # (bh, bw) int32
    bins = jax.lax.broadcasted_iota(jnp.int32, (bh, bw, 256), 2)
    oh = (vals.reshape(bh, bw, 1) == bins).astype(jnp.bfloat16)
    # (bh*bw, 256) @ (256, T): every pixel's value looked up in ALL tiles
    P = jax.lax.dot_general(
        oh.reshape(bh * bw, 256), luts_ref[:, :].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(bh, bw, T)

    tiles = jax.lax.broadcasted_iota(jnp.int32, (bh, bw, T), 2)

    def corner(tyi, txi):
        t = tyi * tx + txi                                  # (bh, bw)
        oht = (t.reshape(bh, bw, 1) == tiles).astype(jnp.float32)
        return jnp.sum(P * oht, axis=2)                     # (bh, bw)

    l11 = corner(y1, x1)
    l12 = corner(y1, x2)
    l21 = corner(y2, x1)
    l22 = corner(y2, x2)
    top = l11 * (jnp.float32(1.0) - xa) + l12 * xa
    bot = l21 * (jnp.float32(1.0) - xa) + l22 * xa
    res = top * (jnp.float32(1.0) - ya) + bot * ya
    out_ref[:, :] = jnp.clip(jnp.round(res), 0.0, 255.0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("grid_size", "block",
                                             "interpret"))
def masked_interp_pallas(img, luts, tile_h, tile_w, grid_size=(8, 8),
                         block=(8, 256), interpret=False):
    """Per-pixel LUT interpolation for the MASKED (dynamic-geometry) CLAHE.

    img: (H, W) uint8/int32 padded bucket buffer; luts: (ty*tx, 256) f32;
    tile_h/tile_w: traced int32 scalars (cv2 geometry of the image's valid
    rect). Returns (H, W) uint8. Band pixels get defined-but-meaningless
    values (their coords extrapolate the last tiles) — callers re-mask."""
    ty, tx = grid_size
    H, W = img.shape
    bh, bw = block
    Hp = -(-H // bh) * bh
    Wp = -(-W // bw) * bw
    buf = jnp.zeros((Hp, Wp), jnp.int32).at[:H, :W].set(img.astype(jnp.int32))
    geom = jnp.asarray([[tile_h, tile_w]], jnp.int32)
    out = pl.pallas_call(
        functools.partial(_masked_interp_kernel, bh=bh, bw=bw, ty=ty, tx=tx),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        grid=(Hp // bh, Wp // bw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ty * tx, 256), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(geom, buf, luts)
    return out[:H, :W].astype(jnp.uint8)
