"""Space-to-depth conv rewrites for MXU-hostile shapes.

The CycleGAN-family generators (models/generators.py) open and close with
7x7 convs whose channel counts (3->64, 64->3) leave the 128-lane MXU nearly
idle: measured on v5e, the final 64->3 conv alone costs 12.5 ms/batch-32
(~3 TFLOP/s) out of a 39 ms generator forward. The standard TPU remedy is a
space-to-depth (s2d) reformulation: block the spatial grid by s, fold the
s x s phases into channels, and run an exactly-equivalent stride-1 conv whose
contraction and output-channel dims are MXU-sized. The same machinery speeds
up stride-2 "down" convs (fold input phases only) and stride-2 transposed
convs (phase-expanded kernel + depth-to-space), replacing the slow
lhs_dilation lowering.

All rewrites are EXACT reformulations (same multiply-add terms, different
grouping): outputs match `jax.lax.conv_general_dilated` to float rounding.
Everything here is plain XLA (reshape/transpose/conv) - no Pallas needed:
the wins come from giving the compiler MXU-shaped contractions.

Reference parity is unaffected: these kick in underneath models/layers.py
Conv/ConvTranspose when `ENABLED` (the default) and the shape heuristics
match; `set_enabled(False)` restores the naive lowering.
"""
import numpy as np
import jax
import jax.numpy as jnp

ENABLED = True


def set_enabled(flag):
    """Toggle the fast-conv dispatch globally. NOTE: toggling between jit
    traces of the same function signature will not invalidate already-compiled
    caches; set once at startup."""
    global ENABLED
    ENABLED = bool(flag)


def reflect_pad(x, pad):
    """Reflect-pad spatial dims of NHWC x, lowered as zero-pad + border
    patches.

    XLA's reflect `jnp.pad` lowers to reverse+gather fusions measured at
    ~140 GB/s on v5e (4 ms for a 268 MB tensor) while a plain zero-pad copy
    runs at bandwidth (0.8 ms). Writing the zero-padded copy and then
    dynamic-update-slicing the four thin mirrored strips (corners inherit the
    double reflection, matching numpy/torch 'reflect') is ~4x faster and
    bit-identical.
    """
    t, b, l, r = pad
    B, H, W, C = x.shape
    if max(t, b) >= H or max(l, r) >= W:
        # numpy/torch 'reflect' requires pad < dim; the strip updates below
        # would silently leave zero rows instead
        raise ValueError("reflect pad %r too wide for (%d, %d)"
                         % (pad, H, W))
    y = jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
    if t:
        strip = jnp.flip(x[:, 1:1 + t], axis=1)
        y = jax.lax.dynamic_update_slice(y, strip, (0, 0, l, 0))
    if b:
        strip = jnp.flip(x[:, H - 1 - b:H - 1], axis=1)
        y = jax.lax.dynamic_update_slice(y, strip, (0, t + H, l, 0))
    if l:
        strip = jnp.flip(y[:, :, l + 1:2 * l + 1], axis=2)
        y = jax.lax.dynamic_update_slice(y, strip, (0, 0, 0, 0))
    if r:
        strip = jnp.flip(y[:, :, l + W - 1 - r:l + W - 1], axis=2)
        y = jax.lax.dynamic_update_slice(y, strip, (0, 0, l + W, 0))
    return y


def space_to_depth(x, s):
    """(B, H, W, C) -> (B, H/s, W/s, s*s*C), phase-major channel order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // s, s, W // s, s, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // s, W // s, s * s * C)


def depth_to_space(x, s):
    """Inverse of space_to_depth."""
    B, Hb, Wb, C = x.shape
    c = C // (s * s)
    x = x.reshape(B, Hb, Wb, s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hb * s, Wb * s, c)


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2d(xp, kernel, s):
    """Stride-1 VALID conv with few output channels, rewritten as ONE
    stride-s conv with a phase-expanded kernel + depth-to-space.

    xp: (B, H+K-1, W+K-1, C) (already padded), kernel (K, K, C, Co),
    H % s == 0, W % s == 0. Exact: output phase (dh, dw) of block (i, j) is
      out[s*i+dh, s*j+dw] = sum_{u,v} xp[s*i+dh+u, s*j+dw+v] k[u, v]
    so a (K+s-1)^2 kernel whose channel group (dh, dw) holds k shifted by
    (dh, dw) computes all s*s phases in one stride-s conv — output channels
    s*s*Co fill the MXU lanes, input stays in its natural NHWC layout.

    NOTE on the rejected two-stage variant (space_to_depth + 2x2-block conv):
    bit-identical and cheap in isolation, but composing transpose->conv in
    one XLA graph costs 3-4x (the conv inherits/fuses the transposed layout:
    9.5 ms vs 2.9 ms measured for the generator's final conv). The single
    stride-s conv has (K+s-1)^2/K^2 zero-inflated FLOPs but no layout moves
    and runs ~10x faster than the naive few-lane conv.
    """
    K, _, C, Co = kernel.shape
    B, Hp, Wp, _ = xp.shape
    # phase-expansion: S[up, d, u] = 1 iff up == d + u
    Ks = K + s - 1
    S = np.zeros((Ks, s, K), np.float32)
    for d in range(s):
        for u in range(K):
            S[d + u, d, u] = 1
    S = jnp.asarray(S, xp.dtype)
    Kb = jnp.einsum("xpu,yqv,uvcd->xycpqd", S, S, kernel.astype(xp.dtype))
    Kb = Kb.reshape(Ks, Ks, C, s * s * Co)
    y = jax.lax.conv_general_dilated(
        xp, Kb, (s, s), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(y, s)


def conv_dual_s2d(xp, kernel, s, fold="s2d"):
    """Stride-1 VALID conv with few INPUT channels, rewritten as a block conv
    on the space-to-depth-folded input with a phase-expanded kernel + d2s.

    The generator's opening 7x7 conv 3->64 contracts only 3 channels per tap
    (3/128 MXU utilization, ~22 TFLOP/s measured). Folding s x s input phases
    into channels (the MLPerf-ResNet conv1 trick) makes the contraction
    s*s*C wide, and expanding all s x s output phases into channels keeps the
    output MXU-sized: one stride-1 conv over (Hp/s, Wp/s) blocks with an
    (nb, nb, s*s*C, s*s*Co) kernel, then depth-to-space. Exact (same
    multiply-add terms; extra taps multiply by structural zeros).

    xp: (B, Hp, Wp, C) pre-padded; kernel (K, K, C, Co); output H=Hp-K+1
    must satisfy H % s == 0 (same for W). fold: "s2d" (reshape-transpose) or
    "slice" (strided-slice concat; same values — but CRASHES the axon
    tunnel's TPU worker via its fusion emitter, like round 1's
    reversed-slice SIGABRT; CPU/testing only).
    """
    K, _, C, Co = kernel.shape
    B, Hp, Wp, _ = xp.shape
    H, W = Hp - K + 1, Wp - K + 1
    if H % s or W % s:
        raise ValueError("output not divisible by s")
    # number of input blocks covered by one output block's taps
    nb = (s - 1 + K - 1) // s + 1
    # pad the input to the exact covered extent: s*(H/s + nb - 1)
    tgt_h, tgt_w = s * (H // s + nb - 1), s * (W // s + nb - 1)
    xp = jnp.pad(xp, ((0, 0), (0, tgt_h - Hp), (0, tgt_w - Wp), (0, 0)))
    if fold == "slice":
        xs = jnp.concatenate(
            [xp[:, e::s, f::s, :] for e in range(s) for f in range(s)], axis=-1)
        # channel order (e, f, c) == s2d's phase-major order
    else:
        xs = space_to_depth(xp, s)
    # S[bi, p, e, u] = 1 iff s*bi + e == p + u
    S = np.zeros((nb, s, s, K), np.float32)
    for p in range(s):
        for u in range(K):
            bi, e = divmod(p + u, s)
            S[bi, p, e, u] = 1
    S = jnp.asarray(S, xp.dtype)
    Kb = jnp.einsum("apeu,bqfv,uvcd->abefcpqd", S, S, kernel.astype(xp.dtype))
    Kb = Kb.reshape(nb, nb, s * s * C, s * s * Co)
    y = _conv(xs, Kb)
    return depth_to_space(y, s)


def conv_wfold(xp, kernel, f):
    """Stride-1 VALID conv with few channels, contraction widened by folding
    f adjacent W-phases into channels — TRANSPOSE-FREE (W and C are
    memory-adjacent in NHWC, so the fold and unfold are pure reshapes,
    unlike space_to_depth's H-folds which cost layout moves).

    Exact: output phase d of W-block j is
      out[f*j+d] = sum_u xp[f*j+d+u] k[u]   (per H-tap, channel pair)
    and d+u spans [0, f+Kw-2] -> nbw = (f+Kw-2)//f + 1 W-taps whose folded
    kernel holds k at (e, u) with f*bw + e == d + u. Contraction per tap
    becomes f*C (lane-filling for C < 128), output channels f*Co, FLOP
    inflation nbw*f/Kw.

    xp: (B, Hp, Wp, C) pre-padded; kernel (Kh, Kw, C, Co). Output
    (B, Hp-Kh+1, W, Co), W = Wp-Kw+1; requires W % f == 0.
    """
    Kh, Kw, C, Co = kernel.shape
    B, Hp, Wp, _ = xp.shape
    W = Wp - Kw + 1
    if W % f:
        raise ValueError("output width not divisible by fold")
    nbw = (f + Kw - 2) // f + 1
    wb_out = W // f
    wb_in = wb_out + nbw - 1
    tgt = wb_in * f
    if tgt > Wp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, tgt - Wp), (0, 0)))
    else:
        xp = xp[:, :, :tgt]
    xf = xp.reshape(B, Hp, wb_in, f * C)
    S = np.zeros((nbw, f, f, Kw), np.float32)  # [bw, d, e, u]
    for d in range(f):
        for u in range(Kw):
            bw, e = divmod(d + u, f)
            S[bw, d, e, u] = 1
    S = jnp.asarray(S, xp.dtype)
    Kb = jnp.einsum("wdeu,huco->hwecdo", S, kernel.astype(xp.dtype))
    Kb = Kb.reshape(Kh, nbw, f * C, f * Co)
    y = _conv(xf, Kb)                      # (B, H, wb_out, f*Co)
    H = Hp - Kh + 1
    return y.reshape(B, H, W, Co)


def conv_stride_s2d(xp, kernel, stride):
    """Strided VALID conv on pre-padded input via s2d of the input only.

    xp: (B, Hp, Wp, C), kernel (K, K, C, Co), output
    ((Hp-K)//stride+1, ...). Folds the stride phases into channels so the
    conv becomes stride-1 with a stride^2*C*nb^2 contraction.
    """
    K, _, C, Co = kernel.shape
    B, Hp, Wp, _ = xp.shape
    s = stride
    Ho, Wo = (Hp - K) // s + 1, (Wp - K) // s + 1
    nb = -(-K // s)
    # pad (or trim unused trailing rows) to exactly the covered extent
    tgt_h, tgt_w = s * (Ho + nb - 1), s * (Wo + nb - 1)
    xp = xp[:, :tgt_h, :tgt_w, :]
    xp = jnp.pad(xp, ((0, 0), (0, tgt_h - xp.shape[1]),
                      (0, tgt_w - xp.shape[2]), (0, 0)))
    xs = space_to_depth(xp, s)
    S = np.zeros((nb, s, K), xp.dtype)
    for b in range(nb):
        for e in range(s):
            u = s * b + e
            if u < K:
                S[b, e, u] = 1
    S = jnp.asarray(S)
    Kp = jnp.einsum("aeu,bfv,uvcd->abefcd", S, S, kernel.astype(xp.dtype))
    Kp = Kp.reshape(nb, nb, s * s * C, Co)
    return _conv(xs, Kp)[:, :Ho, :Wo, :]


def conv_transpose_d2s(x, kernel, stride, pad_lo, pad_hi):
    """Transposed conv (lhs_dilation lowering) rewritten as a phase-expanded
    stride-1 conv + depth-to-space.

    Reproduces exactly:
      lax.conv_general_dilated(x, kernel, (1,1),
          padding=((pad_lo, pad_hi),)*2, lhs_dilation=(stride, stride))
    for output sizes divisible by `stride` (the torch
    ConvTranspose2d(k, s, p, output_padding=s-1... ) shapes used here).
    """
    K, _, C, Co = kernel.shape
    B, H, W, _ = x.shape
    t = stride
    Ho = t * (H - 1) + 1 + pad_lo + pad_hi - (K - 1)
    Wo = t * (W - 1) + 1 + pad_lo + pad_hi - (K - 1)
    if Ho % t or Wo % t:
        raise ValueError("output not divisible by stride")
    # valid (phase d, tap u) pairs: input index (d + u - pad_lo)/t
    pairs = [(d, u, (d + u - pad_lo) // t)
             for d in range(t) for u in range(K)
             if (d + u - pad_lo) % t == 0]
    bmin = min(b for _, _, b in pairs)
    bmax = max(b for _, _, b in pairs)
    Lb = -bmin
    nb = bmax - bmin + 1
    blocks_h = Ho // t + nb - 1
    blocks_w = Wo // t + nb - 1
    if blocks_h - H - Lb < 0 or blocks_w - W - Lb < 0:
        raise ValueError("unsupported transpose geometry")
    x = jnp.pad(x, ((0, 0), (Lb, blocks_h - H - Lb),
                    (Lb, blocks_w - W - Lb), (0, 0)))
    S = np.zeros((nb, t, K), x.dtype)
    for d, u, b in pairs:
        S[b - bmin, d, u] = 1
    S = jnp.asarray(S)
    Kp = jnp.einsum("apu,bqv,uvcd->abcpqd", S, S, kernel.astype(x.dtype))
    Kp = Kp.reshape(nb, nb, C, t * t * Co)
    y = _conv(x, Kp)
    return depth_to_space(y, t)


def conv_reflect_few_out(x, kernel, p, s):
    """'SAME' reflect-padded stride-1 conv with few output channels, without
    materializing the reflect pad.

    XLA's reflect-pad lowering costs ~2 ms for the generator's 256x256x64
    tail input while a zero pad folds into the conv for free. Only outputs
    within p pixels of the border see the reflection, so: run the
    phase-expanded conv on the zero-padded input (conv_s2d), then recompute
    the four p-wide border bands exactly from small reflect-padded strips and
    stitch with concatenation. Bit-identical to pad-reflect + VALID conv.

    x: (B, H, W, C), kernel (K, K, C, Co) with K == 2p + 1; H, W % s == 0.
    """
    K = kernel.shape[0]
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = conv_s2d(xp, kernel, s)
    kernel = kernel.astype(x.dtype)
    # top/bottom bands: output rows [0, p) / [H-p, H), full width
    top_in = jnp.pad(x[:, :2 * p], ((0, 0), (p, 0), (p, p), (0, 0)),
                     mode="reflect")
    bot_in = jnp.pad(x[:, -2 * p:], ((0, 0), (0, p), (p, p), (0, 0)),
                     mode="reflect")
    tb = _conv(jnp.concatenate([top_in, bot_in], axis=0), kernel)
    top, bot = tb[:B], tb[B:]
    # left/right bands: output rows [p, H-p), cols [0, p) / [W-p, W)
    left_in = jnp.pad(x[:, :, :2 * p], ((0, 0), (0, 0), (p, 0), (0, 0)),
                      mode="reflect")
    right_in = jnp.pad(x[:, :, -2 * p:], ((0, 0), (0, 0), (0, p), (0, 0)),
                       mode="reflect")
    lr = _conv(jnp.concatenate([left_in, right_in], axis=0), kernel)
    left, right = lr[:B], lr[B:]
    mid = jnp.concatenate([left, out[:, p:H - p, p:W - p], right], axis=2)
    return jnp.concatenate([top, mid, bot], axis=1)


def conv_reflect_few_out_additive(x, kernel, p, s):
    """'SAME' reflect-padded stride-1 conv with few output channels, without
    materializing the (H+2p, W+2p, C) reflect tensor — v2 of
    conv_reflect_few_out with where/add band placement.

    Measured v5e, batch 24 tail (64->3 7x7 @256²): the reflect-pad
    materialization itself costs ~1.7 ms (half-empty lanes at C=64, and the
    padded tensor can't fold into the conv the way implicit zero padding
    does), while the zero-padded conv_s2d runs in 0.77 ms. v1's concat
    stitching of 3-px-wide pieces on a 3-lane tensor re-lost the win; here
    the four border bands are recomputed exactly from small reflect-padded
    strips and PLACED with full-size where/pad ops — cheap, because the
    OUTPUT tensor is tiny (Co < 32 channels).

    x: (B, H, W, C); kernel (K, K, C, Co), K == 2p+1, H % s == W % s == 0.
    Bit-identical to pad-reflect + VALID conv.
    """
    K = kernel.shape[0]
    B, H, W, C = x.shape
    kernel = kernel.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = conv_s2d(xp, kernel, s)

    # band inputs: reflect only happens within p of each edge, so a
    # (2p + p)-deep strip reflect-padded on its outer side reproduces the
    # exact padded neighborhood of the first/last p output rows/cols
    top_in = jnp.pad(x[:, :2 * p], ((0, 0), (p, 0), (p, p), (0, 0)),
                     mode="reflect")
    bot_in = jnp.pad(x[:, -2 * p:], ((0, 0), (0, p), (p, p), (0, 0)),
                     mode="reflect")
    tb = _conv(jnp.concatenate([top_in, bot_in], axis=0), kernel)
    top, bot = tb[:B], tb[B:]          # (B, p, W, Co)
    left_in = jnp.pad(x[:, :, :2 * p], ((0, 0), (p, p), (p, 0), (0, 0)),
                      mode="reflect")
    right_in = jnp.pad(x[:, :, -2 * p:], ((0, 0), (p, p), (0, p), (0, 0)),
                       mode="reflect")
    lr = _conv(jnp.concatenate([left_in, right_in], axis=0), kernel)
    left, right = lr[:B], lr[B:]       # (B, H, p, Co)

    # placement: pad each band to full size and select by row/col index —
    # all on the (B, H, W, Co) output, a few MB for the few-out-channel case
    rows = jnp.arange(H)[None, :, None, None]
    cols = jnp.arange(W)[None, None, :, None]
    out = jnp.where(cols < p, jnp.pad(left, ((0, 0), (0, 0), (0, W - p), (0, 0))), out)
    out = jnp.where(cols >= W - p,
                    jnp.pad(right, ((0, 0), (0, 0), (W - p, 0), (0, 0))), out)
    out = jnp.where(rows < p, jnp.pad(top, ((0, 0), (0, H - p), (0, 0), (0, 0))), out)
    out = jnp.where(rows >= H - p,
                    jnp.pad(bot, ((0, 0), (H - p, 0), (0, 0), (0, 0))), out)
    return out


def dispatch_conv_reflect(x, kernel, p, stride=1, dilation=1):
    """Fast path for Conv(pad_mode='reflect', stride 1, K == 2p+1) with few
    output channels; None -> pad + normal dispatch. The rewrite computes a
    stride-1 undilated conv, so other configurations must fall through."""
    if not ENABLED or x.ndim != 4 or stride != 1 or dilation != 1:
        return None
    K, _, C, Co = kernel.shape
    if K != 2 * p + 1 or Co >= 32:
        return None
    B, H, W, _ = x.shape
    if H < 2 * p or W < 2 * p:
        return None
    for s in (8, 4, 2):
        if s * s * Co < 128 or H % s or W % s or H // s < 2 or W // s < 2:
            continue
        if Co * (K + s - 1) ** 2 > 128 * K ** 2:
            continue
        return conv_reflect_few_out(x, kernel, p, s)
    return None


def dispatch_conv(xp, kernel, stride):
    """Pick a fast rewrite for a pre-padded VALID conv, or return None to use
    the naive lowering.

    Only the few-OUTPUT-channels stride-1 case (final RGB/edge-map convs) is
    rewritten: with Co < 32 the naive conv uses Co of 128 MXU lanes (measured
    3 TFLOP/s, 11 ms/batch-32 for the generator's 64->3 7x7 @256px); s2d with
    s*s*Co >= 128 fills the lanes (measured ~3.8 ms incl. layout moves).
    Stride-2 down convs, transposed convs, and few-INPUT-channel convs were
    measured at near-roofline already — rewrites there LOSE to the extra
    layout passes (see docs/PERF.md), so they intentionally stay naive.
    """
    if not ENABLED:
        return None
    K, _, C, Co = kernel.shape
    B, Hp, Wp, _ = xp.shape
    if stride != 1:
        return None
    H, W = Hp - K + 1, Wp - K + 1
    if H <= 0 or W <= 0:
        return None
    # NOT dispatched: conv_wfold (transpose-free W-phase fold) for
    # few-INPUT-channel convs measured 2.58 -> 1.28 ms on the generator head
    # WITH its IN+relu epilogue — but the FULL generator regressed 21.2 ->
    # 24.2 ms (the reshape chain degrades the downstream stride-2 conv's
    # layout; same composition trap as the round-1 two-stage s2d form).
    # Kept as a parity-tested op for segment-level use (docs/PERF.md).
    if Co >= 32:
        return None
    for s in (8, 4, 2):
        if s * s * Co < 128 or H % s or W % s or H // s < 2 or W // s < 2:
            continue
        # the phase-expanded kernel inflates FLOPs by ((K+s-1)/K)^2; it only
        # wins while the naive conv's lane waste (128/Co) exceeds that —
        # e.g. 1x1 single-channel convs would inflate 64x for an 8x win.
        if Co * (K + s - 1) ** 2 > 128 * K ** 2:
            continue
        return conv_s2d(xp, kernel, s)
    return None


def dispatch_conv_transpose(x, kernel, stride, pad_lo, pad_hi):
    """Fast path for ConvTranspose, or None for the lhs_dilation lowering."""
    if not ENABLED or stride < 2:
        return None
    t = stride
    H, W = x.shape[1], x.shape[2]
    K = kernel.shape[0]
    Ho = t * (H - 1) + 1 + pad_lo + pad_hi - (K - 1)
    Wo = t * (W - 1) + 1 + pad_lo + pad_hi - (K - 1)
    if Ho <= 0 or Wo <= 0 or Ho % t or Wo % t:
        return None
    try:
        return conv_transpose_d2s(x, kernel, stride, pad_lo, pad_hi)
    except ValueError:
        return None
