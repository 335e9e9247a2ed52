"""Pallas TPU kernel for the MXU-starved low VGG blocks (3x3 SAME convs).

Why: XLA's conv emitter runs conv1_2 (64ch @1024^2) at **14% MXU** and the
128ch block-2 convs at ~40% (docs/PERF.md "descriptor extraction profile").
Every XLA-level reformulation (s2d, wfold) wins in isolation and loses in
composition because the folded layouts poison neighboring ops' layout
assignment (round-2 "composition trap"). A pallas_call is opaque to layout
assignment — operands and results are forced to default NHWC layouts — so
the fold can live *inside* the kernel where XLA cannot see it.

Formulation (lane-folding, no im2col):
- The caller zero-pads spatially (the conv is SAME) and bitcast-reshapes
  (W+2, 64) -> ((W+2)/2, 128): adjacent column PAIRS become 128 lanes. This
  is free in NHWC (W and C are memory-adjacent).
- With the pad included in the fold, an output pair y[2p], y[2p+1] reads
  exactly TWO folded input columns (p, p+1), so each dy tap needs only two
  (128,128) dot matrices:
      B1[dy] = [[K[dy,0], 0      ],     B2[dy] = [[K[dy,2], K[dy,1]],
                [K[dy,1], K[dy,0]]]               [0,       K[dy,2]]]
  6 dots of (M,128)x(128,128) per row-chunk, FLOP inflation 24/18 = 1.33x,
  full 128-lane contraction AND 128-lane output (vs 64/128 both ways for the
  unfolded conv — the root cause of XLA's 14%).
- C=128 needs no fold: 9 dots (one per tap), zero inflation, same kernel
  with G=3 column groups.
- Column alignment: group g's result is shifted by g folded columns — a
  <=2-sublane-offset slice on the f32 dot result (cheap; the round-1
  resblock kernel's losses came from *unaligned lane* work, not this).
- Row halo: the grid walks Hc-row output chunks; the kernel receives the
  padded input block i plus a thin 2-row block at rows [(i+1)*Hc, ...) and
  assembles a contiguous (Hc+2)-row band in VMEM scratch (the round-1
  resblock access pattern, which Mosaic lowers well) — no manual DMA,
  automatic double-buffering, only (1 + 2/Hc)x input HBM traffic.

Numerics: bf16 operands, f32 accumulation, bias+ReLU applied in f32 —
matches XLA's own TPU conv lowering (single-pass bf16 with f32 accumulate;
PERF.md measured f32==bf16 per-block).

Reference semantics: torch.nn.Conv2d(C, C, 3, padding=1) as used by VGG16's
features in /root/reference/mdir/external/cirtorch/networks/
imageretrievalnet.py (OUTPUT_DIM/vgg16 backbone).

VERDICT (measured on chip, scripts/perf_vggconv_pallas.py): **REJECTED for
dispatch**. conv1_2 @1024^2: 25.4 ms Pallas vs 11.4 ms XLA (12 TF/s
exact-basis); conv2 @512^2x128: 15.7 vs 4.0 ms. Even with full 128-lane
contraction the dots-plus-slices form loses to XLA's conv emitter by 2.2-4x
— consistent with the round-1 resblock kernel (44% vs 81% MXU). Kept as a
parity-tested engineering record; `_ENABLED = False` below.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = False  # measured 2.2-4x slower than XLA's conv emitter (docstring)
_FORCE_INTERPRET = False  # test hook: run the kernel interpreted off-TPU


def set_enabled(flag):
    """Disable to bisect perf/numerics issues (mirrors ops.fastconv)."""
    global _ENABLED
    _ENABLED = bool(flag)


def set_force_interpret(flag):
    """Test hook: let `eligible` pass off-TPU and run the kernel interpreted."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(flag)


def _fold_weights(w, fold):
    """(3, 3, C, C) HWIO -> (3, G, 128, 128) folded dot matrices.

    fold=2 (C=64): G=2 groups [B1, B2] as in the module docstring.
    fold=1 (C=128): G=3 groups, group g = K[:, g] directly.
    """
    k = w.astype(jnp.float32)
    if fold == 1:
        return k  # (3, 3=G, 128, 128): group g maps padded col w+g -> out w
    C = k.shape[2]
    z = jnp.zeros((C, C), jnp.float32)
    rows = []
    for dy in range(3):
        k0, k1, k2 = k[dy, 0], k[dy, 1], k[dy, 2]
        b1 = jnp.concatenate([jnp.concatenate([k0, z], 1),
                              jnp.concatenate([k1, k0], 1)], 0)
        b2 = jnp.concatenate([jnp.concatenate([k2, k1], 1),
                              jnp.concatenate([z, k2], 1)], 0)
        rows.append(jnp.stack([b1, b2]))
    return jnp.stack(rows)  # (3, 2, 128, 128)


def _kernel(xcur, xnxt, w_ref, b_ref, o_ref, band, acc, *, Hc, Wq, Wo, G,
            relu):
    """One (n, i) grid step: out rows [i*Hc, (i+1)*Hc).

    xcur: (1, Hc, Wq, 128) padded-input rows [i*Hc, (i+1)*Hc);
    xnxt: (1, 2, Wq, 128) padded-input rows [(i+1)*Hc, (i+1)*Hc + 2);
    w_ref: (3, G, 128, 128); b_ref: (1, 128); o_ref: (1, Hc, Wo, 128);
    band: VMEM scratch (Hc + 2, Wq, 128) bf16; acc: (Hc, Wo, 128) f32.

    Accumulation goes through the `acc` VMEM ref (load-add-store per dot):
    a functional value chain kept ~7 (Hc, Wq, 128)-f32 temporaries live on
    Mosaic's stack and blew the 16 MB scoped-VMEM limit by 5.4 MB at Hc=8.
    """
    band[0:Hc] = xcur[0]
    band[Hc:Hc + 2] = xnxt[0]
    first = True
    for dy in range(3):
        F = band[dy:dy + Hc, :, :].reshape(Hc * Wq, 128)
        for g in range(G):
            P = jnp.dot(F, w_ref[dy, g], preferred_element_type=jnp.float32)
            P = P.reshape(Hc, Wq, 128)[:, g:g + Wo, :]
            acc[...] = P if first else acc[...] + P
            first = False
    y = acc[...] + b_ref[0].astype(jnp.float32).reshape(1, 1, 128)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _plan(H, W, C, out_bytes):
    """(fold, G, Hc) for a supported shape within VMEM budget, else None."""
    if C == 64:
        fold, G = 2, 2
    elif C == 128:
        fold, G = 1, 3
    else:
        return None
    if W % fold:
        return None
    Wq = (W + 2) // fold
    Wo = W // fold
    for Hc in (8, 4, 2):
        if H % Hc:
            continue
        # double-buffered IO blocks + band/acc scratch + ~4x the f32 dot
        # result on Mosaic's stack (calibrated against the compiler's
        # scoped-VMEM OOM report: 21.4 MB at Hc=8/Wq=513 pre-acc-scratch)
        io = 2 * (Hc * Wq * 128 * 2 + 2 * Wq * 128 * 2 + Hc * Wo * 128 * out_bytes)
        scratch = (Hc + 2) * Wq * 128 * 2 + Hc * Wo * 128 * 4
        transient = 4 * Hc * Wq * 128 * 4
        if io + scratch + transient + 3 * G * 128 * 128 * 2 < 14.0 * 2 ** 20:
            return fold, G, Hc
    return None


def conv3x3_same(x, w, b=None, *, relu=False, out_dtype=None, interpret=None):
    """SAME 3x3 stride-1 conv (+bias+ReLU) via the lane-folded Pallas kernel.

    x: (N, H, W, C) with C in {64, 128} and Cout == C; w: (3, 3, C, C) HWIO.
    Returns (N, H, W, C) in out_dtype (default x.dtype). bf16 compute.
    """
    if interpret is None:
        interpret = _FORCE_INTERPRET
    N, H, W, C = x.shape
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    plan = _plan(H, W, C, out_dtype.itemsize)
    assert plan is not None, (x.shape, out_dtype)
    fold, G, Hc = plan
    bf = jnp.bfloat16

    Wq = (W + 2) // fold
    Wo = W // fold
    # +1 spatial halo all around; bottom-extend so the padded height is a
    # multiple of Hc AND even (for the 2-row xnxt blocking). The junk rows
    # are zeros and are never read: out block i touches padded rows <= H+1.
    Hp = -((H + 2) // -Hc) * Hc
    if Hp % 2:
        Hp += Hc
    xp = jnp.pad(x.astype(bf), ((0, 0), (1, Hp - H - 1), (1, 1), (0, 0)))
    xf = xp.reshape(N, Hp, Wq, 128)
    wf = _fold_weights(w, fold).astype(bf)
    if b is None:
        b = jnp.zeros((C,), jnp.float32)
    bfold = jnp.tile(b.astype(jnp.float32), fold).reshape(1, 128)

    kernel = functools.partial(_kernel, Hc=Hc, Wq=Wq, Wo=Wo, G=G, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=(N, H // Hc),
        in_specs=[
            pl.BlockSpec((1, Hc, Wq, 128), lambda n, i: (n, i, 0, 0)),
            # rows [(i+1)*Hc, (i+1)*Hc + 2) as a 2-row block (Hc is even)
            pl.BlockSpec((1, 2, Wq, 128),
                         lambda n, i: (n, (i + 1) * (Hc // 2), 0, 0)),
            pl.BlockSpec((3, G, 128, 128), lambda n, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, 128), lambda n, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Hc, Wo, 128), lambda n, i: (n, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, Wo, 128), out_dtype),
        scratch_shapes=[pltpu.VMEM((Hc + 2, Wq, 128), bf),
                        pltpu.VMEM((Hc, Wo, 128), jnp.float32)],
        interpret=interpret,
    )(xf, xf, wf, bfold)
    return out.reshape(N, H, W, C)


@functools.lru_cache(maxsize=None)
def _vjp_conv(relu, bias_dtype_str, out_dtype_str):
    """custom_vjp wrapper: Pallas forward, standard XLA-conv backward.

    pallas_call has no autodiff rule; without this, any training graph
    touching a dispatched conv (HED/UNet 64-128ch 3x3 layers) would fail to
    trace. The backward matches what XLA derives for a SAME conv: masked-
    by-relu cotangent, dx = conv(g, flip(w) io-swapped), dw via the
    batch<->feature transpose trick, db = sum(g).
    """
    out_dtype = jnp.dtype(out_dtype_str)

    @jax.custom_vjp
    def f(x, w, b):
        return conv3x3_same(x, w, b, relu=relu, out_dtype=out_dtype)

    def fwd(x, w, b):
        y = f(x, w, b)
        return y, (x, w, y if relu else None)

    def bwd(res, g):
        x, w, y = res
        if relu:
            g = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
        wf = jnp.swapaxes(jnp.flip(w, (0, 1)), 2, 3)
        dx = jax.lax.conv_general_dilated(
            g, wf.astype(g.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dw = jax.lax.conv_general_dilated(
            jnp.transpose(xp, (3, 1, 2, 0)),
            jnp.transpose(g, (1, 2, 0, 3)).astype(xp.dtype),
            (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        dw = jnp.transpose(dw, (1, 2, 0, 3))
        db = None
        if bias_dtype_str is not None:
            db = jnp.sum(g, (0, 1, 2)).astype(jnp.dtype(bias_dtype_str))
        return dx.astype(x.dtype), dw.astype(w.dtype), db

    f.defvjp(fwd, bwd)
    return f


def conv3x3_same_ad(x, w, b=None, *, relu=False, out_dtype=None):
    """Differentiable entry point for model-layer dispatch."""
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    bias_dtype = None if b is None else jnp.dtype(b.dtype).name
    fn = _vjp_conv(bool(relu), bias_dtype, out_dtype.name)
    return fn(x, w, b)


def eligible(x_shape, cin, cout, kernel_size, stride, dilation,
             out_dtype=jnp.float32):
    """Static dispatch check (called on the UNPADDED conv input shape)."""
    if not _ENABLED:
        return False
    if kernel_size != 3 or stride != 1 or dilation != 1:
        return False
    if cin != cout or cin not in (64, 128):
        return False
    if len(x_shape) != 4:
        return False
    if jax.default_backend() != "tpu" and not _FORCE_INTERPRET:
        return False
    N, H, W, C = x_shape
    return _plan(H, W, C, jnp.dtype(out_dtype).itemsize) is not None
