"""Fused ResNet-generator block as one Pallas TPU kernel (inference).

**Kept as a documented NEGATIVE result — dispatch is OFF by default.**

The hypothesis: the 9 residual blocks are ~75% of generator inference time;
XLA spends ~0.8 ms/block/batch32 on the instance-norm / ReLU / reflect-pad
elementwise chain (conv-output HBM write + stats read + normalize read), so
a kernel keeping one image's block resident in VMEM (reflect-pad, two 3x3
convs as shifted (Hc*(W+2), C) x (C, C) MXU dots, both INs, ReLU, residual)
should save most of it.

Measured on v5e (batch 32, 64x64x256; docs/PERF.md "fused block" section):
XLA block 2.78 ms, this kernel 3.88 ms, this kernel with the INs removed
3.67 ms. The IN fusion does save (only) ~0.2 ms, but the kernel's convs run
at ~44% MXU vs XLA's ~81%: Mosaic cannot K-stack the taps into one deep dot
(values with different sublane offsets cannot be lane-concatenated, and
`pltpu.roll` is unimplemented for bf16), so each tap is a shallow K=256 dot
plus an unaligned f32 slice-add (~150 MB/image of VPU traffic). The 16 MB
scoped-VMEM limit (grid IO blocks are double-buffered; Mosaic's stack
accounting runs ~2x the live temporaries) caps chunk sizes, and manual-DMA
IO to free VMEM for bigger chunks (Hc=16) measured *slower* (weight
re-fetch + serialized IO). XLA's conv emitter wins this op; the generator
keeps the XLA path.

Numerics (verified in tests, interpret mode): bf16 operands, f32 dot
accumulation, conv results rounded to bf16 before the (f32, two-pass) IN
statistics — at least as close to the f32 reference as XLA's bf16 path.

Reference: ResnetBlock at
/root/reference/mdir/components/model/network/p2p_networks.py:339-378.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = False  # measured slower than XLA's lowering — see module docstring
_FORCE_INTERPRET = False  # test hook: dispatch on CPU via interpret mode


def set_enabled(flag):
    """Disable to bisect perf/numerics issues (mirrors ops.fastconv)."""
    global _ENABLED
    _ENABLED = bool(flag)


def set_force_interpret(flag):
    """Test hook: let `eligible` pass off-TPU and run the kernel interpreted."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(flag)


def _row_chunk(H, W, C):
    """Rows per chunk so the transient f32 dot result stays ~<=2.2 MB —
    larger chunks mean larger MXU dots (M = Hc*(W+2))."""
    budget = 1.1 * 2 ** 20
    rows = max(8, int(budget / ((W + 2) * C * 4)) // 8 * 8)
    while H % rows:
        rows -= 8
    return max(rows, 8)


def _conv3x3_into(xpad, w_ref, b_ref, out, *, H, W, C, Hc):
    """3x3 VALID conv over the padded scratch into the bf16 VMEM buffer
    `out`. For each row chunk and tap (dy, dx): one (Hc*(W+2), C) x (C, C)
    MXU dot over the dy-shifted rows, then the dx-offset columns of the f32
    result accumulate (the only formulation Mosaic lowers well — see module
    docstring). f32 accumulation, rounded to bf16 (+bias, bf16 — the XLA
    rounding points)."""
    Wp = W + 2
    bias = b_ref[...].reshape(1, 1, C).astype(jnp.bfloat16)
    for h0 in range(0, H, Hc):
        acc = jnp.zeros((Hc, W, C), jnp.float32)
        for dy in range(3):
            F = xpad[h0 + dy:h0 + dy + Hc, :, :].reshape(Hc * Wp, C)
            for dx in range(3):
                P = jnp.dot(F, w_ref[dy, dx],
                            preferred_element_type=jnp.float32)
                acc = acc + P.reshape(Hc, Wp, C)[:, dx:dx + W, :]
        out[h0:h0 + Hc, :, :] = acc.astype(jnp.bfloat16) + bias


def _in_stats(buf, *, H, W, C, Hc):
    """Two-pass per-channel spatial mean/var (f32) over the bf16 (H, W, C)
    buffer — torch InstanceNorm2d biased-variance semantics."""
    n = jnp.float32(H * W)
    s = jnp.zeros((1, C), jnp.float32)
    for h0 in range(0, H, Hc):
        v = buf[h0:h0 + Hc, :, :].astype(jnp.float32).reshape(Hc * W, C)
        s = s + jnp.sum(v, axis=0, keepdims=True)
    mean = s / n
    ss = jnp.zeros((1, C), jnp.float32)
    for h0 in range(0, H, Hc):
        v = buf[h0:h0 + Hc, :, :].astype(jnp.float32).reshape(Hc * W, C)
        d = v - mean
        ss = ss + jnp.sum(d * d, axis=0, keepdims=True)
    return mean, ss / n


def _reflect_cols(xpad, *, H, W):
    """Fill the left/right reflect columns (incl. corners) from the already
    written rows."""
    xpad[:, 0:1, :] = xpad[:, 2:3, :]
    xpad[:, W + 1:W + 2, :] = xpad[:, W - 1:W, :]


def _kernel(x_hbm, w1_hbm, b1_ref, w2_hbm, b2_ref, o_hbm,
            xraw, xpad, obuf, wbuf, sem_in, sem_out, sem_w, *, H, W, C, eps):
    # Only one conv's weights are resident at a time (wbuf) — both staying
    # in VMEM busts the 16 MB scoped limit by ~240 KB at Hc=16.
    Hc = _row_chunk(H, W, C)
    i = pl.program_id(0)

    cp_in = pltpu.make_async_copy(x_hbm.at[i], xraw, sem_in)
    cp_in.start()
    cp_w1 = pltpu.make_async_copy(w1_hbm, wbuf, sem_w)
    cp_w1.start()
    cp_in.wait()

    # ---- reflect-pad x into xpad (pad=1: row/col 1 mirrored outward)
    x = xraw[...]
    xpad[1:H + 1, 1:W + 1, :] = x
    xpad[0:1, 1:W + 1, :] = x[1:2, :, :]
    xpad[H + 1:H + 2, 1:W + 1, :] = x[H - 2:H - 1, :, :]
    _reflect_cols(xpad, H=H, W=W)

    # ---- conv1 -> obuf (bf16)
    cp_w1.wait()
    _conv3x3_into(xpad, wbuf, b1_ref, obuf, H=H, W=W, C=C, Hc=Hc)
    cp_w2 = pltpu.make_async_copy(w2_hbm, wbuf, sem_w)
    cp_w2.start()  # overlaps the IN+ReLU phase

    # ---- IN + ReLU -> back into xpad interior, rebuild borders
    mean, var = _in_stats(obuf, H=H, W=W, C=C, Hc=Hc)
    inv = jax.lax.rsqrt(var + jnp.float32(eps)).reshape(1, 1, C)
    mu = mean.reshape(1, 1, C)
    for h0 in range(0, H, Hc):
        v = obuf[h0:h0 + Hc, :, :].astype(jnp.float32)
        y = jnp.maximum((v - mu) * inv, 0.0).astype(jnp.bfloat16)
        xpad[h0 + 1:h0 + Hc + 1, 1:W + 1, :] = y
    xpad[0:1, 1:W + 1, :] = xpad[2:3, 1:W + 1, :]
    xpad[H + 1:H + 2, 1:W + 1, :] = xpad[H - 1:H, 1:W + 1, :]
    _reflect_cols(xpad, H=H, W=W)

    # ---- conv2 -> obuf, IN, residual add, DMA out
    cp_w2.wait()
    _conv3x3_into(xpad, wbuf, b2_ref, obuf, H=H, W=W, C=C, Hc=Hc)
    mean2, var2 = _in_stats(obuf, H=H, W=W, C=C, Hc=Hc)
    inv2 = jax.lax.rsqrt(var2 + jnp.float32(eps)).reshape(1, 1, C)
    mu2 = mean2.reshape(1, 1, C)
    for h0 in range(0, H, Hc):
        v = obuf[h0:h0 + Hc, :, :].astype(jnp.float32)
        y = (v - mu2) * inv2 + xraw[h0:h0 + Hc, :, :].astype(jnp.float32)
        obuf[h0:h0 + Hc, :, :] = y.astype(jnp.bfloat16)

    cp_out = pltpu.make_async_copy(obuf, o_hbm.at[i], sem_out)
    cp_out.start()
    cp_out.wait()


def fused_resblock(x, w1, b1, w2, b2, *, eps=1e-5, interpret=None):
    """x: (N, H, W, C) bf16; w: (3, 3, C, C); b: (C,). Returns (N, H, W, C)
    bf16 — reflect-pad 3x3 conv + IN + ReLU + reflect-pad 3x3 conv + IN + x."""
    if interpret is None:
        interpret = _FORCE_INTERPRET
    N, H, W, C = x.shape
    bf = jnp.bfloat16
    w1 = w1.astype(bf)
    w2 = w2.astype(bf)
    b1 = b1.astype(bf).reshape(1, C)
    b2 = b2.astype(bf).reshape(1, C)
    kernel = functools.partial(_kernel, H=H, W=W, C=C, eps=eps)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            any_spec,  # x stays in HBM; DMA'd per grid step
            any_spec,  # w1 — DMA'd into wbuf when needed
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            any_spec,  # w2
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), bf),
        scratch_shapes=[
            pltpu.VMEM((H, W, C), bf),          # xraw (residual source)
            pltpu.VMEM((H + 2, W + 2, C), bf),  # reflect-padded activation
            pltpu.VMEM((H, W, C), bf),          # conv/output buffer
            pltpu.VMEM((3, 3, C, C), bf),       # active conv weights
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x.astype(bf), w1, b1, w2, b2)


def _vmem_budget_ok(H, W, C):
    """Approximate compile-time VMEM estimate against the 16 MB scoped limit
    (Mosaic's accounting runs ~1 MB above this estimate)."""
    Hc = _row_chunk(H, W, C)
    Wp = W + 2
    scratch = (H * W * C * 2) * 2 + (H + 2) * Wp * C * 2
    weights = 9 * C * C * 2  # one conv's weights resident at a time
    # Mosaic keeps ~2x (acc + dot result + sliced view) live on its stack
    transient = 2 * (Hc * W * C * 4 + Hc * Wp * C * 4)
    return scratch + weights + transient < 14.5 * 2 ** 20


def eligible(x_shape, dtype, *, train, use_dropout, padding_type, norm_type,
             use_bias):
    """Static dispatch check for the fused block."""
    if not _ENABLED or train or use_dropout or not use_bias:
        return False
    if padding_type != "reflect" or norm_type != "instance":
        return False
    if jnp.dtype(dtype) != jnp.bfloat16:
        return False
    if len(x_shape) != 4:
        return False
    N, H, W, C = x_shape
    if C % 128 or H % 8 or W < 8 or H < 8:
        return False
    if jax.default_backend() != "tpu" and not _FORCE_INTERPRET:
        return False
    return _vmem_budget_ok(H, W, C)
