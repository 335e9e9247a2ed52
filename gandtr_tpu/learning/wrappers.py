"""Functional network wrappers, staged inside jit.

TPU-first redesign of /root/reference/mdir/components/data/wrapper.py: each
wrapper is a pair of pure functions `pre(x, ctx) -> (x, meta)` /
`post(y, ctx, meta) -> y` composed around a model apply, all traceable by XLA.
Data-dependent gating (the md5-hash GAN-augmentation switch) is split: the hash
decision runs on host per image *name* (deterministic, as in the reference),
producing a boolean mask that the jitted graph consumes via `jnp.where` —
no Python branching on device data.

Batched convention: everything takes NHWC batches (the reference operates on
single CHW images inside Python loops; here the batch dimension replaces the
loop).
"""
import hashlib
import json
import re
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.ops.resize import scale_resize
from gandtr_tpu.ops import clahe as clahe_ops


def _as_chan(x):
    """[c1, c2, c3] -> (1, 1, 1, 3) broadcastable constant."""
    a = jnp.asarray(x, jnp.float32)
    if a.ndim == 1:
        a = a[None, None, None, :]
    return a


class ScaleList(list):
    """Marker: a wrapper expanded the input into per-scale batches; the model
    forward maps over it (plain lists pass through untouched — e.g. the
    feature lists consumed by PatchSampleF)."""


class Wrapper:
    def pre(self, x, ctx):
        return x, None

    def post(self, y, ctx, meta):
        return y


class ReflectPadMakeDivisible(Wrapper):
    """Pad H, W up to a multiple (replicate-pad), crop back after
    (wrapper.py:68-94). Padding amounts are static given the input shape."""

    def __init__(self, divisible_by):
        self.divisible_by = int(divisible_by)

    def pre(self, x, ctx):
        h, w = x.shape[1], x.shape[2]
        d = self.divisible_by
        pady = (-(h // -d)) * d - h
        padx = (-(w // -d)) * d - w
        pad = (pady // 2, pady - pady // 2, padx // 2, padx - padx // 2)
        x = jnp.pad(x, ((0, 0), (pad[0], pad[1]), (pad[2], pad[3]), (0, 0)),
                    mode="edge")
        return x, pad

    def post(self, y, ctx, pad):
        t, b, l, r = pad
        return y[:, t:y.shape[1] - b or None, l:y.shape[2] - r or None, :]


def metadata_name(path):
    """The name the reference hashes: basename WITHOUT the (last) extension
    (datahelpers.py:44 sets metadata['name'] = basename.rsplit('.', 1)[0]).
    Identical for extension-less retrieval-SfM cids; diverges on .jpg lists
    if the extension is left on — found by reading the metadata chain.

    Lazy h5 paths (`store.h5#cid`) hash the per-image KEY: the reference's
    h5 branch keeps per-cid names (traindataset.py:67-70), so hashing the
    store's basename would collapse the md5 augmentation gate to one draw
    for the whole dataset."""
    import os
    if ".h5#" in path:
        path = path.split("#", 1)[1]
    return os.path.basename(path).rsplit(".", 1)[0]


def cir_hash_passthrough(name, probability):
    """Deterministic md5-based gating (wrapper.py:137-143): last 4 hex digits
    of md5(name) as a uniform sample. Host-side; feeds a mask into jit.
    `name` must be the metadata name (see metadata_name), not a file path."""
    digits = 4
    rand = int(hashlib.md5(name.encode("utf8")).hexdigest()[-digits:], 16) / (16 ** digits)
    return rand < probability


class CirRatioPassThrough(Wrapper):
    """GAN-augmentation switch (wrapper.py:120-146): an image passes through
    the wrapped model only if its label matches and its name-hash falls under
    the ratio. In the jitted graph this is a per-image boolean `mask`; the
    model always runs (SPMD-friendly) and `jnp.where` selects output vs input.
    """

    def __init__(self, ratio_through, image_label):
        self.probability = float(ratio_through)
        self.image_label = re.compile(image_label)

    def mask_for(self, names, labels):
        """Host: compute the per-image pass mask from names/labels."""
        out = []
        for name, label in zip(names, labels):
            if isinstance(label, (list, tuple)) and len(label) == 1:
                label = label[0]
            out.append(bool(self.image_label.match(label))
                       and cir_hash_passthrough(name, self.probability))
        return np.asarray(out)

    def pre(self, x, ctx):
        return x, x  # meta = original input

    def post(self, y, ctx, original):
        mask = ctx["pass_mask"]  # (N,) bool
        st = ctx.get("mask_state")
        if st is not None and st.active:
            # exact padded-bucket mode: pass-through rows keep the ORIGINAL
            # valid rectangle, augmented rows the generator-output one
            from gandtr_tpu.ops.maskprop import MaskState
            st_in = ctx["mask_state_in"]
            m = jnp.asarray(mask)
            hw = (jnp.where(m, st.hw[0], st_in.hw[0]),
                  jnp.where(m, st.hw[1], st_in.hw[1]))
            ctx["mask_state"] = MaskState(hw)
        return jnp.where(jnp.asarray(mask)[:, None, None, None], y, original)


class RandomPassThrough(Wrapper):
    """Probabilistic model bypass (wrapper.py:97-117). Functional form: the
    model always runs; a per-batch bernoulli mask (from ctx["rng"] or a host
    mask) selects model output vs input — SPMD-uniform like
    CirRatioPassThrough."""

    def __init__(self, probability_through):
        self.probability = float(probability_through)

    def pre(self, x, ctx):
        return x, x

    def post(self, y, ctx, original):
        mask = ctx.get("pass_mask")
        if mask is None:
            rng = ctx["rng"]
            mask = jax.random.bernoulli(rng, self.probability,
                                        (y.shape[0],))
        return jnp.where(jnp.asarray(mask)[:, None, None, None], y, original)


class FakeBatch(Wrapper):
    """Tuple-flattening batch emulation (wrapper.py:266-279): a (T, S, ...)
    tuple batch flattens to (T*S, ...) around the model and restores after.
    In the jitted steps this layout is native; the named wrapper exists for
    config-driven composition parity."""

    def pre(self, x, ctx):
        if x.ndim <= 4:
            # plain image batch passes through — the reference only flattens
            # 2-D LISTS of tensors (wrapper.py:295-305 preprocess returns the
            # input unchanged otherwise); caught by the micro-train oracle:
            # mining extraction feeds (N, H, W, C) through the same wrapped
            # net and must not fold the batch into height
            return x, None
        shape = x.shape
        return x.reshape((-1,) + shape[2:]), shape

    def post(self, y, ctx, shape):
        if shape is None:
            return y
        return y.reshape(shape[:2] + y.shape[1:])


class CirFakeTupleBatch(FakeBatch):
    """Tuple flattening + descriptor column assembly (wrapper.py:282-305):
    output descriptors return as (T, S, D) blocks."""


class MeanStdPost(Wrapper):
    """Distribution adaptation after the model (wrapper.py:149-190)."""

    def __init__(self, input_meanstd, output_meanstd):
        if isinstance(input_meanstd, str):
            input_meanstd = json.loads(input_meanstd)
        if isinstance(output_meanstd, str):
            output_meanstd = json.loads(output_meanstd)
        if any(x == 0 for x in np.atleast_1d(input_meanstd[1])) or \
           any(x == 0 for x in np.atleast_1d(output_meanstd[1])):
            raise ValueError("Some std element is zero, leading to zero division.")
        self.im = [_as_chan(v) for v in input_meanstd]
        self.om = [_as_chan(v) for v in output_meanstd]

    def _adapt(self, x):
        x = x * self.im[1] + self.im[0]
        return (x - self.om[0]) / self.om[1]

    def post(self, y, ctx, meta):
        return self._adapt(y)


class MeanStdPre(MeanStdPost):
    def pre(self, x, ctx):
        return self._adapt(x), None

    def post(self, y, ctx, meta):
        return y


class RgbToBgrPre(Wrapper):
    """RGB->BGR channel flip before the model (wrapper.py:351-364)."""

    def pre(self, x, ctx):
        return x[..., ::-1], None


class ClahePost(Wrapper):
    """On-device CLAHE between generator and embedding net (wrapper.py:325-348).

    The reference round-trips GPU→CPU→cv2→GPU per image; here the bit-exact
    JAX CLAHE runs inside the same compiled graph (the BASELINE.json
    "fused preprocessing" north star).
    """

    def __init__(self, meanstd, clip_limit=4, grid_size=8, colorspace="lab"):
        if isinstance(meanstd, str):
            meanstd = json.loads(meanstd)
        self.meanstd = [_as_chan(v) for v in meanstd]
        self.clip_limit = float(clip_limit)
        self.grid_size = int(grid_size)
        self.colorspace = colorspace

    def post(self, y, ctx, meta):
        y = y * self.meanstd[1] + self.meanstd[0]  # unnormalize to [0,1]
        st = ctx.get("mask_state")
        if st is not None and st.active:
            # exact padded-bucket mode: CLAHE tile geometry computed from
            # each image's valid rectangle (ops/clahe.py clahe_u8_masked) —
            # identical to the reference's per-image cv2 call on the exact
            # shape; band pixels are undefined and re-masked downstream
            h, w = st.hw
            # lax.map, not vmap: measured on chip — vmap compiled SLOWER
            # (122 vs 109 ms finetune T=1) and flips ±1 u8 ties under CPU
            # jit (FMA contraction past the barriers); serial is faster AND
            # bit-exact (docs/PERF.md round-3 masked-cost note)
            y = jax.lax.map(
                lambda args: clahe_ops.image_clahe_masked(
                    args[0], (args[1], args[2]), self.clip_limit,
                    self.grid_size, self.colorspace),
                (y, h, w))
        else:
            # lax.map (scan), not vmap: the TPU CLAHE path is a Pallas kernel
            # and sequential mapping avoids pallas_call batching rules
            y = jax.lax.map(lambda im: clahe_ops.image_clahe(
                im, self.clip_limit, self.grid_size, self.colorspace), y)
        return (y - self.meanstd[0]) / self.meanstd[1]


class CirMultiscaleAggregation(Wrapper):
    """Multi-scale descriptor aggregation (wrapper.py:197-263): run the model
    at each scale, p-power-mean the descriptors, renormalize.

    Functional shape: `pre` produces a list of scaled batches; the composed
    forward maps the model over them; `post` aggregates. GeM-p is read from
    ctx["msp"] (host extracts `pool.p` when the model is an unwhitened GeM net).
    """

    SCALE_SETS = {"True": True, "False": False, "ms": True, "ss": False,
                  "sms5": [1, 1 / np.sqrt(2), np.sqrt(2), 1 / 2, 2],
                  "sms": [1, 1 / np.sqrt(2), np.sqrt(2)]}

    def __init__(self, scales=True):
        if isinstance(scales, str):
            scales = self.SCALE_SETS[scales]
        if isinstance(scales, bool):
            scales = [1, 1 / np.sqrt(2), 1 / 2] if scales else [1]
        self.scales = list(scales)

    def pre(self, x, ctx):
        st = ctx.get("mask_state")
        if st is not None and st.active:
            # exact padded-bucket mode: per-image valid-rect resize
            # (ops/resize.py masked_scale_resize) and a per-scale mask the
            # module pools with — (x, mask) pairs through the forward
            from gandtr_tpu.ops.resize import masked_scale_resize
            items = []
            for s in self.scales:
                if s == 1:
                    xs, sts = x, st
                else:
                    xs, sts = masked_scale_resize(x, st, s)
                items.append((xs, sts.mask(xs.shape[1], xs.shape[2],
                                           jnp.float32)))
            return ScaleList(items), None
        if len(self.scales) == 1:
            return ScaleList([x]), None
        return ScaleList([scale_resize(x, s) if s != 1 else x
                          for s in self.scales]), None

    def post(self, descs, ctx, meta):
        """descs: list of (N, D) descriptor batches, one per scale."""
        # single-scale keeps msp=1 like the reference (wrapper.py:249: the
        # GeM-p rule applies only when len(scales) > 1)
        msp = ctx.get("msp", 1.0) if len(self.scales) > 1 else 1.0
        v = sum(d ** msp for d in descs) / len(self.scales)
        v = v ** (1.0 / msp)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def multiscale_msp(model_cfg, variables):
    """The reference's multiscale aggregation power (wrapper.py:249-252):
    GeM p for a PLAIN GeM net — pooling 'gem', no model whitening head, not
    regional — else 1. The eval-time Lw wrapper does NOT disable it (the
    reference checks the model's own meta['whitening']). Single callers'
    single-scale case is handled inside CirMultiscaleAggregation.post."""
    model_cfg = dict(model_cfg or {})
    params = (variables or {}).get("params", {})
    if (model_cfg.get("pooling", "gem") == "gem"
            and not model_cfg.get("whitening")
            and not model_cfg.get("regional")
            and "gem_p" in params):
        return float(np.asarray(params["gem_p"])[0])
    return 1.0


class CirtorchWhiten(Wrapper):
    """Learned-whitening projection (wrapper.py:308-322): X = P(x - m), L2."""

    def __init__(self, P, m, dimensions=None):
        self.P = jnp.asarray(P, jnp.float32)
        self.m = jnp.asarray(m, jnp.float32).reshape(-1)
        self.dimensions = dimensions or self.P.shape[0]

    def post(self, y, ctx, meta):
        # y: (N, D) -> (N, dimensions)
        X = (y - self.m[None, :]) @ self.P[:self.dimensions, :].T
        return X / (jnp.linalg.norm(X, axis=-1, keepdims=True) + 1e-6)


WRAPPERS_LABELS = {
    "reflectpad_divisible": ReflectPadMakeDivisible,
    "random_pass_through": RandomPassThrough,
    "fakebatch": FakeBatch,
    "cirfaketuplebatch": CirFakeTupleBatch,
    "cir_ratio_pass_through": CirRatioPassThrough,
    "meanstd_post": MeanStdPost,
    "meanstd_pre": MeanStdPre,
    "cirmultiscale": CirMultiscaleAggregation,
    "cirwhiten": CirtorchWhiten,
    "clahepost": ClahePost,
    "rgb2bgr_pre": RgbToBgrPre,
}


def split_wrapper_string(s):
    """Split `name:arg:arg,name2:...` respecting brackets (utils.py:95-112)."""
    parts, depth, cur = [], 0, ""
    for ch in s:
        if ch in "[({":
            depth += 1
        elif ch in "])}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        parts.append(cur)
    return parts


def initialize_wrappers(net_wrappers):
    """Parse a wrapper spec (string DSL or sorted dict) into a list
    (wrapper.py:384-396)."""
    if not net_wrappers:
        return []
    if isinstance(net_wrappers, str):
        wraps = []
        for wrap in [x.strip() for x in split_wrapper_string(net_wrappers) if x.strip()]:
            wname, *args = _split_args(wrap)
            wraps.append(WRAPPERS_LABELS[wname](*args))
        return wraps
    return [WRAPPERS_LABELS[k.split("_", 1)[1]](**net_wrappers[k])
            for k in sorted(net_wrappers)]


def _split_args(wrap):
    """name:arg:arg with bracket awareness."""
    parts, depth, cur = [], 0, ""
    for ch in wrap:
        if ch in "[({":
            depth += 1
        elif ch in "])}":
            depth -= 1
        if ch == ":" and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    return parts


def apply_wrapped(wrappers, forward, x, ctx=None):
    """Compose pre/post around a forward fn (wrapper Compose, wrapper.py:15-49).

    Handles the multiscale list case: if a `pre` returns a list, the forward
    maps over it.
    """
    ctx = ctx or {}
    metas = []
    for w in wrappers:
        x, meta = w.pre(x, ctx)
        metas.append(meta)
    if isinstance(x, ScaleList):
        y = [forward(xi) for xi in x]
    else:
        y = forward(x)
    for w, meta in reversed(list(zip(wrappers, metas))):
        y = w.post(y, ctx, meta)
    return y
