"""Host-side preprocessing pipeline with the reference's transform DSL.

Mirrors /root/reference/mdir/components/data/transform/: the string mini-DSL
`"pil2np | apply_clahe:1.0 | totensor | normalize"` builds a variadic Compose
over numpy HWC float images. Differences from the reference, by TPU-first
design:

- `totensor` keeps images as HWC numpy float32 (NHWC is the device layout; the
  reference converts to CHW torch tensors).
- CLAHE / colorspace transforms call the bit-exact JAX ops from
  `gandtr_tpu.ops` (no cv2 dependency on the compute path); for batched
  training the same ops can be staged directly inside the jitted step, making
  the host-side variant a convenience for hub-style single-image use.
- randomness uses an explicit seedable module-level RNG (`seed_transforms`)
  instead of Python's global `random`.
"""
import numpy as np
from PIL import Image
import jax.numpy as jnp

from gandtr_tpu.ops import clahe as clahe_ops
from gandtr_tpu.ops import colorspace as cs_ops

class _LockedRNG:
    """np.random.RandomState is NOT thread-safe and the Loader's prefetch
    pool runs dataset transforms concurrently (num_workers > 1) — serialize
    the draws (found by review). Draw ORDER under threads still depends on
    scheduling; per-epoch bit-reproducibility holds for num_workers <= 1."""

    def __init__(self, seed=None):
        import threading
        self._rng = np.random.RandomState(seed)
        self._lock = threading.Lock()

    def rand(self, *a):
        with self._lock:
            return self._rng.rand(*a)

    def randint(self, *a, **k):
        with self._lock:
            return self._rng.randint(*a, **k)

    def normal(self, *a, **k):
        with self._lock:
            return self._rng.normal(*a, **k)


_RNG = _LockedRNG()


def seed_transforms(seed):
    """Reseed host-side augmentation randomness (per-epoch reseeding mirrors
    training.py:40-42)."""
    global _RNG
    _RNG = _LockedRNG(seed)


def parse_tuple(tpl, dtype=int, fixed_size=0):
    if isinstance(tpl, str):
        tpl = tuple(dtype(x) for x in tpl.split("_"))
    if isinstance(tpl, (int, float)):
        tpl = (dtype(tpl),)
    if fixed_size:
        if len(tpl) == 1:
            tpl *= fixed_size
        elif len(tpl) != fixed_size:
            raise ValueError("Invalid tuple of size %s, required %s" % (len(tpl), fixed_size))
    return tuple(tpl)


class GenericTransform:
    def __init__(self, params=None):
        self.params = params or {}

    def __repr__(self):
        args = ", ".join("%s=%s" % (k, v) for k, v in self.params.items())
        return f"{self.__class__.__name__}({args})"


class Compose(GenericTransform):
    """Variadic multi-image composition (core_transforms.py:25-32)."""

    def __init__(self, transforms):
        super().__init__()
        self.transforms = transforms

    def __call__(self, *pics):
        for t in self.transforms:
            pics = t(*pics)
            if not isinstance(pics, (list, tuple)):
                pics = (pics,)
        if len(pics) == 1:
            return pics[0]
        return pics


class Pil2Numpy(GenericTransform):
    """PIL/uint array -> float32 HWC in [0,1] (core_transforms.py:73-100)."""

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            if isinstance(pic, Image.Image):
                pic = np.asarray(pic.convert("RGB"))
            elif not isinstance(pic, np.ndarray):
                raise ValueError("Unsupported type '%s'" % type(pic))
            if pic.dtype == np.uint8:
                pic = pic.astype(np.float32) / 255.0
            elif pic.dtype == np.uint16:
                pic = pic.astype(np.float32) / 65535.0
            else:
                pic = pic.astype(np.float32)
            acc.append(pic)
        return acc


class ToTensor(GenericTransform):
    """Identity in layout (HWC numpy stays the device layout on TPU); ensures
    float32 contiguous arrays and adds a leading dim-ready view."""

    def __call__(self, *pics):
        return [np.ascontiguousarray(np.asarray(p, dtype=np.float32)) for p in pics]


class Normalize(GenericTransform):
    def __init__(self, mean, std, strict_shape=True):
        if isinstance(strict_shape, str):
            strict_shape = strict_shape.lower() != "false"
        super().__init__({"mean": list(mean), "std": list(std),
                          "strict_shape": bool(strict_shape)})
        assert len(mean) == len(std)

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            c = pic.shape[-1]
            if self.params["strict_shape"]:
                assert c == len(self.params["mean"]), (c, len(self.params["mean"]))
            else:
                assert c <= len(self.params["mean"])
            mean = np.asarray(self.params["mean"][:c], np.float32)
            std = np.asarray(self.params["std"][:c], np.float32)
            acc.append((pic - mean) / std)
        return acc


class StackBatch(GenericTransform):
    """Concatenate the tuple's images along CHANNELS: the reference cats CHW
    tensors on axis 0 (core_transforms.py:103-107); in this repo's HWC layout
    that is the trailing axis (axis 0 would stack heights — found by
    review)."""

    def __call__(self, *pics):
        return [np.concatenate(pics, axis=-1)]


class NanCheck(GenericTransform):
    def __call__(self, *pics):
        for pic in pics:
            if np.isnan(pic).any():
                raise ValueError("Nan value occured in input")
        return pics


# ---------------------------------------------------------------------------
# crops / scaling / noise (augmentation_transforms.py)
# ---------------------------------------------------------------------------

class RandomCrop(GenericTransform):
    def __init__(self, size):
        super().__init__({"size": parse_tuple(size, int, 2)})

    def __call__(self, *pics):
        th, tw = self.params["size"]
        h, w = pics[0].shape[:2]
        i = _RNG.randint(0, h - th + 1)
        j = _RNG.randint(0, w - tw + 1)
        return [x[i:i + th, j:j + tw] for x in pics]


class RandomHorizontalFlip(GenericTransform):
    def __init__(self, p=0.5):
        super().__init__({"p": float(p)})

    def __call__(self, *pics):
        if _RNG.rand() < self.params["p"]:
            return [np.flip(x, axis=1).copy() for x in pics]
        return list(pics)


class CenterCrop(GenericTransform):
    def __init__(self, size):
        super().__init__({"size": np.array(parse_tuple(size, int))[::-1]})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            pad = (np.asarray(pic.shape[:2]) - self.params["size"]) / 2
            y0 = int(np.floor(pad[0])); y1 = -int(np.ceil(pad[0])) or None
            x0 = int(np.floor(pad[1])); x1 = -int(np.ceil(pad[1])) or None
            acc.append(pic[y0:y1, x0:x1])
        return acc


class SquareCrop(GenericTransform):
    def __call__(self, *pics):
        acc = []
        for pic in pics:
            size = pic.shape[:2]
            pad = (np.array(size) - min(size)) / 2
            y0 = int(np.floor(pad[0])); y1 = size[0] - int(np.ceil(pad[0]))
            x0 = int(np.floor(pad[1])); x1 = size[1] - int(np.ceil(pad[1]))
            acc.append(pic[y0:y1, x0:x1])
        return acc


class Downscale(GenericTransform):
    """Fit longest side into `size`, keeping aspect ratio (PIL LANCZOS
    thumbnail — matches the reference's use of Image.thumbnail)."""

    def __init__(self, size):
        super().__init__({"size": int(size)})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            if isinstance(pic, Image.Image):
                if max(pic.size) > self.params["size"]:
                    pic.thumbnail((self.params["size"], self.params["size"]), Image.LANCZOS)
            elif isinstance(pic, np.ndarray) and max(pic.shape[:2]) > self.params["size"]:
                img = Image.fromarray((pic * 255).astype(np.uint8))
                img.thumbnail((self.params["size"], self.params["size"]), Image.LANCZOS)
                pic = np.array(img, dtype=np.float32) / 255.0
            acc.append(pic)
        return acc


def _bilinear_resize_np(img, out_w, out_h):
    """cv2.resize(..., (w, h)) — the reference's exact call
    (augmentation_transforms.py:138, INTER_LINEAR default; float inputs
    take cv2's float path, so this is reference-IDENTICAL arithmetic).

    cv2 sits on the HOST data path only (the compute path stays cv2-free).
    The jax fallback (torch-bilinear semantics, ~1e-4 of cv2) kept for
    cv2-less installs measured 139 ms/img in the round-5 train rehearsal:
    it device-dispatches per image — through the TPU tunnel in production —
    and compiles per distinct crop size. cv2 is ~0.5 ms/img."""
    try:
        import cv2
        return cv2.resize(img, (out_w, out_h))
    except ImportError:
        pass
    x = jnp.asarray(img)[None]
    if x.ndim == 3:
        x = x[..., None]
    from gandtr_tpu.ops.resize import bilinear_resize
    y = bilinear_resize(x, out_h, out_w)
    y = np.asarray(y[0])
    if img.ndim == 2:
        y = y[..., 0]
    return y


class RandomScaleCrop(GenericTransform):
    """Random scale + crop, implemented crop-then-resize
    (augmentation_transforms.py:100-144)."""

    def __init__(self, size, scale=(0.5, 0.8)):
        super().__init__({"size": np.array(parse_tuple(size, int)),
                          "scale": parse_tuple(scale, float)})

    def _pic_min_size(self, pics):
        if len(pics) == 1 or pics[0].shape[:2] == pics[1].shape[:2]:
            if (np.asarray(pics[0].shape[:2]) == self.params["size"][::-1]).all():
                return None
        m = np.full(2, np.iinfo(np.int_).max)
        for pic in pics:
            m = np.minimum(pic.shape[:2], m)
        return m

    def _offset(self, limits):
        return [_RNG.randint(0, x + 1) for x in limits]

    def _scale(self, lowest):
        return _RNG.rand() * (self.params["scale"][1] - lowest) + lowest

    def __call__(self, *pics):
        mn = self._pic_min_size(pics)
        if mn is None:
            return list(pics)
        assert (self.params["size"] <= mn).all()
        lowest = max(float(np.max(self.params["size"] / mn)), self.params["scale"][0])
        scale = self._scale(lowest)
        cropped_size = np.ceil(self.params["size"][::-1] / scale).astype(int)
        assert (mn >= cropped_size).all(), (mn, cropped_size)
        offset = self._offset(mn - cropped_size)
        return self._crop_downscale(pics, offset, cropped_size)

    def crop_only(self, *pics):
        """Draw the SAME (scale, offset) as __call__ — identical _RNG
        consumption — and return the raw crops WITHOUT the resize: the
        device-scalecrop staging hook (the resize moves in-graph,
        ops/resize.dynamic_bilinear_resize_u8). Returns (crops, None) when
        the inputs are already at target size (the __call__ pass-through)."""
        mn = self._pic_min_size(pics)
        if mn is None:
            return list(pics), None
        assert (self.params["size"] <= mn).all()
        lowest = max(float(np.max(self.params["size"] / mn)),
                     self.params["scale"][0])
        scale = self._scale(lowest)
        cropped_size = np.ceil(self.params["size"][::-1] / scale).astype(int)
        assert (mn >= cropped_size).all(), (mn, cropped_size)
        offset = self._offset(mn - cropped_size)
        y0, y1 = offset[0], offset[0] + cropped_size[0]
        x0, x1 = offset[1], offset[1] + cropped_size[1]
        return [pic[y0:y1, x0:x1] for pic in pics], tuple(self.params["size"])

    @property
    def max_crop_side(self):
        """Static pad bound for the device path: ceil(size / scale_low)."""
        return int(np.max(np.ceil(self.params["size"][::-1]
                                  / self.params["scale"][0])))

    def _crop_downscale(self, pics, offset, cropped_size):
        y0, y1 = offset[0], offset[0] + cropped_size[0]
        x0, x1 = offset[1], offset[1] + cropped_size[1]
        w, h = self.params["size"]
        return [_bilinear_resize_np(pic[y0:y1, x0:x1], w, h) for pic in pics]


class CenterScaleCrop(RandomScaleCrop):
    def __init__(self, size, scale=0.6):
        super().__init__(size, (scale, scale))

    def __call__(self, *pics):
        mn = self._pic_min_size(pics)
        if mn is None:
            return list(pics)
        scale = float(self.params["scale"][0])
        cropped_size = np.ceil(self.params["size"][::-1] / scale).astype(int)
        # negative offsets would silently slice a wrapped sliver
        # (augmentation_transforms.py:161 asserts the same)
        assert (mn >= cropped_size).all(), (mn, cropped_size)
        offset = [x // 2 for x in (mn - cropped_size)]
        return self._crop_downscale(pics, offset, cropped_size)


class AdditiveGaussianNoise(GenericTransform):
    def __init__(self, sigma):
        super().__init__({"sigma": float(sigma)})

    def __call__(self, *pics):
        pics = list(pics)
        noise = _RNG.normal(0, self.params["sigma"], pics[0].shape)
        pics[0] = np.clip(pics[0] + noise, 0, 1).astype(np.float32)
        return pics


# ---------------------------------------------------------------------------
# photometric (photometric_transforms.py) — CLAHE via bit-exact JAX ops
# ---------------------------------------------------------------------------

class ApplyClahe(GenericTransform):
    def __init__(self, clip_limit=4, grid_size=8, colorspace="lab"):
        super().__init__({"clip_limit": float(clip_limit),
                          "grid_size": int(grid_size), "colorspace": colorspace})

    def __call__(self, *pics):
        return [np.asarray(clahe_ops.image_clahe(
            jnp.asarray(x), self.params["clip_limit"], self.params["grid_size"],
            self.params["colorspace"])).astype(x.dtype) for x in pics]


class ApplyColorspaceClahe(ApplyClahe):
    def __call__(self, *pics):
        return [np.asarray(clahe_ops.image_colorspace_clahe(
            jnp.asarray(x), self.params["clip_limit"], self.params["grid_size"],
            self.params["colorspace"])).astype(x.dtype) for x in pics]


class CreateClahedImage(ApplyClahe):
    def __call__(self, pic):
        out = np.asarray(clahe_ops.image_clahe(
            jnp.asarray(pic[:, :, :3]), self.params["clip_limit"],
            self.params["grid_size"], self.params["colorspace"])).astype(pic.dtype)
        return [pic, out]


class AddClaheFromRgb(GenericTransform):
    def __init__(self, clip_limit=4, grid_size=8, colorspace="lab"):
        super().__init__({"clip_limit": float(clip_limit),
                          "grid_size": int(grid_size), "colorspace": colorspace})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            spc = np.asarray(cs_ops.rgb2normspace(jnp.asarray(pic[:, :, :3]),
                                                  self.params["colorspace"]))
            chan = np.asarray(clahe_ops.channel_clahe(
                jnp.asarray(spc[:, :, 0]), self.params["clip_limit"],
                self.params["grid_size"]))
            acc.append(np.concatenate((pic, chan[:, :, None]), axis=2))
        return acc


HISTOGRAM_BINS = np.linspace(-0.00196078431372549, 1.0019607843137255, 257)
HISTOGRAM_CENTERS = np.linspace(0, 1, 256)


def channel_histogram_matching(chan0, cdf_target):
    """Match channel's CDF to a target CDF over 256 centers (functional.py:96-103)."""
    cdf0 = np.cumsum(np.histogram(chan0, HISTOGRAM_BINS)[0]) / chan0.size
    if isinstance(cdf_target, str) and cdf_target == "eq":
        return np.interp(chan0, HISTOGRAM_CENTERS, cdf0 * HISTOGRAM_CENTERS[-1]).astype(np.float32)
    return np.interp(chan0, HISTOGRAM_CENTERS,
                     np.interp(cdf0, cdf_target, HISTOGRAM_CENTERS)).astype(np.float32)


def channel2channel_histogram_matching(chan0, chan1):
    cdf0 = np.cumsum(np.histogram(chan0, HISTOGRAM_BINS)[0]) / chan0.size
    cdf1 = np.cumsum(np.histogram(chan1, HISTOGRAM_BINS)[0]) / chan1.size
    return np.interp(chan0, HISTOGRAM_CENTERS,
                     np.interp(cdf0, cdf1, HISTOGRAM_CENTERS)).astype(np.float32)


def _apply_lightness(img, colorspace, func):
    spc = np.array(cs_ops.rgb2normspace(jnp.asarray(img), colorspace))
    spc[:, :, 0] = func(spc[:, :, 0])
    return np.asarray(cs_ops.normspace2rgb(jnp.asarray(spc), colorspace))


class MatchHistogram(GenericTransform):
    def __init__(self, histogram, colorspace="lab"):
        super().__init__({"histogram": histogram, "colorspace": colorspace})

    def __call__(self, *pics):
        from gandtr_tpu.data.histogram_consts import HISTOGRAM_CDF
        target = self.params["histogram"]
        cdf = target if target == "eq" else HISTOGRAM_CDF[target]
        return [_apply_lightness(x, self.params["colorspace"],
                                 lambda c: channel_histogram_matching(c, cdf))
                for x in pics]


class ReplaceChannelWithHistogram(GenericTransform):
    """Train: match first image's last channel to second image's; test: match to
    a constant histogram (photometric_transforms.py:67-87)."""

    def __init__(self, histogram, created_channel):
        super().__init__({"histogram": histogram, "created_channel": created_channel})
        assert created_channel in {"append", "replace"}

    def __call__(self, pic0, *pics):
        out0 = pic0[:, :, :-1] if self.params["created_channel"] == "replace" else pic0
        if len(pics) == 1:
            pic1 = pics[0]
            chan = channel2channel_histogram_matching(pic0[:, :, -1], pic1[:, :, -1])
            return [np.concatenate((out0, chan[:, :, None]), axis=2), pic1[:, :, :-1]]
        from gandtr_tpu.data.histogram_consts import HISTOGRAM_CDF
        # "eq" routes through the equalization branch (functional.py:98-99)
        h = self.params["histogram"]
        cdf = h if h == "eq" else HISTOGRAM_CDF[h]
        chan = channel_histogram_matching(pic0[:, :, -1], cdf)
        return [np.concatenate((out0, chan[:, :, None]), axis=2)] + list(pics)


class GammaEqualize(GenericTransform):
    """Newton root-find for gamma shifting lightness mean to target
    (functional.py:116-130)."""

    def __init__(self, target, colorspace="lab"):
        target = float(target)
        super().__init__({"target": target, "colorspace": colorspace})
        assert 0 < target < 1

    def __call__(self, *pics):
        import scipy.optimize
        import warnings

        def match(channel):
            target = self.params["target"]
            func = lambda gamma: np.mean(np.power(channel, gamma)) - target
            x0 = np.log(target) / np.log(np.mean(channel))
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                try:
                    sol = scipy.optimize.newton(func, x0=x0, tol=1e-4, maxiter=50)
                except RuntimeError:
                    sol = 0.1 if abs(func(0.1)) < abs(func(10)) else 10
            sol = np.clip(sol, 0.1, 10)
            return np.power(channel, sol)

        return [_apply_lightness(x, self.params["colorspace"], match) for x in pics]


# ---------------------------------------------------------------------------
# channel transforms (channel_transforms.py)
# ---------------------------------------------------------------------------

class AddConstantChannel(GenericTransform):
    def __init__(self, value):
        super().__init__({"value": float(value)})

    def __call__(self, *pics):
        return [np.concatenate(
            (x, np.full(x.shape[:2] + (1,), self.params["value"], np.float32)),
            axis=2) for x in pics]


class NpInvertChannel(GenericTransform):
    def __init__(self, channel):
        super().__init__({"channel": int(channel)})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            pic = pic.copy()
            pic[:, :, self.params["channel"]] = 1.0 - pic[:, :, self.params["channel"]]
            acc.append(pic)
        return acc


class NpChanSelector(GenericTransform):
    """Keep the channel SLICE [start, end) — not a channel list
    (channel_transforms.py:36-47; divergence caught by differential fuzz)."""

    def __init__(self, start, end="unset"):
        end = int(end) if end and end != "unset" and end != "null" else None
        super().__init__({"start": int(start), "end": end})

    def __call__(self, *pics):
        return [x[:, :, self.params["start"]:self.params["end"]] for x in pics]


class NpCloneChannels(GenericTransform):
    """APPEND a copy of channel slice [start, end) (or just channel `start`
    when `end` is unset) — not a whole-image tile (channel_transforms.py:49-61;
    divergence caught by differential fuzz)."""

    def __init__(self, start, end="unset"):
        if end != "unset":
            end = int(end) if end and end != "null" else None
        super().__init__({"start": int(start), "end": end})

    def __call__(self, *pics):
        s, e = self.params["start"], self.params["end"]
        if e == "unset":
            return [np.concatenate((x, x[:, :, s:s + 1]), axis=2) for x in pics]
        return [np.concatenate((x, x[:, :, s:e]), axis=2) for x in pics]


class AddIntensityFromRgb(GenericTransform):
    """Append the LIGHTNESS channel of `colorspace` (default: normalized lab
    L), not cv2 gray (channel_transforms.py:67-80; divergence caught by
    differential fuzz)."""

    def __init__(self, colorspace="lab"):
        super().__init__({"colorspace": colorspace})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            spc = np.asarray(cs_ops.rgb2normspace(jnp.asarray(pic[:, :, :3]),
                                                  self.params["colorspace"]))
            acc.append(np.concatenate((pic, spc[:, :, :1]), axis=2))
        return acc


class ToColorspace(GenericTransform):
    def __init__(self, colorspace):
        super().__init__({"colorspace": colorspace})

    def __call__(self, *pics):
        # first 3 channels only, like the reference (channel_transforms.py:89)
        return [np.asarray(cs_ops.rgb2normspace(jnp.asarray(x[:, :, :3]),
                                                self.params["colorspace"]))
                for x in pics]


# ---------------------------------------------------------------------------
# registry + DSL (transform/__init__.py:1-46)
# ---------------------------------------------------------------------------

TRANSFORMS = {
    "totensor": ToTensor,
    "normalize": Normalize,
    "pil2np": Pil2Numpy,
    "stackbatch": StackBatch,
    "nan_check": NanCheck,

    "random_crop": RandomCrop,
    "mirror": RandomHorizontalFlip,
    "center_crop": CenterCrop,
    "square_crop": SquareCrop,
    "downscale": Downscale,
    "scalecrop": RandomScaleCrop,
    "centerscalecrop": CenterScaleCrop,
    "gaussian_noise": AdditiveGaussianNoise,

    "add_const": AddConstantChannel,
    "tospace": ToColorspace,
    "add_intensity_fromrgb": AddIntensityFromRgb,
    "np_invert_chan": NpInvertChannel,
    "np_chanselect": NpChanSelector,
    "np_chanclone": NpCloneChannels,

    "add_clahe_fromrgb": AddClaheFromRgb,
    "apply_clahe": ApplyClahe,
    "apply_colorspaceclahe": ApplyColorspaceClahe,
    "create_clahed": CreateClahedImage,
    "match_histogram": MatchHistogram,
    "replace_histogram": ReplaceChannelWithHistogram,
    "gamma_equalize": GammaEqualize,
}


def initialize_transforms(augmentations, mean_std):
    """Parse the pipe-DSL into a Compose; `normalize` receives mean_std."""
    trans = []
    for aug in [x.strip() for x in augmentations.split("|") if x.strip()]:
        tname, *args = aug.split(":", 1)
        args = args[0].split(":") if args else []
        if "normalize" in aug:
            trans.append(TRANSFORMS[tname](*(list(mean_std) + args)))
        else:
            trans.append(TRANSFORMS[tname](*args))
    return Compose(trans)


def split_device_transform(transforms_str, mean_std):
    """Split the standard descriptor preprocessing pipeline into a host part
    and an in-graph device part.

    For `pil2np [| apply_clahe:...] | totensor | normalize`, returns
    (host_fn, device_fn): `host_fn(PIL) -> uint8 HWC array` (decode only —
    4x less host->device transfer than the normalized f32 image), and
    `device_fn((N?, H, W, 3) f32 in [0,1]) -> normalized` applying the
    bit-exact CLAHE + normalization inside the caller's jit. Descriptors are
    unchanged vs the host pipeline (the CLAHE ops are cv2-bit-exact on
    device; /255 and (x-mean)/std are the same IEEE f32 arithmetic).

    Returns (None, None) when the pipeline contains anything else.
    """
    import jax

    parts = [x.strip() for x in str(transforms_str).split("|") if x.strip()]
    if len(parts) < 3 or parts[0] != "pil2np" or parts[-1] != "normalize":
        return None, None
    mid = parts[1:-1]
    if not mid or mid[-1] != "totensor":
        return None, None
    mid = mid[:-1]
    clahe_args = None
    if len(mid) == 1 and mid[0].split(":")[0] == "apply_clahe":
        bits = mid[0].split(":")[1:]
        clahe_args = (float(bits[0]) if bits else 4.0,
                      int(bits[1]) if len(bits) > 1 else 8,
                      bits[2] if len(bits) > 2 else "lab")
    elif mid:
        return None, None

    mean = np.asarray(mean_std[0], np.float32)
    std = np.asarray(mean_std[1], np.float32)

    def host_fn(pic):
        if isinstance(pic, Image.Image):
            return np.asarray(pic.convert("RGB"))
        return np.asarray(pic)

    def device_fn(x, mask=None):
        if clahe_args is not None:
            cl, gs, cspace = clahe_args
            if mask is not None:
                # exact padded-bucket mode: CLAHE geometry from each image's
                # valid rectangle (ops/clahe.py clahe_u8_masked)
                from gandtr_tpu.ops.maskprop import MaskState
                st = MaskState.maybe(mask if mask.ndim == 3 else mask[None])
                h, w = st.hw
                one = lambda args: clahe_ops.image_clahe_masked(
                    args[0], (args[1], args[2]), cl, gs, cspace)
                if x.ndim == 4:
                    # lax.map: vmap measured slower on chip and flips ±1 u8
                    # ties under CPU jit (see learning/wrappers.ClahePost)
                    x = jax.lax.map(one, (x, h, w))
                else:
                    x = one((x, h[0], w[0]))
            else:
                one = lambda im: clahe_ops.image_clahe(im, cl, gs, cspace)
                # lax.map (scan), not vmap: the TPU CLAHE path is a Pallas
                # kernel and sequential mapping avoids batching rules
                x = jax.lax.map(one, x) if x.ndim == 4 else one(x)
        return (x - jnp.asarray(mean)) / jnp.asarray(std)

    return host_fn, device_fn


def device_quantize_rgb(y, mean_std):
    """In-graph denormalize + truncate a model output to uint8 RGB (f32
    arithmetic). NOTE: the host image sink (scenarios/infer_stage.py
    RgbImageSaver) promotes to f64 like the reference's python-list mean/std
    (imgtools.py:24), so pixels at f32/f64 rounding-tie boundaries can differ
    by 1 — the infer stage therefore uses this only when the config opts in
    via `device_postprocess: true`. The serving export uses it
    unconditionally (uint8 transfer, no reference-artifact parity needed)."""
    mean = jnp.asarray(mean_std[0], jnp.float32)
    std = jnp.asarray(mean_std[1], jnp.float32)
    rgb = jnp.clip(y * std + mean, 0, 1)
    return jnp.floor(rgb * 255.0).astype(jnp.uint8)


class DeviceScalecrop:
    """Host half of the opt-in device-scalecrop staging
    (`data.train.device_scalecrop`): uint8 crops at the SAME _RNG draws as
    the host `pil2np | scalecrop | totensor | normalize` chain, padded to
    the static bound with per-image (h, w) — /255 + bilinear resize +
    normalize run in-graph (ops/resize.dynamic_bilinear_resize_u8, ~1e-7
    rel off cv2's float path; the pixels and crop geometry are identical).
    Emits [img_u8, hw, ...] per input image for stack_collate."""

    def __init__(self, sc):
        self.sc = sc
        self.pad = sc.max_crop_side

    def __call__(self, *pics):
        arrs = []
        for p in pics:
            a = np.asarray(p.convert("RGB")) if hasattr(p, "convert") \
                else np.asarray(p)
            if a.ndim == 2:
                a = np.repeat(a[:, :, None], 3, 2)
            assert a.dtype == np.uint8, a.dtype  # decode output, pre-pil2np
            arrs.append(a)
        crops, _ = self.sc.crop_only(*arrs)
        out = []
        for c in crops:
            h = min(c.shape[0], self.pad)
            w = min(c.shape[1], self.pad)
            buf = np.zeros((self.pad, self.pad, 3), np.uint8)
            buf[:h, :w] = c[:self.pad, :self.pad]
            out.extend([buf, np.asarray([h, w], np.int32)])
        return out
