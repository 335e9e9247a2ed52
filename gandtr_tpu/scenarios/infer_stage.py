"""Infer stage: batched network inference with image/embedding output sinks.

Counterpart of /root/reference/mdir/stages/infer.py:17-84 + data/output.py:
loads a network checkpoint, runs each input image through the jitted forward,
writes RGB images (denormalized, async thread pool) or assembles an embedding
matrix. Skip-if-done idempotency preserved (infer.py:23-27).
"""
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from gandtr_tpu.utils.io import resolve_path
from gandtr_tpu.data.transforms import initialize_transforms
from gandtr_tpu.data.datasets import imread, path_join


class RgbImageSaver:
    """Denormalize + save (output.py:29-87), flat or input-dir structure, with
    a write-behind thread pool (AsyncOutput, output.py:90-115).

    `structure="flat"` encodes names like the reference (output.py:56-60):
    multi-piece names have all-but-last extension-stripped and are joined with
    "::"; "/" becomes "%". `structure="input"` (the reference's default for
    single-column data, output.py:44-46) keeps the relative path.

    `stretch_by` mirrors imgtools._tensor_to_image (imgtools.py:20-29):
    "meanstd" denormalizes with mean/std; "auto" min-max stretches; "none"
    saves raw; a number n denormalizes then maps to [1/2n-ish] contrast.

    `transforms` is the dataset's transform DSL string; like the reference's
    imgtools (imgtools.py:5-11, 31-60) the sink scans it for colorspace
    markers (tolab/toluv/tolsh) and channel modes (chan1/chan42/add_meanstd)
    and undoes them: denormalized LAB/LUV/LSH values are range-clipped and
    converted back to RGB; chan42 saves concat(input[..., 3:], output);
    add_meanstd saves output channel 0 as grayscale. In a colorspace branch
    the reference ignores stretch_by — so do we.
    """

    def __init__(self, directory, mean_std, structure=None, append=False,
                 workers=6, stretch_by="meanstd", transforms=""):
        self.directory = resolve_path(directory)
        # float64 like the reference's python-list mean/std, which promotes
        # the f32 image on multiply (imgtools.py:24) — keeps truncation ties
        # byte-identical to the reference artifacts
        self.mean = np.asarray(mean_std[0], np.float64)
        self.std = np.asarray(mean_std[1], np.float64)
        self.structure = structure
        self.append = append
        self.stretch_by = stretch_by
        self.transforms = transforms or ""
        # imgtools._transforms_to_colorspace (imgtools.py:5-11): legacy raw
        # colorspace markers, undone with the reference's range-clips
        self.colorspace = next((c for c in ("lab", "luv", "lsh")
                                if "to" + c in self.transforms), None)
        # the LIVE registry form `tospace:X` produces NORMALIZED colorspace
        # values (channel_transforms.py:82-89 -> rgb2normspace); the reference
        # imgtools never learned to undo it — we do, via normspace2rgb
        self.normspace = None
        for piece in self.transforms.split("|"):
            piece = piece.strip()
            if piece.startswith("tospace:"):
                self.normspace = piece.split(":", 1)[1].strip()
        os.makedirs(self.directory, exist_ok=True)
        self.pool = ThreadPoolExecutor(workers)
        self.futures = []

    @staticmethod
    def flat_name(name):
        """Reference flat-name encoding (output.py:56-60)."""
        if isinstance(name, (list, tuple)):
            pieces = [x.rsplit(".", 1)[0] for x in name[:-1]] + [name[-1]]
            name = "::".join(pieces)
        return name.replace("/", "%")

    def target_path(self, name):
        # Default structure is per-row like the reference (output.py:44-46):
        # "flat" for multi-piece names, "input" for plain paths; "input" on a
        # multi-piece row keeps x[0] (output.py:62).
        structure = self.structure
        if structure is None:
            structure = "flat" if isinstance(name, (list, tuple)) else "input"
        if structure == "flat":
            name = self.flat_name(name)
        elif isinstance(name, (list, tuple)):
            name = name[0]
        path = os.path.join(self.directory, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    def exclude_existing(self, names):
        if not self.append:
            return names
        return [n for n in names if not os.path.exists(self.target_path(n))]

    @property
    def needs_input(self):
        """chan42/add_meanstd mix the (normalized) INPUT into the saved image
        (imgtools.get_image, imgtools.py:63-71)."""
        return "chan42" in self.transforms or "add_meanstd" in self.transforms

    def _to_uint8(self, arr):
        """imgtools._tensor_to_image stretch semantics (imgtools.py:20-29),
        NHWC instead of the reference's CHW; "auto" stays f32 (the reference's
        in-place ops), the mean/std paths promote to f64 (list multiply)."""
        if self.colorspace:
            return self._colorspace_to_uint8(arr)
        if self.normspace and self.normspace not in ("rgb", "gray"):
            return self._normspace_to_uint8(arr)
        img = np.asarray(arr, np.float32)
        if img.shape[-1] == 1:  # grayscale squeeze (imgtools.py:18)
            img = img[..., 0]
        elif img.shape[-1] > 3:
            img = img[..., :3]
        s = self.stretch_by
        c = 1 if img.ndim == 2 else img.shape[-1]
        if s == "auto":
            img = img - np.min(img)
            img = img / np.max(img)
        elif s == "meanstd":
            img = img * self.std[:c] + self.mean[:c]
        elif s != "none":
            img = img * self.std[:c] + self.mean[:c]
            img = img / float(s)
            img = img + 1.0 / 2.0 / float(s)
        return np.clip(img * 255, 0, 255).astype(np.uint8)

    def _normspace_to_uint8(self, arr):
        """Undo the live `tospace:X` transform: mean/std denormalize to the
        normalized colorspace, invert with ops.colorspace.normspace2rgb, clip
        to [0,1], *255 uint8. stretch_by is ignored like the reference's
        colorspace branch."""
        from gandtr_tpu.ops import colorspace as cs
        img = np.asarray(arr, np.float32)
        c = img.shape[-1]
        img = img[..., :3] * self.std[:min(c, 3)] + self.mean[:min(c, 3)]
        rgb = np.asarray(cs.normspace2rgb(jnp.asarray(img, jnp.float32),
                                          self.normspace))
        return (np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)

    def _colorspace_to_uint8(self, arr):
        """Colorspace-undo branch (imgtools.py:31-60): zero-pad chan1 to 3
        channels, denormalize, clip to the space's valid range, convert back
        to RGB with the cv2-float-parity converters in ops.colorspace, and
        (chan1) reduce to grayscale. stretch_by is ignored, matching the
        reference. uint8 cast is unclipped like imgtools.py:59 — safe because
        LAB/LUV converters saturate to [0,1] (cv2 parity) and clipped HLS
        inputs produce in-range RGB."""
        from gandtr_tpu.ops import colorspace as cs
        img = np.asarray(arr, np.float32)
        mean, std = self.mean, self.std
        chan1 = "chan1" in self.transforms  # plain substring, imgtools.py:31
        if chan1:  # imgtools.py:31-33
            img = np.concatenate([img, np.zeros_like(img), np.zeros_like(img)],
                                 axis=-1)
            mean = np.array([mean[0], 0.0, 0.0])
            std = np.array([std[0], 1.0, 1.0])
        img = img[..., :3] * std[:3] + mean[:3]
        space = self.colorspace
        if space == "lab":  # imgtools.py:36-38
            img[..., 0] = np.clip(img[..., 0], 0, 100)
            img[..., 1:] = np.clip(img[..., 1:], -127, 127)
        elif space == "luv":  # imgtools.py:39-42
            img[..., 0] = np.clip(img[..., 0], 0, 100)
            img[..., 1] = np.clip(img[..., 1], -134, 220)
            img[..., 2] = np.clip(img[..., 2], -140, 122)
        elif space == "lsh":  # imgtools.py:43-48: [l,s,h] -> HLS [h,l,s]
            img = np.stack([np.clip(img[..., 2], 0, 360),
                            np.clip(img[..., 0], 0, 1),
                            np.clip(img[..., 1], 0, 1)], axis=-1)
        fn = {"lab": cs.lab_to_rgb, "luv": cs.luv_to_rgb,
              "lsh": cs.hls_to_rgb}[space]
        rgb = np.asarray(fn(jnp.asarray(img, jnp.float32)))
        if space in ("lab", "luv"):  # cv2 saturates LAB2RGB/LUV2RGB output
            rgb = np.clip(rgb, 0.0, 1.0)
        if chan1:  # imgtools.py:57-58
            rgb = np.mean(rgb, axis=-1)
        return (rgb * 255).astype(np.uint8)

    def add(self, name, image_nhwc, input_nhwc=None):
        out = np.asarray(image_nhwc)
        if input_nhwc is not None:  # imgtools.get_image (imgtools.py:66-69)
            inp = np.asarray(input_nhwc)
            if "chan42" in self.transforms:
                out = np.concatenate([inp[..., 3:], out], axis=-1)
            elif "add_meanstd" in self.transforms:
                out = out[..., :1]

        def write(n, arr):
            if arr.dtype != np.uint8:  # device-side post already denormalized
                arr = self._to_uint8(arr)
            elif arr.ndim == 3 and arr.shape[-1] == 1:
                arr = arr[..., 0]
            Image.fromarray(arr).save(self.target_path(n))
        self.futures.append(self.pool.submit(write, name, out))

    def close(self):
        for f in self.futures:
            f.result()
        self.pool.shutdown()


class EmbeddingOutput:
    """Assemble a (D, N) descriptor matrix; NaN rows for failures
    (output.py:118-156)."""

    def __init__(self, dimensions):
        self.dimensions = dimensions
        self.names = []
        self.vecs = []

    def exclude_existing(self, names):
        return names

    def add(self, name, vec):
        self.names.append(name)
        self.vecs.append(np.asarray(vec).reshape(-1))

    def matrix(self, order=None):
        """(D, N) columns. With `order` (a name list), columns follow that
        order with NaN fill for missing names — required because the infer
        loop flushes shape buckets out of input order (output.py:143-146
        NaN-row semantics)."""
        if order is None:
            return np.stack(self.vecs, axis=1) if self.vecs else \
                np.zeros((self.dimensions, 0))
        by_name = dict(zip(self.names, self.vecs))
        # actual vec length wins over the configured dimensions (e.g. HED
        # edge maps dumped through the embedding sink)
        dim = self.vecs[0].size if self.vecs else self.dimensions
        out = np.full((dim, len(order)), np.nan, np.float32)
        for i, n in enumerate(order):
            if n in by_name:
                out[:, i] = by_name[n]
        return out

    def close(self):
        pass


def infer(params, data):
    """params: {network: {path|model...}, data: {...}, output: {...}};
    data[0] = list of image names (stdin)."""
    # fixed stage seed like the reference (stages/infer.py:20-21) — any
    # stochastic transform in the pipeline becomes run-to-run deterministic
    np.random.seed(0)
    from gandtr_tpu.data import transforms as _T
    _T.seed_transforms(0)
    params = dict(params)
    names = list(data[0]) if data else []

    out_cfg = dict(params.pop("output", {}))
    out_type = out_cfg.pop("type", "image")

    data_cfg = dict(params.pop("data", {}))
    if isinstance(data_cfg.get("test"), dict):
        # reference nested form (whitening.yml / infer configs):
        # data.test.{dataset: {name, image_dir, image_size}, loader, ...}
        nested = dict(data_cfg["test"])
        ds = dict(nested.pop("dataset", {}) or {})
        name = ds.pop("name", None)
        if name not in (None, "CirImageList"):
            raise NotImplementedError("infer dataset %r" % name)
        data_cfg = {**nested, **ds}

    net_cfg = dict(params.pop("network"))
    model, variables = _load_network(net_cfg)
    model_cfg = model.loaded_model_cfg

    # transform defaults come from the network's own data params — for
    # checkpoint-loaded nets, the CHECKPOINT's runtime data (reference
    # stages/infer.py:32: {**network.network_params.runtime['data'],
    # **params['data']['test']})
    net_defaults = model.data_params if isinstance(model.data_params, dict) \
        else {}
    image_dir = resolve_path(data_cfg.pop("image_dir", ""))
    tf_str = data_cfg.get("transforms",
                          net_defaults.get("transforms",
                                           "pil2np | totensor | normalize"))
    mean_std = data_cfg.get("mean_std",
                            net_defaults.get("mean_std",
                                             [[0.5] * 3, [0.5] * 3]))
    transforms = initialize_transforms(tf_str, mean_std)

    # Fused device IO (default on): ship decoded uint8 images and run the
    # normalize (+CLAHE) transform in-graph — 1/4 of the upload, identical
    # f32 math to the host transform.
    device_pre = None
    if data_cfg.get("device_preprocess", True):
        from gandtr_tpu.data.transforms import split_device_transform
        host_tf, device_pre = split_device_transform(tf_str, mean_std)
        if device_pre is not None:
            transforms = host_tf

    # (network was loaded above, before transform resolution, so checkpoint
    # data defaults could flow into the transforms)

    # multiscale aggregation power (reference wrapper.py:249-252) — used by
    # a `cirmultiscale` runtime wrapper (the whitening.yml protocol)
    from gandtr_tpu.learning.wrappers import multiscale_msp
    msp = multiscale_msp(model_cfg, variables)

    # named-forward dispatch (reference infer.py:49,53-57: params['forward']
    # selects a method + extra call kwargs, e.g. pre-sigmoid edge maps)
    fwd_cfg = dict(params.pop("forward", {}) or {})
    fwd_kwargs = dict(fwd_cfg.get("params", {}) or {})
    if fwd_cfg.get("method"):
        fwd_kwargs["method"] = getattr(model.module, fwd_cfg["method"])

    if out_type == "image":
        sink = RgbImageSaver(out_cfg.pop("directory"), mean_std,
                             structure=out_cfg.pop("structure", None),
                             append=bool(out_cfg.pop("append", False)),
                             stretch_by=out_cfg.pop("stretch_by", "meanstd"),
                             transforms=tf_str)
        if sink.needs_input and device_pre is not None:
            # chan42/add_meanstd sinks consume the NORMALIZED input
            # (imgtools.get_image) — keep the full transform on host so the
            # batched arrays are what the sink expects
            transforms = initialize_transforms(tf_str, mean_std)
            device_pre = None
    else:
        sink = EmbeddingOutput(out_cfg.pop("dimensions", 512))

    names = sink.exclude_existing(names)
    batch_size = int(data_cfg.get("loader", {}).get("batch_size", 8))
    jit_cache = {}

    # Opt-in `device_postprocess: true` quantizes on device (1/4 download);
    # it computes the "meanstd" stretch in f32 while the host sink promotes
    # to f64 like the reference's python-list mean/std (imgtools.py:24), so
    # pixels at f32/f64 rounding-tie boundaries can differ by 1 from the
    # reference artifacts — hence off by default.
    # 'gray' excluded: device_quantize_rgb broadcasts 1-channel output
    # against the 3-channel stats while the host path squeezes + uses
    # channel-0 stats — the two opt-in paths must not differ beyond rounding
    device_post = bool(out_type == "image" and
                       sink.stretch_by == "meanstd" and
                       sink.colorspace is None and not sink.needs_input and
                       sink.normspace in (None, "rgb") and
                       data_cfg.get("device_postprocess", False))

    # `data.shape_bucket`: round spatial dims up to multiples with the EXACT
    # masked compute (ops/maskprop.py) — one compiled graph per bucket
    # instead of per image shape, same compile-wall win as the eval default
    # (REPRODUCE.md measured table). Descriptor output only: image sinks
    # would write band pixels.
    shape_bucket = data_cfg.get("shape_bucket")
    if shape_bucket and out_type == "image":
        raise ValueError("data.shape_bucket needs an embedding-type output "
                         "(image sinks would include pad-band pixels)")

    def full_forward(v, x, m=None):
        if device_pre is not None:
            xf = x.astype(jnp.float32)
            if x.dtype == jnp.uint8:
                xf = xf / 255.0
            x = device_pre(xf, m) if m is not None else device_pre(xf)
        kw = dict(fwd_kwargs)
        if m is not None:
            kw["mask"] = m
        y = model.apply(v, x, train=False, ctx={"msp": msp}, **kw)
        if device_post:
            from gandtr_tpu.data.transforms import device_quantize_rgb
            y = device_quantize_rgb(y, mean_std)
        return y

    def _pad_bucket(arr):
        b = int(shape_bucket)
        H, W = arr.shape[:2]
        Hp, Wp = -(-H // b) * b, -(-W // b) * b
        padded = np.pad(arr, ((0, Hp - H), (0, Wp - W)) +
                        ((0, 0),) * (arr.ndim - 2))
        mask = np.zeros((Hp, Wp), np.float32)
        mask[:H, :W] = 1.0
        return padded, mask

    def flush(bucket_names, bucket_items):
        """Run one fixed-size batch: same-shape (or same-bucket) images batch
        together (the reference's DataLoader batching, output.py); the tail
        is padded to the batch size so only ONE graph per (shape, batch_size)
        compiles."""
        n = len(bucket_names)
        items = bucket_items + [bucket_items[-1]] * (batch_size - n)
        if shape_bucket:
            x = jnp.asarray(np.stack([a for a, _ in items]))
            m = jnp.asarray(np.stack([mm for _, mm in items]))
            key = x.shape + (True,)
            if key not in jit_cache:
                jit_cache[key] = jax.jit(full_forward)
            out = np.asarray(jit_cache[key](variables, x, m))
        else:
            x = jnp.asarray(np.stack(items))
            key = x.shape
            if key not in jit_cache:
                jit_cache[key] = jax.jit(full_forward)
            out = np.asarray(jit_cache[key](variables, x))
        mix = out_type == "image" and sink.needs_input
        for i in range(n):
            if mix:
                sink.add(bucket_names[i], out[i], input_nhwc=items[i])
            else:
                sink.add(bucket_names[i], out[i])

    image_size = data_cfg.get("image_size")

    def load(i):
        img = imread(path_join(image_dir, names[i]))
        if image_size:  # longest-side resize (whitening.yml protocol)
            from gandtr_tpu.eval.retrieval import imresize
            img = imresize(img, int(image_size))
        return transforms(img)

    from gandtr_tpu.eval.retrieval import _prefetched
    buckets = {}  # per-shape (or per-bucket) accumulation
    for i, arr in _prefetched(len(names), load,
                              depth=max(8, batch_size)):
        if shape_bucket:
            item = _pad_bucket(arr)
            key = item[0].shape
        else:
            item, key = arr, arr.shape
        bucket = buckets.setdefault(key, ([], []))
        bucket[0].append(names[i])
        bucket[1].append(item)
        if len(bucket[0]) == batch_size:
            flush(*bucket)
            buckets.pop(key)
    for shape in list(buckets):
        flush(*buckets.pop(shape))
    sink.close()

    meta = {"count": len(names)}
    if out_type != "image":
        # input-name order, NOT bucket-flush order: downstream consumers
        # (whitening qidxs/pidxs, index building) index columns positionally
        meta["vecs"] = sink.matrix(order=names)
        meta["names"] = list(names)
    return (meta,)


def _load_network(net_cfg):
    """Build model + load checkpoint per the network section."""
    from gandtr_tpu.learning.network import build_single_net
    from gandtr_tpu.learning.checkpoints import load_network_file
    import jax.random

    net_cfg = dict(net_cfg)
    net_cfg.pop("type", None)
    path = net_cfg.pop("path", None)
    ckpt_state = None
    if path and str(path).endswith((".pth", ".pt")):
        from gandtr_tpu.utils.io import (load_torch_checkpoint,
                                         normalize_network_checkpoint)
        ckpt_state = normalize_network_checkpoint(
            load_torch_checkpoint(resolve_path(path)))["net"]
        if "model" not in net_cfg:
            # reference path-only network config: the model is rebuilt from
            # the CHECKPOINT's own network_params with the config runtime as
            # overlay (mdir/learning/__init__.py:9-13 ->
            # network.py initialize_network(None, device, state, runtime))
            params_from_ckpt = dict(ckpt_state.get("network_params") or {})
            if "model" in params_from_ckpt:
                net_cfg["model"] = dict(params_from_ckpt["model"])
            # data defaults (transforms/mean_std) flow from the checkpoint
            # like the reference's net_defaults merges (stages/infer.py:32,
            # learning/validation.py:36-50); the config overrides per key.
            # Wrappers do NOT flow — the reference merges data only.
            ck_data = dict((params_from_ckpt.get("runtime") or {})
                           .get("data") or {})
            if ck_data:
                rt = dict(net_cfg.get("runtime") or {})
                rt["data"] = {**ck_data, **(rt.get("data") or {})}
                net_cfg["runtime"] = rt
    net = build_single_net(net_cfg)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(net.init(jax.random.PRNGKey(0), x0))
    if ckpt_state is not None:
        from gandtr_tpu.utils import torch_import as ti
        arch = (net_cfg.get("model") or {}).get("architecture")
        variables = ti.convert_torch_state(
            variables, ckpt_state["model_state"],
            key_map=ti.key_map_for_architecture(arch),
            strict=False, min_coverage=1.0)
    elif path:
        variables = load_network_file(resolve_path(path), variables)
    # effective model config (checkpoint-adopted for path-only configs) —
    # consumers like multiscale_msp need the real pooling/whitening flags
    net.loaded_model_cfg = dict(net_cfg.get("model") or {})
    return net, variables


def infer_incrementally(params, data):
    """Infer only identifiers missing from an existing (id, value) store and
    merge (reference infer.py:69-84): data = (identifier_existing,
    value_existing, identifier_new); returns (metadata, identifier_new,
    value_new) with values as per-identifier rows."""
    if len(data) != 3:
        raise ValueError(
            "infer_incrementally needs (identifier_existing, value_existing, "
            "identifier_new) — it is a programmatic API (no caller passes "
            "stdin data to it as a scenario step, matching the reference), "
            "got %d data item(s)" % len(data))
    identifier_existing, value_existing, identifier_new = data
    existing = dict(zip(identifier_existing, list(value_existing)))
    for_inference = [x for x in identifier_new if x not in existing]

    (metadata,) = infer(dict(params), (for_inference,))
    added = {}
    if "vecs" in metadata:  # embedding sink: (D, N) columns -> rows
        added = dict(zip(for_inference,
                         list(np.asarray(metadata["vecs"]).T)))

    value_new = [existing[x] if x in existing else added[x]
                 for x in identifier_new]
    if isinstance(value_existing, np.ndarray):
        value_new = np.array(value_new)
    return (metadata, identifier_new, value_new)
