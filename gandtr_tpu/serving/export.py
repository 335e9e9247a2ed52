"""AOT export of hub models as serving artifacts (jax.export / StableHLO).

The reference's deployment story is torch.hub: a serving process needs the
whole codebase + checkpoint importer in-process (hubconf.py,
mdir/hub/model.py:17-42). Here the jitted forward — weights baked in as
constants, device preprocessing (CLAHE + normalize) optionally fused
in-graph — is exported through `jax.export` and serialized, so a server
loads ONE directory and calls a compiled program.

Artifact layout (a directory):
    meta.json     — kind, input spec, batch buckets, transform provenance
    b<N>.jaxexp   — one serialized `jax.export.Exported` per batch bucket

Why batch buckets instead of a symbolic batch dim: every serving graph here
is per-image independent (instance norm, GeM pooling, per-image CLAHE), so
padding a request batch up to the next bucket and slicing the outputs is
EXACT — and fixed shapes keep the artifact compatible with lowerings that
reject symbolic dims (the Pallas CLAHE kernel among them).
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 1


def _artifact_kind(model):
    """'embedding' (descriptor nets: output (N, D)) vs 'generator'
    (image-to-image: output (N, H, W, C)). Descriptor models carry a
    pooling entry in their meta (GemRetrievalNet.meta / hub._embedding)."""
    return "embedding" if "pooling" in model.meta else "generator"


def export_hub_model(model, path, image_hw, batch_buckets=(1, 4, 8),
                     from_uint8=True, with_mask=False, platforms=None,
                     kind=None):
    """Export a `hub.HubModel` (or anything with .net/.variables/.meta/
    .data_params on the net) into a serving artifact at `path`.

    - `image_hw`: the fixed (H, W) the serving graphs are compiled for.
    - `batch_buckets`: compiled batch sizes; requests are padded up to the
      next bucket (exact — graphs are per-image independent).
    - `from_uint8`: bake the device preprocessing in: input is uint8 RGB and
      the graph runs /255 + (CLAHE +) normalize exactly as the training/eval
      pipelines do (data.transforms.split_device_transform); generators also
      denormalize + quantize the output to uint8 in-graph (byte-identical to
      the host sink, scenarios/infer_stage.py). With False, the graph takes
      the already-normalized f32 tensor.
    - `with_mask`: add a (N, H, W) f32 valid-pixel mask input for
      aspect-preserving pad-to-bucket serving via masked GeM
      (models/retrieval.py mask path). Only valid for embedding models
      without multiscale/whitening wrappers (wrappers don't thread masks);
      models that cannot honor a mask (regional pooling, poolings without a
      masked form) refuse the kwarg at export trace time rather than
      silently pooling over pad pixels.
    - `platforms`: jax.export platform list (default: current backend).
    """
    from jax import export as jexport

    kind = kind or _artifact_kind(model)
    h, w = int(image_hw[0]), int(image_hw[1])
    buckets = sorted(set(int(b) for b in batch_buckets))
    assert buckets and buckets[0] >= 1

    if with_mask:
        if kind != "embedding":
            raise ValueError("with_mask only applies to embedding models")
        if model.net.wrappers_eval:
            raise ValueError(
                "with_mask requires an eval-wrapper-free net (wrappers "
                "don't thread masks); got %r" % model.net.wrappers_eval)

    tf_str, mean_std, forward = _export_forward(model, from_uint8, kind,
                                                with_mask=with_mask)

    in_dtype = jnp.uint8 if from_uint8 else jnp.float32
    os.makedirs(path, exist_ok=True)
    out_spec = None
    for b in buckets:
        args = [jax.ShapeDtypeStruct((b, h, w, 3), in_dtype)]
        if with_mask:
            args.append(jax.ShapeDtypeStruct((b, h, w), jnp.float32))
        exp = jexport.export(jax.jit(forward), platforms=platforms)(*args)
        out_spec = _out_spec(exp)
        with open(os.path.join(path, "b%d.jaxexp" % b), "wb") as f:
            f.write(exp.serialize())

    meta = _base_meta(model, kind, (h, w), buckets, from_uint8, with_mask,
                      out_spec, tf_str, mean_std)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


def _export_forward(model, from_uint8, kind, with_mask=False):
    """The ONE definition of artifact provenance + forward body shared by
    both exporters (they had drifted copies — found by review)."""
    data_params = dict(getattr(model.net, "data_params", None) or {})
    mean_std = data_params.get("mean_std", [[0.5] * 3, [0.5] * 3])
    tf_str = data_params.get("transforms", "pil2np | totensor | normalize")

    device_pre = None
    if from_uint8:
        from gandtr_tpu.data.transforms import split_device_transform
        _, device_pre = split_device_transform(tf_str, mean_std)
        if device_pre is None:
            raise ValueError(
                "from_uint8=True needs a device-splittable transform "
                "pipeline; got %r" % tf_str)

    variables = model.variables
    ctx = {"msp": model.meta.get("msp", 1.0)}

    def forward(x, *extra):
        if from_uint8:
            x = device_pre(x.astype(jnp.float32) / 255.0)
        kw = {"mask": extra[0]} if with_mask else {}
        y = model.net.apply(variables, x, train=False, ctx=ctx, **kw)
        if from_uint8 and kind == "generator":
            from gandtr_tpu.data.transforms import device_quantize_rgb
            y = device_quantize_rgb(y, mean_std)
        return y

    return tf_str, mean_std, forward


def _out_spec(exp):
    return [list(a.shape[1:]) for a in jax.tree_util.tree_leaves(
        exp.out_avals)][0]


def _base_meta(model, kind, hw, buckets, from_uint8, with_mask, out_spec,
               tf_str, mean_std):
    return {
        "format_version": FORMAT_VERSION,
        "kind": kind,
        "image_hw": [int(hw[0]), int(hw[1])],
        "batch_buckets": list(buckets),
        "input_dtype": "uint8" if from_uint8 else "float32",
        "with_mask": bool(with_mask),
        "output_shape_per_item": out_spec,
        "transforms": tf_str,
        "mean_std": [list(map(float, mean_std[0])),
                     list(map(float, mean_std[1]))],
        "model_meta": {k: v for k, v in model.meta.items()
                       if isinstance(v, (int, float, str, bool))},
        "jax_version": jax.__version__,
    }


def export_sharded_model(model, path, image_hw, n_devices,
                         batch_per_device=1, from_uint8=True, axis="data",
                         devices=None, platforms=None, kind=None):
    """Export ONE SPMD serving program batch-sharded over an `n_devices`
    mesh (GSPMD; XLA emits any collectives). Complements `export_hub_model`'s
    round-robin: a sharded artifact serves a whole batch in a single
    dispatch across all chips of a slice — one program, one queue, no host
    chunking — and is the natural form when the per-chip batch is small
    enough that dispatch overhead dominates round-robin.

    The exported program records the device count; `load_artifact` must be
    given exactly `n_devices` devices. Export requires `n_devices` visible
    devices too (pass `devices`, or e.g. an 8-CPU-device test mesh).
    """
    from jax import export as jexport
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    kind = kind or _artifact_kind(model)
    h, w = int(image_hw[0]), int(image_hw[1])
    devs = list(devices) if devices is not None else jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise ValueError("export_sharded_model needs %d devices, have %d"
                         % (n_devices, len(devs)))
    mesh = Mesh(np.asarray(devs[:n_devices]), (axis,))
    batch = int(n_devices) * int(batch_per_device)

    tf_str, mean_std, forward = _export_forward(model, from_uint8, kind)

    in_dtype = jnp.uint8 if from_uint8 else jnp.float32
    sh = NamedSharding(mesh, P(axis))
    jitted = jax.jit(forward, in_shardings=sh, out_shardings=sh)
    exp = jexport.export(jitted, platforms=platforms)(
        jax.ShapeDtypeStruct((batch, h, w, 3), in_dtype))

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "b%d.jaxexp" % batch), "wb") as f:
        f.write(exp.serialize())
    meta = _base_meta(model, kind, (h, w), [batch], from_uint8, False,
                      _out_spec(exp), tf_str, mean_std)
    meta["sharded"] = {"n_devices": int(n_devices), "axis": axis,
                       "batch_per_device": int(batch_per_device)}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return meta


class Servable:
    """A loaded serving artifact: `servable(images[, masks])` on numpy
    (N, H, W, 3) arrays of the artifact's dtype. Requests above the largest
    bucket are chunked; partial chunks are padded to the next bucket and the
    outputs sliced — exact, since the graphs are per-image independent.
    Compilation happens lazily once per bucket.

    `devices`: round-robin the chunks of a request over multiple chips
    (each device compiles the same exported program once; dispatches are
    async, so chunks run concurrently — linear scaling like the eval
    extractor's round-robin, eval/retrieval.py ShapeCachedExtractor)."""

    def __init__(self, path, devices=None):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError("Unsupported artifact format_version %r"
                             % self.meta.get("format_version"))
        self.path = path
        self.buckets = list(self.meta["batch_buckets"])
        self.devices = list(devices) if devices else None
        self._compiled = {}
        self._sharding = None
        sharded = self.meta.get("sharded")
        if sharded:
            # SPMD artifact: `devices` is the mesh (exact count), inputs are
            # batch-sharded over it — no round-robin chunk dispatch
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            devs = self.devices or jax.devices()[:sharded["n_devices"]]
            if len(devs) != sharded["n_devices"]:
                raise ValueError(
                    "sharded artifact needs exactly %d devices, got %d"
                    % (sharded["n_devices"], len(devs)))
            mesh = Mesh(np.asarray(devs), (sharded["axis"],))
            self._sharding = NamedSharding(mesh, P(sharded["axis"]))
            self.devices = None

    def _fn_for(self, bucket):
        if bucket not in self._compiled:
            from jax import export as jexport
            with open(os.path.join(self.path, "b%d.jaxexp" % bucket),
                      "rb") as f:
                exp = jexport.deserialize(f.read())
            self._compiled[bucket] = jax.jit(exp.call)
        return self._compiled[bucket]

    def _run_chunk(self, x, mask, device=None):
        """Dispatch one chunk; returns (device_array, n) without blocking."""
        n = x.shape[0]
        bucket = next((b for b in self.buckets if b >= n), self.buckets[-1])
        pad = bucket - n
        if pad:
            reps = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = np.pad(x, reps, mode="edge")
            if mask is not None:
                mask = np.pad(mask, [(0, pad), (0, 0), (0, 0)], mode="edge")
        args = (x,) if mask is None else (x, mask)
        if self._sharding is not None:
            args = tuple(jax.device_put(a, self._sharding) for a in args)
        elif device is not None:
            args = tuple(jax.device_put(a, device) for a in args)
        return self._fn_for(bucket)(*args), n

    def __call__(self, images, masks=None):
        x = np.asarray(images)
        h, w = self.meta["image_hw"]
        if x.ndim == 3:
            x = x[None]
        if x.shape[1:] != (h, w, 3):
            raise ValueError("input shape %s != (N, %d, %d, 3)"
                             % (x.shape, h, w))
        want_mask = self.meta["with_mask"]
        if want_mask:
            if masks is None:
                masks = np.ones(x.shape[:3], np.float32)
            else:
                masks = np.asarray(masks, np.float32)
                if masks.ndim == 2:  # single image, mirror x = x[None]
                    masks = masks[None]
        elif masks is not None:
            raise ValueError("artifact was exported without mask input")
        cap = self.buckets[-1]
        pending = []
        for ci, i in enumerate(range(0, x.shape[0], cap)):
            dev = (self.devices[ci % len(self.devices)]
                   if self.devices else None)
            pending.append(self._run_chunk(
                x[i:i + cap], masks[i:i + cap] if want_mask else None, dev))
        return np.concatenate([np.asarray(out)[:n] for out, n in pending], 0)


def load_artifact(path, devices=None):
    return Servable(path, devices=devices)
