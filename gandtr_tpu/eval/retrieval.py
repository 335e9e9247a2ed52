"""Retrieval evaluation: dataset configs, descriptor extraction, mAP.

Mirrors the reference eval chain (SURVEY.md §3.3): configdataset gnd pkls
(/root/reference/mdir/external/cirtorch/datasets/testdataset.py:6-32),
ImagesFromList-style loading with bbx crops + longest-side LANCZOS resize
(genericdataset.py:66-102, datahelpers.py:75-82), multiscale + whitening
staged in the jitted forward (wrapper.py:197-263, 308-322), on-device
`V.T @ Q` ranking, and E/M/H protocol mAP (evaluate.py:114-152).

XLA static shapes vs variable-resolution images: extraction compiles one graph
per unique image shape (cached); pass `shape_bucket` to round spatial dims up
to a multiple with exact masked compute (ops/maskprop.py: zero-pad re-masking
per layer, masked pooling/IN stats, boundary-clamped reflect pads) — bucketed
descriptors equal exact-shape ones to <=1e-5 including gradients
(tests/test_exact_bucketing.py), so bucketing is purely a compile-count
optimization.
"""
import os
import pickle

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp

from gandtr_tpu.data.datasets import imread
from gandtr_tpu.ops.ranking import rank_descriptors, compute_map_protocols


DATASETS = ["oxford5k", "paris6k", "roxford5k", "rparis6k", "247tokyo1k"]


def configdataset(dataset, dir_main):
    """Load a gnd_<dataset>.pkl test-set config (testdataset.py:6-32)."""
    dataset = dataset.lower()
    if dataset not in DATASETS:
        raise ValueError("Unknown dataset: {}!".format(dataset))
    gnd_fname = os.path.join(dir_main, dataset, "gnd_{}.pkl".format(dataset))
    with open(gnd_fname, "rb") as f:
        cfg = pickle.load(f)
    cfg["gnd_fname"] = gnd_fname
    cfg["ext"] = ".jpg"
    cfg["qext"] = ".jpg"
    cfg["dir_data"] = os.path.join(dir_main, dataset)
    cfg["dir_images"] = os.path.join(cfg["dir_data"], "jpg")
    cfg["n"] = len(cfg["imlist"])
    cfg["nq"] = len(cfg["qimlist"])
    cfg["dataset"] = dataset
    return cfg


def configdataset_tsv(dataset):
    """Build an eval cfg from the reference's tsv dataset dict form
    {name, queries, db, imgdir} (cirscore.py:26-40): db rows give the
    identifier order, query rows carry bbx/ok/junk columns with
    JSON-bracketed lists."""
    from gandtr_tpu.utils.file_readers import initialize_file_reader
    from gandtr_tpu.data.datasets import path_join
    from gandtr_tpu.utils.io import resolve_path

    assert dataset.keys() == {"name", "queries", "db", "imgdir"}
    imgdir = dataset["imgdir"]
    with initialize_file_reader(resolve_path(dataset["db"]),
                                keys=["identifier"]) as reader:
        identifiers = reader.get()["identifier"]
    images = [path_join(imgdir, x) for x in identifiers]
    mapping = {x: i for i, x in enumerate(identifiers)}
    with initialize_file_reader(resolve_path(dataset["queries"]),
                                keys=["query", "bbx", "ok", "junk"]) as reader:
        data = reader.get()
    qimages = [path_join(imgdir, x) for x in data["query"]]
    bbxs = [tuple(x) if x else None for x in data["bbx"]]
    gnd = [{"ok": [mapping[x] for x in ok],
            "junk": [mapping[x] for x in junk]}
           for ok, junk in zip(data["ok"], data["junk"])]
    return {"dataset": dataset["name"], "im_paths": images,
            "qim_paths": qimages, "bbxs": bbxs, "gnd": gnd,
            "n": len(images), "nq": len(qimages)}


def im_fname(cfg, i):
    if "im_paths" in cfg:
        return cfg["im_paths"][i]
    return os.path.join(cfg["dir_images"], cfg["imlist"][i] + cfg["ext"])


def qim_fname(cfg, i):
    if "qim_paths" in cfg:
        return cfg["qim_paths"][i]
    return os.path.join(cfg["dir_images"], cfg["qimlist"][i] + cfg["qext"])


def imresize(img, imsize):
    """Longest-side LANCZOS thumbnail (datahelpers.py:75-82)."""
    img.thumbnail((int(imsize), int(imsize)), Image.LANCZOS)
    return img


class ShapeCachedExtractor:
    """Single-image descriptor extraction with a per-shape jit cache.

    forward(variables, image_batch) -> (N, D) descriptors; wrappers
    (multiscale, whitening) are part of `forward` and thus of each compiled
    graph. With `shape_bucket`, images pad up to multiples and a mask rides
    along (masked GeM).

    With `devices` (a list of jax devices), calls round-robin across them —
    data-parallel extraction: dispatch is async, so up to len(devices)
    batches are in flight; the caller materializes results late
    (extract_vectors does). Variables are replicated per device on first use.
    """

    def __init__(self, forward, variables, shape_bucket=None, devices=None):
        self.forward = forward
        self.variables = variables
        self.shape_bucket = shape_bucket
        # honor a single-device list too (pin extraction to one chip)
        self.devices = list(devices) if devices else None
        self._dev_variables = {}
        self._rr = 0
        self._cache = {}

    def _jit_for(self, shape):
        if shape not in self._cache:
            self._cache[shape] = jax.jit(self.forward)
        return self._cache[shape]

    def _place(self, *arrays):
        """Round-robin device placement; returns (variables, *placed)."""
        if not self.devices:
            return (self.variables,) + tuple(jnp.asarray(a) for a in arrays)
        d = self.devices[self._rr % len(self.devices)]
        self._rr += 1
        if d not in self._dev_variables:
            self._dev_variables[d] = jax.device_put(self.variables, d)
        return (self._dev_variables[d],) + tuple(
            jax.device_put(a, d) for a in arrays)

    def group_key(self, img_np):
        """Shape key under which images share one compiled graph (the padded
        bucket shape when bucketing, the exact shape otherwise)."""
        H, W = img_np.shape[:2]
        if self.shape_bucket:
            b = self.shape_bucket
            return (-(-H // b) * b, -(-W // b) * b) + img_np.shape[2:]
        return img_np.shape

    def _pad_and_mask(self, img_np):
        # zero-pad: with per-layer re-masking in the backbone
        # (ops/maskprop.py) a zero band at the valid border is exactly the
        # exact-shape compute's own zero SAME padding, so bucketed
        # descriptors EQUAL exact-shape descriptors (float-assoc noise only)
        Hp, Wp = self.group_key(img_np)[:2]
        H, W = img_np.shape[:2]
        padded = np.pad(img_np, ((0, Hp - H), (0, Wp - W), (0, 0)))
        mask = np.zeros((Hp, Wp), np.float32)
        mask[:H, :W] = 1.0
        return padded, mask

    def __call__(self, img_np):
        """img_np: (H, W, C) preprocessed image -> (D,) descriptor (a jax
        array — dispatch is async, materialize late)."""
        if self.shape_bucket:
            padded, mask = self._pad_and_mask(img_np)
            fn = self._jit_for(padded.shape[:2] + (True,))
            v, x, m = self._place(padded[None], mask[None])
            out = fn(v, x, m)
        else:
            fn = self._jit_for(img_np.shape[:2])
            v, x = self._place(img_np[None])
            out = fn(v, x)
        return out[0]

    def batch(self, imgs_np):
        """Batched extraction of images sharing one `group_key`: list/array of
        (H, W, C) -> list of (D,) descriptors (jax arrays). One compiled
        graph per (shape, batch) pair."""
        if self.shape_bucket:
            pm = [self._pad_and_mask(im) for im in imgs_np]
            padded = np.stack([p for p, _ in pm])
            masks = np.stack([m for _, m in pm])
            fn = self._jit_for(padded.shape[1:3] + (True,))
            v, x, m = self._place(padded, masks)
            out = fn(v, x, m)
        else:
            imgs_np = np.stack(imgs_np)
            fn = self._jit_for(imgs_np.shape[:3])
            v, x = self._place(imgs_np)
            out = fn(v, x)
        return list(out)


def _load_preprocessed(path, image_size, transform, bbx=None):
    img = imread(path)
    imfullsize = max(img.size)
    if bbx:
        img = img.crop(bbx)
    if image_size is not None:
        if bbx:
            img = imresize(img, image_size * max(img.size) / imfullsize)
        else:
            img = imresize(img, image_size)
    return transform(img) if transform else np.asarray(img, np.float32) / 255.0


def _prefetched(n, loadfn, workers=2, depth=8):
    """Yield (i, loadfn(i)) in order while a small thread pool preloads up to
    `depth` items ahead — overlaps host decode/CLAHE with device compute
    without holding more than `depth` images in memory."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if n <= 1 or depth <= 1:
        for i in range(n):
            yield i, loadfn(i)
        return
    ex = ThreadPoolExecutor(workers)
    try:
        dq = deque(ex.submit(loadfn, i) for i in range(min(depth, n)))
        for i in range(n):
            arr = dq.popleft().result()
            if i + depth < n:
                dq.append(ex.submit(loadfn, i + depth))
            yield i, arr
    finally:
        ex.shutdown(wait=False, cancel_futures=True)


def extract_vectors(extractor, image_paths, image_size, transform, bbxs=None,
                    print_freq=500, batch_size=1, prefetch=8):
    """Extract descriptors for a list of images -> (D, N) column matrix
    (imageretrievalnet.py:312-339 semantics: bbx crop relative resize,
    longest-side resize, transform, single-image forward).

    With batch_size > 1, images sharing a compiled-graph shape (exact shape,
    or padded bucket shape when the extractor buckets) are buffered and
    forwarded together, bounding both recompiles and host memory. Host
    preprocessing runs `prefetch` images ahead on a thread pool.
    """
    n = len(image_paths)
    vecs = [None] * n
    done = 0

    def flush(batch):
        nonlocal done
        idxs, arrs = zip(*batch)
        if len(arrs) == 1:
            outs = [extractor(arrs[0])]
        else:
            outs = extractor.batch(list(arrs)) if hasattr(extractor, "batch") \
                else [extractor(a) for a in arrs]
        for i, v in zip(idxs, outs):
            vecs[i] = v  # jax arrays stay async; materialized at the end
        done += len(batch)
        if done % print_freq < len(batch) or done == n:
            print("\r>>>> {}/{} done...".format(done, n), end="")

    def load(i):
        return _load_preprocessed(image_paths[i], image_size, transform,
                                  bbxs[i] if bbxs is not None else None)

    group_key = getattr(extractor, "group_key", lambda a: a.shape)
    buffers = {}
    buffered = 0
    # heterogeneous shapes (aspect-preserving resize w/o shape_bucket) would
    # otherwise buffer nearly the whole dataset in host f32 — cap the total
    # and flush the fullest group as a partial batch when the cap is hit
    max_buffered = max(batch_size * 8, 64)
    for i, arr in _prefetched(n, load, depth=max(prefetch, batch_size)):
        key = group_key(arr)
        buffers.setdefault(key, []).append((i, arr))
        buffered += 1
        if len(buffers[key]) >= batch_size:
            buffered -= len(buffers[key])
            flush(buffers.pop(key))
        elif buffered >= max_buffered:
            fullest = max(buffers, key=lambda k: len(buffers[k]))
            buffered -= len(buffers[fullest])
            flush(buffers.pop(fullest))
    for batch in buffers.values():
        flush(batch)
    print("")
    return np.stack([np.asarray(v) for v in vecs], axis=1)  # (D, N)


def evaluate_dataset(extractor, cfg, image_size, transform, batch_size=1):
    """Full retrieval eval of one dataset (cirscore.py:51-83): extract db +
    query descriptors, rank on device, compute protocol mAPs."""
    db_paths = [im_fname(cfg, i) for i in range(cfg["n"])]
    q_paths = [qim_fname(cfg, i) for i in range(cfg["nq"])]
    # per-entry like the reference (cirscore.py:46): one None bbx must not
    # disable cropping for the other queries (found by review)
    bbxs = cfg.get("bbxs")  # tsv dict form carries bbxs outside gnd
    if bbxs is None and "gnd" in cfg:
        bbxs = [tuple(g["bbx"]) if g.get("bbx") else None
                for g in (cfg["gnd"][i] for i in range(cfg["nq"]))]
    if bbxs is not None and all(b is None for b in bbxs):
        bbxs = None

    vecs = extract_vectors(extractor, db_paths, image_size, transform,
                           batch_size=batch_size)
    if q_paths == db_paths and bbxs is None:
        # queries are the db images: reuse descriptors (cirscore.py:58-59)
        qvecs = vecs.copy()
    else:
        qvecs = extract_vectors(extractor, q_paths, image_size, transform,
                                bbxs=bbxs, batch_size=batch_size)

    ranks = np.asarray(rank_descriptors(vecs.astype(np.float32),
                                        qvecs.astype(np.float32)))
    metrics, aps = compute_map_protocols(cfg["dataset"], ranks, cfg["gnd"])
    return metrics, aps, vecs, qvecs
