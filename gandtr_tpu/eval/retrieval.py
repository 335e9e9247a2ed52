"""Retrieval evaluation: dataset configs, descriptor extraction, mAP.

Mirrors the reference eval chain (SURVEY.md §3.3): configdataset gnd pkls
(/root/reference/mdir/external/cirtorch/datasets/testdataset.py:6-32),
ImagesFromList-style loading with bbx crops + longest-side LANCZOS resize
(genericdataset.py:66-102, datahelpers.py:75-82), multiscale + whitening
staged in the jitted forward (wrapper.py:197-263, 308-322), on-device
`V.T @ Q` ranking, and E/M/H protocol mAP (evaluate.py:114-152).

XLA static shapes vs variable-resolution images: extraction compiles one graph
per unique image shape (cached); pass `shape_bucket` to round spatial dims up
to a multiple with masked pooling instead (faster, approximate near borders).
"""
import os
import pickle
from collections import OrderedDict

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


def im_fname(cfg, i):
    return os.path.join(cfg["dir_images"], cfg["imlist"][i] + cfg["ext"])


def qim_fname(cfg, i):
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
    """

    def __init__(self, forward, variables, shape_bucket=None):
        self.forward = forward
        self.variables = variables
        self.shape_bucket = shape_bucket
        self._cache = {}

    def _jit_for(self, shape):
        if shape not in self._cache:
            self._cache[shape] = jax.jit(self.forward)
        return self._cache[shape]

    def __call__(self, img_np):
        """img_np: (H, W, C) preprocessed image -> (D,) descriptor."""
        if self.shape_bucket:
            b = self.shape_bucket
            H, W = img_np.shape[:2]
            Hp = -(-H // b) * b
            Wp = -(-W // b) * b
            # edge-pad (not zero): limits feature contamination at the valid
            # boundary; masked GeM excludes the padded region itself
            padded = np.pad(img_np, ((0, Hp - H), (0, Wp - W), (0, 0)),
                            mode="edge")
            mask = np.zeros((Hp, Wp), np.float32)
            mask[:H, :W] = 1.0
            fn = self._jit_for((Hp, Wp, True))
            out = fn(self.variables, jnp.asarray(padded)[None],
                     jnp.asarray(mask)[None])
        else:
            fn = self._jit_for(img_np.shape[:2])
            out = fn(self.variables, jnp.asarray(img_np)[None])
        return np.asarray(out)[0]

    def batch(self, imgs_np):
        """Batched extraction of same-shaped images: (B, H, W, C) -> list of
        (D,) descriptors. One compiled graph per (shape, batch) pair."""
        if self.shape_bucket:
            return [self(im) for im in imgs_np]
        fn = self._jit_for(imgs_np.shape[:3])
        out = fn(self.variables, jnp.asarray(imgs_np))
        return list(np.asarray(out))


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


def extract_vectors(extractor, image_paths, image_size, transform, bbxs=None,
                    print_freq=500, batch_size=1):
    """Extract descriptors for a list of images -> (D, N) column matrix
    (imageretrievalnet.py:312-339 semantics: bbx crop relative resize,
    longest-side resize, transform, single-image forward).

    With batch_size > 1, same-shaped images are buffered and forwarded in
    batches (one compiled graph per unique shape either way), bounding both
    recompiles and host memory.
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
            outs = extractor.batch(np.stack(arrs)) if hasattr(extractor, "batch") \
                else [extractor(a) for a in arrs]
        for i, v in zip(idxs, outs):
            vecs[i] = np.asarray(v)
        done += len(batch)
        if done % print_freq < len(batch) or done == n:
            print("\r>>>> {}/{} done...".format(done, n), end="")

    buffers = {}
    for i, path in enumerate(image_paths):
        arr = _load_preprocessed(path, image_size, transform,
                                 bbxs[i] if bbxs is not None else None)
        key = arr.shape
        buffers.setdefault(key, []).append((i, arr))
        if len(buffers[key]) >= batch_size:
            flush(buffers.pop(key))
    for batch in buffers.values():
        flush(batch)
    print("")
    return np.stack(vecs, axis=1)  # (D, N)


def evaluate_dataset(extractor, cfg, image_size, transform):
    """Full retrieval eval of one dataset (cirscore.py:51-83): extract db +
    query descriptors, rank on device, compute protocol mAPs."""
    db_paths = [im_fname(cfg, i) for i in range(cfg["n"])]
    q_paths = [qim_fname(cfg, i) for i in range(cfg["nq"])]
    bbxs = None
    try:
        bbxs = [tuple(cfg["gnd"][i]["bbx"]) for i in range(cfg["nq"])]
    except (KeyError, TypeError):
        bbxs = None

    vecs = extract_vectors(extractor, db_paths, image_size, transform)
    qvecs = extract_vectors(extractor, q_paths, image_size, transform, bbxs=bbxs)

    ranks = np.asarray(rank_descriptors(vecs.astype(np.float32),
                                        qvecs.astype(np.float32)))
    metrics, aps = compute_map_protocols(cfg["dataset"], ranks, cfg["gnd"])
    return metrics, aps, vecs, qvecs
