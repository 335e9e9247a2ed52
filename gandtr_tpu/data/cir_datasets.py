"""cirtorch-style dataset adapters: tuple mining datasets + eval image lists.

Counterparts of /root/reference/mdir/components/data/dataset/
cirtorch_datasets.py: `CirTuples` (random-query mining), `CirDiverseAnchors`
(diverse-anchor mining), `CirImageList` (bbx crop + longest-side resize eval
list). The mining datasets produce padded square tuple batches with validity
masks and md5 augmentation gates (TupleEpochDataset) — the static-shape feed
for the jitted fine-tune step.
"""
import os
import re

import numpy as np

from gandtr_tpu.data.datasets import imread, path_join
from gandtr_tpu.data.mining import TuplesMiner, cid2filename
from gandtr_tpu.learning.wrappers import cir_hash_passthrough, metadata_name
from gandtr_tpu.utils.io import resolve_path


def imresize(img, imsize):
    from PIL import Image
    img.thumbnail((int(imsize), int(imsize)), Image.LANCZOS)
    return img


def generator_safe_bucket(image_size):
    """Padded-bucket side for tuple batches: rounded UP to a multiple of 4 so
    the 2x-down/2x-up CycleGAN generator maps the bucket onto itself. The
    torch reference feeds odd sizes (362) and simply embeds the generator's
    enlarged output (364) per image; under SPMD the augment/original select
    (`jnp.where`) needs one static shape, so the bucket itself is made
    generator-safe and the validity mask covers the pad."""
    return -(-int(image_size) // 4) * 4


class TupleEpochDataset:
    """Mined tuples as padded square batches (see finetune_build docstring)."""

    loader_params = {"drop_last": True}

    def __init__(self, db, images, transform, image_size, miner,
                 augment_ratio=0.25, augment_label="anc", neg_num=5,
                 device_preprocess=False):
        self.db = db
        self.images = images
        self.transform = transform
        self.image_size = int(image_size)
        self.pad_size = generator_safe_bucket(image_size)
        self.miner = miner
        self.augment_ratio = augment_ratio
        self.augment_label = augment_label
        self.neg_num = neg_num
        self.extract_fn = None
        self.tuples = None
        self.tuple_labels = None
        # EXACT uint8 staging (round-5 rehearsal: the f32 images + all-ones
        # float masks were 74 MB/step through the tunnel — 24x off the
        # in-graph bound). imresize returns a uint8 PIL image, and the
        # protocol transform (pil2np | totensor | normalize) is elementwise
        # AFTER the resize, so shipping the padded uint8 crop + per-image
        # (h, w) and normalizing in-graph is bit-identical to the host
        # pipeline. Only enabled by the builder when the transform chain is
        # the splittable form (transforms.split_device_transform).
        self.device_preprocess = bool(device_preprocess)

    def prepare_epoch(self, network=None, device=None):
        assert self.extract_fn is not None, "set extract_fn before training"
        qidxs, pidxs, nidxs, labels, stats = self.miner.create_epoch_tuples(
            self.extract_fn)
        self.tuples = list(zip(qidxs, pidxs, nidxs))
        self.tuple_labels = labels  # rows x tuples (may carry -easy/-hard)
        return stats

    def __len__(self):
        return len(self.tuples) if self.tuples else self.miner.qsize

    def _load_tuple(self, idxs):
        """Load + resize the whole tuple, then apply the transform
        VARIADICALLY across it like the reference (traindataset.py:175
        `self.transform(*output)`): random transforms share one draw over the
        tuple and multi-image transforms see all members (per-image
        application silently changed the training distribution — found by
        review)."""
        raws = [imresize(imread(self.images[i]), self.image_size)
                for i in idxs]
        if self.transform:
            arrs = self.transform(*raws)
            if not isinstance(arrs, (list, tuple)):
                arrs = [arrs]
        else:
            arrs = [np.asarray(r, np.float32) / 255.0 for r in raws]
        return [self._pad(np.asarray(a)) for a in arrs]

    def _pad(self, arr):
        H, W = arr.shape[:2]
        hw = self.pad_size
        out = np.zeros((hw, hw, arr.shape[2]), np.float32)
        out[:H, :W] = arr[:hw, :hw]
        mask = np.zeros((hw, hw), np.float32)
        mask[:min(H, hw), :min(W, hw)] = 1.0
        return out, mask

    def _load_tuple_u8(self, idxs):
        """uint8 staging: padded uint8 crops + per-image valid (h, w)."""
        outs, hws = [], []
        hw = self.pad_size
        for i in idxs:
            arr = np.asarray(imresize(imread(self.images[i]),
                                      self.image_size))
            if arr.ndim == 2:
                arr = arr[:, :, None].repeat(3, axis=2)
            H, W = arr.shape[:2]
            out = np.zeros((hw, hw, 3), np.uint8)
            out[:min(H, hw), :min(W, hw)] = arr[:hw, :hw]
            outs.append(out)
            hws.append((min(H, hw), min(W, hw)))
        return outs, np.asarray(hws, np.int32)

    def __getitem__(self, i):
        q, p, negs = self.tuples[i]
        negs = list(negs)
        tuple_labels = [row[i] for row in self.tuple_labels]
        # first_neg override (traindataset.py:167,179): "pos" relabels the
        # top-ranked negative's loss target to 1; "exc" drops it entirely
        first = [0.0]
        if negs:
            if self.miner.first_neg == "pos":
                first = [1.0]
            elif self.miner.first_neg == "exc":
                negs = negs[1:]
                del tuple_labels[2]
                first = [0.0] if negs else []
        idxs = [q, p] + negs
        labels = np.asarray([-1.0, 1.0] + (first + [0.0] * (len(negs) - 1)
                                           if negs else []), np.float32)
        # regex MATCH like everywhere else the label gate appears
        # (reference wrapper.py:124, finetune_build, CirRatioPassThrough)
        # — startswith broke regex labels like 'anc|pos'
        pmask = np.asarray(
            [bool(re.match(self.augment_label, lbl)) and
             cir_hash_passthrough(metadata_name(self.images[idx]),
                                  self.augment_ratio)
             for idx, lbl in zip(idxs, tuple_labels)], bool)
        if self.device_preprocess:
            imgs_u8, hws = self._load_tuple_u8(idxs)
            return np.stack(imgs_u8), hws, labels, pmask
        imgs, masks = [], []
        for im, m in self._load_tuple(idxs):
            imgs.append(im)
            masks.append(m)
        return np.stack(imgs), np.stack(masks), labels, pmask


def _load_db(dataset_pkl, split, ims_root, dataset_name=None):
    import pickle
    path = resolve_path(dataset_pkl) if dataset_pkl else None
    if path is None and dataset_name:
        path = resolve_path(
            f"data/train/{dataset_name}/{dataset_name}.pkl")
    with open(path, "rb") as f:
        db_full = pickle.load(f)
    db = db_full[split]
    root = resolve_path(ims_root or "")
    if root.endswith(".h5"):
        # h5 image store (traindataset.py:67-70): flat datasets keyed by raw
        # cid. The reference decodes the WHOLE store up front; we emit lazy
        # `store.h5#cid` paths that data.datasets.imread reads per image.
        _check_h5_store(root)
        images = ["%s#%s" % (root, cid) for cid in db["cids"]]
    elif "cids" in db:
        images = [cid2filename(cid, root) for cid in db["cids"]]
    else:
        images = [os.path.join(root, x) for x in db["ids"]]
    return db, images


def _check_h5_store(path):
    """The reference asserts the store layout before use
    (traindataset.py:69, genericdataset.py:48)."""
    import h5py
    with h5py.File(path, "r") as f:
        storage = f.attrs["storage_type"]
        if isinstance(storage, bytes):
            storage = storage.decode("utf8")
        elif not isinstance(storage, str):  # the reference's .tostring() form
            storage = np.asarray(storage).tobytes().decode("utf8")
        assert storage == "flat_by_cid", storage


def _count(value, default):
    """Reference configs use `.inf` for query/pool sizes (min() caps them in
    TuplesDataset); int(float('inf')) raised OverflowError — found by
    review."""
    v = float(value if value is not None else default)
    return (1 << 62) if v == float("inf") else int(v)


def _swap_qp(db, params):
    if params.pop("swap_qp", False):
        db = dict(db)
        db["qidxs"], db["pidxs"] = db["pidxs"], db["qidxs"]
    return db


def cir_tuples_dataset(data, transform, **params):
    """`CirTuples` (cirtorch_datasets.py:7-8): random-query hard-negative
    mining."""
    assert not data
    db, images = _load_db(params.pop("dataset_pkl", None), params.pop("split"),
                          params.pop("image_dir", ""),
                          params.pop("dataset", None))
    db = _swap_qp(db, params)
    image_size = params.pop("image_size")
    miner = TuplesMiner(db, nnum=int(params.pop("neg_num", 5)),
                        qsize=_count(params.pop("query_size", None), 2000),
                        poolsize=_count(params.pop("pool_size", None), 22000),
                        shuffle=bool(params.pop("shuffle", True)),
                        first_neg=params.pop("first_neg", "neg"))
    params.pop("qpool_size", None)
    assert not params, f"Unused CirTuples params: {sorted(params)}"
    return TupleEpochDataset(db, images, transform, image_size, miner,
                             neg_num=miner.nnum)


def cir_diverse_anchors_dataset(data, transform, **params):
    """`CirDiverseAnchors` (cirtorch_datasets.py:10-11, 53-115)."""
    assert not data
    db, images = _load_db(params.pop("dataset_pkl", None), params.pop("split"),
                          params.pop("image_dir", ""),
                          params.pop("dataset", None))
    db = _swap_qp(db, params)
    image_size = params.pop("image_size")
    miner = TuplesMiner(
        db, nnum=int(params.pop("neg_num", 5)),
        qsize=_count(params.pop("query_size", None), 2000),
        poolsize=_count(params.pop("pool_size", None), 22000),
        qpool_size=_count(params.pop("qpool_size", None), 10000),
        similar_exclude=float(params.pop("similar_exclude", 0.2)),
        similar_include=float(params.pop("similar_include", 0.8)),
        shuffle=bool(params.pop("shuffle", True)),
        mark_easy=params.pop("mark_easy", None),
        first_neg=params.pop("first_neg", "neg"))
    assert not params, f"Unused CirDiverseAnchors params: {sorted(params)}"
    return TupleEpochDataset(db, images, transform, image_size, miner,
                             neg_num=miner.nnum)


class CirImageListDataset:
    """`CirImageList` (cirtorch_datasets.py:33-50 + ImagesFromList): image
    paths (+ optional bbxs + labels), longest-side resize, error tolerance."""

    loader_params = {}

    def __init__(self, data, transform, image_dir="", image_size=None,
                 image_labels=False, ignore_errors=False,
                 load_images_with_bbx=False, **params):
        assert not params, f"Unused CirImageList params: {sorted(params)}"
        if image_labels:
            *data, self.labels = data
        else:
            self.labels = None
        self.images, self.bbxs = (data[0], None) if len(data) == 1 else data[:2]
        image_dir = resolve_path(image_dir)
        is_h5 = image_dir.endswith(".h5")
        if not is_h5:
            # the reference joins each image with the dir via daan path_join
            # BEFORE ImagesFromList — '*' extension DSL + default-.jpg
            # deduction apply here (cirtorch_datasets.py:38-39), and the bbx
            # renaming below then operates on the JOINED names
            self.images = [path_join(image_dir, img) for img in self.images]
            image_dir = ""
        if load_images_with_bbx and self.bbxs:
            # pre-cropped-file mode (genericdataset.py:33-45): query images
            # live as `base.x1_y1_x2_y2.ext` crops; the +1e-10 reproduces the
            # reference's matlab-compatible rounding of half-integer coords
            self.images = [self._bbx_filename(img, bbx) if bbx else img
                           for img, bbx in zip(self.images, self.bbxs)]
            self.bbxs = None
        if is_h5:
            # h5 store root (genericdataset.py:47-50): datasets keyed by the
            # image BASENAME; read lazily via `store.h5#key` paths.
            _check_h5_store(image_dir)
            self.images = ["%s#%s" % (image_dir, img.rsplit("/", 1)[-1])
                           for img in self.images]
            image_dir = ""
        self.image_dir = image_dir
        self.image_size = image_size
        self.transform = transform
        self.ignore_errors = ignore_errors

    @staticmethod
    def _bbx_filename(image, bbx):
        dirpath, fname = image.rsplit("/", 1) if "/" in image else (None, image)
        basename, ext = fname.split(".", 1) if "." in fname else (fname, None)
        out = "%s.%d_%d_%d_%d" % (
            (basename,) + tuple(round(x + 1e-10) for x in bbx))
        if ext:
            out = "%s.%s" % (out, ext)
        if dirpath:
            out = "%s/%s" % (dirpath, out)
        return out

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        # plain join, NOT daan path_join: ImagesFromList does
        # `os.path.join(root, img) if root else img` with no extension
        # deduction (genericdataset.py:51)
        name = self.images[i]
        path = os.path.join(self.image_dir, name) if self.image_dir else name
        try:
            img = imread(path)
        except Exception:
            if self.ignore_errors:
                return {}
            raise
        imfullsize = max(img.size)
        if self.bbxs is not None and self.bbxs[i]:
            img = img.crop(self.bbxs[i])
        if self.image_size is not None:
            scale = max(img.size) / imfullsize if (self.bbxs is not None and
                                                   self.bbxs[i]) else 1.0
            img = imresize(img, self.image_size * scale)
        if self.transform:
            img = self.transform(img)
        return img
