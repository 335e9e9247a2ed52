"""Host-side datasets + batch loader.

Mirrors /root/reference/mdir/components/data/dataset/: ImageList,
InferImageList, RandomImageTuple, PregeneratedImageTuple, RandomDomainsPair,
and the registry/initializer. The torch DataLoader (num_workers 6, pin_memory)
becomes a thread-pool prefetch loader feeding numpy batches ready for
`jax.device_put` double-buffering.
"""
import random
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image, ImageFile

ImageFile.LOAD_TRUNCATED_IMAGES = True


import os as _os
import threading as _threading

# Native (C++) decode fast path: libjpeg/libpng on GIL-released ctypes calls,
# bit-exact vs PIL (tests/test_native_loader.py). Default on; disable with
# GANDTR_TPU_NATIVE_LOADER=0 (e.g. when bisecting loader behavior).
_NATIVE_OK = _os.environ.get("GANDTR_TPU_NATIVE_LOADER", "1") != "0"


# Lazy-h5 read-handle cache: the loader's thread pool hits the store once
# per image per epoch — a per-read File open pays HDF5 metadata overhead
# ~100k times per epoch. h5py is not thread-safe without a threadsafe HDF5
# build, so reads serialize under one lock (decode dominates, not the read).
_H5_HANDLES = {}
_H5_LOCK = _threading.Lock()


def _h5_read(h5path, key):
    import h5py
    with _H5_LOCK:
        f = _H5_HANDLES.get(h5path)
        if f is None:
            f = _H5_HANDLES[h5path] = h5py.File(h5path, "r")
        try:
            return np.asarray(f[key])
        except KeyError:
            # the store may have been rewritten since first open (tests,
            # regenerated caches) — reopen once before failing for real
            _H5_HANDLES.pop(h5path).close()
            f = _H5_HANDLES[h5path] = h5py.File(h5path, "r")
            return np.asarray(f[key])


def imread(path, mode="RGB"):
    """Load an image; `archive.h5#key` reads from an HDF5 dataset (the
    reference's h5 image storage, traindataset.py h5 branch)."""
    if ".h5#" in path:
        h5path, key = path.split("#", 1)
        return Image.fromarray(_h5_read(h5path, key)).convert(mode)
    if _NATIVE_OK and mode == "RGB":
        from gandtr_tpu import native
        if native.available():
            arr = native.decode(path)
            if arr is not None:
                return Image.fromarray(arr)
    with open(path, "rb") as f:
        return Image.open(f).convert(mode)


def path_join(directory, name, default_extension=".jpg"):
    """Faithful port of daan path_join (ml/tools.py:26-48): absolute names
    pass through; '*' in the path splits off an extension candidate; 'ext!'
    force-replaces the name's extension (plain 'ext' only applies when the
    name has none); extension-less names under a '*'-free path get
    `default_extension` — INCLUDING under an empty directory (differentially
    pinned vs the reference's actual ml/tools.py). None directory = ''."""
    directory = directory or ""
    if name and name[0] == "/":
        return name
    ext = default_extension
    path = directory
    if "*" in path:
        path, ext = path.rsplit("*", 1)
    if "/" not in ext:
        if ext and ext[-1] == "!":
            ext = ext[:-1]
            if ext:
                name = name.rsplit(".", 1)[0]
        elif "." in name.rsplit("/", 1)[-1] and name.rsplit(".", 1)[-1]:
            ext = ""
    return _os.path.join(path, name + ext)


class ImageListDataset:
    """Images from parallel name lists (tuple_datasets.py:19-40)."""

    loader_params = {}

    def __init__(self, data, transform, image_dir, mode=None):
        assert len({len(x) for x in data}) == 1
        self.image_list = [[path_join(image_dir, x) for x in y] for y in zip(*data)]
        self.transform = transform
        self.mode = mode

    def __len__(self):
        return len(self.image_list)

    def __getitem__(self, idx):
        images = tuple(imread(x, self.mode or "RGB") for x in self.image_list[idx])
        if self.transform:
            images = self.transform(*images)
        return images


class InferImageListDataset(ImageListDataset):
    """Adds image names to each item (tuple_datasets.py:43-60)."""

    def __init__(self, data, transform, image_dir, mode=None):
        super().__init__(data, transform, image_dir, mode)
        self.data = [list(x) for x in zip(*data)]

    def __getitem__(self, idx):
        images = super().__getitem__(idx)
        return tuple(self.data[idx]), images


class RandomImageTupleDataset:
    """Per-epoch index re-sampling with the any/different/range idx DSL
    (tuple_datasets.py:63-122)."""

    loader_params = {}

    def __init__(self, data, transform, dataset, data_key, image_dir, idx,
                 rng=None):
        assert not data
        image_list = self._read_dataset(dataset, data_key)
        self.image_list = [[path_join(image_dir, y) for y in x] for x in image_list]
        self.transform = transform
        if isinstance(idx, str):
            idx = [x if x in {"any", "different"} else int(x) for x in idx.split("_")]
        self.idx = idx
        self.epoch_images = None
        self._rng = rng or np.random

    @staticmethod
    def _read_dataset(dataset, data_key):
        if isinstance(dataset, dict):
            return dataset[data_key]
        # the reference reads tuple lists through the file-reader facade
        # (tuple_datasets.py:68-69): tsv/csv/pkl/h5/lst (+.gz/.xz), with
        # JSON-bracketed tsv cells decoded to lists
        from gandtr_tpu.utils.file_readers import initialize_file_reader
        with initialize_file_reader(dataset, keys=[data_key]) as reader:
            return reader.get()[data_key]

    @staticmethod
    def get_idx(idx, length, previous_idxs, rand):
        if idx == "any":
            return rand(length)
        if idx == "different":
            idxs = [x for x in range(length) if x not in previous_idxs]
            return idxs[rand(len(idxs))]
        if isinstance(idx, (list, tuple)):
            # bounds-check each end (normalized negatives), then feed the RAW
            # values to rand, exactly like the reference (tuple_datasets.py
            # :87-95: a negative start reaches randint un-normalized)
            for idxi in idx:
                if idxi is not None:
                    if idxi < 0:
                        idxi = length + idxi
                    assert 0 <= idxi < length
            return rand(idx[0] or 0, idx[1] or length)
        if idx < 0:
            idx = length + idx
        assert 0 <= idx < length
        return idx

    def _generate_epoch_images(self, rand):
        self.epoch_images = []
        for possible in self.image_list:
            idxs = []
            for i in self.idx:
                idxs.append(self.get_idx(i, len(possible), idxs, rand))
            self.epoch_images.append([possible[j] for j in idxs])

    def prepare_epoch(self, network=None, device=None):
        self._generate_epoch_images(self._rng.randint)
        return None

    def __len__(self):
        return len(self.image_list)

    def __getitem__(self, idx):
        images = [imread(x) for x in self.epoch_images[idx]]
        if self.transform:
            images = self.transform(*images)
        return images


class PregeneratedImageTupleDataset(RandomImageTupleDataset):
    """Seed-0 fixed sampling, resume-safe (tuple_datasets.py:125-135)."""

    def __init__(self, data, transform, dataset, data_key, image_dir, idx):
        super().__init__(data, transform, dataset, data_key, image_dir, idx)
        self._generate_epoch_images(random.Random(0).randrange)

    def prepare_epoch(self, network=None, device=None):
        return None


class RandomDomainsPairDataset:
    """Unpaired X/Y domain sampling per epoch (domain_datasets.py:10-58)."""

    loader_params = {}

    def __init__(self, data, transform, dataset_X, dataset_Y, image_dir, size,
                 image_dir_Y=None, rng=None):
        assert not data
        image_dir_Y = image_dir if image_dir_Y is None else image_dir_Y
        self.images_X = [path_join(image_dir, x) for x in self._read_list(dataset_X)]
        self.images_Y = [path_join(image_dir_Y, y) for y in self._read_list(dataset_Y)]
        self.transform = transform
        self.size = int(size) if size is not None else min(len(self.images_X),
                                                           len(self.images_Y))
        self._rng = rng or np.random
        self.idxs_X = self.idxs_Y = None

    @staticmethod
    def _read_list(path_or_list):
        if isinstance(path_or_list, (list, tuple)):
            return list(path_or_list)
        with open(path_or_list) as f:
            return [x.strip() for x in f.readlines()]

    def prepare_epoch(self, network=None, device=None):
        self.idxs_X = list(self._rng.randint(len(self.images_X), size=self.size))
        self.idxs_Y = list(self._rng.randint(len(self.images_Y), size=self.size))
        return None

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        images = (imread(self.images_X[self.idxs_X[idx]]),
                  imread(self.images_Y[self.idxs_Y[idx]]))
        if self.transform:
            images = self.transform(*images)
        return images


class Loader:
    """Thread-pool prefetch batch loader (replaces torch DataLoader workers).

    Yields lists of dataset items per batch; `collate` stacks them (default:
    stack each tuple position into an (N, H, W, C) array).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 num_workers=6, collate=None, seed=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate = collate or stack_collate
        self.rng = np.random.RandomState(seed)
        # in-flight batch depth: dispatch_chunk drains `chunk` batches per
        # device dispatch, so the chunked train path raises this to keep the
        # decode threads busy during the device window (round-5 rehearsal:
        # depth 2 left ~190 ms/step of loader drain at chunk 8)
        self.prefetch = int(prefetch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 1:
            for b in batches:
                yield self.collate([self.dataset[int(i)] for i in b])
            return

        with ThreadPoolExecutor(self.num_workers) as ex:
            futures = []
            prefetch = self.prefetch
            it = iter(batches)

            def submit_next():
                try:
                    b = next(it)
                except StopIteration:
                    return
                futures.append(ex.submit(
                    lambda bb: self.collate([self.dataset[int(i)] for i in bb]), b))

            for _ in range(prefetch + 1):
                submit_next()
            while futures:
                f = futures.pop(0)
                submit_next()
                yield f.result()


def stack_collate(items):
    """Stack sequence positions: [(a1, b1), (a2, b2)] -> (stack(a), stack(b)).

    Items may be tuples (CirTuples: imgs/masks/labels/pmask) or LISTS — the
    transform chain returns lists for multi-image datasets
    (RandomDomainsPair / *ImageTuple), and torch's default_collate transposes
    both. Round-4's GAN-train cross-engine oracle caught that lists fell
    through untransposed: batch_to_args then read b[0] = ITEM 0 (its [X, Y]
    stacked as a pseudo-batch) instead of the X batch — every GAN train
    batch read through a Loader was mispaired, and batch_size 1 raised."""
    first = items[0]
    if isinstance(first, (tuple, list)) and len(first) > 1 \
            and isinstance(first[0], np.ndarray):
        return tuple(np.stack([it[i] for it in items])
                     for i in range(len(first)))
    if isinstance(first, np.ndarray):
        return np.stack(items)
    return items


def _lazy_cir(name):
    def build(data, transform, **params):
        from gandtr_tpu.data import cir_datasets
        return getattr(cir_datasets, name)(data, transform, **params)
    return build


def _lazy_cir_imagelist(data, transform, **params):
    from gandtr_tpu.data.cir_datasets import CirImageListDataset
    return CirImageListDataset(data, transform, **params)


DATASET_LABELS = {
    "ImageList": ImageListDataset,
    "InferImageList": InferImageListDataset,
    "RandomImageTuple": RandomImageTupleDataset,
    "PregeneratedImageTuple": PregeneratedImageTupleDataset,
    "RandomDomainsPair": RandomDomainsPairDataset,
    "CirTuples": _lazy_cir("cir_tuples_dataset"),
    "CirDiverseAnchors": _lazy_cir("cir_diverse_anchors_dataset"),
    "CirImageList": _lazy_cir_imagelist,
}


def initialize_dataset_loader(data, split, params, loader_defaults=None):
    """Build dataset + Loader from a reference-style config
    (dataset/__init__.py:8-41): params = {dataset: {...name...}, loader: {...}}."""
    from gandtr_tpu.data.transforms import initialize_transforms

    params = dict(params)
    dparams = dict(params.pop("dataset"))
    user_loader = dict(params.pop("loader", {}))
    transforms = None
    if "transforms" in params:
        transforms = initialize_transforms(params.pop("transforms"),
                                           params.pop("mean_std"))
    name = dparams.pop("name")
    dataset = DATASET_LABELS[name](data, transforms, **dparams)
    # precedence like the reference (dataset/__init__.py:39): defaults <
    # dataset.loader_params < the user's loader config (config wins; the
    # previous order let dataset defaults silently override configs)
    lparams = {"num_workers": 6, **(loader_defaults or {}),
               **getattr(dataset, "loader_params", {}), **user_loader}
    lparams.pop("pin_memory", None)
    return Loader(dataset, **lparams)
