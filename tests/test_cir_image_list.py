"""CirImageList adapter vs the reference's ACTUAL ImagesFromList.

Loads /root/reference/mdir/external/cirtorch/datasets/genericdataset.py (+
datahelpers) standalone and compares gandtr_tpu.data.cir_datasets.
CirImageListDataset against it: bbx crop + full-size-relative longest-side
resize, the `load_images_with_bbx` pre-cropped-filename mode (matlab +1e-10
rounding), image_labels splitting, ignore_errors, and the `.h5`
flat_by_cid image store (which the reference eagerly decodes and we read
lazily via `store.h5#key` paths).

Reference: genericdataset.py:12-110, datahelpers.py:18-37,66-80,
cirtorch_datasets.py:34-50, traindataset.py:67-72.
"""
import importlib.util as ilu
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from gandtr_tpu.data.cir_datasets import CirImageListDataset, _load_db

_DSDIR = "/root/reference/mdir/external/cirtorch/datasets"

needs_reference = pytest.mark.skipif(not os.path.isdir(_DSDIR),
                                     reason="reference tree not mounted")
torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")


def _load(fullname, path):
    spec = ilu.spec_from_file_location(fullname, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    # save/restore sys.modules like test_transforms_differential — leaked
    # stubs break other differential fixtures run later in the same process
    names = ("cirtorch", "cirtorch.datasets", "torchvision",
             "cirtorch.datasets.datahelpers",
             "cirtorch.datasets.genericdataset")
    saved = {k: sys.modules.get(k) for k in names}
    for pkg in ("cirtorch", "cirtorch.datasets"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    if "torchvision" not in sys.modules:  # datahelpers.py:69 backend probe
        tv = types.ModuleType("torchvision")
        tv.get_image_backend = lambda: "PIL"
        sys.modules["torchvision"] = tv
    try:
        dh = _load("cirtorch.datasets.datahelpers",
                   os.path.join(_DSDIR, "datahelpers.py"))
        sys.modules["cirtorch.datasets"].datahelpers = dh
        gd = _load("cirtorch.datasets.genericdataset",
                   os.path.join(_DSDIR, "genericdataset.py"))
        yield types.SimpleNamespace(gd=gd, dh=dh)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _write_images(tmp_path, names, size=(21, 13)):
    rng = np.random.RandomState(7)
    for name in names:
        arr = rng.randint(0, 255, size + (3,), np.uint8)
        path = tmp_path / name
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr).save(path)


@needs_reference
def test_bbx_crop_resize_matches_reference(ref, tmp_path):
    names = ["a.png", "b.png", "c.png"]
    _write_images(tmp_path, names, size=(40, 30))
    bbxs = [(3, 2, 25, 19), None, (0, 0, 12, 30)]

    theirs = ref.gd.ImagesFromList(root=str(tmp_path), images=names,
                                   imsize=17, bbxs=bbxs)
    ours = CirImageListDataset([names, bbxs], None,
                               image_dir=str(tmp_path), image_size=17)
    assert len(ours) == len(theirs) == 3
    for i in range(3):
        a, b = np.asarray(theirs[i]), np.asarray(ours[i])
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=str(i))


@needs_reference
def test_load_images_with_bbx_filename_mapping(ref, tmp_path):
    # pre-cropped files: base.x1_y1_x2_y2.ext under a subdir (the reference's
    # no-slash branch is a latent NameError, so dirpath'd names only)
    _write_images(tmp_path, ["sub/q1.4_2_20_11.png", "sub/q2.png"],
                  size=(24, 32))
    names = ["sub/q1.png", "sub/q2.png"]
    # half-integer coords round matlab-style (up) via the +1e-10 nudge
    bbxs = [(3.5, 1.5, 19.5, 10.5), None]

    theirs = ref.gd.ImagesFromList(root=str(tmp_path), images=list(names),
                                   imsize=None, bbxs=list(bbxs),
                                   load_images_with_bbx=True)
    ours = CirImageListDataset([list(names), list(bbxs)], None,
                               image_dir=str(tmp_path),
                               load_images_with_bbx=True)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(theirs[i]),
                                      np.asarray(ours[i]), err_msg=str(i))


def test_image_labels_and_ignore_errors(tmp_path):
    _write_images(tmp_path, ["x.png"])
    ds = CirImageListDataset([["x.png", "missing.png"], ["lab1", "lab2"]],
                             None, image_dir=str(tmp_path),
                             image_labels=True, ignore_errors=True)
    assert ds.labels == ["lab1", "lab2"]
    assert np.asarray(ds[0]).shape == (21, 13, 3)
    assert ds[1] == {}  # ignore_errors: missing image -> {} (genericdataset)
    with pytest.raises(Exception):
        CirImageListDataset([["missing.png"]], None,
                            image_dir=str(tmp_path))[0]


def _write_h5_store(path, keyed_images):
    with h5py.File(path, "w") as f:
        f.attrs["storage_type"] = np.void(b"flat_by_cid")
        for key, arr in keyed_images.items():
            f[key] = arr


def test_h5_image_store_image_list(tmp_path):
    rng = np.random.RandomState(3)
    imgs = {"im%d.jpg" % i: rng.randint(0, 255, (9, 11, 3), np.uint8)
            for i in range(3)}
    store = tmp_path / "store.h5"
    _write_h5_store(store, imgs)

    ds = CirImageListDataset([["dir/im0.jpg", "im1.jpg", "im2.jpg"]], None,
                             image_dir=str(store))
    for i, key in enumerate(["im0.jpg", "im1.jpg", "im2.jpg"]):
        np.testing.assert_array_equal(np.asarray(ds[i]), imgs[key],
                                      err_msg=key)


def test_h5_image_store_tuples_db(tmp_path):
    import pickle
    rng = np.random.RandomState(4)
    cids = ["%06x" % rng.randint(0, 1 << 24) for _ in range(4)]
    imgs = {cid: rng.randint(0, 255, (8, 8, 3), np.uint8) for cid in cids}
    store = tmp_path / "ims.h5"
    _write_h5_store(store, imgs)
    pkl = tmp_path / "db.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"train": {"cids": cids}}, f)

    db, images = _load_db(str(pkl), "train", str(store))
    assert images == ["%s#%s" % (store, cid) for cid in cids]
    from gandtr_tpu.data.datasets import imread
    for cid, path in zip(cids, images):
        np.testing.assert_array_equal(np.asarray(imread(path)), imgs[cid],
                                      err_msg=cid)


def test_h5_store_rejects_wrong_layout(tmp_path):
    store = tmp_path / "bad.h5"
    with h5py.File(store, "w") as f:
        f.attrs["storage_type"] = "by_folder"
    with pytest.raises(AssertionError):
        CirImageListDataset([["a.jpg"]], None, image_dir=str(store))


def test_unknown_params_raise():
    with pytest.raises(AssertionError):
        CirImageListDataset([["a.jpg"]], None, bogus_param=1)


@needs_reference
def test_path_join_differential_grid():
    """daan path_join (the join used by tuple/domain/cirscore datasets) vs
    the reference's ACTUAL ml/tools.py over the '*'-DSL grid — incl. the
    empty-directory branch, which still applies extension deduction."""
    import itertools
    ref = _load("refpj.daan.ml.tools",
                "/root/reference/mdir/external/daan/ml/tools.py")
    sys.modules.pop("refpj.daan.ml.tools", None)
    from gandtr_tpu.data.datasets import path_join

    dirs = ["", "imgs", "imgs/", "imgs*.png", "imgs*.png!", "imgs*!",
            "imgs*", "a/b*.tiff", "/abs/dir", "imgs*sub/dir"]
    names = ["x", "x.jpg", "sub/x", "sub/x.png", "x.tar.gz", "/abs/x",
             "x.", "sub.dir/x", "sub.dir/x.txt"]
    for d, n in itertools.product(dirs, names):
        assert path_join(d, n) == ref.path_join(d, n), (d, n)


def test_image_list_daan_path_join_semantics(tmp_path):
    """CirImageList joins each image with the dir via daan path_join BEFORE
    the bbx renaming (cirtorch_datasets.py:38-39): '.jpg' extension deduction
    and the '*' extension DSL apply; absolute names pass through untouched
    (path_join's absolute short-circuit — ImagesFromList itself never joins
    since root becomes '')."""
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 255, (6, 7, 3), np.uint8)
    # absolute, extension-less: passes through (no '.jpg' appended)
    noext = tmp_path / "imnoext"
    Image.fromarray(arr).save(noext, format="PNG")
    ds = CirImageListDataset([[str(noext)]], None)
    np.testing.assert_array_equal(np.asarray(ds[0]), arr)
    # relative, extension-less cid under a dir: '.jpg' is deduced
    # (PNG content under .jpg names — decode sniffs content; exact compare)
    Image.fromarray(arr).save(tmp_path / "cid123.jpg", format="PNG")
    ds = CirImageListDataset([["cid123"]], None, image_dir=str(tmp_path))
    assert ds.images == [str(tmp_path / "cid123.jpg")]
    np.testing.assert_array_equal(np.asarray(ds[0]), arr)
    # '*' DSL dir: extension comes from the dir spec
    Image.fromarray(arr).save(tmp_path / "cid9.png")
    ds = CirImageListDataset([["cid9"]], None,
                             image_dir=str(tmp_path) + "/*.png")
    np.testing.assert_array_equal(np.asarray(ds[0]), arr)
    # bbx renaming applies AFTER the join, i.e. to the '.jpg'-deduced name
    Image.fromarray(arr).save(tmp_path / "q7.1_1_5_4.jpg", format="PNG")
    ds = CirImageListDataset([["q7"], [(1, 1, 5, 4)]], None,
                             image_dir=str(tmp_path),
                             load_images_with_bbx=True)
    assert ds.images == [str(tmp_path / "q7.1_1_5_4.jpg")]
    np.testing.assert_array_equal(np.asarray(ds[0]), arr)
