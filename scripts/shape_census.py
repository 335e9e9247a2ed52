"""Shape census + compile plan for real-dataset evaluation.

Reads a cirtorch gnd pkl + image dir and prints, per dataset: the exact-shape
compile count (one XLA graph per unique resized (H, W) x scale), the bucketed
compile count for a given `--bucket` multiple (ops/maskprop.py exact
bucketing), and wall-clock estimates through the axon tunnel.

Size arithmetic replicates the eval loader exactly (eval/retrieval.py
imresize = PIL thumbnail longest-side; query bbx crop + relative resize,
genericdataset.py:85-92 semantics) WITHOUT decoding any image — PIL size
headers + a dummy Image for thumbnail rounding.

Usage:
  python scripts/shape_census.py data/test/roxford5k/gnd_roxford5k.pkl \
      data/test/roxford5k/jpg --image-size 1024 --bucket 64
"""
import argparse
import collections
import os
import pickle
import sys

from PIL import Image


def thumb_shape(w, h, imsize):
    """(W, H) after PIL thumbnail((imsize, imsize)) — exact PIL rounding via
    a dummy image, no decode."""
    im = Image.new("L", (w, h))
    im.thumbnail((int(imsize), int(imsize)))
    return im.size


def census(gnd_pkl, image_dir, image_size=1024, bucket=64,
           scales=(1.0, 0.7071067811865476, 0.5), ext=".jpg"):
    with open(gnd_pkl, "rb") as f:
        gnd = pickle.load(f)
    shapes = []

    def img_path(name):
        p = os.path.join(image_dir, name)
        return p if os.path.splitext(p)[1] else p + ext

    for name in gnd.get("imlist", []):
        try:
            w, h = Image.open(img_path(name)).size  # header only, no decode
        except OSError:
            continue
        shapes.append(thumb_shape(w, h, image_size))
    for qi, name in enumerate(gnd.get("qimlist", [])):
        try:
            w, h = Image.open(img_path(name)).size
        except OSError:
            continue
        q = gnd.get("gnd", [{}] * (qi + 1))[qi]
        bbx = q.get("bbx") if isinstance(q, dict) else None
        if bbx:
            # crop, then resize by image_size * max(cropped)/max(full)
            # (genericdataset.py:85-92 / eval/retrieval._load_preprocessed)
            full = max(w, h)
            cw = int(bbx[2]) - int(bbx[0])
            ch = int(bbx[3]) - int(bbx[1])
            shapes.append(thumb_shape(cw, ch,
                                      image_size * max(cw, ch) / full))
        else:
            shapes.append(thumb_shape(w, h, image_size))

    def bucketed(wh):
        w, h = wh
        return (-(-h // bucket) * bucket, -(-w // bucket) * bucket)

    exact = collections.Counter((h, w) for (w, h) in shapes)
    buck = collections.Counter(bucketed(s) for s in shapes)
    return shapes, exact, buck


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("gnd_pkl")
    ap.add_argument("image_dir")
    ap.add_argument("--image-size", type=float, default=1024)
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--scales", type=int, default=3,
                    help="multiscale graph multiplier (3 = eval protocol)")
    ap.add_argument("--compile-sec", type=float, default=60.0,
                    help="seconds per server-side compile through the tunnel")
    ap.add_argument("--imgs-per-sec", type=float, default=177.0,
                    help="steady-state extraction rate (docs/PERF.md)")
    args = ap.parse_args(argv)

    shapes, exact, buck = census(args.gnd_pkl, args.image_dir,
                                 args.image_size, args.bucket)
    n = len(shapes)
    # multiscale runs inside ONE graph per input shape (the scale resizes are
    # part of the compiled forward), so graphs = unique shapes, but each
    # graph is ~sum(s^2) larger; scale count only affects runtime
    print("images:             %d" % n)
    print("unique exact shapes: %d  -> ~%d compiles, ~%.1f min compile wall"
          % (len(exact), len(exact), len(exact) * args.compile_sec / 60))
    print("bucket=%d shapes:    %d  -> ~%d compiles, ~%.1f min compile wall"
          % (args.bucket, len(buck), len(buck),
             len(buck) * args.compile_sec / 60))
    area_mult = 1.0 + (0.5 + 0.25 if args.scales == 3 else 0.0)
    print("extraction:          ~%.1f min (%d imgs @ %.0f img/s, x%.2f "
          "multiscale FLOPs)" % (n * area_mult / args.imgs_per_sec / 60, n,
                                 args.imgs_per_sec, area_mult))
    top = buck.most_common(5)
    print("top buckets:", ", ".join("%dx%d:%d" % (h, w, c)
                                    for (h, w), c in top))
    return 0


if __name__ == "__main__":
    sys.exit(main())
