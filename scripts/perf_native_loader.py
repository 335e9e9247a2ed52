"""Measure the native (C++) decode pipeline vs the PIL path.

Generates a corpus of photo-sized JPEGs, then times:
  1. PIL decode, single thread                (the reference's per-worker path)
  2. PIL decode on the Loader's thread pool   (round-1 data path)
  3. native decode, single thread             (ctypes, GIL released)
  4. native DecodePool batch decode           (C++ worker pool, ONE ctypes call)
  5. native pool + DCT scaling to 1024px      (eval-protocol load)
  6. PIL + draft(1024) equivalent             (PIL's DCT scaling, pow-2 only)

Run: python scripts/perf_native_loader.py [n_images] [size]

NOTE: this container exposes ONE CPU core (nproc=1), so neither pool can
show parallel speedup here; the measurable wins are single-thread decode
(~1.3x vs PIL) and DCT-domain scaling (~1.6x for eval-protocol loads). The
C++ pool's GIL-free scaling is the architectural win on real multi-core
hosts feeding TPU slices.
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gandtr_tpu import native


def make_corpus(d, n, hw):
    rng = np.random.RandomState(0)
    h, w = hw, int(hw * 4 / 3)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([np.sin(yy / 37.0) * 127 + 128,
                     np.cos(xx / 53.0) * 127 + 128,
                     (xx + yy) % 255], -1)
    paths = []
    for i in range(n):
        img = np.clip(base + rng.randn(h, w, 3) * 10, 0, 255).astype(np.uint8)
        p = os.path.join(d, "img%03d.jpg" % i)
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def timeit(label, fn, n_img):
    import gc
    best = float("inf")
    for _ in range(2):  # first pass doubles as warmup (allocator, page cache)
        gc.collect()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print("%-38s %6.2f ms/img  %7.1f img/s" % (label, 1e3 * best / n_img,
                                               n_img / best))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    d = "/tmp/native_loader_corpus_%d_%d" % (n, hw)
    os.makedirs(d, exist_ok=True)
    paths = make_corpus(d, n, hw)
    print("corpus: %d JPEGs %dx%d, native available: %s" % (
        n, int(hw * 4 / 3), hw, native.available()))

    pil = lambda p: np.asarray(Image.open(p).convert("RGB"))
    timeit("PIL single-thread", lambda: [pil(p) for p in paths], n)
    with ThreadPoolExecutor(8) as ex:
        timeit("PIL thread-pool x8",
               lambda: list(ex.map(pil, paths)), n)
    timeit("native single-thread",
           lambda: [native.decode(p) for p in paths], n)
    with native.DecodePool(8) as pool:
        timeit("native pool x8 (one ctypes call)",
               lambda: pool.decode_batch(paths), n)
        timeit("native pool x8 + DCT-scale 1024",
               lambda: pool.decode_batch(paths, scale_longest=1024), n)

    def pil_draft(p):
        im = Image.open(p)
        im.draft("RGB", (1024, 1024))
        return np.asarray(im.convert("RGB"))
    timeit("PIL single + draft 1024", lambda: [pil_draft(p) for p in paths], n)


if __name__ == "__main__":
    main()
