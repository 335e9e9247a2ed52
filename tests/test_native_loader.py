"""Native (C++) image loader: bit-exact decode parity vs PIL, batch pool,
DCT-domain scaling, and graceful degradation (loader.cc + native/__init__.py).

The reference's decode path is PIL inside torch DataLoader worker processes
(mdir/components/data/dataset/genericdataset.py:34-45); ours must produce
byte-identical rasters so every golden/descriptor test is decoder-agnostic.
"""
import numpy as np
import pytest
from PIL import Image

from gandtr_tpu import native
from gandtr_tpu.data import datasets


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native loader did not build: %r" % (native.build_error(),))


def _img(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([np.sin(yy / 37.0) * 127 + 128,
                     np.cos(xx / 53.0) * 127 + 128,
                     (xx + yy) % 255], -1)
    return np.clip(base + rng.randn(h, w, 3) * 8, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w, q, sub) in enumerate(
            [(480, 640, 95, 0), (480, 640, 75, 2), (333, 517, 85, 1)]):
        p = str(d / ("j%d.jpg" % i))
        Image.fromarray(_img(rng, h, w)).save(p, quality=q, subsampling=sub)
        paths.append(p)
    p = str(d / "rgb.png")
    Image.fromarray(_img(rng, 240, 320)).save(p)
    paths.append(p)
    p = str(d / "gray.jpg")
    Image.fromarray(_img(rng, 100, 150)[:, :, 0]).save(p)
    paths.append(p)
    p = str(d / "pal.png")
    Image.fromarray(_img(rng, 100, 150)).convert("P").save(p)
    paths.append(p)
    p = str(d / "rgba.png")
    rgba = np.dstack([_img(rng, 80, 90), np.full((80, 90), 200, np.uint8)])
    Image.fromarray(rgba, "RGBA").save(p)
    paths.append(p)
    return paths


class TestNativeDecode:
    def test_bit_exact_vs_pil(self, images):
        for p in images:
            arr = native.decode(p)
            assert arr is not None, p
            ref = np.asarray(Image.open(p).convert("RGB"))
            np.testing.assert_array_equal(arr, ref, err_msg=p)

    def test_batch_pool(self, images):
        with native.DecodePool(4) as pool:
            outs = pool.decode_batch(images)
        refs = [np.asarray(Image.open(p).convert("RGB")) for p in images]
        assert len(outs) == len(images)
        for out, ref, p in zip(outs, refs, images):
            np.testing.assert_array_equal(out, ref, err_msg=p)

    def test_dct_scaling(self, tmp_path):
        """scale_longest decodes at the smallest 1/8-granular DCT scale whose
        longest side still covers the target (Image.draft semantics)."""
        rng = np.random.RandomState(1)
        p = str(tmp_path / "big.jpg")
        Image.fromarray(_img(rng, 1200, 1600)).save(p, quality=90)
        arr = native.decode(p, scale_longest=1024)
        # 1600 * 6/8 = 1200 >= 1024; 1600 * 5/8 = 1000 < 1024
        assert (arr.shape[0], arr.shape[1]) == (900, 1200)
        # cross-check at 1/2 scale, the largest scale PIL's draft also uses
        # (draft only picks power-of-2 scales; our rule has 1/8 granularity)
        half = native.decode(p, scale_longest=800)
        assert (half.shape[0], half.shape[1]) == (600, 800)
        im = Image.open(p)
        im.draft("RGB", (800, 600))
        ref = np.asarray(im)
        assert ref.shape == half.shape
        # scaled-mode IDCT kernels may differ by ±1 across libjpeg builds
        # (full-size decode is bit-exact — test_bit_exact_vs_pil); the scaled
        # raster feeds a resize, so a ±2 uint8 contract is the right one
        diff = np.abs(half.astype(int) - ref.astype(int))
        assert diff.max() <= 2 and (diff > 1).mean() < 0.01
        # full decode when target above image size
        assert native.decode(p, scale_longest=4096).shape == (1200, 1600, 3)

    def test_failure_modes(self, tmp_path):
        assert native.decode(str(tmp_path / "missing.jpg")) is None
        junk = tmp_path / "junk.jpg"
        junk.write_bytes(b"\xff\xd8\xff" + b"garbage" * 10)
        assert native.decode(str(junk)) is None
        txt = tmp_path / "notimage.txt"
        txt.write_text("hello")
        assert native.decode(str(txt)) is None
        with native.DecodePool(2) as pool:
            outs = pool.decode_batch([str(junk), str(txt)])
        assert outs == [None, None]

    def test_imread_routes_through_native(self, images, monkeypatch):
        """datasets.imread returns identical pixels with the native path on
        and off (the flag only switches the decoder)."""
        a = np.asarray(datasets.imread(images[0]))
        monkeypatch.setattr(datasets, "_NATIVE_OK", False)
        b = np.asarray(datasets.imread(images[0]))
        np.testing.assert_array_equal(a, b)

    def test_imread_non_rgb_mode_falls_back(self, images):
        gray = datasets.imread(images[0], mode="L")
        assert gray.mode == "L"
        ref = Image.open(images[0]).convert("L")
        np.testing.assert_array_equal(np.asarray(gray), np.asarray(ref))


class TestSharedPool:
    def test_shared_pool_no_deadlock(self, images):
        """shared_pool() must not self-deadlock on first use (DecodePool's
        lazy _load() takes the module lock; shared_pool uses its own)."""
        import threading
        result = {}

        def use():
            pool = native.shared_pool()
            result["arrs"] = pool.decode_batch(images[:2])

        t = threading.Thread(target=use, daemon=True)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive(), "shared_pool() deadlocked"
        assert all(a is not None for a in result["arrs"])
        assert native.shared_pool() is native.shared_pool()


def test_pool_concurrent_batches_and_close(images):
    """Concurrent decode_batch calls on one pool return correct results
    (per-batch completion, loader.cc BatchState), and close() waits for
    in-flight batches instead of destroying the pool under them."""
    import threading
    paths = images
    pool = native.DecodePool(n_threads=2)
    refs = pool.decode_batch(paths)  # single-caller baseline
    errors = []

    def work():
        try:
            for _ in range(3):
                out = pool.decode_batch(paths)
                for o, r in zip(out, refs):
                    np.testing.assert_array_equal(o, r)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # double close from two threads: exactly one destroys, none crash
    closers = [threading.Thread(target=pool.close) for _ in range(2)]
    for t in closers:
        t.start()
    for t in closers:
        t.join()
    with pytest.raises(RuntimeError, match="pool closed"):
        pool.decode_batch(paths)
