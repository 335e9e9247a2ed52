"""Differential test of the RGB output sink's image-undo semantics vs the
reference's ACTUAL mdir/tools/imgtools.py (loaded standalone — it only needs
numpy/cv2/PIL).

Pinned semantics (imgtools.py:5-71):

- stretch_by modes on the no-colorspace path ("auto" min-max, "meanstd",
  numeric contrast, "none" raw), with clip*255 uint8;
- colorspace undo for tolab/toluv/tolsh markers: denormalize, clip to the
  space's valid range (L[0,100] ab[-127,127] / u[-134,220] v[-140,122] /
  lsh->HLS permutation), cvtColor back to RGB, *255 uint8 WITHOUT clip,
  stretch_by ignored;
- chan1: zero-pad to 3 channels with mean_std ([m0,0,0],[s0,1,1]), gray
  reduce (mean over channels) after the RGB conversion;
- get_image input mixing: chan42 saves concat(input[3:], output);
  add_meanstd saves output[:1] as grayscale.

Ours is NHWC (reference CHW); colorspace converters are the cv2-float-parity
ops in gandtr_tpu.ops.colorspace, so colorspace paths allow ±1 uint8 at
rounding boundaries; pure-arithmetic paths must be byte-identical.
"""
import importlib.util as ilu
import os
import sys

import numpy as np
import pytest

from gandtr_tpu.scenarios.infer_stage import RgbImageSaver

_IMGTOOLS = "/root/reference/mdir/tools/imgtools.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(_IMGTOOLS),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref():
    pytest.importorskip("cv2")
    spec = ilu.spec_from_file_location("ref_imgtools", _IMGTOOLS)
    mod = ilu.module_from_spec(spec)
    sys.modules["ref_imgtools"] = mod
    spec.loader.exec_module(mod)
    return mod


def _sink(tmp_path, mean_std, stretch_by="meanstd", transforms=""):
    return RgbImageSaver(str(tmp_path), mean_std, stretch_by=stretch_by,
                         transforms=transforms, workers=1)


def _assert_u8_close(ours, want, exact=True, msg=""):
    assert ours.shape == want.shape, (msg, ours.shape, want.shape)
    if exact:
        np.testing.assert_array_equal(ours, want, err_msg=msg)
    else:
        d = np.abs(ours.astype(np.int32) - want.astype(np.int32))
        assert d.max() <= 1, (msg, d.max())
        assert (d == 0).mean() >= 0.97, (msg, (d == 0).mean())


MEANSTD3 = ([0.5, 0.4, 0.6], [0.5, 0.6, 0.4])


class TestStretchModes:
    # NB the reference's stretch_by=False default divides by zero on the
    # numeric branch (imgtools.py:25-28); its configs always pass an explicit
    # mode (output_gan.yml), so only explicit modes are compared.
    @pytest.mark.parametrize("stretch", ["meanstd", "auto", "none", 2, 0.5])
    def test_rgb(self, ref, tmp_path, stretch):
        rng = np.random.RandomState(abs(hash(str(stretch))) % 2**31)
        chw = rng.randn(3, 17, 23).astype(np.float32)
        want = ref._tensor_to_image(chw.copy(), MEANSTD3, "",
                                    stretch_by=stretch)
        ours = _sink(tmp_path, MEANSTD3, stretch_by=stretch)._to_uint8(
            np.transpose(chw, (1, 2, 0)))
        _assert_u8_close(ours, want, exact=True, msg=str(stretch))

    def test_gray_1chan(self, ref, tmp_path):
        rng = np.random.RandomState(7)
        chw = rng.randn(1, 9, 11).astype(np.float32)
        mean_std = ([0.3], [0.7])
        want = ref._tensor_to_image(chw.copy(), mean_std, "",
                                    stretch_by="meanstd")
        ours = _sink(tmp_path, mean_std)._to_uint8(
            np.transpose(chw, (1, 2, 0)))
        assert want.ndim == 2 and ours.ndim == 2
        _assert_u8_close(ours, want, exact=True, msg="gray")


class TestColorspaceUndo:
    @pytest.mark.parametrize("space,tf", [("lab", "pil2np | tolab | totensor"),
                                          ("luv", "pil2np | toluv | totensor"),
                                          ("lsh", "pil2np | tolsh | totensor")])
    def test_roundtrip(self, ref, tmp_path, space, tf):
        rng = np.random.RandomState(ord(space[1]))
        # plausible normalized model outputs around 0 with mean/std that map
        # into (and beyond — exercising the clips) each space's raw range
        if space == "lab":
            mean_std = ([50.0, 0.0, 0.0], [60.0, 150.0, 150.0])
        elif space == "luv":
            mean_std = ([50.0, 40.0, -10.0], [60.0, 190.0, 140.0])
        else:  # lsh: [l, s, h]
            mean_std = ([0.5, 0.5, 180.0], [0.6, 0.6, 200.0])
        chw = rng.randn(3, 13, 19).astype(np.float32)
        want = ref._tensor_to_image(chw.copy(), mean_std, tf)
        ours = _sink(tmp_path, mean_std, transforms=tf)._to_uint8(
            np.transpose(chw, (1, 2, 0)))
        _assert_u8_close(ours, want, exact=False, msg=space)

    def test_chan1_gray(self, ref, tmp_path):
        rng = np.random.RandomState(3)
        tf = "pil2np | tolab | chan1 | totensor"
        mean_std = ([50.0], [60.0])
        chw = rng.randn(1, 13, 19).astype(np.float32)
        want = ref._tensor_to_image(chw.copy(), mean_std, tf)
        ours = _sink(tmp_path, mean_std, transforms=tf)._to_uint8(
            np.transpose(chw, (1, 2, 0)))
        assert want.ndim == 2 and ours.ndim == 2
        _assert_u8_close(ours, want, exact=False, msg="chan1")


class TestLiveTospaceUndo:
    """The reference's colorspace undo only recognizes legacy raw markers
    (tolab/...); the LIVE registry form is `tospace:X` which produces
    NORMALIZED values (channel_transforms.py:82-89) that the reference
    cannot save back to RGB. Ours can — pin the round-trip property."""

    @pytest.mark.parametrize("space", ["lab", "luv", "hsv"])
    def test_roundtrip_identity(self, space, tmp_path):
        from PIL import Image
        from gandtr_tpu.data.transforms import initialize_transforms
        rng = np.random.RandomState(ord(space[0]))
        src = rng.randint(0, 255, (16, 24, 3), np.uint8)
        mean_std = [[0.5, 0.5, 0.5], [0.2, 0.2, 0.2]]
        tf_str = "pil2np | tospace:%s | totensor | normalize" % space
        tf = initialize_transforms(tf_str, mean_std)
        sink = _sink(tmp_path, mean_std, transforms=tf_str)
        assert sink.normspace == space and sink.colorspace is None
        back = sink._to_uint8(np.asarray(tf(Image.fromarray(src))))
        d = np.abs(back.astype(np.int32) - src.astype(np.int32))
        # truncation vs rounding ties leave ±1; the inversion itself is exact
        assert d.max() <= 1, (space, d.max())

    def test_plain_rgb_unaffected(self, tmp_path):
        sink = _sink(tmp_path, MEANSTD3,
                     transforms="pil2np | totensor | normalize")
        assert sink.normspace is None and sink.colorspace is None


class TestGetImageMixing:
    def test_chan42(self, ref, tmp_path):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(11)
        inp = rng.randn(4, 13, 19).astype(np.float32)   # RGB + edge channel
        out = rng.randn(2, 13, 19).astype(np.float32)
        tf = "pil2np | tolab | chan42 | totensor"
        mean_std = ([50.0, 0.0, 0.0], [60.0, 150.0, 150.0])
        want = ref.get_image([torch.from_numpy(inp), torch.from_numpy(out)],
                             mean_std, tf)
        sink = _sink(tmp_path, mean_std, transforms=tf)
        assert sink.needs_input
        merged = np.concatenate([np.transpose(inp, (1, 2, 0))[..., 3:],
                                 np.transpose(out, (1, 2, 0))], axis=-1)
        ours = sink._to_uint8(merged)
        _assert_u8_close(ours, want, exact=False, msg="chan42")

    def test_add_meanstd(self, ref, tmp_path):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(13)
        inp = rng.randn(2, 13, 19).astype(np.float32)
        out = rng.randn(3, 13, 19).astype(np.float32)
        tf = "pil2np | add_meanstd | totensor"
        mean_std = ([0.5], [0.5])
        want = ref.get_image([torch.from_numpy(inp), torch.from_numpy(out)],
                             mean_std, tf, stretch_by="meanstd")
        sink = _sink(tmp_path, mean_std, transforms=tf)
        assert sink.needs_input
        ours = sink._to_uint8(np.transpose(out, (1, 2, 0))[..., :1])
        assert want.ndim == 2 and ours.ndim == 2
        _assert_u8_close(ours, want, exact=True, msg="add_meanstd")

    def test_sink_add_writes_mixed_file(self, ref, tmp_path):
        """End-to-end: sink.add with input mixing writes the same bytes the
        reference pipeline would."""
        rng = np.random.RandomState(17)
        inp = rng.randn(13, 19, 4).astype(np.float32)
        out = rng.randn(13, 19, 2).astype(np.float32)
        tf = "pil2np | tolab | chan42 | totensor"
        mean_std = ([50.0, 0.0, 0.0], [60.0, 150.0, 150.0])
        sink = _sink(tmp_path, mean_std, transforms=tf)
        sink.add("x.png", out, input_nhwc=inp)
        sink.close()
        from PIL import Image
        got = np.asarray(Image.open(tmp_path / "x.png"))
        torch = pytest.importorskip("torch")
        want = ref.get_image([torch.from_numpy(np.transpose(inp, (2, 0, 1))),
                              torch.from_numpy(np.transpose(out, (2, 0, 1)))],
                             mean_std, tf)
        _assert_u8_close(got, want, exact=False, msg="sink.add")
