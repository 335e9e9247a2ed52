"""Differential test of the RGB image sink vs the reference's ACTUAL
output.py + imgtools.py (loaded standalone with daan stubs).

Pins: flat-filename encoding ("::" piece joins, "%" for "/"), the
dir_structure default ("input" for single-column data), append-skip, and the
stretch_by pixel semantics (meanstd / auto / none / numeric) byte-for-byte.

Reference: /root/reference/mdir/components/data/output.py,
           /root/reference/mdir/tools/imgtools.py.
"""
import os
import sys
import types
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.scenarios.infer_stage import RgbImageSaver

_OUT = "/root/reference/mdir/components/data/output.py"
_IMG = "/root/reference/mdir/tools/imgtools.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_OUT),
                                     reason="reference tree not mounted")
cv2 = pytest.importorskip("cv2")


def _load(fullname, path, search=None):
    spec = ilu.spec_from_file_location(fullname, path,
                                       submodule_search_locations=search)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    # daan stubs: identity resolve_path, os.path.join path_join
    for name in ("daan", "daan.ml", "daan.core"):
        sys.modules.setdefault(name, types.ModuleType(name))
    tools = types.ModuleType("daan.ml.tools")
    tools.path_join = lambda *a: os.path.join(*a)
    sys.modules["daan.ml.tools"] = tools
    pr = types.ModuleType("daan.core.path_resolver")
    pr.resolve_path = lambda p: p
    sys.modules["daan.core.path_resolver"] = pr

    # package skeleton so output.py's relative `from ...tools import imgtools`
    # and `from .tuple_datasets import imread` resolve
    pkg = types.ModuleType("refmdir")
    pkg.__path__ = []
    sys.modules["refmdir"] = pkg
    for name in ("refmdir.components", "refmdir.components.data",
                 "refmdir.tools"):
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    imgtools = _load("refmdir.tools.imgtools", _IMG)
    sys.modules["refmdir.tools"].imgtools = imgtools
    output = _load("refmdir.components.data.output", _OUT)
    return types.SimpleNamespace(output=output, imgtools=imgtools)


@needs_reference
class TestFlatNaming:

    def _ref_fnames(self, ref, data, **kw):
        saver = ref.output.RgbImageSaver(
            [data], {"mean_std": [[0.5] * 3, [0.5] * 3], "transforms": ""},
            image_dir="/nonexistent_dir_for_names", **kw)
        (fnames,) = saver.preprocess()
        return saver, fnames

    def test_single_column_default_is_input_structure(self, ref):
        names = ["a/b/c.jpg", "x.png"]
        saver, fnames = self._ref_fnames(ref, names)
        assert saver.dir_structure == "input"
        assert fnames == names  # kept verbatim, subdirs preserved

    def test_multi_column_default_flat_encoding(self, ref):
        data = [["q/r.jpg", "s/t.png", "u/v.jpg"], ["a.jpg", "b.jpg"]]
        saver, fnames = self._ref_fnames(ref, data)
        assert saver.dir_structure == "flat"
        assert fnames == [RgbImageSaver.flat_name(x) for x in data]
        # spot-check the encoding itself
        assert fnames[0] == "q%r::s%t::u%v.jpg"

    def test_explicit_flat_on_single_column(self, ref):
        names = ["a/b/c.jpg"]
        _, fnames = self._ref_fnames(ref, names, dir_structure="flat")
        assert fnames == [RgbImageSaver.flat_name(x) for x in names]
        assert fnames == ["a%b%c.jpg"]

    def test_append_skips_existing(self, ref, tmp_path):
        (tmp_path / "done.jpg").write_bytes(b"x")
        saver = ref.output.RgbImageSaver(
            [["done.jpg", "todo.jpg"]],
            {"mean_std": [[0.5] * 3, [0.5] * 3], "transforms": ""},
            image_dir=str(tmp_path), append=True)
        (fnames,) = saver.preprocess()
        assert fnames == ["done.jpg", "todo.jpg"]  # postprocess keeps all
        assert saver.paths == [os.path.join(str(tmp_path), "todo.jpg")]
        ours = RgbImageSaver(str(tmp_path), [[0.5] * 3, [0.5] * 3],
                             structure="input", append=True)
        try:
            assert ours.exclude_existing(["done.jpg", "todo.jpg"]) == \
                ["todo.jpg"]
        finally:
            ours.close()


@needs_reference
class TestStretchPixels:

    MEAN_STD = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]

    @pytest.mark.parametrize("stretch", ["meanstd", "auto", "none", 2, 0.5])
    def test_to_uint8_matches_reference(self, ref, tmp_path, stretch):
        rng = np.random.RandomState(int(np.float64(hash(str(stretch))) % 997))
        for trial in range(20):
            chw = rng.randn(3, 13, 17).astype(np.float32) * 1.3
            want = ref.imgtools._tensor_to_image(
                chw.copy(), self.MEAN_STD, "", stretch_by=stretch)
            ours = RgbImageSaver(str(tmp_path), self.MEAN_STD,
                                 stretch_by=stretch)
            try:
                got = ours._to_uint8(np.transpose(chw, (1, 2, 0)))
            finally:
                ours.close()
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"stretch={stretch}")

    def test_boundary_ties(self, ref, tmp_path):
        """Values landing exactly on integer*(1/255) boundaries truncate the
        same way (the f64 list-promotion detail)."""
        mean_std = [[0.5] * 3, [0.5] * 3]
        grid = (np.arange(256, dtype=np.float64) / 255.0 - 0.5) / 0.5
        chw = np.broadcast_to(grid.astype(np.float32), (3, 16, 256)) \
            .reshape(3, 16, 256).copy()
        want = ref.imgtools._tensor_to_image(chw.copy(), mean_std, "",
                                             stretch_by="meanstd")
        ours = RgbImageSaver(str(tmp_path), mean_std, stretch_by="meanstd")
        try:
            got = ours._to_uint8(np.transpose(chw, (1, 2, 0)))
        finally:
            ours.close()
        np.testing.assert_array_equal(got, want)
