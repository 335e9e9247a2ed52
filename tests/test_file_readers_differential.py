"""Differential fuzz of utils/file_readers vs the reference's ACTUAL
daan/data/file_readers.py (loaded standalone), plus the tsv dict-form eval
dataset built on top of it (cirscore.py:26-40).

Reference: /root/reference/mdir/external/daan/data/file_readers.py.
"""
import gzip
import json
import lzma
import os
import pickle
import sys
import importlib.util as ilu

import numpy as np
import pytest

from gandtr_tpu.utils import file_readers as FR

_REF = "/root/reference/mdir/external/daan/data/file_readers.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_REF),
                                     reason="reference tree not mounted")
h5py = pytest.importorskip("h5py")


@pytest.fixture(scope="module")
def ref():
    spec = ilu.spec_from_file_location("ref_file_readers", _REF)
    mod = ilu.module_from_spec(spec)
    sys.modules["ref_file_readers"] = mod
    spec.loader.exec_module(mod)
    return mod


def _selector_cases():
    return [
        {},
        {"keys": None, "limit": 3},
        {"slice": 0, "partitions": 2},
        {"slice": 1, "partitions": 3},
        {"slice": 2, "partitions": 4, "limit": 7},
    ]


def _norm(d):
    """OrderedDict of columns -> plain comparable structure."""
    return {k: (v.tolist() if isinstance(v, np.ndarray) else list(v))
            for k, v in d.items()}


@needs_reference
class TestTsv:

    @pytest.fixture(scope="class")
    def tsv_files(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("fr_tsv")
        rng = np.random.RandomState(0)
        header = ["identifier", "bbx", "ok", "score"]
        rows = []
        for i in range(11):
            bbx = json.dumps([int(x) for x in rng.randint(0, 99, 4)]) \
                if i % 3 else ""
            ok = json.dumps([f"id{j}" for j in rng.randint(0, 11, 2)])
            rows.append([f"dir/id{i}", bbx, ok, str(rng.rand())])
        tsv = "\t".join(header) + "\n" + \
            "\n".join("\t".join(r) for r in rows) + "\n"
        # csv cells must not contain commas (the reference splits naively,
        # so JSON-list cells are tsv-only in practice) — scalars here
        csv = "identifier,score\n" + \
            "\n".join(f"{r[0]},{r[3]}" for r in rows) + "\n"
        paths = {}
        (d / "t.tsv").write_text(tsv)
        paths["plain"] = str(d / "t.tsv")
        with gzip.open(d / "t.tsv.gz", "wb") as f:
            f.write(tsv.encode())
        paths["gz"] = str(d / "t.tsv.gz")
        with lzma.open(d / "t.tsv.xz", "wb") as f:
            f.write(tsv.encode())
        paths["xz"] = str(d / "t.tsv.xz")
        (d / "t.csv").write_text(csv)
        paths["csv"] = str(d / "t.csv")
        return paths

    @pytest.mark.parametrize("variant", ["plain", "gz", "xz", "csv"])
    @pytest.mark.parametrize("sel", _selector_cases())
    def test_matches_reference(self, ref, tsv_files, variant, sel):
        path = tsv_files[variant]
        keys_cases = [None, ["identifier"]] if variant == "csv" else \
            [None, ["identifier"], ["ok", "identifier"]]
        for keys in keys_cases:
            kw = dict(sel, keys=keys)
            with ref.initialize_file_reader(path, **kw) as r:
                want = _norm(r.get())
            with FR.initialize_file_reader(path, **kw) as r:
                got = _norm(r.get())
            assert got == want, (variant, kw)

    def test_json_cells_decoded(self, tsv_files):
        with FR.initialize_file_reader(tsv_files["plain"],
                                       keys=["bbx", "ok"]) as r:
            data = r.get()
        assert data["bbx"][0] is None  # empty cell -> None
        assert isinstance(data["bbx"][1], list) and len(data["bbx"][1]) == 4
        assert all(isinstance(x, list) for x in data["ok"])


@needs_reference
class TestPklH5Lst:

    @pytest.mark.parametrize("sel", _selector_cases())
    def test_pkl(self, ref, tmp_path, sel):
        p = tmp_path / "d.pkl"
        data = {"a": list(range(13)), "b": np.arange(13) * 0.5}
        with open(p, "wb") as f:
            pickle.dump(data, f)
        for keys in (None, ["b"]):
            kw = dict(sel, keys=keys)
            with ref.initialize_file_reader(str(p), **kw) as r:
                want = _norm(r.get())
            with FR.initialize_file_reader(str(p), **kw) as r:
                got = _norm(r.get())
            assert got == want

    @pytest.mark.parametrize("sel", _selector_cases())
    def test_h5_numeric(self, ref, tmp_path, sel, monkeypatch):
        # the reference's `data.dtype == np.object` check crashes outright on
        # numpy>=1.24 (np.object removed) — restore the alias to drive it
        monkeypatch.setattr(np, "object", object, raising=False)
        p = tmp_path / "d.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("x", data=np.arange(17, dtype=np.int64))
            f.create_dataset("y", data=np.linspace(0, 1, 17))
            f.attrs["header"] = ["x", "y"]
        for keys in (None, ["y"]):
            kw = dict(sel, keys=keys)
            with ref.initialize_file_reader(str(p), **kw) as r:
                want = _norm(r.get())
            with FR.initialize_file_reader(str(p), **kw) as r:
                got = _norm(r.get())
            assert got == want

    @pytest.mark.parametrize("sel", _selector_cases())
    def test_lst_with_expansion(self, ref, tmp_path, sel):
        for col in ("day", "night"):
            (tmp_path / f"{col}.lst").write_text(
                "\n".join(f"{col}/im{i}.jpg" for i in range(9)) + "\n")
        path = str(tmp_path / "[day|night].lst")
        for keys in (None, ["night"]):
            kw = dict(sel, keys=keys)
            with ref.initialize_file_reader(path, **kw) as r:
                want = _norm(r.get())
            with FR.initialize_file_reader(path, **kw) as r:
                got = _norm(r.get())
            assert got == want

    def test_h5_string_columns_decoded(self, tmp_path):
        """Ours decodes h5 object/bytes columns to str (the reference's
        np.object check crashes on numpy>=1.24 — known reference bug)."""
        p = tmp_path / "s.h5"
        with h5py.File(p, "w") as f:
            f.create_dataset("cid", data=np.array([b"a", b"bb"],
                                                  dtype=object),
                             dtype=h5py.special_dtype(vlen=bytes))
            f.attrs["header"] = ["cid"]
        with FR.initialize_file_reader(str(p)) as r:
            assert r.get()["cid"] == ["a", "bb"]


class TestTupleDatasetThroughReaders:

    def test_random_tuple_dataset_reads_tsv(self, tmp_path):
        from gandtr_tpu.data.datasets import RandomImageTupleDataset
        p = tmp_path / "tuples.tsv"
        p.write_text("pair\n" + "\n".join(
            json.dumps([f"a{i}.jpg", f"b{i}.jpg"]) for i in range(4)) + "\n")
        ds = RandomImageTupleDataset(
            (), None, str(p), "pair", str(tmp_path), "0_1",
            rng=np.random.RandomState(0))
        assert len(ds) == 4
        ds.prepare_epoch()
        assert ds.epoch_images[0][0].endswith("a0.jpg")


class TestTsvEvalDataset:
    """The reference's tsv dict dataset form for scores (cirscore.py:26-40)."""

    @pytest.fixture()
    def tsv_eval(self, tmp_path):
        from PIL import Image
        rng = np.random.RandomState(1)
        img_dir = tmp_path / "ims"
        img_dir.mkdir()
        ids = []
        for i in range(6):
            base = 0.2 if i < 3 else 0.8
            arr = np.clip(rng.rand(24, 24, 3) * 0.15 + base, 0, 1)
            name = f"im{i}.jpg"
            Image.fromarray((arr * 255).astype(np.uint8)
                            ).save(img_dir / name)
            ids.append(name)
        (tmp_path / "db.tsv").write_text(
            "identifier\n" + "\n".join(ids) + "\n")
        qrows = []
        for qi, grp in enumerate([0, 1]):
            name = f"q{qi}.jpg"
            base = 0.2 if grp == 0 else 0.8
            arr = np.clip(rng.rand(24, 24, 3) * 0.15 + base, 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)
                            ).save(img_dir / name)
            ok = [ids[j] for j in (range(3) if grp == 0 else range(3, 6))]
            junk = [ids[3]] if grp == 0 else []
            qrows.append("\t".join([name, "", json.dumps(ok),
                                    json.dumps(junk)]))
        (tmp_path / "q.tsv").write_text(
            "query\tbbx\tok\tjunk\n" + "\n".join(qrows) + "\n")
        return {"name": "synthtsv", "queries": str(tmp_path / "q.tsv"),
                "db": str(tmp_path / "db.tsv"), "imgdir": str(img_dir)}

    def test_configdataset_tsv(self, tsv_eval):
        from gandtr_tpu.eval.retrieval import configdataset_tsv
        cfg = configdataset_tsv(tsv_eval)
        assert cfg["n"] == 6 and cfg["nq"] == 2
        assert cfg["dataset"] == "synthtsv"
        assert cfg["im_paths"][0].endswith("im0.jpg")
        assert cfg["bbxs"] == [None, None]
        assert cfg["gnd"][0]["ok"] == [0, 1, 2]
        assert cfg["gnd"][0]["junk"] == [3]
        assert cfg["gnd"][1]["ok"] == [3, 4, 5]

    def test_evaluate_dataset_on_tsv_form(self, tsv_eval):
        from gandtr_tpu.eval.retrieval import (configdataset_tsv,
                                               evaluate_dataset)
        cfg = configdataset_tsv(tsv_eval)

        def extractor(arr):  # centered mean color: dark/bright groups get
            # opposite-sign descriptors, so same-group dot products win
            v = np.asarray(arr, np.float32).mean(axis=(0, 1)) - 0.5
            return v / (np.linalg.norm(v) + 1e-9)

        metrics, aps, vecs, qvecs = evaluate_dataset(
            extractor, cfg, image_size=24, transform=None)
        assert set(metrics) == {"map"}
        assert metrics["map"] > 0.9, metrics
        assert vecs.shape[1] == 6 and qvecs.shape[1] == 2
