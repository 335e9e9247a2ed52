"""Utils: stats meters, imgtools, file readers, io path resolution."""
import json
import pickle

import numpy as np
import pytest

from gandtr_tpu.utils import stats, imgtools, file_readers, io


class TestStats:
    def test_average_meter(self):
        m = stats.AverageMeter()
        for v in (1.0, 2.0, 3.0):
            m.update(v)
        assert m.avg == 2.0

    def test_stopwatch(self):
        sw = stats.StopWatch()
        sw.lap("a")
        sw.lap("b")
        assert set(sw.laps) == {"a", "b"}
        logged = []
        sw.emit(lambda k, v, d: logged.append((k, d)))
        assert ("time/a", "scalar/time") in logged

    def test_resource_usage(self):
        r = stats.ResourceUsage()
        snap = r.snapshot()
        assert "cpu_seconds" in snap

    def test_code_version(self):
        cv = stats.CodeVersion(root="/root/repo")
        snap = cv.snapshot()
        assert "jax" in snap
        assert "git_head" in snap


class TestImgtools:
    def test_unnormalize_roundtrip(self):
        rng = np.random.RandomState(0)
        img = rng.rand(8, 8, 3).astype(np.float32)
        norm = (img - 0.5) / 0.5
        out = imgtools.unnormalize(norm)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_grid(self):
        imgs = [np.zeros((4, 4, 3), np.float32) for _ in range(5)]
        grid = imgtools.image_grid(imgs, cols=3)
        assert grid.shape == (2 * 6 - 2, 3 * 6 - 2, 3)


class TestFileReaders:
    def test_tsv(self, tmp_path):
        p = tmp_path / "d.tsv"
        p.write_text("a\tb\n1\tx\n2\ty\n")
        with file_readers.initialize_file_reader(str(p), keys=["a"]) as r:
            assert r.get()["a"] == ["1", "2"]

    def test_pkl_with_slice(self, tmp_path):
        p = tmp_path / "d.pkl"
        with open(p, "wb") as f:
            pickle.dump({"xs": list(range(10))}, f)
        with file_readers.initialize_file_reader(str(p) + "#2:5", keys=["xs"]) as r:
            assert r.get()["xs"] == [2, 3, 4]

    def test_json(self, tmp_path):
        p = tmp_path / "d.json"
        p.write_text(json.dumps({"k": [1, 2]}))
        with file_readers.initialize_file_reader(str(p)) as r:
            assert r.get()["k"] == [1, 2]


class TestIo:
    def test_resolve_path_passthrough(self):
        assert io.resolve_path("/abs/path") == "/abs/path"
        assert io.resolve_path("http://x/y") == "http://x/y"

    def test_resolve_path_root(self, monkeypatch):
        monkeypatch.setenv("GANDTR_ROOT", "/data/root")
        out = io.resolve_path("experiments/x", rules=[("^", "/data/root")])
        assert out == "/data/root/experiments/x"


class TestTensorboard:
    def test_write_and_read_scalars(self, tmp_path):
        import glob
        from gandtr_tpu.learning.tensorboard import (TensorboardWriter,
                                                     read_scalar_events)
        w = TensorboardWriter(str(tmp_path))
        w.register(1, 0, 10, "train/loss", 0.5, "scalar/loss")
        w.register(1, 9, 10, "train/loss", 0.25, "scalar/loss")
        w.register(2, 0, 10, "train/loss", 0.125, "scalar/loss")
        w.close()
        files = glob.glob(str(tmp_path / "epochs" / "tensorboard" / "events.*"))
        assert files
        events = read_scalar_events(files[0])
        tags = [(t, round(v, 4), s) for t, v, s in events]
        assert ("train/loss", 0.5, 0) in tags
        assert ("train/loss", 0.25, 9) in tags
        assert ("train/loss", 0.125, 10) in tags  # absolute iteration counter

    def test_crc32c_known_vector(self):
        from gandtr_tpu.learning.tensorboard import crc32c
        # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
        assert crc32c(b"\x00" * 32) == 0x8A9136AA


class TestModelviz:
    def test_jaxpr_dot_and_param_summary(self):
        import jax.numpy as jnp
        from gandtr_tpu.utils import modelviz
        from gandtr_tpu.models.retrieval import GemRetrievalNet
        import jax as _jax

        model = GemRetrievalNet(architecture="vgg16")
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        var = model.init(_jax.random.PRNGKey(0), x)
        dot = modelviz.architecture_graph(model, var, (1, 32, 32, 3))
        assert dot.startswith("digraph jaxpr {") and dot.endswith("}")
        assert "conv_general_dilated" in dot
        assert "output0" in dot
        rows, total = modelviz.param_summary(var)
        assert total == sum(r[3] for r in rows) and total > 1e6
        text = modelviz.format_summary(var, "gem_vgg16")
        assert "gem_vgg16 (%d params)" % total in text

    def test_jaxpr_dot_truncation(self):
        import jax.numpy as jnp
        from gandtr_tpu.utils.modelviz import jaxpr_dot

        def fn(x):
            for _ in range(20):
                x = x * 2 + 1
            return x

        dot = jaxpr_dot(fn, jnp.ones((2,)), max_nodes=5)
        assert "more equations" in dot


class TestCompileCache:
    def test_enable_and_env(self, tmp_path, monkeypatch):
        from gandtr_tpu.utils import compile_cache as cc
        import jax

        d = cc.enable_compilation_cache(str(tmp_path / "xla"))
        assert jax.config.jax_compilation_cache_dir == d
        monkeypatch.setenv("GANDTR_TPU_COMPILE_CACHE", "0")
        assert cc.enable_from_env() is None
        monkeypatch.setenv("GANDTR_TPU_COMPILE_CACHE", str(tmp_path / "x2"))
        assert cc.enable_from_env() == str(tmp_path / "x2")
        # restore: don't leave later jits writing into this tmp dir
        jax.config.update("jax_compilation_cache_dir", None)


class TestApiPath:
    """ApiPath JSON-POST driver round-trip against a live local server."""

    @pytest.fixture()
    def api_server(self, tmp_path):
        import http.server
        import threading
        import json as _json
        import re

        root = tmp_path / "apiroot"
        root.mkdir()

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, obj):
                body = _json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                raw = self.rfile.read(int(self.headers["Content-Length"]))
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/form-data"):
                    boundary = ctype.split("boundary=")[1].encode()
                    fields, content = {}, None
                    for part in raw.split(b"--" + boundary)[1:-1]:
                        head, _, payload = part.partition(b"\r\n\r\n")
                        payload = payload.rstrip(b"\r\n")
                        name = re.search(rb'name="([^"]+)"', head).group(1)
                        if name == b"file":
                            content = payload
                        else:
                            fields[name.decode()] = _json.loads(payload)
                    p = root / fields["path"]
                    p.parent.mkdir(parents=True, exist_ok=True)
                    p.write_bytes(content)
                    return self._reply({"ok": True})
                data = _json.loads(raw)
                cmd = data["command"]
                if cmd == "exists":
                    return self._reply(
                        [(root / x).exists() for x in data["path"]])
                if cmd == "makedirs":
                    for x in data["path"]:
                        (root / x).mkdir(parents=True, exist_ok=True)
                    return self._reply({"ok": True})
                if cmd == "rename":
                    (root / data["src"]).rename(root / data["dst"])
                    return self._reply({"ok": True})
                if cmd == "read":
                    body = (root / data["path"]).read_bytes()
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                return self._reply({"error": "unknown"})

        srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield "127.0.0.1:%d" % srv.server_address[1]
        srv.shutdown()

    def test_round_trip(self, api_server):
        from gandtr_tpu.utils.fs_api import ApiPath, fs_driver

        url = "http://user:pw@%s/api?path=exp&tag=v1" % api_server
        p = fs_driver(url)
        assert isinstance(p, ApiPath)
        assert p.path == "exp" and p.data == {"tag": "v1"}
        assert p.auth == ("user", "pw")
        assert p.makedirs("sub")["ok"]
        child = p / "sub"
        assert child.path == "exp/sub"
        assert child.store("a.txt", b"hello api")["ok"]
        assert p.exists("sub/a.txt") == [True]
        assert p.exists("nope") == [False]
        assert child.open("a.txt").read() == b"hello api"
        assert p.rename("sub/a.txt", "sub/b.txt")["ok"]
        assert p.exists("sub/b.txt", "sub/a.txt") == [True, False]


class TestPretrainedBootstrap:
    def test_caffe_features_import_and_whitening_load(self, tmp_path):
        """init_network(pretrained=True) fills the backbone from a caffe-style
        FEATURES checkpoint (Sequential '0.weight' keys); load_whitening
        returns {'m','P'} float64 (imageretrievalnet.py:237-261)."""
        import torch
        import jax.numpy as jnp
        from gandtr_tpu.models.pretrained_urls import (
            init_network, load_whitening, FEATURES, WHITENING)

        assert set(FEATURES) == {"vgg16", "resnet50", "resnet101",
                                 "resnet152"}
        CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
               512, 512, 512, 'M', 512, 512, 512]
        sd, idx, cin = {}, 0, 3
        rng = np.random.RandomState(0)
        for item in CFG:
            if item == 'M':
                idx += 1
                continue
            sd["%d.weight" % idx] = torch.tensor(
                rng.randn(item, cin, 3, 3).astype(np.float32) * 0.02)
            sd["%d.bias" % idx] = torch.tensor(
                rng.randn(item).astype(np.float32) * 0.02)
            cin = item
            idx += 2
        path = str(tmp_path / "feats.pth")
        torch.save(sd, path)

        model, var = init_network({
            "architecture": "cirnet", "cir_architecture": "vgg16",
            "pooling": "gem", "local_whitening": False, "whitening": False,
            "pretrained": True, "features_path": path})
        k = np.asarray(var["params"]["backbone"]["features_28"]["conv"]["kernel"])
        np.testing.assert_array_equal(
            k, sd["28.weight"].numpy().transpose(2, 3, 1, 0))
        d = model.apply(var, jnp.ones((1, 64, 64, 3)))
        assert d.shape == (1, 512) and np.isfinite(np.asarray(d)).all()

        wpath = str(tmp_path / "w.pth")
        torch.save({"m": np.zeros((512, 1)), "P": np.eye(512)}, wpath)
        w = load_whitening(wpath)
        assert w["m"].shape == (512, 1) and w["P"].shape == (512, 512)
        assert "vgg16-gem" in WHITENING


class TestBenchWatchdog:
    """A crash in a LATER sub-bench must not discard already-printed metric
    lines: after all attempts fail, the watchdog forwards the best attempt's
    partial stdout (bench.py _watchdog)."""

    def _run(self, monkeypatch, capsys, outcomes):
        import types as _types
        import bench as B

        calls = iter(outcomes)

        def fake_run(*a, **k):
            rc, out = next(calls)
            return _types.SimpleNamespace(returncode=rc, stdout=out,
                                          stderr="boom")

        monkeypatch.setattr(B.subprocess, "run", fake_run)
        monkeypatch.setattr(B.time, "sleep", lambda s: None)
        rc = B._watchdog()
        return rc, capsys.readouterr().out

    def test_partial_metrics_forwarded(self, monkeypatch, capsys):
        partial = '{"metric": "gen", "value": 1.0}\n'
        rc, out = self._run(monkeypatch, capsys,
                            [(1, partial), (1, "")])
        assert rc == 0
        assert out == partial

    def test_full_success_passthrough(self, monkeypatch, capsys):
        full = '{"metric": "gen"}\n{"metric": "desc"}\n'
        rc, out = self._run(monkeypatch, capsys, [(0, full)])
        assert rc == 0 and out == full

    def test_no_metrics_fails(self, monkeypatch, capsys):
        rc, out = self._run(monkeypatch, capsys, [(1, ""), (1, "")])
        assert rc == 1 and out == ""
