"""Serving subsystem: AOT export artifacts (jax.export), bucket/chunk
padding exactness, the micro-batching service, and the HTTP server
end-to-end. All on the CPU backend (conftest)."""
import io
import json
import os
import threading
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gandtr_tpu.hub import HubModel, GENERATOR_DATA
from gandtr_tpu.learning.network import WrappedNet
from gandtr_tpu.models import initialize_model
from gandtr_tpu.serving import (
    export_hub_model, load_artifact, BatchingService, serve_http)

HW = 32


def tiny_generator_hub():
    module = initialize_model({
        "architecture": "official_resnet_generator", "ngf": 8, "n_blocks": 1,
        "no_antialias": True, "no_antialias_up": True,
        "norm_layer": "instance"})
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = dict(module.init(jax.random.PRNGKey(0), x0, train=False))
    net = WrappedNet(module=module, meta={}, data_params=dict(GENERATOR_DATA))
    return HubModel(net, variables, transform=None,
                    meta={"in_channels": 3, "out_channels": 3})


def tiny_embedding_hub(with_wrappers=False):
    from gandtr_tpu.models.retrieval import GemRetrievalNet
    module = GemRetrievalNet(architecture="vgg16", pooling="gem")
    x0 = jnp.zeros((1, HW * 2, HW * 2, 3), jnp.float32)
    variables = dict(module.init(jax.random.PRNGKey(1), x0))
    net = WrappedNet(module=module, meta=module.meta,
                     data_params={"transforms": "pil2np | totensor | normalize",
                                  "mean_std": [[0.485, 0.456, 0.406],
                                               [0.229, 0.224, 0.225]]})
    return HubModel(net, variables, transform=None, meta=dict(module.meta))


@pytest.fixture(scope="module")
def gen_artifact(tmp_path_factory):
    model = tiny_generator_hub()
    path = str(tmp_path_factory.mktemp("art") / "gen")
    meta = export_hub_model(model, path, (HW, HW), batch_buckets=(2,),
                            from_uint8=True)
    return model, path, meta


def _reference_generator_out(model, imgs_u8):
    """What the exported uint8->uint8 graph must equal: device preprocess
    (normalize) -> module -> denormalize + floor-quantize (infer_stage)."""
    mean = np.asarray(GENERATOR_DATA["mean_std"][0], np.float32)
    std = np.asarray(GENERATOR_DATA["mean_std"][1], np.float32)
    x = (imgs_u8.astype(np.float32) / 255.0 - mean) / std
    y = np.asarray(model.net.apply(model.variables, jnp.asarray(x),
                                   train=False, ctx={"msp": 1.0}))
    rgb = np.clip(y * std + mean, 0, 1)
    return np.floor(rgb * 255.0).astype(np.uint8)


class TestExportGenerator:
    def test_meta(self, gen_artifact):
        _, path, meta = gen_artifact
        assert meta["kind"] == "generator"
        assert meta["input_dtype"] == "uint8"
        on_disk = json.load(open(os.path.join(path, "meta.json")))
        assert on_disk == meta
        assert os.path.exists(os.path.join(path, "b2.jaxexp"))

    def test_bucket_pad_and_chunk_exact(self, gen_artifact):
        model, path, _ = gen_artifact
        servable = load_artifact(path)
        rng = np.random.RandomState(0)
        # n=1 exercises pad-to-bucket, n=3 exercises chunking (cap 2)
        for n in (1, 3):
            imgs = rng.randint(0, 256, (n, HW, HW, 3), np.uint8)
            out = servable(imgs)
            ref = _reference_generator_out(model, imgs)
            assert out.shape == (n, HW, HW, 3) and out.dtype == np.uint8
            # XLA-CPU jit contracts FMAs (CLAUDE.md): round-half-even ties in
            # the quantization can flip +-1 vs the eager reference compute.
            diff = np.abs(out.astype(int) - ref.astype(int))
            assert diff.max() <= 1
            assert (diff == 0).mean() > 0.999

    def test_multi_device_round_robin(self, gen_artifact):
        model, path, _ = gen_artifact
        servable = load_artifact(path, devices=jax.devices()[:4])
        rng = np.random.RandomState(5)
        imgs = rng.randint(0, 256, (7, HW, HW, 3), np.uint8)  # 4 chunks @cap 2
        out = servable(imgs)
        ref = _reference_generator_out(model, imgs)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999  # FMA ties

    def test_single_image_auto_batch_dim(self, gen_artifact):
        _, path, _ = gen_artifact
        servable = load_artifact(path)
        img = np.zeros((HW, HW, 3), np.uint8)
        assert servable(img).shape == (1, HW, HW, 3)


@pytest.fixture(scope="module")
def emb_artifact(tmp_path_factory):
    model = tiny_embedding_hub()
    path = str(tmp_path_factory.mktemp("art") / "emb")
    meta = export_hub_model(model, path, (HW * 2, HW * 2),
                            batch_buckets=(1, 2), from_uint8=False,
                            with_mask=True)
    return model, path, meta


class TestExportEmbeddingMask:
    def test_masked_export_matches_direct(self, emb_artifact):
        model, path, meta = emb_artifact
        assert meta["kind"] == "embedding"
        servable = load_artifact(path)
        rng = np.random.RandomState(1)
        x = rng.rand(2, HW * 2, HW * 2, 3).astype(np.float32)
        out = servable(x)  # default all-ones mask
        ref = np.asarray(model.net.apply(model.variables, jnp.asarray(x),
                                         train=False, ctx={"msp": 1.0}))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)
        # unit-norm descriptors (embedding path ends in L2N)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    def test_mask_ignores_padding(self, emb_artifact):
        """Aspect-preserving serving: descriptor of an image padded to the
        bucket (with its mask) ~= descriptor of the unpadded image. VGG16's
        stride-32 receptive fields bleed a little across the boundary, so
        require high cosine rather than equality."""
        model, path, _ = emb_artifact
        servable = load_artifact(path)
        rng = np.random.RandomState(2)
        h_valid = HW * 2 - 16
        base = rng.rand(h_valid, HW * 2, 3).astype(np.float32)
        padded = np.pad(base, [(0, 16), (0, 0), (0, 0)], mode="edge")
        mask = np.zeros((HW * 2, HW * 2), np.float32)
        mask[:h_valid] = 1.0
        d_masked = servable(padded[None], masks=mask[None])[0]
        d_direct = np.asarray(model.net.apply(
            model.variables, jnp.asarray(base[None]), train=False,
            ctx={"msp": 1.0}))[0]
        cos = float(np.dot(d_masked, d_direct))
        # at this tiny test resolution the stride-32 feature map is 4x4 and
        # the pad boundary bleeds into a whole feature row; at the 1024px
        # serving size the boundary fraction is ~8x smaller
        assert cos > 0.95, cos

    def test_single_image_2d_mask(self, emb_artifact):
        _, path, _ = emb_artifact
        servable = load_artifact(path)
        img = np.zeros((HW * 2, HW * 2, 3), np.float32)
        mask = np.ones((HW * 2, HW * 2), np.float32)
        assert servable(img, masks=mask).shape[0] == 1

    def test_mask_refused_by_unsupported_pooling(self):
        """A pooling without a masked form must refuse the mask kwarg at
        trace time instead of silently pooling over pad pixels."""
        from gandtr_tpu.models.retrieval import GemRetrievalNet
        module = GemRetrievalNet(architecture="vgg16", pooling="rmac")
        x = jnp.zeros((1, HW * 2, HW * 2, 3), jnp.float32)
        with pytest.raises(ValueError, match="mask is not supported"):
            module.init(jax.random.PRNGKey(0), x,
                        mask=jnp.ones((1, HW * 2, HW * 2)))

    def test_attention_net_honors_mask(self):
        from gandtr_tpu.models.retrieval import GemRetrievalNetAttention
        module = GemRetrievalNetAttention(architecture="vgg16", pooling="gem")
        x = jnp.asarray(np.random.RandomState(6).rand(1, HW * 2, HW * 2, 3),
                        jnp.float32)
        v = module.init(jax.random.PRNGKey(0), x)
        full = module.apply(v, x, mask=jnp.ones((1, HW * 2, HW * 2)))
        plain = module.apply(v, x)
        np.testing.assert_allclose(np.asarray(full), np.asarray(plain),
                                   rtol=1e-5)
        half = jnp.zeros((1, HW * 2, HW * 2)).at[:, :HW].set(1.0)
        masked = module.apply(v, x, mask=half)
        assert not np.allclose(np.asarray(masked), np.asarray(plain))

    def test_wrapped_net_rejects_mask(self, tmp_path):
        from gandtr_tpu.learning.wrappers import CirMultiscaleAggregation
        model = tiny_embedding_hub()
        model.net = WrappedNet(module=model.net.module,
                               wrappers_eval=[CirMultiscaleAggregation(
                                   scales=True)],
                               meta=model.net.meta,
                               data_params=model.net.data_params)
        with pytest.raises(ValueError, match="wrapper-free"):
            export_hub_model(model, str(tmp_path / "x"), (HW, HW),
                             with_mask=True, from_uint8=False)


class TestBatchingService:
    def test_concurrent_correctness(self):
        seen_batches = []

        def fn(x):
            seen_batches.append(x.shape[0])
            return x * 2.0

        svc = BatchingService(fn, max_batch=4, max_wait_ms=30)
        try:
            items = [np.full((3,), i, np.float32) for i in range(16)]
            results = [None] * 16

            def worker(i):
                results[i] = svc.submit(items[i]).result(timeout=30)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(16)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for i in range(16):
                np.testing.assert_array_equal(results[i], items[i] * 2)
            assert all(b <= 4 for b in seen_batches)
            assert sum(seen_batches) == 16
        finally:
            svc.close()

    def test_error_fans_out(self):
        def fn(x):
            raise RuntimeError("boom")

        svc = BatchingService(fn, max_batch=2, max_wait_ms=1)
        try:
            fut = svc.submit(np.zeros((2,)))
            with pytest.raises(RuntimeError, match="boom"):
                fut.result(timeout=10)
        finally:
            svc.close()

    def test_cancelled_future_does_not_kill_batcher(self):
        def fn(x):
            time.sleep(0.05)
            return x

        svc = BatchingService(fn, max_batch=2, max_wait_ms=1)
        try:
            f1 = svc.submit(np.zeros((1,), np.float32))
            f1.cancel()  # waiter gave up; batcher must survive set_result
            out = svc.submit(np.ones((1,), np.float32)).result(timeout=30)
            np.testing.assert_array_equal(out, np.ones((1,), np.float32))
        finally:
            svc.close()

    def test_close_never_strands_a_future(self):
        """submit racing close(): every submit either resolves or raises —
        no future may hang forever."""
        svc = BatchingService(lambda x: x, max_batch=4, max_wait_ms=1)
        futs, errors = [], []

        def submitter():
            for _ in range(50):
                try:
                    futs.append(svc.submit(np.zeros((1,), np.float32)))
                except RuntimeError:
                    errors.append(1)
                    return

        t = threading.Thread(target=submitter)
        t.start()
        time.sleep(0.01)
        svc.close()
        t.join(timeout=10)
        for f in futs:
            try:
                f.result(timeout=5)  # must not time out
            except RuntimeError:
                pass

    def test_submit_after_close_raises(self):
        svc = BatchingService(lambda x: x, max_batch=2, max_wait_ms=1)
        svc.close()
        with pytest.raises(RuntimeError, match="closed"):
            svc.submit(np.zeros((1,), np.float32))

    def test_multi_arg_items(self):
        def fn(x, m):
            return (x * m[..., None]).sum(axis=(1, 2, 3))

        svc = BatchingService(fn, max_batch=4, max_wait_ms=1)
        try:
            x = np.ones((2, 2, 3), np.float32)
            m = np.ones((2, 2), np.float32)
            out = svc(x, m)
            assert out == pytest.approx(12.0)
        finally:
            svc.close()


class TestExportStage:
    def test_scenario_stage_roundtrip(self, tmp_path):
        from gandtr_tpu.scenarios.run import FUNCTIONS
        params = {
            "network": {"model": {"architecture": "official_resnet_generator",
                                  "ngf": 8, "n_blocks": 1,
                                  "no_antialias": True,
                                  "no_antialias_up": True,
                                  "norm_layer": "instance"},
                        "runtime": {"wrappers": "",
                                    "data": dict(GENERATOR_DATA)}},
            "export": {"directory": str(tmp_path / "art"),
                       "image_hw": [HW, HW], "batch_buckets": [2],
                       "from_uint8": True},
        }
        (meta,) = FUNCTIONS["gandtr_tpu.stages.export"](params, ())
        assert meta["kind"] == "generator"
        servable = load_artifact(meta["directory"])
        out = servable(np.zeros((1, HW, HW, 3), np.uint8))
        assert out.shape == (1, HW, HW, 3) and out.dtype == np.uint8

    def test_stage_rejects_unknown_params(self, tmp_path):
        from gandtr_tpu.scenarios.export_stage import export
        params = {
            "network": {"model": {"architecture": "official_resnet_generator",
                                  "ngf": 8, "n_blocks": 1,
                                  "no_antialias": True,
                                  "no_antialias_up": True,
                                  "norm_layer": "instance"},
                        "runtime": {"wrappers": "",
                                    "data": dict(GENERATOR_DATA)}},
            "export": {"directory": str(tmp_path / "art"),
                       "image_hw": [HW, HW], "typo_key": 1},
        }
        with pytest.raises(AssertionError, match="typo_key"):
            export(params, ())


class TestRetrievalIndex:
    def _db(self, n=500, d=64, seed=0):
        rng = np.random.RandomState(seed)
        v = rng.randn(n, d).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    def test_exact_topk_vs_numpy(self):
        from gandtr_tpu.serving import RetrievalIndex
        db, q = self._db(500, 64), self._db(7, 64, seed=1)
        idx = RetrievalIndex(64)
        idx.add([f"im{i}" for i in range(250)], db[:250])
        idx.add([f"im{i}" for i in range(250, 500)], db[250:])
        results = idx.query(q, k=9)
        scores = q @ db.T
        for qi in range(7):
            ref = np.argsort(-scores[qi], kind="stable")[:9]
            assert [n for n, _ in results[qi]] == [f"im{j}" for j in ref]
            np.testing.assert_allclose([s for _, s in results[qi]],
                                       scores[qi][ref], rtol=1e-5)

    def test_multi_device_shards_match_single(self):
        from gandtr_tpu.serving import RetrievalIndex
        db, q = self._db(200, 32), self._db(3, 32, seed=2)
        single = RetrievalIndex(32)
        multi = RetrievalIndex(32, devices=jax.devices()[:4])
        names = [f"x{i}" for i in range(200)]
        single.add(names, db)
        multi.add(names, db)
        # per-shard matmuls round differently at ~1e-7; names must agree
        # exactly, scores to float tolerance
        got_s, got_m = single.query(q, k=11), multi.query(q, k=11)
        for rs, rm in zip(got_s, got_m):
            assert [n for n, _ in rs] == [n for n, _ in rm]
            np.testing.assert_allclose([s for _, s in rs],
                                       [s for _, s in rm], rtol=1e-5)

    def test_chunked_topk_path_exact(self):
        """Databases above the chunk threshold use the two-stage top-k;
        results (values AND index-based names, incl. duplicate-row ties)
        must equal the plain path and numpy."""
        from gandtr_tpu.serving import RetrievalIndex
        d = 16
        base = self._db(1000, d, seed=4)
        # tile rows so exact score ties exist across chunk boundaries
        db = np.concatenate([base] * 20, 0)          # 20000 rows > 4*CHUNK
        q = self._db(3, d, seed=5)
        idx = RetrievalIndex(d)  # 20000 rows -> two recursion levels @128
        names = [f"r{i}" for i in range(db.shape[0])]
        idx.add(names, db)
        res = idx.query(q, k=7)
        scores = q @ db.T
        for qi in range(3):
            ref = np.argsort(-scores[qi], kind="stable")[:7]
            assert [n for n, _ in res[qi]] == [f"r{j}" for j in ref]
            np.testing.assert_allclose([s for _, s in res[qi]],
                                       scores[qi][ref], rtol=1e-5)

    def test_save_load_roundtrip(self, tmp_path):
        from gandtr_tpu.serving import RetrievalIndex
        db = self._db(40, 16)
        idx = RetrievalIndex(16)
        idx.add([f"n{i}" for i in range(40)], db)
        p = str(tmp_path / "index.npz")
        idx.save(p)
        idx2 = RetrievalIndex.load(p)
        assert len(idx2) == 40 and idx2.dim == 16
        assert idx.query(db[:2], k=3) == idx2.query(db[:2], k=3)

    def test_empty_and_k_clamp(self):
        from gandtr_tpu.serving import RetrievalIndex
        idx = RetrievalIndex(8)
        assert idx.query(np.zeros((2, 8), np.float32)) == [[], []]
        idx.add(["only"], np.ones((1, 8), np.float32) / np.sqrt(8))
        (res,) = idx.query(np.ones((1, 8), np.float32) / np.sqrt(8), k=10)
        assert len(res) == 1 and res[0][0] == "only"
        assert res[0][1] == pytest.approx(1.0, abs=1e-5)


class TestHttpServer:
    @pytest.fixture()
    def server(self, gen_artifact, emb_artifact):
        _, path, _ = gen_artifact
        _, emb_path, _ = emb_artifact
        srv = serve_http({"day2night": load_artifact(path),
                          "embed": load_artifact(emb_path)}, port=0,
                         max_wait_ms=1.0, block=False)
        yield srv
        srv.shutdown()
        for e in srv.models.values():
            e.batcher.close()

    def _url(self, server, path):
        host, port = server.server_address
        return "http://%s:%d%s" % (host, port, path)

    def test_healthz_and_listing(self, server):
        with urllib.request.urlopen(self._url(server, "/healthz")) as r:
            health = json.load(r)
        assert health["status"] == "ok"
        with urllib.request.urlopen(self._url(server, "/v1/models")) as r:
            models = json.load(r)
        assert models["day2night"]["kind"] == "generator"

    def _predict(self, server, body, ctype):
        req = urllib.request.Request(
            self._url(server, "/v1/models/day2night:predict"), data=body,
            headers={"Content-Type": ctype}, method="POST")
        return urllib.request.urlopen(req)

    def test_predict_npy(self, server, gen_artifact):
        model, _, _ = gen_artifact
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (HW, HW, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        with self._predict(server, buf.getvalue(),
                           "application/octet-stream") as r:
            assert r.headers["Content-Type"] == "image/png"
            png = r.read()
        from PIL import Image
        out = np.asarray(Image.open(io.BytesIO(png)))
        ref = _reference_generator_out(model, img[None])[0]
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999  # FMA ties

    def test_predict_png_bytes_resizes(self, server):
        from PIL import Image
        img = Image.fromarray(
            np.random.RandomState(4).randint(0, 256, (50, 70, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        with self._predict(server, buf.getvalue(), "image/png") as r:
            out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == (HW, HW, 3)

    def test_embedding_f32_masked_artifact_over_http(self, server):
        """An f32 artifact (from_uint8=False, masked): the server rebuilds
        the host transform from the artifact's provenance and pads
        aspect-preserving; response is a descriptor JSON."""
        from PIL import Image
        img = Image.fromarray(np.random.RandomState(7).randint(
            0, 256, (40, HW * 2, 3), np.uint8))  # non-square: pad + mask
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(
            self._url(server, "/v1/models/embed:predict"),
            data=buf.getvalue(), headers={"Content-Type": "image/png"},
            method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        desc = np.asarray(out["descriptor"])
        assert desc.shape == (512,)
        np.testing.assert_allclose(np.linalg.norm(desc), 1.0, atol=1e-4)

    def test_search_endpoint_end_to_end(self, emb_artifact):
        """Image -> descriptor -> top-k over an attached RetrievalIndex."""
        from gandtr_tpu.serving import RetrievalIndex
        _, emb_path, _ = emb_artifact
        index = RetrievalIndex(512)
        srv = serve_http({"embed": load_artifact(emb_path)}, port=0,
                         max_wait_ms=1.0, block=False,
                         indices={"embed": index})
        try:
            host, port = srv.server_address
            rng = np.random.RandomState(8)
            imgs = [rng.randint(0, 256, (HW * 2, HW * 2, 3), np.uint8)
                    for _ in range(3)]

            def post(action, img):
                buf = io.BytesIO()
                np.save(buf, img)
                req = urllib.request.Request(
                    "http://%s:%d/v1/models/embed%s" % (host, port, action),
                    data=buf.getvalue(),
                    headers={"Content-Type": "application/octet-stream"},
                    method="POST")
                with urllib.request.urlopen(req) as r:
                    return json.load(r)

            for i, img in enumerate(imgs):
                desc = np.asarray(post(":predict", img)["descriptor"])
                index.add(["img%d" % i], desc[None])
            got = post(":search?k=2", imgs[1])["results"]
            assert got[0]["name"] == "img1"
            assert got[0]["score"] == pytest.approx(1.0, abs=1e-4)
            # noise images yield correlated descriptors (~0.997); only the
            # self-match should be ~exactly 1
            assert len(got) == 2 and got[1]["score"] < got[0]["score"] - 1e-3
        finally:
            srv.shutdown()
            for e in srv.models.values():
                e.batcher.close()

    def test_search_endpoint_with_pq_index(self, emb_artifact):
        """The PQ index duck-types RetrievalIndex behind :search (rerank
        gives exact self-match scores)."""
        from gandtr_tpu.serving.pq import PQRetrievalIndex
        _, emb_path, _ = emb_artifact
        rng = np.random.RandomState(9)
        train = rng.randn(300, 512).astype(np.float32)
        train /= np.linalg.norm(train, axis=1, keepdims=True)
        index = PQRetrievalIndex(512, m=8, ksub=32, rerank=10).fit(
            train, iters=5)
        srv = serve_http({"embed": load_artifact(emb_path)}, port=0,
                         max_wait_ms=1.0, block=False,
                         indices={"embed": index})
        try:
            host, port = srv.server_address
            imgs = [rng.randint(0, 256, (HW * 2, HW * 2, 3), np.uint8)
                    for _ in range(3)]

            def post(action, img):
                buf = io.BytesIO()
                np.save(buf, img)
                req = urllib.request.Request(
                    "http://%s:%d/v1/models/embed%s" % (host, port, action),
                    data=buf.getvalue(),
                    headers={"Content-Type": "application/octet-stream"},
                    method="POST")
                with urllib.request.urlopen(req) as r:
                    return json.load(r)

            for i, img in enumerate(imgs):
                desc = np.asarray(post(":predict", img)["descriptor"])
                index.add(["img%d" % i], desc[None])
            got = post(":search?k=2", imgs[1])["results"]
            assert got[0]["name"] == "img1"
            assert got[0]["score"] == pytest.approx(1.0, abs=1e-4)
        finally:
            srv.shutdown()
            for e in srv.models.values():
                e.batcher.close()

    def test_search_bad_k_is_400(self, emb_artifact):
        """Malformed ?k= must be a 400 JSON error, not a dropped socket."""
        from gandtr_tpu.serving import RetrievalIndex
        _, emb_path, _ = emb_artifact
        srv = serve_http({"embed": load_artifact(emb_path)}, port=0,
                         max_wait_ms=1.0, block=False,
                         indices={"embed": RetrievalIndex(512)})
        try:
            host, port = srv.server_address
            for bad in ("abc", "0", "-3"):
                req = urllib.request.Request(
                    "http://%s:%d/v1/models/embed:search?k=%s"
                    % (host, port, bad), data=b"x",
                    headers={"Content-Type": "application/octet-stream"},
                    method="POST")
                with pytest.raises(urllib.error.HTTPError) as exc:
                    urllib.request.urlopen(req)
                assert exc.value.code == 400
        finally:
            srv.shutdown()
            for e in srv.models.values():
                e.batcher.close()

    def test_search_without_index_404(self, server):
        req = urllib.request.Request(
            self._url(server, "/v1/models/day2night:search"), data=b"x",
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 404

    def test_unknown_model_404(self, server):
        req = urllib.request.Request(
            self._url(server, "/v1/models/nope:predict"), data=b"x",
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 404


class TestShardedExport:
    """export_sharded_model: ONE SPMD program batch-sharded over the mesh
    (vs export_hub_model's per-device round-robin)."""

    @pytest.fixture(scope="class")
    def sharded_artifact(self, tmp_path_factory):
        import jax
        from gandtr_tpu.serving.export import export_sharded_model
        model = tiny_embedding_hub()
        path = str(tmp_path_factory.mktemp("art") / "sharded")
        meta = export_sharded_model(model, path, (HW * 2, HW * 2),
                                    n_devices=len(jax.devices()),
                                    batch_per_device=1)
        return model, path, meta

    def test_meta_and_exact_outputs(self, sharded_artifact):
        import jax
        model, path, meta = sharded_artifact
        n = len(jax.devices())
        assert meta["sharded"]["n_devices"] == n
        assert meta["batch_buckets"] == [n]

        servable = load_artifact(path)
        rng = np.random.RandomState(0)
        imgs = (rng.rand(n, HW * 2, HW * 2, 3) * 255).astype(np.uint8)
        out = servable(imgs)
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        x = (imgs.astype(np.float32) / 255.0 - mean) / std
        ref = np.asarray(model.net.apply(model.variables, jnp.asarray(x),
                                         train=False, ctx={"msp": 1.0}))
        assert out.shape == ref.shape
        assert np.abs(out - ref).max() < 2e-5

        # a partial batch pads to the sharded bucket and slices back — exact
        out3 = servable(imgs[:3])
        assert np.abs(out3 - ref[:3]).max() < 2e-5

    def test_wrong_device_count_refused(self, sharded_artifact):
        import jax
        _, path, _ = sharded_artifact
        with pytest.raises(ValueError, match="exactly"):
            load_artifact(path, devices=jax.devices()[:1])


class TestF32GeneratorArtifact:
    def test_f32_generator_http_predict_quantizes(self, tmp_path):
        """from_uint8=False generator over HTTP must return the SAME PNG as
        the uint8-exported artifact (host denorm+quantize path — a raw uint8
        cast of the normalized output was returning noise; found by review)."""
        model = tiny_generator_hub()
        p32 = str(tmp_path / "gen32")
        pu8 = str(tmp_path / "gen8")
        export_hub_model(model, p32, (HW, HW), batch_buckets=(1,),
                         from_uint8=False)
        export_hub_model(model, pu8, (HW, HW), batch_buckets=(1,),
                         from_uint8=True)
        srv = serve_http({"g32": load_artifact(p32), "g8": load_artifact(pu8)},
                         port=0, max_wait_ms=1.0, block=False)
        try:
            host, port = srv.server_address
            img = np.random.RandomState(0).randint(
                0, 256, (HW, HW, 3), np.uint8)

            def post(name):
                buf = io.BytesIO()
                np.save(buf, img)
                req = urllib.request.Request(
                    "http://%s:%d/v1/models/%s:predict" % (host, port, name),
                    data=buf.getvalue(),
                    headers={"Content-Type": "application/octet-stream"},
                    method="POST")
                with urllib.request.urlopen(req) as r:
                    from PIL import Image
                    return np.asarray(Image.open(io.BytesIO(r.read())))

            out32, out8 = post("g32"), post("g8")
            assert out32.dtype == np.uint8 and out32.shape == (HW, HW, 3)
            # device vs host quantize may differ by 1 on exact bin edges
            assert np.abs(out32.astype(int) - out8.astype(int)).max() <= 1
            assert out32.std() > 5  # not a constant/garbage image
        finally:
            srv.shutdown()
            for e in srv.models.values():
                e.batcher.close()
