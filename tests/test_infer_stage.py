"""Infer stage: generator batch inference with image sink (skip-if-done) and
embedding sink; multistep whitening learn."""
import os
import pickle

import numpy as np
from PIL import Image
import pytest

from gandtr_tpu.scenarios.infer_stage import infer
from gandtr_tpu.scenarios.multistep_stage import infer_and_learn_whitening


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("infer_ims")
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)
                        ).save(d / f"im{i}.jpg")
    return d


NET = {"type": "SingleNetwork",
       "model": {"architecture": "official_resnet_generator", "ngf": 4,
                 "n_blocks": 1, "norm_layer": "instance"},
       "runtime": {"wrappers": "", "data": {}}}

EMB_NET = {"type": "SingleNetwork",
           "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                     "pooling": "gem", "local_whitening": False,
                     "whitening": False},
           "runtime": {"wrappers": "", "data": {}}}


def test_image_output_with_append_skip(imgdir, tmp_path):
    out_dir = tmp_path / "out"
    params = {
        "network": dict(NET),
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.5] * 3, [0.5] * 3]},
        "output": {"type": "image", "directory": str(out_dir), "append": True},
    }
    names = [f"im{i}.jpg" for i in range(3)]
    (meta,) = infer(dict(params), (names,))
    assert meta["count"] == 3
    assert sorted(os.listdir(out_dir)) == sorted(names)
    # append mode: second run writes nothing new
    (meta2,) = infer(dict(params), (names,))
    assert meta2["count"] == 0


def test_embedding_output(imgdir):
    params = {
        "network": dict(EMB_NET),
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "output": {"type": "embedding", "dimensions": 512},
    }
    (meta,) = infer(params, ([f"im{i}.jpg" for i in range(3)],))
    assert meta["vecs"].shape == (512, 3)
    np.testing.assert_allclose(np.linalg.norm(meta["vecs"], axis=0), 1.0,
                               atol=1e-4)


def test_embedding_order_with_mixed_shapes(tmp_path):
    """Shape-bucketed flushes must NOT reorder descriptor columns: column i
    belongs to input name i (whitening qidxs/pidxs and infer_incrementally
    both index positionally)."""
    rng = np.random.RandomState(3)
    d = tmp_path / "ims"
    d.mkdir()
    names = []
    for i in range(5):
        hw = (32, 32) if i % 2 == 0 else (48, 32)  # two shape buckets
        Image.fromarray((rng.rand(*hw, 3) * 255).astype(np.uint8)
                        ).save(d / f"m{i}.png")
        names.append(f"m{i}.png")
    params = {
        "network": dict(EMB_NET),
        "data": {"image_dir": str(d) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
                 "loader": {"batch_size": 2}},
        "output": {"type": "embedding", "dimensions": 512},
    }
    (meta,) = infer(dict(params), (names,))
    assert meta["names"] == names
    (meta_rev,) = infer(dict(params), (names[::-1],))
    # same name -> same column regardless of submission order
    np.testing.assert_allclose(meta["vecs"], meta_rev["vecs"][:, ::-1],
                               atol=1e-5)


def test_build_index_stage(imgdir, tmp_path):
    from gandtr_tpu.scenarios.index_stage import build_index
    from gandtr_tpu.serving.index import RetrievalIndex
    names = [f"im{i}.jpg" for i in range(3)]
    params = {
        "network": dict(EMB_NET),
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "index": {"path": str(tmp_path / "db.npz"), "dimensions": 512},
    }
    (meta,) = build_index(dict(params), (names,))
    assert meta["count"] == 3 and meta["failed"] == 0

    idx = RetrievalIndex.load(meta["path"])
    assert len(idx) == 3
    # querying with a db image's own descriptor returns it at rank 1
    (emb_meta,) = infer({"network": dict(EMB_NET),
                         "data": dict(params["data"]),
                         "output": {"type": "embedding", "dimensions": 512}},
                        (names,))
    (res,) = idx.query(emb_meta["vecs"][:, 1], k=2)
    assert res[0][0] == "im1.jpg"
    assert res[0][1] == pytest.approx(1.0, abs=1e-4)

    # idempotent skip on re-run
    (meta2,) = build_index(dict(params), (names,))
    assert meta2["status"] == "skipped" and meta2["count"] == 3


def test_build_index_stage_pq(imgdir, tmp_path):
    """PQ variant: `index.pq` config builds a PQRetrievalIndex; load_index
    dispatches on the file; rank-1 self-retrieval holds with rerank."""
    from gandtr_tpu.scenarios.index_stage import build_index
    from gandtr_tpu.serving import load_index
    from gandtr_tpu.serving.pq import PQRetrievalIndex
    names = [f"im{i}.jpg" for i in range(3)]
    params = {
        "network": dict(EMB_NET),
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "index": {"path": str(tmp_path / "pq.npz"), "dimensions": 512,
                  "pq": {"m": 8, "ksub": 3, "rerank": 3, "iters": 5}},
    }
    (meta,) = build_index(dict(params), (names,))
    assert meta["count"] == 3 and meta["failed"] == 0

    idx = load_index(meta["path"])
    assert isinstance(idx, PQRetrievalIndex) and len(idx) == 3
    (emb_meta,) = infer({"network": dict(EMB_NET),
                         "data": dict(params["data"]),
                         "output": {"type": "embedding", "dimensions": 512}},
                        (names,))
    (res,) = idx.query(emb_meta["vecs"][:, 1], k=2)
    assert res[0][0] == "im1.jpg"
    assert res[0][1] == pytest.approx(1.0, abs=1e-4)  # rerank: exact score

    (meta2,) = build_index(dict(params), (names,))
    assert meta2["status"] == "skipped" and meta2["count"] == 3


def test_multistep_whitening(imgdir, tmp_path):
    # cid-style names: path derived as cid[-2:]/cid[-4:-2]/cid[-6:-4]/cid
    rng = np.random.RandomState(1)
    cids = []
    for i in range(6):
        cid = "%040d" % (1234567 + i)
        sub = imgdir / cid[-2:] / cid[-4:-2] / cid[-6:-4]
        os.makedirs(sub, exist_ok=True)
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)
                        ).save(sub / cid, format="JPEG")
        cids.append(cid)
    pkl_path = tmp_path / "whiten_db.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"cids": cids, "qidxs": [0, 1], "pidxs": [2, 3]}, f)

    params = {
        "whitening": {"type": "lw", "dataset_pkl": str(pkl_path),
                      "directory": str(tmp_path / "exp")},
        "network": dict(EMB_NET),
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "output": {"dimensions": 512},
    }
    (meta,) = infer_and_learn_whitening(dict(params), ())
    wpath = meta["whitening_path"]
    assert wpath and os.path.exists(wpath)
    with open(wpath, "rb") as f:
        lw = pickle.load(f)
    assert lw["P"].shape == (512, 512) and lw["m"].shape == (512, 1)
    # idempotency: second run skips
    (meta2,) = infer_and_learn_whitening(dict(params), ())
    assert meta2.get("status") == "skipped"


def test_multistep_whitening_mixed_shapes(imgdir, tmp_path):
    """Whitening pairs (qidxs/pidxs) index descriptor COLUMNS positionally;
    with mixed image shapes the shape-bucketed infer loop flushes out of
    input order, so the lw result must equal a per-image (order-free)
    reference computation."""
    from gandtr_tpu.ops import whiten as whiten_ops
    rng = np.random.RandomState(7)
    cids = []
    for i in range(6):
        cid = "%040d" % (7654321 + i)
        sub = imgdir / cid[-2:] / cid[-4:-2] / cid[-6:-4]
        os.makedirs(sub, exist_ok=True)
        hw = (32, 32) if i % 2 == 0 else (48, 32)  # two shape buckets
        Image.fromarray((rng.rand(*hw, 3) * 255).astype(np.uint8)
                        ).save(sub / cid, format="PNG")  # lossless
        cids.append(cid)
    pkl_path = tmp_path / "whiten_mixed.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"cids": cids, "qidxs": [0, 1], "pidxs": [3, 4]}, f)

    data_cfg = {"image_dir": str(imgdir) + "/*",
                "transforms": "pil2np | totensor | normalize",
                "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
                "loader": {"batch_size": 2}}
    params = {
        "whitening": {"type": "lw", "dataset_pkl": str(pkl_path),
                      "directory": ""},
        "network": dict(EMB_NET),
        "data": dict(data_cfg),
        "output": {"dimensions": 512},
    }
    (meta,) = infer_and_learn_whitening(dict(params), ())
    lw = meta["whitening"]

    # order-free reference: infer each image ALONE, assemble columns by cid
    cols = []
    for cid in cids:
        path = "/".join([cid[-2:], cid[-4:-2], cid[-6:-4], cid])
        (m1,) = infer({"network": dict(EMB_NET), "data": dict(data_cfg),
                       "output": {"type": "embedding", "dimensions": 512}},
                      ([path],))
        cols.append(m1["vecs"][:, 0])
    descs = np.stack(cols, axis=1)
    m_ref, P_ref = whiten_ops.whitenlearn_with_retry(descs, [0, 1], [3, 4])
    np.testing.assert_allclose(lw["m"], m_ref, atol=1e-4)
    np.testing.assert_allclose(lw["P"], P_ref, atol=2e-3)


def test_batched_equals_single(imgdir, tmp_path):
    """Same-shape batching (+ tail padding) produces identical images to
    batch_size=1 processing."""
    names = [f"im{i}.jpg" for i in range(3)]
    outs = {}
    for bs, tag in ((1, "single"), (8, "batched")):
        out_dir = tmp_path / tag
        params = {
            "network": dict(NET),
            "data": {"image_dir": str(imgdir) + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": [[0.5] * 3, [0.5] * 3],
                     "loader": {"batch_size": bs}},
            "output": {"type": "image", "directory": str(out_dir)},
        }
        (meta,) = infer(params, (names,))
        assert meta["count"] == 3
        outs[tag] = [np.asarray(Image.open(out_dir / n)) for n in names]
    for a, b in zip(outs["single"], outs["batched"]):
        np.testing.assert_array_equal(a, b)


def test_device_io_matches_host_io(imgdir, tmp_path):
    """uint8-in/uint8-out device IO produces byte-identical saved images to
    the host f32 transform + host denormalize path."""
    names = [f"im{i}.jpg" for i in range(3)]
    outs = {}
    for dev, tag in ((True, "device"), (False, "host")):
        out_dir = tmp_path / tag
        params = {
            "network": dict(NET),
            "data": {"image_dir": str(imgdir) + "/*",
                     "transforms": "pil2np | totensor | normalize",
                     "mean_std": [[0.5] * 3, [0.5] * 3],
                     "device_preprocess": dev, "device_postprocess": dev,
                     "loader": {"batch_size": 2}},
            "output": {"type": "image", "directory": str(out_dir)},
        }
        (meta,) = infer(params, (names,))
        assert meta["count"] == 3
        outs[tag] = [np.asarray(Image.open(out_dir / n)) for n in names]
    for a, b in zip(outs["device"], outs["host"]):
        # XLA-CPU jit FMA contraction can flip the final truncation by 1 ulp
        # on exact .0 boundaries; byte-exact on TPU/eager
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_infer_incrementally(imgdir):
    """Only missing identifiers are inferred; existing values are reused and
    merged in the requested order (reference infer.py:69-84)."""
    from gandtr_tpu.scenarios.infer_stage import infer_incrementally

    params = {
        "network": dict(EMB_NET),
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "output": {"type": "embedding", "dimensions": 512},
    }
    ids_existing = ["im0.jpg"]
    vals_existing = np.full((1, 512), 7.0, np.float32)  # sentinel: reused, not recomputed
    ids_new = ["im1.jpg", "im0.jpg", "im2.jpg"]
    meta, out_ids, out_vals = infer_incrementally(
        params, (ids_existing, vals_existing, ids_new))
    assert out_ids == ids_new
    assert meta["count"] == 2  # only im1/im2 inferred
    assert out_vals.shape == (3, 512)
    np.testing.assert_array_equal(out_vals[1], vals_existing[0])
    np.testing.assert_allclose(np.linalg.norm(out_vals[0]), 1.0, atol=1e-4)


def test_forward_params_dispatch(imgdir, tmp_path):
    """params['forward'] threads method kwargs into the model call (reference
    infer.py:49): HED with no_sigmoid dumps pre-sigmoid maps."""
    from gandtr_tpu.scenarios.infer_stage import infer

    base = {
        "network": {"type": "SingleNetwork",
                    "model": {"architecture": "hed_interpolation",
                              "width_mult": 0.0625},
                    "runtime": {"wrappers": "", "data": {}}},
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.5] * 3, [0.5] * 3]},
        "output": {"type": "embedding", "dimensions": 1},
    }
    (m_sig,) = infer(dict(base), (["im0.jpg"],))
    (m_pre,) = infer({**base, "forward": {"params": {"no_sigmoid": True}}},
                     (["im0.jpg"],))
    sig = m_sig["vecs"]
    pre = m_pre["vecs"]
    assert sig.min() >= 0 and sig.max() <= 1        # sigmoided
    np.testing.assert_allclose(1 / (1 + np.exp(-pre)), sig, atol=1e-5)


def test_multiscale_infer_matches_manual_aggregation(imgdir):
    """`runtime.wrappers: cirmultiscale:True` (the reference whitening.yml
    protocol) aggregates per-scale descriptors with the GeM-p power mean
    (wrapper.py:237-252, msp = pool.p for plain GeM nets)."""
    import jax
    import jax.numpy as jnp
    from gandtr_tpu.learning.network import build_single_net
    from gandtr_tpu.learning.wrappers import scale_resize
    from gandtr_tpu.data.transforms import initialize_transforms

    ms_net = {"type": "SingleNetwork",
              "model": dict(EMB_NET["model"]),
              "runtime": {"wrappers": "cirmultiscale:True", "data": {}}}
    mean_std = [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]
    params = {
        "network": ms_net,
        "data": {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": mean_std},
        "output": {"type": "embedding", "dimensions": 512},
    }
    (meta,) = infer(dict(params), (["im0.jpg"],))
    got = np.asarray(meta["vecs"])[:, 0]

    # manual aggregation over the same variables (seeded identically)
    net = build_single_net({"model": dict(EMB_NET["model"]),
                            "runtime": {"wrappers": "", "data": {}}})
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = dict(net.init(jax.random.PRNGKey(0), x0))
    p = float(np.asarray(variables["params"]["gem_p"])[0])
    tf = initialize_transforms("pil2np | totensor | normalize", mean_std)
    x = jnp.asarray(tf(Image.open(imgdir / "im0.jpg")))[None]
    descs = [np.asarray(net.apply(variables,
                                  scale_resize(x, s) if s != 1 else x))[0]
             for s in (1, 1 / np.sqrt(2), 1 / 2)]
    v = sum(d ** p for d in descs) / 3
    v = v ** (1 / p)
    want = v / np.linalg.norm(v)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    assert abs(np.linalg.norm(got) - 1) < 1e-5


def test_embedding_shape_bucket_equals_exact(tmp_path):
    """`data.shape_bucket` on the embedding path (round 4): padded-bucket
    masked compute equals exact-shape descriptors (ops/maskprop.py), with
    one compiled graph per bucket — the whiten protocol's compile-wall fix
    (REPRODUCE.md measured table)."""
    rng = np.random.RandomState(7)
    d = tmp_path / "ims"
    d.mkdir()
    names = []
    for i, hw in enumerate([(33, 47), (47, 33), (40, 40), (25, 61)]):
        Image.fromarray((rng.rand(*hw, 3) * 255).astype(np.uint8)
                        ).save(d / f"b{i}.png")
        names.append(f"b{i}.png")
    params = {
        "network": dict(EMB_NET),
        "data": {"image_dir": str(d) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
                 "loader": {"batch_size": 2}},
        "output": {"type": "embedding", "dimensions": 512},
    }
    (exact,) = infer({**params, "data": dict(params["data"])}, (names,))
    bucketed = {**params, "data": {**params["data"], "shape_bucket": 32}}
    (got,) = infer(bucketed, (names,))
    assert got["names"] == names
    np.testing.assert_allclose(got["vecs"], exact["vecs"], atol=2e-5)

    # image sinks must refuse the bucket (band pixels would be written)
    import pytest as _pytest
    bad = {**params, "data": {**params["data"], "shape_bucket": 32},
           "output": {"type": "image", "directory": str(tmp_path / "o")}}
    with _pytest.raises(ValueError):
        infer(bad, (names,))


def test_multistep_whitening_bucketed_equals_exact(imgdir, tmp_path):
    """whitening.yml now defaults `data.shape_bucket: 64` (round 4): the
    bucketed multistep whiten — including the protocol's MULTISCALE
    wrappers with the mask threaded per scale — must learn the same Lw as
    the exact-shape run."""
    rng = np.random.RandomState(9)
    cids = []
    for i in range(6):
        cid = "%040d" % (8881000 + i)
        sub = imgdir / cid[-2:] / cid[-4:-2] / cid[-6:-4]
        os.makedirs(sub, exist_ok=True)
        hw = [(33, 47), (47, 33), (40, 40)][i % 3]
        Image.fromarray((rng.rand(*hw, 3) * 255).astype(np.uint8)
                        ).save(sub / cid, format="PNG")
        cids.append(cid)
    pkl_path = tmp_path / "whiten_bucket.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"cids": cids, "qidxs": [0, 1], "pidxs": [3, 4]}, f)

    net = {**EMB_NET, "runtime": {"wrappers": "cirmultiscale:True",
                                  "data": {}}}
    base_data = {"image_dir": str(imgdir) + "/*",
                 "transforms": "pil2np | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
                 "loader": {"batch_size": 2}}

    # descriptor-level equality through the MULTISCALE string-wrapper path
    # (the actual new surface; Lw's P is an ill-conditioned amplifier of
    # float noise on a 6-image census, so it is smoked rather than compared)
    paths = ["/".join([c[-2:], c[-4:-2], c[-6:-4], c]) for c in cids]

    def embed(shape_bucket):
        params = {"network": dict(net),
                  "data": {**base_data,
                           **({"shape_bucket": shape_bucket}
                              if shape_bucket else {})},
                  "output": {"type": "embedding", "dimensions": 512}}
        (meta,) = infer(params, (paths,))
        return meta["vecs"]

    np.testing.assert_allclose(embed(32), embed(None), atol=2e-5)

    params = {
        "whitening": {"type": "lw", "dataset_pkl": str(pkl_path),
                      "directory": ""},
        "network": dict(net),
        "data": {**base_data, "shape_bucket": 32},
        "output": {"dimensions": 512},
    }
    (meta,) = infer_and_learn_whitening(params, ())
    lw = meta["whitening"]
    assert np.isfinite(lw["m"]).all() and np.isfinite(lw["P"]).all()
