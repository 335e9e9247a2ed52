"""End-to-end retrieval evaluation on a synthetic roxford5k-style dataset:
gnd pkl -> descriptor extraction (multiscale + whitening wrappers) -> ranks ->
E/M/H mAP, through the validate stage."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from gandtr_tpu.eval import retrieval as R


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("test_data")
    ds_dir = root / "roxford5k"
    jpg = ds_dir / "jpg"
    jpg.mkdir(parents=True)
    rng = np.random.RandomState(0)
    # two visual groups: dark and bright images
    imlist, gnd_groups = [], []
    for i in range(8):
        name = f"db{i}"
        base = 0.15 if i < 4 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"{name}.jpg")
        imlist.append(name)
        gnd_groups.append(0 if i < 4 else 1)
    qimlist = []
    gnd = []
    for qi, grp in enumerate([0, 1]):
        name = f"q{qi}"
        base = 0.15 if grp == 0 else 0.75
        arr = np.clip(rng.rand(48, 48, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"{name}.jpg")
        qimlist.append(name)
        easy = [i for i, g in enumerate(gnd_groups) if g == grp]
        gnd.append({"easy": np.asarray(easy[:3]), "hard": np.asarray(easy[3:]),
                    "junk": np.asarray([]), "bbx": [0, 0, 48, 48]})
    with open(ds_dir / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)
    return str(root)


def test_validate_stage_end_to_end(synth_dataset):
    from gandtr_tpu.scenarios.validate_stage import validate

    params = {
        "network": {
            "type": "SingleNetwork",
            "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                      "pooling": "gem", "local_whitening": False,
                      "whitening": False},
            "runtime": {"wrappers": {"eval": {"1_cirmultiscale": {"scales": True}}}},
        },
        "data": {"image_size": 64,
                 "transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "validation": {"dir_main": synth_dataset, "datasets": ["roxford5k"]},
    }
    (result,) = validate(params, ())
    metadata = result["metadata"]["validation"]
    keys = [k for k in metadata if "roxford5k" in k]
    assert any("map_medium" in k for k in keys), keys
    # brightness separates groups — even a random-weight GeM net ranks the
    # matching group first; medium mAP must be far above chance
    medium = [v for k, v in metadata.items() if "map_medium" in k][0]
    assert medium > 0.6, medium


def test_extract_vectors_shape_cache(synth_dataset):
    import jax, jax.numpy as jnp
    from gandtr_tpu.models import initialize_model
    from gandtr_tpu.data.transforms import initialize_transforms

    model = initialize_model({"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False})
    x0 = jnp.zeros((1, 32, 32, 3))
    var = model.init(jax.random.PRNGKey(0), x0)
    tf = initialize_transforms("pil2np | totensor | normalize",
                               [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])
    ex = R.ShapeCachedExtractor(lambda v, x: model.apply(v, x), var)
    cfg = R.configdataset("roxford5k", synth_dataset)
    paths = [R.im_fname(cfg, i) for i in range(3)]
    vecs = R.extract_vectors(ex, paths, 32, tf)
    assert vecs.shape == (512, 3)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=0), 1.0, atol=1e-4)


def test_masked_bucket_extraction_close_to_exact(synth_dataset):
    """Padded-bucket extraction (masked GeM) stays close to exact-shape."""
    import jax, jax.numpy as jnp
    from gandtr_tpu.models import initialize_model
    from gandtr_tpu.data.transforms import initialize_transforms

    model = initialize_model({"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False})
    x0 = jnp.zeros((1, 32, 32, 3))
    var = model.init(jax.random.PRNGKey(0), x0)
    tf = initialize_transforms("pil2np | totensor | normalize",
                               [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])
    exact = R.ShapeCachedExtractor(lambda v, x: model.apply(v, x), var)
    bucketed = R.ShapeCachedExtractor(
        lambda v, x, m: model.apply(v, x, mask=m), var, shape_bucket=32)
    # realistic aspect: pad fraction a few percent (prod: 1024px, bucket 32)
    rng = np.random.RandomState(3)
    big = tmp_path_for_img = os.path.join(synth_dataset, "big.jpg")
    Image.fromarray((rng.rand(160, 130, 3) * 255).astype(np.uint8)).save(big)
    v_exact = R.extract_vectors(exact, [big], None, tf)
    v_bucket = R.extract_vectors(bucketed, [big], None, tf)
    cos = float((v_exact[:, 0] * v_bucket[:, 0]).sum())
    assert cos > 0.97, cos

def test_bucketed_batch_equals_single(synth_dataset):
    """Bucketed extraction gives identical descriptors batched vs per-image."""
    import jax, jax.numpy as jnp
    from gandtr_tpu.models import initialize_model
    from gandtr_tpu.data.transforms import initialize_transforms

    model = initialize_model({"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False})
    var = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tf = initialize_transforms("pil2np | totensor | normalize",
                               [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])
    ex = R.ShapeCachedExtractor(
        lambda v, x, m: model.apply(v, x, mask=m), var, shape_bucket=16)
    cfg = R.configdataset("roxford5k", synth_dataset)
    paths = [R.im_fname(cfg, i) for i in range(4)]
    # different exact shapes mapping to one bucket share a graph + batch
    v1 = R.extract_vectors(ex, paths, 40, tf, batch_size=1)
    v4 = R.extract_vectors(ex, paths, 40, tf, batch_size=4)
    np.testing.assert_allclose(v1, v4, atol=2e-6)


def test_validate_stage_bucketed(synth_dataset):
    """validate stage with shape_bucket + batch_size: same ranking quality
    (multiscale wrappers with the mask threaded through each scale)."""
    from gandtr_tpu.scenarios.validate_stage import validate

    params = {
        "network": {
            "type": "SingleNetwork",
            "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                      "pooling": "gem", "local_whitening": False,
                      "whitening": False},
            "runtime": {"wrappers": {"eval": {"1_cirmultiscale": {"scales": True}}}},
        },
        "data": {"image_size": 64, "shape_bucket": 32,
                 "loader": {"batch_size": 4},
                 "transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
                 "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
        "validation": {"dir_main": synth_dataset, "datasets": ["roxford5k"]},
    }
    (result,) = validate(params, ())
    metadata = result["metadata"]["validation"]
    medium = [v for k, v in metadata.items() if "map_medium" in k][0]
    assert medium > 0.6, medium


def test_device_preprocess_matches_host(synth_dataset):
    """Fused device preprocessing (uint8 upload + in-graph CLAHE/normalize)
    reproduces the host-transform descriptors and mAP."""
    from gandtr_tpu.scenarios.validate_stage import validate

    def run(device_preprocess):
        params = {
            "network": {
                "type": "SingleNetwork",
                "model": {"architecture": "cirnet", "cir_architecture": "vgg16",
                          "pooling": "gem", "local_whitening": False,
                          "whitening": False},
                "runtime": {"wrappers": {"eval": {
                    "1_cirmultiscale": {"scales": True}}}},
            },
            "data": {"image_size": 64,
                     "device_preprocess": device_preprocess,
                     "transforms": "pil2np | apply_clahe:1.0 | totensor | normalize",
                     "mean_std": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
            "validation": {"dir_main": synth_dataset, "datasets": ["roxford5k"]},
        }
        (result,) = validate(params, ())
        return result["metadata"]["validation"]

    m_host = run(False)
    m_dev = run(True)
    for k in m_host:
        if "map" in k:
            np.testing.assert_allclose(m_dev[k], m_host[k], atol=1e-6), k


def test_parallel_extract_across_devices(synth_dataset):
    """Round-robin multi-device extraction (8 virtual CPU devices): same
    descriptors as single-device, with all devices actually used."""
    import jax, jax.numpy as jnp
    from gandtr_tpu.models import initialize_model
    from gandtr_tpu.data.transforms import initialize_transforms

    assert len(jax.local_devices()) == 8
    model = initialize_model({"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False})
    var = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tf = initialize_transforms("pil2np | totensor | normalize",
                               [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])
    cfg = R.configdataset("roxford5k", synth_dataset)
    paths = [R.im_fname(cfg, i) for i in range(6)]
    single = R.ShapeCachedExtractor(lambda v, x: model.apply(v, x), var)
    multi = R.ShapeCachedExtractor(lambda v, x: model.apply(v, x), var,
                                   devices=jax.local_devices())
    v1 = R.extract_vectors(single, paths, 32, tf)
    v8 = R.extract_vectors(multi, paths, 32, tf)
    np.testing.assert_allclose(v1, v8, atol=1e-6)
    assert multi._rr == len(paths)
    assert len(multi._dev_variables) >= 2  # actually spread across devices


def test_score_validation_events(synth_dataset):
    """ScoreValidation logs score_avg + per-query AP events + eval time like
    the reference CirDatasetAp (cirscore.py:75-83), and the score drives
    best-epoch selection through the dtype-directed MetadataKeeper."""
    import jax, jax.numpy as jnp
    from gandtr_tpu.models import initialize_model
    from gandtr_tpu.data.transforms import initialize_transforms
    from gandtr_tpu.learning.events import EventBroker, MetadataKeeper
    from gandtr_tpu.learning.training import ScoreValidation

    model = initialize_model({"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False})
    var = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tf = initialize_transforms("pil2np | totensor | normalize",
                               [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]])

    class _State:
        variables = {"embed": var}

    val = ScoreValidation(model, "roxford5k", synth_dataset, image_size=32,
                          transform=tf, net_name="embed")
    events = EventBroker(metadata=MetadataKeeper(
        "val/validation/roxford5k/score_avg:map_medium"))
    val(_State(), 1, events)
    agg = events.close_epoch(1)

    assert "val/validation/roxford5k/score_avg:map_medium" in agg
    # per-query events averaged per epoch (2 queries in the fixture)
    assert "val/validation/roxford5k/score:ap_medium" in agg
    assert "val/validation/roxford5k/dataset:eval" in agg
    assert events.metadata.is_last_best() is True
    assert events.metadata.best_epoch() == 1


@pytest.fixture(scope="module")
def synth_dataset_mixed(tmp_path_factory):
    """Mixed-shape census: db/query images with different aspect ratios, so
    aspect-preserving resize yields heterogeneous (H, W) and the bucketed
    path actually pads (the exactness claim under test)."""
    root = tmp_path_factory.mktemp("test_data_mixed")
    ds_dir = root / "roxford5k"
    jpg = ds_dir / "jpg"
    jpg.mkdir(parents=True)
    rng = np.random.RandomState(5)
    shapes = [(48, 48), (40, 56), (56, 40), (32, 60), (60, 32), (44, 52),
              (52, 44), (36, 58)]
    imlist, gnd_groups = [], []
    for i, (h, w) in enumerate(shapes):
        name = f"db{i}"
        base = 0.15 if i < 4 else 0.75
        arr = np.clip(rng.rand(h, w, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"{name}.jpg")
        imlist.append(name)
        gnd_groups.append(0 if i < 4 else 1)
    qimlist, gnd = [], []
    for qi, (grp, (h, w)) in enumerate(zip([0, 1], [(42, 54), (54, 42)])):
        name = f"q{qi}"
        base = 0.15 if grp == 0 else 0.75
        arr = np.clip(rng.rand(h, w, 3) * 0.2 + base, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(jpg / f"{name}.jpg")
        qimlist.append(name)
        easy = [i for i, g in enumerate(gnd_groups) if g == grp]
        gnd.append({"easy": np.asarray(easy[:3]), "hard": np.asarray(easy[3:]),
                    "junk": np.asarray([]), "bbx": [0, 0, float(w), float(h)]})
    with open(ds_dir / "gnd_roxford5k.pkl", "wb") as f:
        pickle.dump({"imlist": imlist, "qimlist": qimlist, "gnd": gnd}, f)
    return str(root)


def test_eval_default_bucket_and_exactness(synth_dataset_mixed):
    """Round-4 default flip: the iccv23 eval parameters carry
    shape_bucket: 64, and on a mixed-shape census bucketed mAPs EQUAL the
    exact-shape protocol's (descriptor-level exactness is proven in
    test_exact_bucketing; this pins it at the validate-stage level plus the
    effective-config snapshot in the output metadata)."""
    import yaml
    from gandtr_tpu.scenarios.validate_stage import validate

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "gandtr_tpu", "scenarios", "configs",
        "iccv23", "parameters", "eval.yml")
    with open(cfg_path) as f:
        eval_params = yaml.safe_load(f)
    assert eval_params["data"]["shape_bucket"] == 64

    def run(shape_bucket):
        params = {
            "network": {
                "type": "SingleNetwork",
                "model": {"architecture": "cirnet",
                          "cir_architecture": "vgg16",
                          "pooling": "gem", "local_whitening": False,
                          "whitening": False},
                "runtime": {"wrappers": {"eval": {
                    "1_cirmultiscale": {"scales": True}}}},
            },
            "data": {"image_size": 64, "shape_bucket": shape_bucket,
                     "transforms":
                         "pil2np | apply_clahe:1.0 | totensor | normalize",
                     "mean_std": [[0.485, 0.456, 0.406],
                                  [0.229, 0.224, 0.225]]},
            "validation": {"dir_main": synth_dataset_mixed,
                           "datasets": ["roxford5k"]},
        }
        (result,) = validate(params, ())
        return result["metadata"]["validation"]

    m_exact = run(None)
    m_bucket = run(32)  # small bucket so the tiny census still pads
    assert m_exact["config:data.shape_bucket"] is None
    assert m_bucket["config:data.shape_bucket"] == 32
    for k in m_exact:
        if "map" in k:
            np.testing.assert_allclose(m_bucket[k], m_exact[k], atol=1e-6,
                                       err_msg=k)
