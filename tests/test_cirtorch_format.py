"""Legacy cirtorch-format stages: convert our checkpoint -> cirtorch layout,
load it back, embed images, learn whitening (stages/cirtorch_format/test.py
counterpart)."""
import os
import pickle

import numpy as np
from PIL import Image
import flax.serialization
import jax
import jax.numpy as jnp
import pytest

from gandtr_tpu.models import initialize_model
from gandtr_tpu.scenarios import cirtorch_format_stage as cf


@pytest.fixture(scope="module")
def our_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("cirfmt")
    model = initialize_model({"architecture": "cirnet",
                              "cir_architecture": "vgg16", "pooling": "gem",
                              "local_whitening": False, "whitening": False})
    var = dict(model.init(jax.random.PRNGKey(7),
                          jnp.zeros((1, 32, 32, 3), jnp.float32)))
    path = str(d / "embed.ckpt")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(var))
    return d, model, var, path


def test_convert_and_reload_round_trip(our_ckpt):
    d, model, var, path = our_ckpt
    out = str(d / "cirtorch.pth")
    (meta,) = cf.convert_contained_net(
        {"input_path": path, "output_path": out,
         "meta": {"architecture": "vgg16", "pooling": "gem"}}, ())
    assert meta["keys"] > 20
    with open(out, "rb") as f:
        state = pickle.load(f)
    # torch layout: OIHW convs, pool.p present
    assert state["state_dict"]["features.0.weight"].shape == (64, 3, 3, 3)
    assert "pool.p" in state["state_dict"]

    model2, var2, m2 = cf.load_cirtorch_network(out)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    a = np.asarray(model.apply(var, x))
    b = np.asarray(model2.apply(var2, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_embed_and_learn_whitening(our_ckpt, tmp_path):
    d, model, var, path = our_ckpt
    out = str(d / "cirtorch.pth")
    if not os.path.exists(out):
        cf.convert_contained_net(
            {"input_path": path, "output_path": out,
             "meta": {"architecture": "vgg16", "pooling": "gem"}}, ())
    imgdir = tmp_path / "ims"
    imgdir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(6):
        n = "im%d.jpg" % i
        Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)
                        ).save(imgdir / n)
        names.append(n)
    (res,) = cf.embed({"network_path": out, "image_size": 32,
                       "image_dir": str(imgdir) + "/*",
                       "output": str(tmp_path / "vecs.pkl")}, (names,))
    assert res["count"] == 6 and res["vecs"].shape == (512, 6)
    np.testing.assert_allclose(np.linalg.norm(res["vecs"], axis=0), 1.0,
                               atol=1e-4)

    (wres,) = cf.learn_whitening({"qidxs": [0, 1], "pidxs": [2, 3],
                                  "output": str(tmp_path / "lw.pkl")},
                                 (res["vecs"],))
    with open(tmp_path / "lw.pkl", "rb") as f:
        lw = pickle.load(f)
    assert lw["m"].shape == (512, 1) and lw["P"].shape == (512, 512)
