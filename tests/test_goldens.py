"""Stored-golden regression anchors: fixed seed + fixed input must reproduce
the committed descriptor bit patterns across refactors (complements the
torch-oracle parity tests, which pin external semantics)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.models.retrieval import GemRetrievalNet

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def test_vgg16_gem_descriptor_golden():
    model = GemRetrievalNet(architecture="vgg16")
    x = jnp.asarray(np.linspace(0, 1, 1 * 64 * 64 * 3,
                                dtype=np.float32).reshape(1, 64, 64, 3))
    var = model.init(jax.random.PRNGKey(123), x)
    out = np.asarray(model.apply(var, x))
    ref = np.load(os.path.join(GOLDENS, "vgg16_gem_desc_seed123.npy"))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
