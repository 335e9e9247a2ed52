"""Spatial (SP) and combined data×spatial GSPMD sharding of the conv
workloads (SURVEY §2.11: "design sharding API so spatial/batch sharding of
conv workloads is expressible"). GSPMD inserts the halo exchanges for the
convs/pads and psums for the instance-norm / GeM global reductions; outputs
must match the replicated forward.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gandtr_tpu.models import initialize_model


def _devices(n):
    if len(jax.devices()) < n:
        pytest.skip("needs the %d-device virtual mesh" % n)
    return jax.devices()[:n]


class TestSpatialSharding:
    def test_generator_h_sharded_matches_replicated(self):
        """9 pads (reflect), strided + transposed convs, and instance norms
        (global-H reductions) under 8-way H sharding."""
        gen = initialize_model({"architecture": "official_resnet_generator",
                                "ngf": 8, "n_blocks": 2,
                                "norm_layer": "instance"})
        x = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32) * 2 - 1
        v = gen.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)
        ref = np.asarray(jax.jit(
            lambda: gen.apply(v, jnp.asarray(x), train=False))())

        mesh = Mesh(np.array(_devices(8)), ("sp",))
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp")))
        vr = jax.device_put(v, NamedSharding(mesh, P()))
        fn = jax.jit(lambda vv, z: gen.apply(vv, z, train=False),
                     out_shardings=NamedSharding(mesh, P(None, "sp")))
        out = fn(vr, xs)
        assert out.sharding.spec == P(None, "sp")
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_descriptor_dp_sp_mesh(self):
        """GeM-VGG16 descriptors on a 2x4 (data x spatial) mesh: batch
        sharded 2-way AND the image H dim 4-way; GeM's global spatial pool
        crosses the sp axis."""
        model = initialize_model({"architecture": "cirnet",
                                  "cir_architecture": "vgg16",
                                  "pooling": "gem", "local_whitening": False,
                                  "whitening": False})
        x = np.random.RandomState(1).rand(4, 64, 64, 3).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
        ref = np.asarray(jax.jit(lambda: model.apply(v, jnp.asarray(x)))())

        mesh = Mesh(np.array(_devices(8)).reshape(2, 4), ("data", "sp"))
        xs = jax.device_put(jnp.asarray(x),
                            NamedSharding(mesh, P("data", "sp")))
        vr = jax.device_put(v, NamedSharding(mesh, P()))
        fn = jax.jit(lambda vv, z: model.apply(vv, z),
                     out_shardings=NamedSharding(mesh, P("data")))
        out = fn(vr, xs)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
        # descriptors stay unit-norm through the sharded pool
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1),
                                   1.0, atol=1e-4)
