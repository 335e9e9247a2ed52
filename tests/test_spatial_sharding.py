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


class TestSpatialShardingHazards:
    """The XLA SPMD partitioner (jax 0.9.0) mis-partitions two conv patterns
    under spatial sharding, both SILENTLY: parallel.mesh.spatial_mesh is the
    sanctioned guard. These tests pin (a) the hazard still existing — if an
    XLA upgrade fixes it, the canary fails and the fastconv guard can be
    lifted — and (b) the guarded path matching replicated execution."""

    def test_fastconv_strided_rewrite_diverges_canary(self):
        """conv_s2d (stride-8 conv + depth_to_space, Co=512) partitions
        wrongly when spatial shard boundaries don't align with the window
        grid. Canary: if this starts matching, re-evaluate the spatial_mesh
        fastconv guard."""
        import jax as _jax
        if _jax.__version__ != "0.9.0":
            pytest.skip("hazard pinned on jax 0.9.0; re-evaluate on upgrade")
        from gandtr_tpu.ops import fastconv
        rng = np.random.RandomState(0)
        x = rng.rand(2, 32, 32, 3).astype(np.float32)
        k = jnp.asarray(rng.rand(3, 3, 3, 8).astype(np.float32))

        def fast8(z):
            zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return fastconv.conv_s2d(zp, k, 8)

        ref = np.asarray(jax.jit(fast8)(jnp.asarray(x)))
        mesh = Mesh(np.array(_devices(4)), ("sp",))
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, "sp")))
        out = np.asarray(jax.jit(fast8)(xs))
        assert np.abs(out - ref).max() > 0.01, (
            "XLA now partitions conv_s2d correctly — the spatial_mesh "
            "fastconv guard can be re-evaluated")

    def test_hed_sanctioned_spatial_path_matches_replicated(self):
        """HED (fastconv-eligible convs + 16x downsampling) through
        spatial_mesh + max_spatial_shards equals the replicated forward."""
        from gandtr_tpu.parallel import mesh as pmesh
        from gandtr_tpu.ops import fastconv
        _devices(8)
        hw = 64
        sp = pmesh.max_spatial_shards(hw, 16, max_halo=2)
        assert sp == 2
        model = initialize_model({"architecture": "hed_interpolation",
                                  "width_mult": 0.125})
        x = np.random.RandomState(3).rand(4, hw, hw, 3).astype(np.float32)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
        enabled_before = fastconv.ENABLED
        try:
            mesh = pmesh.spatial_mesh(4, sp)
            assert not fastconv.ENABLED  # the guard must have tripped
            ref = np.asarray(jax.jit(
                lambda vv, z: model.apply(vv, z))(v, jnp.asarray(x)))
            xs = jax.device_put(jnp.asarray(x),
                                NamedSharding(mesh, P("data", "sp")))
            vr = jax.device_put(v, NamedSharding(mesh, P()))
            out = np.asarray(jax.jit(
                lambda vv, z: model.apply(vv, z))(vr, xs))
        finally:
            fastconv.set_enabled(enabled_before)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_max_spatial_shards_rule(self):
        from gandtr_tpu.parallel.mesh import max_spatial_shards
        assert max_spatial_shards(64, 16, 2) == 2   # deepest 4 rows / halo 2
        assert max_spatial_shards(32, 16, 2) == 1   # deepest 2 rows: no split
        assert max_spatial_shards(256, 4, 2) == 32  # generator-like stack
        assert max_spatial_shards(100, 4, 2) == 10  # must divide image dim
        assert max_spatial_shards(8, 16, 2) == 1    # degenerate: at least 1
