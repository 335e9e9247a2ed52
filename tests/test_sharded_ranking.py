"""Sharded retrieval ranking: the V.T @ Q scores matmul with descriptor
columns sharded over the mesh — GSPMD inserts the collectives; results equal
the single-device ranking."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gandtr_tpu.ops.ranking import rank_descriptors
from gandtr_tpu.parallel.mesh import make_mesh


def test_sharded_ranking_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    rng = np.random.RandomState(0)
    D, Ndb, Nq = 32, 64, 16
    vecs = rng.randn(D, Ndb).astype(np.float32)
    qvecs = rng.randn(D, Nq).astype(np.float32)

    ref = np.asarray(rank_descriptors(vecs, qvecs))

    mesh = make_mesh(8)
    # shard the db columns over devices; queries replicated
    vs = jax.device_put(jnp.asarray(vecs), NamedSharding(mesh, P(None, "data")))
    qs = jax.device_put(jnp.asarray(qvecs), NamedSharding(mesh, P()))
    out = np.asarray(jax.jit(rank_descriptors)(vs, qs))
    np.testing.assert_array_equal(out, ref)

    # shard queries instead (the eval-time layout for many queries)
    qs2 = jax.device_put(jnp.asarray(qvecs), NamedSharding(mesh, P(None, "data")))
    vs2 = jax.device_put(jnp.asarray(vecs), NamedSharding(mesh, P()))
    out2 = np.asarray(jax.jit(rank_descriptors)(vs2, qs2))
    np.testing.assert_array_equal(out2, ref)
