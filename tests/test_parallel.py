"""Sharded embedding + mesh tests on the 8-virtual-device CPU backend
(the TPU analog of the reference's ddp_sim CPU simulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.parallel.embedding_sharding import ShardedEmbedding
from mygenerativerecommenders_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 host devices"
    return make_mesh(data=2, model=4)


def test_sharded_lookup_matches_dense(mesh, rng):
    emb = ShardedEmbedding(mesh, num_items=100, embedding_dim=16)
    table = emb.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(0, 101, size=(4, 7)), dtype=jnp.int32)
    out = emb.lookup(table, ids)
    dense = np.asarray(jax.device_get(table))
    np.testing.assert_allclose(
        np.asarray(out), dense[np.asarray(ids)], rtol=1e-6, atol=1e-6
    )


def test_sharded_lookup_grad(mesh):
    emb = ShardedEmbedding(mesh, num_items=100, embedding_dim=8)
    table = emb.init(jax.random.PRNGKey(1))
    ids = jnp.asarray([[1, 5, 99], [100, 1, 0]], dtype=jnp.int32)

    def loss(t):
        return emb.lookup(t, ids).sum()

    g = jax.grad(loss)(table)
    g = np.asarray(jax.device_get(g))
    # each occurrence adds 1 to its row
    expected = np.zeros_like(g)
    for i in np.asarray(ids).ravel():
        expected[i] += 1.0
    np.testing.assert_allclose(g, expected, atol=1e-6)


def test_padding_row_zero_init(mesh):
    emb = ShardedEmbedding(mesh, num_items=50, embedding_dim=8)
    table = emb.init(jax.random.PRNGKey(2))
    row0 = np.asarray(emb.lookup(table, jnp.asarray([0])))
    assert np.abs(row0).max() == 0.0
