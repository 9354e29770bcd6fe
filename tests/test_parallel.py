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


def test_all_to_all_lookup_matches_psum(mesh, rng):
    from mygenerativerecommenders_tpu.parallel.embedding_sharding import (
        ShardedEmbedding,
    )

    emb = ShardedEmbedding(mesh, num_items=100, embedding_dim=16)
    table = emb.init(jax.random.PRNGKey(3))
    ids = jnp.asarray(rng.integers(0, 101, size=(6, 9)), dtype=jnp.int32)
    want = np.asarray(emb.lookup(table, ids))
    got = np.asarray(jax.jit(emb.lookup_all_to_all)(table, ids))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def loss_a2a(t):
        return (emb.lookup_all_to_all(t, ids) ** 2).sum()

    def loss_psum(t):
        return (emb.lookup(t, ids) ** 2).sum()

    ga = np.asarray(jax.jit(jax.grad(loss_a2a))(table))
    gp = np.asarray(jax.jit(jax.grad(loss_psum))(table))
    np.testing.assert_allclose(ga, gp, rtol=1e-5, atol=1e-6)


def test_all_to_all_lookup_overflow_exact(mesh):
    """Heavy skew (all ids on one shard) overflows the buckets; the psum
    residual keeps the result exact."""
    from mygenerativerecommenders_tpu.parallel.embedding_sharding import (
        ShardedEmbedding,
    )

    emb = ShardedEmbedding(mesh, num_items=100, embedding_dim=8)
    table = emb.init(jax.random.PRNGKey(4))
    ids = jnp.full((5, 8), 7, dtype=jnp.int32)  # all owned by shard 0
    want = np.asarray(emb.lookup(table, ids))
    # capacity_factor so small that most duplicates overflow
    got = np.asarray(emb.lookup_all_to_all(table, ids, capacity_factor=0.25))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    g_a2a = jax.grad(lambda t: (emb.lookup_all_to_all(t, ids, 0.25) ** 2).sum())(
        table
    )
    g_ps = jax.grad(lambda t: (emb.lookup(t, ids) ** 2).sum())(table)
    np.testing.assert_allclose(
        np.asarray(g_a2a), np.asarray(g_ps), rtol=1e-5, atol=1e-6
    )


def test_column_sharded_lookup(mesh, rng):
    from mygenerativerecommenders_tpu.parallel.embedding_sharding import (
        ColumnShardedEmbedding,
    )

    emb = ColumnShardedEmbedding(mesh, num_items=60, embedding_dim=16)
    table = emb.init(jax.random.PRNGKey(5))
    ids = jnp.asarray(rng.integers(0, 61, size=(3, 5)), dtype=jnp.int32)
    out = np.asarray(jax.jit(emb.lookup)(table, ids))
    dense = np.asarray(jax.device_get(table))
    np.testing.assert_allclose(out, dense[np.asarray(ids)], rtol=1e-6, atol=1e-6)

    g = np.asarray(
        jax.grad(lambda t: emb.lookup(t, ids).sum())(table)
    )
    expected = np.zeros_like(g)
    for i in np.asarray(ids).ravel():
        expected[i] += 1.0
    np.testing.assert_allclose(g, expected, atol=1e-6)

    with pytest.raises(ValueError):
        ColumnShardedEmbedding(mesh, num_items=60, embedding_dim=18)


def test_large_vocab_sharded_retrieval(mesh, rng):
    """Large-vocab retrieval slice (BASELINE north-star config #5 scaled to
    the CPU mesh): a 1M-row table row-sharded over "model", all-to-all id
    lookup for the query-side embeddings, sharded brute-force MIPS top-k.
    At 100M rows on a pod slice only the constants change — every array
    here is sharded or O(shards*k)."""
    from mygenerativerecommenders_tpu.parallel.embedding_sharding import (
        ShardedEmbedding,
    )
    from mygenerativerecommenders_tpu.parallel.topk_sharded import (
        sharded_mips_top_k,
    )

    num_items = 1_000_000
    d, b, k = 16, 8, 10
    emb = ShardedEmbedding(mesh, num_items=num_items, embedding_dim=d)
    table = emb.init(jax.random.PRNGKey(6))
    ids = jnp.asarray(
        rng.integers(1, num_items + 1, size=(b, 3)), dtype=jnp.int32
    )
    queries = jax.jit(emb.lookup_all_to_all)(table, ids).mean(axis=1)  # [b, d]

    all_ids = jnp.arange(0, emb.vocab, dtype=jnp.int32)  # row i <-> id i
    top_ids, top_scores = sharded_mips_top_k(
        mesh, queries, table, all_ids, k=k
    )
    assert top_ids.shape == (b, k) and top_scores.shape == (b, k)
    # verify against the dense single-device answer
    dense = np.asarray(jax.device_get(table))
    scores = np.asarray(queries) @ dense.T
    scores[:, 0] = -np.inf  # padding id never wins
    want = np.argsort(-scores, axis=1)[:, :k]
    got = np.asarray(top_ids)
    # ids match up to ties; compare score values instead of raw ids
    np.testing.assert_allclose(
        np.asarray(top_scores),
        np.take_along_axis(scores, want, axis=1),
        rtol=1e-5, atol=1e-5,
    )
