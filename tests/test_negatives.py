"""Negative sampler tests: distribution support + static-shape dedup."""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.models.negatives import (
    InBatchNegativesSampler,
    LocalNegativesSampler,
)


def identity_lookup(ids):
    return ids[..., None].astype(jnp.float32)


def test_local_sampler_support():
    sampler = LocalNegativesSampler(l2_norm=False)
    catalog = jnp.asarray([5, 7, 11, 13], dtype=jnp.int32)
    ids, emb = sampler(
        jax.random.PRNGKey(0), jnp.zeros((4, 6), dtype=jnp.int32), 8,
        catalog, identity_lookup,
    )
    assert ids.shape == (4, 6, 8)
    assert set(np.unique(np.asarray(ids))) <= {5, 7, 11, 13}
    np.testing.assert_allclose(np.asarray(emb)[..., 0], np.asarray(ids))


def test_in_batch_pool_dedup():
    sampler = InBatchNegativesSampler(l2_norm=False, dedup_embeddings=True)
    ids = jnp.asarray([[3, 3, 5, 0], [5, 9, 0, 0]], dtype=jnp.int32)
    presences = ids != 0
    pool, count = sampler.process_batch(ids, presences)
    assert int(count) == 3
    assert set(np.asarray(pool)[: int(count)].tolist()) == {3, 5, 9}
    # pool tail is padding
    assert np.asarray(pool)[int(count):].sum() == 0


def test_in_batch_pool_no_dedup():
    sampler = InBatchNegativesSampler(l2_norm=False, dedup_embeddings=False)
    ids = jnp.asarray([[3, 3, 5, 0]], dtype=jnp.int32)
    pool, count = sampler.process_batch(ids, ids != 0)
    assert int(count) == 3
    assert sorted(np.asarray(pool)[:3].tolist()) == [3, 3, 5]


def test_in_batch_sampling_within_count():
    sampler = InBatchNegativesSampler(l2_norm=False, dedup_embeddings=True)
    ids = jnp.asarray([[3, 3, 5, 0], [5, 9, 0, 0]], dtype=jnp.int32)
    pool, count = sampler.process_batch(ids, ids != 0)
    s_ids, _ = sampler(
        jax.random.PRNGKey(1), jnp.zeros((2, 3), dtype=jnp.int32), 16,
        pool, count, identity_lookup,
    )
    assert set(np.unique(np.asarray(s_ids))) <= {3, 5, 9}


def test_l2_norm():
    sampler = LocalNegativesSampler(l2_norm=True)
    x = jnp.asarray([[3.0, 4.0]])
    np.testing.assert_allclose(
        np.asarray(sampler.normalize_embeddings(x)), [[0.6, 0.8]], rtol=1e-6
    )
