"""MIPS top-k + invalid-id filtering vs numpy brute force (reference:
indexing/candidate_index.py:107-164 overfetch+mask semantics)."""

import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.ops.topk import mips_top_k


def test_mips_topk_filters_invalid(rng):
    b, x, d, k = 4, 50, 8, 5
    queries = rng.normal(size=(b, d)).astype(np.float32)
    items = rng.normal(size=(x, d)).astype(np.float32)
    item_ids = np.arange(10, 10 + x, dtype=np.int32)  # ids offset from index
    invalid = np.zeros((b, 6), dtype=np.int32)
    for i in range(b):
        invalid[i, :3] = rng.choice(item_ids, size=3, replace=False)

    top_ids, top_scores = mips_top_k(
        jnp.asarray(queries), jnp.asarray(items), jnp.asarray(item_ids),
        k=k, invalid_ids=jnp.asarray(invalid), max_item_id=int(item_ids.max()),
    )
    top_ids, top_scores = np.asarray(top_ids), np.asarray(top_scores)

    scores = queries @ items.T
    for i in range(b):
        mask = np.isin(item_ids, invalid[i])
        s = np.where(mask, -np.inf, scores[i])
        expect_idx = np.argsort(-s, kind="stable")[:k]
        np.testing.assert_array_equal(top_ids[i], item_ids[expect_idx])
        np.testing.assert_allclose(top_scores[i], s[expect_idx], rtol=1e-4, atol=1e-5)
        assert not np.isin(top_ids[i], invalid[i]).any()


def test_mips_topk_no_filter(rng):
    b, x, d, k = 2, 20, 4, 20
    queries = rng.normal(size=(b, d)).astype(np.float32)
    items = rng.normal(size=(x, d)).astype(np.float32)
    ids = np.arange(1, x + 1, dtype=np.int32)
    top_ids, _ = mips_top_k(
        jnp.asarray(queries), jnp.asarray(items), jnp.asarray(ids), k=k
    )
    scores = queries @ items.T
    for i in range(b):
        np.testing.assert_array_equal(
            np.asarray(top_ids)[i], ids[np.argsort(-scores[i], kind="stable")]
        )
