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


def test_mips_top_k_approx_recall(rng):
    """index.approx_top_k_recall routes selection through
    jax.lax.approx_max_k: on CPU the lowering is exact, so results equal
    the full-sort path; the recall contract on TPU is the primitive's
    (the knob is opt-in serving-only either way)."""
    import jax.numpy as jnp

    from mygenerativerecommenders_tpu.ops.topk import mips_top_k

    b, x, d, k = 8, 512, 16, 32
    q = jnp.asarray(rng.normal(size=(b, d)).astype("float32"))
    emb = jnp.asarray(rng.normal(size=(x, d)).astype("float32"))
    ids = jnp.asarray(np.arange(1, x + 1, dtype=np.int32))
    inv = jnp.asarray(rng.integers(1, x + 1, size=(b, 16)).astype(np.int32))

    exact_ids, exact_scores = mips_top_k(
        q, emb, ids, k=k, invalid_ids=inv, max_item_id=x
    )
    approx_ids, approx_scores = mips_top_k(
        q, emb, ids, k=k, invalid_ids=inv, max_item_id=x, approx_recall=0.95
    )
    # per-row overlap with the exact top-k must meet the recall target
    for r in range(b):
        overlap = len(
            set(np.asarray(exact_ids[r]).tolist())
            & set(np.asarray(approx_ids[r]).tolist())
        )
        assert overlap >= int(0.95 * k), (r, overlap)
    # invalid ids are filtered on both paths
    for r in range(b):
        assert not set(np.asarray(approx_ids[r]).tolist()) & set(
            np.asarray(inv[r]).tolist()
        )


def test_trainer_eval_with_approx_topk(tmp_path):
    """index.approx_top_k_recall plumbs through the trainer's eval step
    (CPU lowering of approx_max_k is exact, so metrics match the exact
    scan here; on TPU the knob trades recall for the sort cost)."""
    import numpy as np

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    results = {}
    for recall in (0.0, 0.95):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out_{recall}")
        cfg.model.index.approx_top_k_recall = recall
        trainer = Trainer(cfg)
        try:
            results[recall] = trainer.eval_epoch(
                trainer.data.loader("val"), "val"
            )
        finally:
            trainer.close()
    for key in results[0.0]:
        np.testing.assert_allclose(
            results[0.95][key], results[0.0][key], rtol=1e-6,
            err_msg=f"metric {key} differs (CPU approx_max_k is exact)",
        )
