"""Int8-quantized MIPS top-k (index.quantize="int8").

Opt-in serving fast path: int8 pre-ranking + exact re-scoring
(ops/quantized_topk.py). Verified: quantization error bound, exact-path
agreement at realistic over-fetch, invalid-id filtering, and the
eval-step / candidate-fn integration (QuantizedCatalog flows through the
jitted step; retrieval metrics match the exact scan on a trained-shape
model).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.ops.quantized_topk import (
    QuantizedCatalog,
    mips_top_k_int8,
    quantize_catalog,
    quantize_rows,
)
from mygenerativerecommenders_tpu.ops.topk import mips_top_k


def _normed(rng, n, d):
    e = rng.standard_normal((n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_quantize_rows_error_bound(rng):
    e = rng.standard_normal((64, 50)).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(e))
    deq = np.asarray(q, dtype=np.float32) * np.asarray(s)[:, None]
    # symmetric rounding error <= s/2 = absmax/254 per element
    bound = np.abs(e).max(axis=-1, keepdims=True) / 254.0 + 1e-7
    assert np.all(np.abs(deq - e) <= bound)
    assert q.dtype == jnp.int8
    # zero rows quantize to zeros with scale 1
    qz, sz = quantize_rows(jnp.zeros((2, 8)))
    assert np.all(np.asarray(qz) == 0) and np.all(np.asarray(sz) == 1.0)


def test_matches_exact_with_rescore(rng):
    x, d, b, k = 2000, 64, 8, 10
    items = _normed(rng, x, d)
    queries = _normed(rng, b, d)
    ids = np.arange(1, x + 1, dtype=np.int32)

    want_ids, want_scores = mips_top_k(
        jnp.asarray(queries), jnp.asarray(items), jnp.asarray(ids), k=k
    )
    cat = quantize_catalog(jnp.asarray(items))
    got_ids, got_scores = mips_top_k_int8(
        jnp.asarray(queries), cat, jnp.asarray(ids), k=k, over_fetch=4
    )
    # exact re-scoring: the surviving candidates' scores are exact, and
    # at 4x over-fetch the true top-k virtually always survives
    recall = np.mean(
        [
            len(set(np.asarray(got_ids)[i]) & set(np.asarray(want_ids)[i])) / k
            for i in range(b)
        ]
    )
    assert recall >= 0.95
    # where ids agree, scores are the exact f32 inner products
    agree = np.asarray(got_ids) == np.asarray(want_ids)
    np.testing.assert_allclose(
        np.asarray(got_scores)[agree], np.asarray(want_scores)[agree],
        rtol=1e-5,
    )


def test_no_rescore_returns_dequantized_order(rng):
    x, d, b, k = 500, 32, 4, 5
    items = _normed(rng, x, d)
    queries = _normed(rng, b, d)
    ids = np.arange(1, x + 1, dtype=np.int32)
    cat = quantize_catalog(jnp.asarray(items), keep_exact=False)
    assert cat.exact is None
    got_ids, got_scores = mips_top_k_int8(
        jnp.asarray(queries), cat, jnp.asarray(ids), k=k
    )
    assert got_ids.shape == (b, k) and got_scores.shape == (b, k)
    # scores descending
    assert np.all(np.diff(np.asarray(got_scores), axis=1) <= 1e-6)


def test_invalid_ids_filtered(rng):
    x, d, b, k = 300, 16, 4, 50
    items = _normed(rng, x, d)
    queries = _normed(rng, b, d)
    ids = np.arange(1, x + 1, dtype=np.int32)
    invalid = rng.integers(1, x + 1, size=(b, 20)).astype(np.int32)
    invalid[:, 0] = 0  # padding slot must be ignored
    cat = quantize_catalog(jnp.asarray(items))
    got_ids, _ = mips_top_k_int8(
        jnp.asarray(queries), cat, jnp.asarray(ids), k=k,
        invalid_ids=jnp.asarray(invalid), max_item_id=x, over_fetch=2,
    )
    got = np.asarray(got_ids)
    for i in range(b):
        assert not set(got[i]) & set(invalid[i, 1:].tolist())


def test_eval_step_integration(rng):
    """index.quantize=int8 end-to-end: candidate fn emits a
    QuantizedCatalog, eval_step consumes it, and the retrieved top-k
    matches the exact path on the same params."""
    import copy

    from mygenerativerecommenders_tpu.configs import Config, resolve
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.train.task_retrieval import (
        make_candidate_fn,
        make_eval_step,
    )
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch
    from tests.test_dense_negatives import _make_batch

    num_items = 150
    cfg = Config()
    cfg.data.max_sequence_length = 10
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    cfg.model.index.k = 10
    cfg.model.index.quantize = "int8"
    cfg.model.index.rescore_over_fetch = 8
    resolve(cfg, num_items)
    model = build_model(cfg)
    ids = np.arange(1, num_items + 1, dtype=np.int32)
    batch = _make_batch(rng, 4, 10, num_items)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq,
        method=model.init_all,
    )

    cand_q = make_candidate_fn(model, cfg, ids)(params)
    assert isinstance(cand_q, QuantizedCatalog)
    step_q = make_eval_step(model, cfg, ids, num_items)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    got_ids, got_scores = step_q(params, dev_batch, cand_q)

    cfg_exact = copy.deepcopy(cfg)
    cfg_exact.model.index.quantize = "none"
    cand = make_candidate_fn(model, cfg_exact, ids)(params)
    step = make_eval_step(model, cfg_exact, ids, num_items)
    want_ids, want_scores = step(params, dev_batch, cand)

    # at 8x over-fetch on a 150-item catalog the sets match exactly
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-5
    )
