"""Greedy autoregressive generation smoke (models/decode.greedy_generate)."""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.decode import greedy_generate
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


def test_greedy_generate_unique_valid_ids(rng):
    cfg = Config()
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 60)
    model = build_model(cfg)

    b, l = 2, 16
    lengths = np.array([5, 8], dtype=np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, 60, size=n)
        ts[i, :n] = np.sort(rng.integers(100, 10**5, size=n))
    batch = {
        "lengths": lengths, "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32), "timestamps": ts,
        "target_id": np.ones(b, dtype=np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 10).astype(np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq,
        method=model.init_all,
    )

    catalog_ids = jnp.arange(1, 61, dtype=jnp.int32)
    candidates = l2_normalize(
        model.apply(params, catalog_ids, method=model.item_embeddings)
    )
    steps = 4
    generated = np.asarray(
        greedy_generate(model, params, seq, candidates, catalog_ids, steps, 60)
    )
    assert generated.shape == (b, steps)
    assert (generated >= 1).all() and (generated <= 60).all()
    for i in range(b):
        # filtered generation never repeats history or itself
        seen = set(ids[i][ids[i] > 0].tolist())
        for g in generated[i]:
            assert int(g) not in seen
            seen.add(int(g))


def _tiny_setup(rng):
    cfg = Config()
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 60)
    model = build_model(cfg)
    b, l = 2, 16
    lengths = np.array([5, 8], dtype=np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, 60, size=n)
        ts[i, :n] = np.sort(rng.integers(100, 10**5, size=n))
    batch = {
        "lengths": lengths, "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32), "timestamps": ts,
        "target_id": np.ones(b, dtype=np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 10).astype(np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq,
        method=model.init_all,
    )
    catalog_ids = jnp.arange(1, 61, dtype=jnp.int32)
    candidates = l2_normalize(
        model.apply(params, catalog_ids, method=model.item_embeddings)
    )
    return model, params, seq, candidates, catalog_ids, ids


def test_beam_width1_equals_greedy(rng):
    from mygenerativerecommenders_tpu.models.decode import beam_generate

    model, params, seq, candidates, catalog_ids, _ = _tiny_setup(rng)
    steps = 4
    greedy = np.asarray(
        greedy_generate(model, params, seq, candidates, catalog_ids, steps, 60)
    )
    beam, score = beam_generate(
        model, params, seq, candidates, catalog_ids, steps, 60, num_beams=1
    )
    np.testing.assert_array_equal(np.asarray(beam), greedy)
    assert np.isfinite(np.asarray(score)).all()


def test_beam_search_improves_or_matches_score(rng):
    """Wider beams never score worse (same objective, larger search)."""
    from mygenerativerecommenders_tpu.models.decode import beam_generate

    model, params, seq, candidates, catalog_ids, hist = _tiny_setup(rng)
    steps = 3
    _, s1 = beam_generate(
        model, params, seq, candidates, catalog_ids, steps, 60, num_beams=1
    )
    out4, s4 = beam_generate(
        model, params, seq, candidates, catalog_ids, steps, 60, num_beams=4
    )
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-5).all()
    out4 = np.asarray(out4)
    for i in range(out4.shape[0]):
        seen = set(hist[i][hist[i] > 0].tolist())
        for g in out4[i]:
            assert int(g) not in seen  # history-filtered
            seen.add(int(g))  # and no repeats within the beam


def test_sample_generate_low_temperature_matches_greedy(rng):
    from mygenerativerecommenders_tpu.models.decode import sample_generate

    model, params, seq, candidates, catalog_ids, hist = _tiny_setup(rng)
    steps = 4
    greedy = np.asarray(
        greedy_generate(model, params, seq, candidates, catalog_ids, steps, 60)
    )
    cold = sample_generate(
        model, params, seq, candidates, catalog_ids, steps, 60,
        rng=jax.random.PRNGKey(7), temperature=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(cold), greedy)
    # hot sampling stays within the valid, unseen catalog
    hot = np.asarray(
        sample_generate(
            model, params, seq, candidates, catalog_ids, steps, 60,
            rng=jax.random.PRNGKey(8), temperature=5.0, top_k=10, top_p=0.9,
        )
    )
    assert (hot >= 1).all() and (hot <= 60).all()
    for i in range(hot.shape[0]):
        seen = set(hist[i][hist[i] > 0].tolist())
        for g in hot[i]:
            assert int(g) not in seen
            seen.add(int(g))
