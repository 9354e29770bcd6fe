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
