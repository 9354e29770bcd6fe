"""Sequence feature schema (reference: models/utils/features.py).

`SequenceBatch` is the pytree crossing the host->device boundary: fixed
shapes, int32 ids/timestamps, a lengths vector instead of jagged offsets.

`seq_features_from_batch` mirrors seq_features_from_row (features.py:19-85):
pads the history arrays by `max_output_length` zeros and scatters the
target timestamp at position `lengths` (so the last attended query
position sees the "next-item" timestamp). `sample_weight` marks real rows
(1.0) vs padding rows added to fill a partial final batch (0.0).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.ops.sequence import scatter_at_lengths


class SequenceBatch(NamedTuple):
    past_lengths: jax.Array  # [B] int32, all >= 1 for real rows
    past_ids: jax.Array  # [B, N] int32, 0 = padding
    past_embeddings: Optional[jax.Array]  # [B, N, D] float or None
    past_payloads: Dict[str, jax.Array]  # timestamps/ratings/years [B, N]


def seq_features_from_batch(
    batch: Dict[str, jax.Array],
    max_output_length: int,
) -> Tuple[SequenceBatch, jax.Array, jax.Array]:
    """Raw loader batch -> (SequenceBatch padded to N, target_ids, target_ratings).

    Expects keys: lengths [B], ids/timestamps/ratings(/years) [B, L],
    target_id/target_rating/target_timestamp(/target_year) [B].
    """
    lengths = batch["lengths"].astype(jnp.int32)
    b = lengths.shape[0]

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((b, max_output_length), dtype=x.dtype)], axis=1
        )

    ids = pad(batch["ids"].astype(jnp.int32))
    timestamps = pad(batch["timestamps"].astype(jnp.int32))
    ratings = pad(batch["ratings"].astype(jnp.int32))
    timestamps = scatter_at_lengths(
        timestamps, lengths, batch["target_timestamp"].astype(jnp.int32)
    )

    payloads = {"timestamps": timestamps, "ratings": ratings}
    if "years" in batch:
        payloads["years"] = pad(batch["years"].astype(jnp.int32))

    # any extra columns (user features etc.) ride along as payloads, like
    # the reference's exclude-keys passthrough (features.py:59-83)
    known = {
        "lengths", "ids", "timestamps", "ratings", "years",
        "target_id", "target_rating", "target_timestamp", "target_year",
        "sample_weight",
    }
    for key, value in batch.items():
        if key not in known:
            payloads[key] = value

    features = SequenceBatch(
        past_lengths=lengths,
        past_ids=ids,
        past_embeddings=None,
        past_payloads=payloads,
    )
    return (
        features,
        batch["target_id"].astype(jnp.int32),
        batch["target_rating"].astype(jnp.int32),
    )


def packed_seq_features(batch: Dict[str, jax.Array]) -> SequenceBatch:
    """PackedBatchLoader batch -> SequenceBatch (data/packing.py).

    No output-slot padding or target scatter: targets are already each
    segment's last token, and the `positions` / `seg_ids` payloads drive
    the positional gather (models/preprocessors.py) and block-diagonal
    attention (models/hstu.py SEGMENT_IDS_KEY)."""
    return SequenceBatch(
        past_lengths=batch["lengths"].astype(jnp.int32),
        past_ids=batch["ids"].astype(jnp.int32),
        past_embeddings=None,
        past_payloads={
            "timestamps": batch["timestamps"].astype(jnp.int32),
            "ratings": batch["ratings"].astype(jnp.int32),
            "positions": batch["positions"].astype(jnp.int32),
            "seg_ids": batch["seg_ids"].astype(jnp.int32),
        },
    )
