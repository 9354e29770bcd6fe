"""Brute-force MIPS top-k with per-row invalid-id filtering.

Reference: models/indexing/top_k.py (MIPSBruteForceTopK: mm + topk) and
candidate_index.py:107-164 (over-fetch k' = k + max_invalid, mask invalid
rows, cumsum-gather the first k valid).

TPU-native design: instead of over-fetching and doing a dynamic nonzero
gather, invalid ids are masked to -inf directly in the [B, X] score matrix
(a scatter into id-space), then a single `jax.lax.top_k`. This is exactly
equivalent whenever k <= number of valid candidates (the reference asserts
the same implicitly via its .view(-1, k)) and is one fused pass on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_mips_scores(
    query_embeddings: jax.Array,  # [B, D]
    item_embeddings: jax.Array,  # [X, D]
    item_ids: jax.Array,  # [X] int (catalog ids, all > 0)
    invalid_ids: Optional[jax.Array] = None,  # [B, N0] ids to exclude (0 = none)
    max_item_id: Optional[int] = None,
) -> jax.Array:
    """[B, X] inner-product scores with each row's invalid ids at NEG_INF."""
    scores = jnp.einsum(
        "bd,xd->bx", query_embeddings, item_embeddings,
        preferred_element_type=jnp.float32,
    )
    if invalid_ids is not None:
        if max_item_id is None:
            max_item_id = int(item_ids.max())  # only valid outside jit
        b = invalid_ids.shape[0]
        # Scatter invalid ids into id-space, then gather at catalog ids.
        # Slot 0 absorbs padding (id 0) and is never read back (ids > 0).
        invalid_in_id_space = jnp.zeros((b, max_item_id + 1), dtype=jnp.bool_)
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        invalid_in_id_space = invalid_in_id_space.at[
            rows, jnp.clip(invalid_ids, 0, max_item_id)
        ].set(True)
        invalid_in_id_space = invalid_in_id_space.at[:, 0].set(False)
        is_invalid = jnp.take_along_axis(
            invalid_in_id_space, item_ids[None, :].astype(jnp.int32), axis=1
        )
        scores = jnp.where(is_invalid, NEG_INF, scores)
    return scores


@functools.partial(
    jax.jit, static_argnames=("k", "max_item_id", "approx_recall")
)
def mips_top_k(
    query_embeddings: jax.Array,  # [B, D]
    item_embeddings: jax.Array,  # [X, D]
    item_ids: jax.Array,  # [X] int (catalog ids, all > 0)
    k: int,
    invalid_ids: Optional[jax.Array] = None,  # [B, N0] ids to exclude (0 = none)
    max_item_id: Optional[int] = None,
    approx_recall: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k by inner product, excluding each row's invalid ids.

    Returns (top_k_ids [B, k], top_k_scores [B, k]), sorted descending.

    approx_recall > 0 routes the selection through the TPU's hardware
    partial-reduce top-k (`jax.lax.approx_max_k`) with that per-element
    recall target instead of XLA's full-sort `lax.top_k` — the XLA sort
    is the dominant cost of a large-catalog scan (measured at X=131k:
    exact mm+top-k 11.6 ms/call vs 3.4 ms at recall 0.99; the matmul
    itself is 1.7 ms). Opt-in, serving-oriented; the default 0.0 keeps
    the reference-exact scan for training/eval checkpoint selection.
    """
    scores = masked_mips_scores(
        query_embeddings, item_embeddings, item_ids, invalid_ids, max_item_id
    )
    if approx_recall > 0.0:
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k, recall_target=float(approx_recall)
        )
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k)
    top_ids = jnp.take(item_ids, top_idx, axis=0)
    return top_ids, top_scores
