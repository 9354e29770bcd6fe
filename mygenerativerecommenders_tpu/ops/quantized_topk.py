"""Int8-quantized MIPS top-k (a serving MEMORY lever).

The reference's `MIPSBruteForceTopK` (models/indexing/top_k.py:43-70) is
an f32 `mm` + `topk`. This opt-in path stores the catalog as symmetric
per-row int8 (absmax/127 scales) — 4x smaller catalog RESIDENCY, which
is what lets a 100M x 64 index fit per-shard budgets — scores with an
int8xint8->int32 MXU matmul, then optionally re-scores an over-fetched
candidate set against the exact f32 rows so the returned top-k ORDER is
exact whenever the true top-k survives the quantized pre-ranking
(recall measured ~1.0 at 4x over-fetch on normalized embeddings;
tests/test_quantized_topk.py).

Honest throughput note (r5, v5e): at this model family's head dims
(D=50-64) int8 is NOT faster — the pre-rank matmul it accelerates is
GFLOP-scale noise next to the [B, X]-wide dequant/top-k work, which the
int8 path widens (measured 29-33k q/s vs 53k exact at X=3952, 4.0k vs
9.5k at X=131k). Pick it for memory, not speed.

Enable with `index.quantize="int8"` (+ `index.rescore_over_fetch`);
default "none" keeps the reference-exact scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.ops.topk import NEG_INF


class QuantizedCatalog(NamedTuple):
    q: jax.Array  # [X, D] int8 rows
    scales: jax.Array  # [X] f32 per-row dequant scales
    exact: Optional[jax.Array]  # [X, D] f32 rows for re-scoring (or None)


def quantize_rows(emb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8: q = round(e / s), s = absmax/127."""
    absmax = jnp.max(jnp.abs(emb), axis=-1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(emb / scales[..., None]), -127, 127).astype(jnp.int8)
    return q, scales.astype(jnp.float32)


def quantize_catalog(emb: jax.Array, keep_exact: bool = True) -> QuantizedCatalog:
    q, scales = quantize_rows(emb)
    return QuantizedCatalog(q=q, scales=scales, exact=emb if keep_exact else None)


def _invalid_mask(
    item_ids: jax.Array,  # [X] catalog ids (> 0)
    invalid_ids: jax.Array,  # [B, N0] ids to exclude (0 = none)
    max_item_id: int,
) -> jax.Array:
    """[B, X] bool — True where the catalog item is in the row's invalid
    set (same scatter/gather trick as ops/topk.masked_mips_scores)."""
    b = invalid_ids.shape[0]
    space = jnp.zeros((b, max_item_id + 1), dtype=jnp.bool_)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    space = space.at[rows, jnp.clip(invalid_ids, 0, max_item_id)].set(True)
    space = space.at[:, 0].set(False)
    return jnp.take_along_axis(space, item_ids[None, :].astype(jnp.int32), axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "max_item_id", "over_fetch")
)
def mips_top_k_int8(
    query_embeddings: jax.Array,  # [B, D] f32
    catalog: QuantizedCatalog,
    item_ids: jax.Array,  # [X] int (catalog ids, all > 0)
    k: int,
    invalid_ids: Optional[jax.Array] = None,  # [B, N0]
    max_item_id: Optional[int] = None,
    over_fetch: int = 4,  # re-score k' = min(X, over_fetch * k) rows
) -> Tuple[jax.Array, jax.Array]:
    """Top-k by int8-scored MIPS with optional exact re-scoring.

    Returns (top_k_ids [B, k], top_k_scores [B, k]) sorted descending.
    With catalog.exact set, scores are the EXACT inner products of the
    re-scored candidates; otherwise the dequantized int8 approximations.
    """
    x = item_ids.shape[0]
    qq, qs = quantize_rows(query_embeddings)  # [B, D] int8, [B]
    si32 = jax.lax.dot_general(
        qq, catalog.q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, X]
    scores = si32.astype(jnp.float32) * qs[:, None] * catalog.scales[None, :]
    if invalid_ids is not None:
        if max_item_id is None:
            # item_ids is a tracer here (the fn is jitted), so computing
            # the max would raise an opaque ConcretizationTypeError
            raise ValueError(
                "mips_top_k_int8 requires max_item_id when invalid_ids "
                "is passed (it sizes the static invalid-id scatter mask)"
            )
        scores = jnp.where(
            _invalid_mask(item_ids, invalid_ids, max_item_id), NEG_INF, scores
        )

    if catalog.exact is None:
        top_scores, top_idx = jax.lax.top_k(scores, k)
        return jnp.take(item_ids, top_idx, axis=0), top_scores

    kp = min(x, max(k, over_fetch * k))
    _, cand_idx = jax.lax.top_k(scores, kp)  # [B, k']
    cand_rows = jnp.take(catalog.exact, cand_idx, axis=0)  # [B, k', D]
    exact = jnp.einsum(
        "bd,bkd->bk", query_embeddings, cand_rows,
        preferred_element_type=jnp.float32,
    )
    if invalid_ids is not None:
        # keep the pre-ranking's masking: candidates that were NEG_INF in
        # the quantized scan can only appear when k' exceeds the valid
        # count; re-mask them so they sort last
        pre = jnp.take_along_axis(scores, cand_idx, axis=1)
        exact = jnp.where(pre <= NEG_INF / 2, NEG_INF, exact)
    top_scores, within = jax.lax.top_k(exact, k)  # [B, k] into k'
    top_idx = jnp.take_along_axis(cand_idx, within, axis=1)
    return jnp.take(item_ids, top_idx, axis=0), top_scores
