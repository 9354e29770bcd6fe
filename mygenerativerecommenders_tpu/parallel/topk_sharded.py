"""Sharded brute-force MIPS top-k: local top-k per table shard + merge.

Completes the row-sharded embedding story for serving: with the candidate
matrix sharded over the "model" axis, each shard computes scores against
its rows and its local top-k, then an all_gather + second top-k merges
the per-shard winners — comm volume is O(shards * k') instead of O(X),
and no device ever holds the full [X, D] candidate matrix.

Per-row invalid-id filtering (the reference's past-id exclusion,
candidate_index.py:107-164) uses the reference's own over-fetch
strategy: each shard fetches k' = k + max_invalid local winners, the
merge keeps the global k', and the merged [B, k'] id list — small —
is masked against each row's invalid ids before a final top-k. Exact
whenever k valid candidates exist, like the reference's over-fetch.

(The reference's MIPSBruteForceTopK is single-device, top_k.py:43-70.)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def sharded_mips_top_k(
    mesh: Mesh,
    query_embeddings: jax.Array,  # [B, D]
    item_embeddings: jax.Array,  # [X, D], sharded over "model" rows
    item_ids: jax.Array,  # [X], sharded like the embeddings
    k: int,
    invalid_ids: Optional[jax.Array] = None,  # [B, N0] ids to exclude (0=none)
    axis: str = "model",
    approx_recall: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (top_k_ids [B, k], top_k_scores [B, k]) sorted descending.

    Padded shard rows must carry id 0 and will never win (their scores
    are forced to -inf below). Queries/outputs shard over the mesh's
    "data" axis when present (each data group handles its own rows);
    the exchange rides the model axis only.

    approx_recall > 0 routes each shard's LOCAL pre-rank through the
    TPU's partial-reduce top-k (jax.lax.approx_max_k) — the per-shard
    full sort dominates at production row counts (12.5M rows/shard at
    100M items over 8 shards); the cross-shard merge and the final
    filtered selection stay exact over the fetched candidates.
    """
    k_fetch = k + (int(invalid_ids.shape[1]) if invalid_ids is not None else 0)
    has_data = "data" in mesh.axis_names
    q_spec = P("data", None) if has_data else P()
    out_spec = P("data", None) if has_data else P()
    inv_spec = P("data", None) if has_data else P()

    if invalid_ids is None:
        # shard_map needs a concrete operand; a [B, 1] zero column filters
        # nothing (id 0 never occurs in catalogs)
        invalid_ids = jnp.zeros((query_embeddings.shape[0], 1), dtype=jnp.int32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(q_spec, P(axis, None), P(axis), inv_spec),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )
    def _local_topk(q, items, ids, invalid):
        scores = jnp.einsum(
            "bd,xd->bx", q, items, preferred_element_type=jnp.float32
        )
        # demote padding rows (id 0) so they never enter the merge
        scores = jnp.where(ids[None, :] == 0, NEG_INF, scores)
        local_k = min(k_fetch, items.shape[0])
        if approx_recall > 0.0:
            s, idx = jax.lax.approx_max_k(
                scores, local_k, recall_target=float(approx_recall)
            )  # [B, k']
        else:
            s, idx = jax.lax.top_k(scores, local_k)  # [B, k']
        top_ids = jnp.take(ids, idx, axis=0)
        # gather the per-shard winners everywhere, then merge
        all_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [B, m*k']
        all_ids = jax.lax.all_gather(top_ids, axis, axis=1, tiled=True)
        merged_s, merged_idx = jax.lax.top_k(all_s, min(k_fetch, all_s.shape[1]))
        merged_ids = jnp.take_along_axis(all_ids, merged_idx, axis=1)
        # reference-style post-filter on the SMALL merged list: mask each
        # row's invalid ids, then keep the k best survivors
        is_invalid = jnp.any(
            merged_ids[:, :, None] == invalid[:, None, :], axis=-1
        )
        merged_s = jnp.where(is_invalid, NEG_INF, merged_s)
        final_s, final_idx = jax.lax.top_k(merged_s, k)
        final_ids = jnp.take_along_axis(merged_ids, final_idx, axis=1)
        return final_ids, final_s

    # scope the ambient mesh so a different globally-set mesh (e.g. a
    # Trainer's) can't conflict with the one passed here; under a jit
    # trace (the trainer's eval step) set_mesh is forbidden and
    # unnecessary — shard_map already received the mesh explicitly
    if isinstance(query_embeddings, jax.core.Tracer):
        return _local_topk(
            query_embeddings, item_embeddings, item_ids,
            invalid_ids.astype(jnp.int32),
        )
    with jax.sharding.set_mesh(mesh):
        return _local_topk(
            query_embeddings, item_embeddings, item_ids,
            invalid_ids.astype(jnp.int32),
        )


def sharded_mips_top_k_int8(
    mesh: Mesh,
    query_embeddings: jax.Array,  # [B, D] f32
    catalog_q: jax.Array,  # [X, D] int8, sharded over "model" rows
    catalog_scales: jax.Array,  # [X] f32 per-row scales, sharded alike
    catalog_exact: jax.Array,  # [X, D] f32 exact rows, sharded alike
    item_ids: jax.Array,  # [X], sharded alike
    k: int,
    invalid_ids: Optional[jax.Array] = None,
    over_fetch: int = 4,
    axis: str = "model",
) -> Tuple[jax.Array, jax.Array]:
    """int8 pre-ranked sharded top-k (index.quantize=int8 x index.sharded).

    Each shard pre-ranks ITS OWN int8 slice, re-scores its local winners
    against its own exact f32 rows (no cross-shard row gathers), then
    the exact per-shard winners merge like `sharded_mips_top_k`.
    Pre-rank recall matches or beats the replicated int8 path: every
    shard over-fetches over_fetch*k locally, so the true top-k survives
    whenever it would have globally."""
    from mygenerativerecommenders_tpu.ops.quantized_topk import quantize_rows

    n_inv = int(invalid_ids.shape[1]) if invalid_ids is not None else 0
    k_fetch = k + n_inv
    kp = max(k_fetch, over_fetch * k)
    has_data = "data" in mesh.axis_names
    q_spec = P("data", None) if has_data else P()
    out_spec = P("data", None) if has_data else P()
    if invalid_ids is None:
        invalid_ids = jnp.zeros((query_embeddings.shape[0], 1), dtype=jnp.int32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            q_spec, P(axis, None), P(axis), P(axis, None), P(axis),
            q_spec if has_data else P(),
        ),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )
    def _local(q, cq, cs, cx, ids, invalid):
        qq, qs = quantize_rows(q)
        si32 = jax.lax.dot_general(
            qq, cq,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, X/R]
        approx = si32.astype(jnp.float32) * qs[:, None] * cs[None, :]
        approx = jnp.where(ids[None, :] == 0, NEG_INF, approx)
        local_kp = min(kp, cq.shape[0])
        _, idx = jax.lax.top_k(approx, local_kp)  # [B, kp]
        cand_ids = jnp.take(ids, idx, axis=0)
        cand_rows = jnp.take(cx, idx, axis=0)  # [B, kp, D]
        exact = jnp.einsum(
            "bd,bkd->bk", q, cand_rows, preferred_element_type=jnp.float32
        )
        exact = jnp.where(cand_ids == 0, NEG_INF, exact)
        all_s = jax.lax.all_gather(exact, axis, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(cand_ids, axis, axis=1, tiled=True)
        merged_s, merged_idx = jax.lax.top_k(
            all_s, min(k_fetch, all_s.shape[1])
        )
        merged_ids = jnp.take_along_axis(all_ids, merged_idx, axis=1)
        is_invalid = jnp.any(
            merged_ids[:, :, None] == invalid[:, None, :], axis=-1
        )
        merged_s = jnp.where(is_invalid, NEG_INF, merged_s)
        final_s, final_idx = jax.lax.top_k(merged_s, k)
        return jnp.take_along_axis(merged_ids, final_idx, axis=1), final_s

    args = (
        query_embeddings, catalog_q, catalog_scales, catalog_exact,
        item_ids, invalid_ids.astype(jnp.int32),
    )
    if isinstance(query_embeddings, jax.core.Tracer):
        return _local(*args)
    with jax.sharding.set_mesh(mesh):
        return _local(*args)
