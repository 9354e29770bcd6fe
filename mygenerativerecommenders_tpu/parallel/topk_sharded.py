"""Sharded brute-force MIPS top-k: local top-k per table shard + merge.

Completes the row-sharded embedding story for serving: with the candidate
matrix sharded over the "model" axis, each shard computes scores against
its rows and its local top-k, then an all_gather + second top-k merges
the per-shard winners — comm volume is O(shards * k) instead of O(X).

(The reference's MIPSBruteForceTopK is single-device, top_k.py:43-70.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_mips_top_k(
    mesh: Mesh,
    query_embeddings: jax.Array,  # [B, D] (replicated over "model")
    item_embeddings: jax.Array,  # [X, D], sharded over "model" rows
    item_ids: jax.Array,  # [X], sharded like the embeddings
    k: int,
    axis: str = "model",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (top_k_ids [B, k], top_k_scores [B, k]) sorted descending.

    Padded shard rows must carry id 0 and will never win (their
    embeddings should be zero; scores tie at 0 and are pushed down by
    the -inf id-0 penalty below).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _local_topk(q, items, ids):
        scores = jnp.einsum(
            "bd,xd->bx", q, items, preferred_element_type=jnp.float32
        )
        # demote padding rows (id 0) so they never enter the merge
        scores = jnp.where(ids[None, :] == 0, -jnp.inf, scores)
        local_k = min(k, items.shape[0])
        s, idx = jax.lax.top_k(scores, local_k)  # [B, k']
        top_ids = jnp.take(ids, idx, axis=0)
        # gather the per-shard winners everywhere, then merge
        all_s = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [B, m*k']
        all_ids = jax.lax.all_gather(top_ids, axis, axis=1, tiled=True)
        merged_s, merged_idx = jax.lax.top_k(all_s, k)
        merged_ids = jnp.take_along_axis(all_ids, merged_idx, axis=1)
        return merged_ids, merged_s

    # scope the ambient mesh so a different globally-set mesh (e.g. a
    # Trainer's) can't conflict with the one passed here
    with jax.sharding.set_mesh(mesh):
        return _local_topk(query_embeddings, item_embeddings, item_ids)
