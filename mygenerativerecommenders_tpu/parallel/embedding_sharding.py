"""Row-sharded embedding tables over the "model" mesh axis.

The capability the reference explicitly lacks: its `LocalEmbeddingModule`
replicates the full item table per rank (embeddings.py:40-101 — the
"Local" in the name marks the missing distributed half). Here the
[V, D] table is sharded by rows (vocab) across the "model" axis:

  lookup:  every device holds ids (replicated across "model"; they may be
           sharded across "data"), gathers the rows it owns — others
           contribute zeros — and a single psum over "model" assembles
           the full embeddings. One reduce over ICI, no host round-trips.
  grads:   the psum's transpose is identity on each shard, so each
           device's table gradient is exactly the scatter-add of the
           output cotangents for the rows it owns — fully local. This is
           the TPU analog of the fbgemm table-sharded
           embedding-bag exchange.

Two lookup strategies (both exact, both differentiable w.r.t. the table):

  * `lookup` — psum assembly: every device gathers the rows it owns
    (zeros elsewhere) and one psum over "model" adds the shards. Simple,
    one collective; traffic O(n*D) per device regardless of shard count.
  * `lookup_all_to_all` — owner-routed exchange: ids are bucketed by
    owner shard, `all_to_all` ships each bucket to its owner, owners
    gather their rows locally, a second `all_to_all` ships rows back.
    Traffic per device is O(n*D / num_shards) when ids are balanced —
    the fbgemm-style exchange that scales to pod-slice vocabularies.
    Buckets are static-capacity (`capacity_factor`); overflow falls back
    to exactness-preserving handling (see docstring).

`ColumnShardedEmbedding` shards the EMBEDDING DIM instead (table
[V, D/R] per device): lookups are fully local, one all-gather on the
feature axis reassembles [n, D]. Right when the vocab fits per-device
but the lookup fan-out is hot, or composed with row sharding for 2-D
(row, col) sharded tables.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def owner_routed_lookup_body(
    local_table: jax.Array,
    flat_ids: jax.Array,
    *,
    axis: str,
    rows_per_shard: int,
    num_shards: int,
    cap: int,
) -> jax.Array:
    """The owner-routed all-to-all exchange, to be called INSIDE a
    shard_map whose `axis` carries the row shards.

    `local_table` is this shard's [rows_per_shard, d_local] slice;
    `flat_ids` [n] is replicated across `axis`. Returns the full [n,
    d_local] embeddings (replicated across `axis`): ids are bucketed by
    owner shard ([num_shards, cap]), one `all_to_all` ships each bucket
    to its owner, owners gather their rows locally, a second
    `all_to_all` ships rows back. Ids that overflow a bucket (heavy
    skew) are handled EXACTLY by a residual psum pass, so results match
    the psum-broadcast lookup bit-for-bit. Differentiable w.r.t.
    `local_table` (gathers transpose to local scatter-adds; all_to_all
    transposes to the inverse exchange).

    Shared by the standalone `ShardedEmbedding.lookup_all_to_all` and
    the model-path flax modules (models/embeddings.py ShardedA2AEmbedding
    / Sharded2DEmbedding).
    """
    n = flat_ids.shape[0]
    d = local_table.shape[1]
    shard = jax.lax.axis_index(axis)
    owner = jnp.clip(flat_ids // rows_per_shard, 0, num_shards - 1)
    # rank of each id within its owner group (stable grouping)
    order = jnp.argsort(owner)  # positions grouped by owner
    sorted_owner = jnp.take(owner, order)
    pos_in_sorted = jnp.arange(n, dtype=jnp.int32)
    group_start = jnp.searchsorted(
        sorted_owner, jnp.arange(num_shards, dtype=sorted_owner.dtype),
        side="left",
    )  # [R]
    rank_sorted = pos_in_sorted - jnp.take(group_start, sorted_owner)
    rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
    fits = rank < cap

    # build [R, C] send buckets of (id, original position)
    slot = jnp.where(fits, owner * cap + rank, num_shards * cap)
    send_ids = (
        jnp.full((num_shards * cap + 1,), -1, dtype=jnp.int32)
        .at[slot].set(flat_ids)[:-1]
        .reshape(num_shards, cap)
    )
    # ship buckets to their owners: recv[(src s), c] = bucket this
    # shard owns, contributed by source shard s
    recv_ids = jax.lax.all_to_all(
        send_ids, axis, split_axis=0, concat_axis=0, tiled=False
    ).reshape(num_shards, cap)
    local_idx = recv_ids - shard * rows_per_shard
    ok = jnp.logical_and(local_idx >= 0, local_idx < rows_per_shard)
    safe = jnp.clip(local_idx, 0, rows_per_shard - 1)
    rows = jnp.take(local_table, safe.reshape(-1), axis=0)
    rows = jnp.where(ok.reshape(-1, 1), rows, 0.0).reshape(
        num_shards, cap, d
    )
    # ship rows back to the requesting shards
    back = jax.lax.all_to_all(
        rows, axis, split_axis=0, concat_axis=0, tiled=False
    ).reshape(num_shards * cap, d)
    # un-bucket: result[i] = back[slot[i]] for ids that fit
    safe_slot = jnp.where(fits, slot, 0)
    routed = jnp.take(back, safe_slot, axis=0)
    routed = jnp.where(fits[:, None], routed, 0.0)

    # exact overflow residual: rare ids beyond capacity use the
    # psum path (all-zero when nothing overflows)
    any_overflow = jnp.any(~fits)

    def residual(_):
        lo = shard * rows_per_shard
        li = flat_ids - lo
        in_shard = jnp.logical_and(li >= 0, li < rows_per_shard)
        pick = jnp.logical_and(in_shard, ~fits)
        srows = jnp.take(
            local_table, jnp.clip(li, 0, rows_per_shard - 1), axis=0
        )
        return jnp.where(pick[:, None], srows, 0.0)

    def no_overflow(_):
        zeros = jnp.zeros((n, d), dtype=local_table.dtype)
        # mark device-varying so both cond branches agree (the
        # residual branch derives from the sharded table)
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(zeros, axis, to="varying")
        return jax.lax.pvary(zeros, (axis,))

    res = jax.lax.cond(any_overflow, residual, no_overflow, operand=None)
    return routed + jax.lax.psum(res, axis)


def a2a_capacity(n: int, num_shards: int, capacity_factor: float) -> int:
    """Static per-owner bucket capacity for `owner_routed_lookup_body`."""
    cap = int(np.ceil(n / num_shards * capacity_factor))
    return max(1, min(cap, n))


def owner_routed_lookup_sliced(
    local_table: jax.Array,
    my_ids: jax.Array,
    *,
    axis: str,
    rows_per_shard: int,
    num_shards: int,
    cap: int,
) -> jax.Array:
    """Owner-routed exchange where each shard routes only ITS OWN slice
    of the request list — the production traffic shape.

    Unlike `owner_routed_lookup_body` (whose `flat_ids` are replicated
    across `axis`, so every device sends and receives the FULL request
    list — more bytes than the psum broadcast it is meant to beat),
    `my_ids` [chunk] here is device-varying over `axis`: shard r holds
    requests [r*chunk, (r+1)*chunk). Per-device all_to_all traffic is
    then O(chunk * capacity_factor * d) ≈ O(n_local * d / num_shards) —
    1/num_shards of the full list — and the caller reassembles the full
    [num_shards*chunk, d] with one tiled all_gather (or leaves the
    result request-sharded).

    Returns [chunk, d] rows for `my_ids`. Exact under bucket overflow:
    overflowed ids are all_gathered to every shard, owners contribute
    their rows via one psum, and each shard slices back its chunk — a
    rare-path cost gated by a replicated lax.cond.
    """
    chunk = my_ids.shape[0]
    d = local_table.shape[1]
    shard = jax.lax.axis_index(axis)
    owner = jnp.clip(my_ids // rows_per_shard, 0, num_shards - 1)
    order = jnp.argsort(owner)
    sorted_owner = jnp.take(owner, order)
    pos_in_sorted = jnp.arange(chunk, dtype=jnp.int32)
    group_start = jnp.searchsorted(
        sorted_owner, jnp.arange(num_shards, dtype=sorted_owner.dtype),
        side="left",
    )
    rank_sorted = pos_in_sorted - jnp.take(group_start, sorted_owner)
    rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
    fits = rank < cap

    slot = jnp.where(fits, owner * cap + rank, num_shards * cap)
    send_ids = (
        jnp.full((num_shards * cap + 1,), -1, dtype=jnp.int32)
        .at[slot].set(my_ids)[:-1]
        .reshape(num_shards, cap)
    )
    recv_ids = jax.lax.all_to_all(
        send_ids, axis, split_axis=0, concat_axis=0, tiled=False
    ).reshape(num_shards, cap)
    local_idx = recv_ids - shard * rows_per_shard
    ok = jnp.logical_and(local_idx >= 0, local_idx < rows_per_shard)
    safe = jnp.clip(local_idx, 0, rows_per_shard - 1)
    rows = jnp.take(local_table, safe.reshape(-1), axis=0)
    rows = jnp.where(ok.reshape(-1, 1), rows, 0.0).reshape(num_shards, cap, d)
    back = jax.lax.all_to_all(
        rows, axis, split_axis=0, concat_axis=0, tiled=False
    ).reshape(num_shards * cap, d)
    safe_slot = jnp.where(fits, slot, 0)
    routed = jnp.take(back, safe_slot, axis=0)
    routed = jnp.where(fits[:, None], routed, 0.0)

    # exact overflow residual (rare path; predicate replicated via psum)
    n_overflow = jax.lax.psum((~fits).sum(), axis)

    def residual(_):
        over_ids = jnp.where(fits, -1, my_ids)  # [chunk]
        all_over = jax.lax.all_gather(
            over_ids, axis, axis=0, tiled=True
        )  # [num_shards*chunk], slice r*chunk.. from shard r
        li = all_over - shard * rows_per_shard
        in_shard = (
            (li >= 0) & (li < rows_per_shard) & (all_over >= 0)
        )
        srows = jnp.take(
            local_table, jnp.clip(li, 0, rows_per_shard - 1), axis=0
        )
        srows = jnp.where(in_shard[:, None], srows, 0.0)
        allrows = jax.lax.psum(srows, axis)  # [num_shards*chunk, d]
        return jax.lax.dynamic_slice(
            allrows, (shard * chunk, 0), (chunk, d)
        )

    def no_overflow(_):
        zeros = jnp.zeros((chunk, d), dtype=local_table.dtype)
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(zeros, axis, to="varying")
        return jax.lax.pvary(zeros, (axis,))

    res = jax.lax.cond(n_overflow > 0, residual, no_overflow, operand=None)
    return routed + res


class ShardedEmbedding:
    """Row-sharded [V, D] embedding table on `mesh` axis "model"."""

    def __init__(
        self,
        mesh: Mesh,
        num_items: int,  # max item id; table rows = padded(num_items + 1)
        embedding_dim: int,
        init_std: float = 0.02,
        axis: str = "model",
    ):
        self.mesh = mesh
        self.axis = axis
        self.num_shards = mesh.shape[axis]
        self.vocab = _round_up(num_items + 1, self.num_shards)
        self.rows_per_shard = self.vocab // self.num_shards
        self.embedding_dim = embedding_dim
        self.init_std = init_std
        self.table_sharding = NamedSharding(mesh, P(axis, None))

    def init(self, rng: jax.Array) -> jax.Array:
        init = jax.jit(
            lambda key: jax.nn.initializers.truncated_normal(stddev=self.init_std)(
                key, (self.vocab, self.embedding_dim)
            ).at[0].set(0.0),
            out_shardings=self.table_sharding,
        )
        return init(rng)

    def lookup(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        """ids [...] -> embeddings [..., D]; differentiable w.r.t. table."""
        rows_per_shard = self.rows_per_shard
        axis = self.axis

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(axis, None), P()),
            out_specs=P(),
        )
        def _lookup(local_table: jax.Array, flat_ids: jax.Array) -> jax.Array:
            shard = jax.lax.axis_index(axis)
            lo = shard * rows_per_shard
            local_idx = flat_ids - lo
            in_shard = jnp.logical_and(local_idx >= 0, local_idx < rows_per_shard)
            safe_idx = jnp.clip(local_idx, 0, rows_per_shard - 1)
            rows = jnp.take(local_table, safe_idx, axis=0)
            rows = jnp.where(in_shard[:, None], rows, 0.0)
            return jax.lax.psum(rows, axis)

        flat = ids.reshape(-1).astype(jnp.int32)
        out = _lookup(table, flat)
        return out.reshape(ids.shape + (self.embedding_dim,))

    def lookup_all_to_all(
        self, table: jax.Array, ids: jax.Array, capacity_factor: float = 2.0
    ) -> jax.Array:
        """Owner-routed lookup: ids travel to their owner shard, rows
        travel back — two `all_to_all` collectives instead of a psum over
        full [n, D] buffers, cutting per-device traffic by ~num_shards
        when ids are balanced.

        Mechanics (all static shapes): ids are bucketed by owner shard
        into [R, C] with C = ceil(n/R * capacity_factor); a bucket slot
        holds the id and its position. Ids that overflow a bucket (heavy
        skew) are handled EXACTLY by a residual pass: the overflowed ids
        take the psum path, so results match `lookup` bit-for-bit.
        Differentiable w.r.t. `table` (gathers transpose to local
        scatter-adds; all_to_all transposes to the inverse exchange).
        """
        rows_per_shard = self.rows_per_shard
        axis = self.axis
        num_shards = self.num_shards
        d = self.embedding_dim
        flat = ids.reshape(-1).astype(jnp.int32)
        n = flat.shape[0]
        cap = a2a_capacity(n, num_shards, capacity_factor)

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(axis, None), P()),
            out_specs=P(),
            # `routed` is value-replicated (identical requests -> identical
            # responses on every device) but the rep-checker can't infer
            # that through all_to_all
            check_vma=False,
        )
        def _lookup(local_table: jax.Array, flat_ids: jax.Array) -> jax.Array:
            return owner_routed_lookup_body(
                local_table,
                flat_ids,
                axis=axis,
                rows_per_shard=rows_per_shard,
                num_shards=num_shards,
                cap=cap,
            )

        out = _lookup(table, flat)
        return out.reshape(ids.shape + (d,))

    def full_table(self, table: jax.Array) -> jax.Array:
        """All-gather the table (e.g. for the MIPS candidate matrix)."""
        return jax.device_put(table, NamedSharding(self.mesh, P()))


class ColumnShardedEmbedding:
    """Feature-dim-sharded [V, D] table: each device owns D/R columns.

    Lookups are fully local gathers; one `all_gather` over the model axis
    reassembles the feature dim. The complement of row sharding: no id
    routing at all, at the cost of replicating the id->row gather R times
    and holding V rows per device. Compose with ShardedEmbedding for 2-D
    (row, col) sharding of pod-scale tables.
    """

    def __init__(
        self,
        mesh: Mesh,
        num_items: int,
        embedding_dim: int,
        init_std: float = 0.02,
        axis: str = "model",
    ):
        self.mesh = mesh
        self.axis = axis
        self.num_shards = mesh.shape[axis]
        if embedding_dim % self.num_shards:
            raise ValueError(
                f"embedding_dim {embedding_dim} not divisible by "
                f"{self.num_shards} column shards"
            )
        self.vocab = num_items + 1
        self.embedding_dim = embedding_dim
        self.init_std = init_std
        self.table_sharding = NamedSharding(mesh, P(None, axis))

    def init(self, rng: jax.Array) -> jax.Array:
        init = jax.jit(
            lambda key: jax.nn.initializers.truncated_normal(
                stddev=self.init_std
            )(key, (self.vocab, self.embedding_dim)).at[0].set(0.0),
            out_shardings=self.table_sharding,
        )
        return init(rng)

    def lookup(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        axis = self.axis
        d_local = self.embedding_dim // self.num_shards

        @functools.partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(P(None, axis), P()),
            out_specs=P(),
            check_vma=False,  # full all_gather output IS replicated
        )
        def _lookup(local_table: jax.Array, flat_ids: jax.Array) -> jax.Array:
            cols = jnp.take(local_table, flat_ids, axis=0)  # [n, D/R]
            return jax.lax.all_gather(cols, axis, axis=1, tiled=True)

        flat = ids.reshape(-1).astype(jnp.int32)
        out = _lookup(table, flat)
        return out.reshape(ids.shape + (self.embedding_dim,))

    def full_table(self, table: jax.Array) -> jax.Array:
        return jax.device_put(table, NamedSharding(self.mesh, P()))
