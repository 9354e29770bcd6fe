"""Item-embedding modules (reference: models/embeddings/embeddings.py).

`LocalEmbedding` is the plain full-dimension item table (the upstream
behavior). `ItemYearEmbedding` reproduces the fork's variant
(embeddings.py:40-101) that splits the dimension into an item half and a
year half driven by an item->year side-feature table — here the table is
passed in as data instead of being loaded from a hardcoded CSV path at
module import time (an anti-pattern flagged in SURVEY.md appendix).

`CategoricalEmbedding` maps item ids to category ids before lookup
(embeddings.py:104-139).

Row 0 is the padding row: zero-initialized, and every consumer masks
positions with id==0, matching torch's padding_idx=0 semantics closely
enough (torch pins the row to zero; here AdamW's weight decay plus masked
gradients keep it at zero).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _padded_trunc_normal(std: float):
    """truncated_normal(std) with row 0 zeroed (the padding id)."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.nn.initializers.truncated_normal(stddev=std)(key, shape, dtype)
        return w.at[0].set(0.0)

    return init


class EmbeddingModule(nn.Module):
    """Base: subclasses define __call__(ids) -> [..., D] embeddings."""

    @property
    def embedding_dim(self) -> int:
        raise NotImplementedError


class LocalEmbedding(EmbeddingModule):
    num_items: int  # max item id; table has num_items + 1 rows (id 0 = pad)
    item_embedding_dim: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param(
            "item_emb",
            _padded_trunc_normal(self.init_std),
            (self.num_items + 1, self.item_embedding_dim),
        )
        return jnp.take(table, ids, axis=0)

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim


class ItemYearEmbedding(EmbeddingModule):
    """Fork variant: half item embedding + half year embedding.

    `year_of_item` is a [num_items + 1] int array mapping item id -> year id
    (0 for unknown), the data-driven equivalent of the fork's
    `year_lookup_table` buffer (embeddings.py:66-73).
    """

    num_items: int
    item_embedding_dim: int
    year_of_item: tuple  # static: tuple of ints, len num_items + 1
    num_years: int = 2200
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        half = self.item_embedding_dim // 2
        item_table = self.param(
            "item_emb", _padded_trunc_normal(self.init_std), (self.num_items + 1, half)
        )
        year_table = self.param(
            "year_emb", _padded_trunc_normal(self.init_std), (self.num_years + 1, half)
        )
        year_map = jnp.asarray(self.year_of_item, dtype=jnp.int32)
        safe_ids = jnp.clip(ids, 0, year_map.shape[0] - 1)
        year_ids = jnp.take(year_map, safe_ids, axis=0)
        return jnp.concatenate(
            [jnp.take(item_table, ids, axis=0), jnp.take(year_table, year_ids, axis=0)],
            axis=-1,
        )

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim


def _data_spec_and_pad(flat: jax.Array, multiple: int):
    """Pad a flat id vector to `multiple` and pick the request sharding:
    requests ride the "data" axis when the ambient mesh has one (each
    data group processes only its own rows), else stay replicated."""
    from jax.sharding import PartitionSpec as P

    mesh = jax.sharding.get_abstract_mesh()
    sizes = dict(mesh.shape)
    data = int(sizes.get("data", 1))
    m = multiple * data
    n = flat.shape[0]
    n_pad = ((n + m - 1) // m) * m
    if n_pad != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((n_pad - n,), dtype=flat.dtype)]
        )
    id_spec = P("data") if "data" in sizes else P()
    out_spec = P("data", None) if "data" in sizes else P()
    return mesh, flat, n, data, id_spec, out_spec


class ShardedLocalEmbedding(EmbeddingModule):
    """Row-sharded item table over the mesh's "model" axis.

    The distributed half the reference's `LocalEmbeddingModule` lacks
    (embeddings.py:40-101 replicates the table per rank): the [V, D]
    table is partitioned P("model", None) and the lookup runs under
    shard_map — each shard gathers the rows it owns, a psum over "model"
    assembles full embeddings, and the psum's transpose keeps table
    gradients fully local to the owning shard (see
    parallel/embedding_sharding.py for the standalone version). Requests
    are sharded over the "data" axis, so each data group only gathers /
    reduces its own rows.

    Requires an active Mesh with a "model" axis (use
    parallel.mesh.make_mesh and jax.sharding.use_mesh / set_mesh, or
    pass shardings at jit boundaries). Vocab is padded to a multiple of
    the shard count.
    """

    num_items: int
    item_embedding_dim: int
    num_shards: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        vocab = ((self.num_items + 1 + self.num_shards - 1) // self.num_shards
                 ) * self.num_shards
        rows_per_shard = vocab // self.num_shards
        table = self.param(
            "item_emb",
            _padded_trunc_normal(self.init_std),
            (vocab, self.item_embedding_dim),
        )
        flat = ids.reshape(-1).astype(jnp.int32)
        mesh, flat_p, n, _, id_spec, out_spec = _data_spec_and_pad(flat, 1)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("model", None), id_spec),
            out_specs=out_spec,
            check_vma=False,
        )
        def _lookup(local_table, flat_ids):
            shard = jax.lax.axis_index("model")
            lo = shard * rows_per_shard
            local_idx = flat_ids - lo
            in_shard = jnp.logical_and(local_idx >= 0, local_idx < rows_per_shard)
            rows = jnp.take(local_table, jnp.clip(local_idx, 0, rows_per_shard - 1), axis=0)
            rows = jnp.where(in_shard[:, None], rows, 0.0)
            return jax.lax.psum(rows, "model")

        out = _lookup(table, flat_p)[:n]
        return out.reshape(ids.shape + (self.item_embedding_dim,))

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim


class ShardedA2AEmbedding(EmbeddingModule):
    """Row-sharded item table with OWNER-ROUTED all-to-all lookups.

    Same [V, D] row partition over the "model" mesh axis as
    `ShardedLocalEmbedding`, but the lookup routes requests to their
    owning shard instead of psum-broadcasting — and each model shard
    routes only ITS OWN 1/R slice of the request list (the request list
    itself rides the "data" axis):

      1. shard r takes requests [r*chunk, (r+1)*chunk) of its data
         group's id list,
      2. buckets them by owner, one `all_to_all` ships each bucket to
         its owner, owners gather their rows locally, a second
         `all_to_all` ships rows back
         (parallel/embedding_sharding.py owner_routed_lookup_sliced),
      3. one tiled all_gather over "model" reassembles the data group's
         full [n_local, D].

    Per-device exchange traffic: ~n_local*D*4*(capacity_factor/R) for
    the a2a legs + (R-1)/R*n_local*D*4 for the gather ≈ HALF the psum
    form's ring all-reduce (2*(R-1)/R*n_local*D*4), with the row-gather
    compute cut by R. This is the production mechanism the north star
    names ("all-to-all ID exchange"); the reference's
    `LocalEmbeddingModule` replicates the whole table per rank instead
    (embeddings.py:40-101). Lookups match `ShardedLocalEmbedding`
    bit-for-bit, including under bucket overflow (exact residual:
    overflowed ids broadcast, owners psum their rows); table gradients
    match up to scatter-add ordering.
    """

    num_items: int
    item_embedding_dim: int
    num_shards: int
    capacity_factor: float = 2.0
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from mygenerativerecommenders_tpu.parallel.embedding_sharding import (
            owner_routed_lookup_sliced,
        )

        vocab = ((self.num_items + 1 + self.num_shards - 1) // self.num_shards
                 ) * self.num_shards
        rows_per_shard = vocab // self.num_shards
        d = self.item_embedding_dim
        num_shards = self.num_shards
        table = self.param(
            "item_emb", _padded_trunc_normal(self.init_std), (vocab, d)
        )
        flat = ids.reshape(-1).astype(jnp.int32)
        mesh, flat_p, n, data, id_spec, out_spec = _data_spec_and_pad(
            flat, num_shards
        )
        chunk = flat_p.shape[0] // (data * num_shards)
        cap = max(
            1,
            min(int(np.ceil(chunk / num_shards * self.capacity_factor)), chunk),
        )

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("model", None), id_spec),
            out_specs=out_spec,
            # routed responses are device-varying mid-flight; the final
            # all_gather replicates over "model" but the rep-checker
            # can't see through all_to_all
            check_vma=False,
        )
        def _lookup(local_table, local_ids):
            r = jax.lax.axis_index("model")
            my_ids = jax.lax.dynamic_slice(local_ids, (r * chunk,), (chunk,))
            rows = owner_routed_lookup_sliced(
                local_table,
                my_ids,
                axis="model",
                rows_per_shard=rows_per_shard,
                num_shards=num_shards,
                cap=cap,
            )  # [chunk, D]
            return jax.lax.all_gather(rows, "model", axis=0, tiled=True)

        out = _lookup(table, flat_p)[:n]
        return out.reshape(ids.shape + (d,))

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim


class ColumnShardedLocalEmbedding(EmbeddingModule):
    """Feature-dim-sharded item table: each "model" shard owns D/R columns.

    Lookups are fully local gathers of the [V, D/R] slice; one tiled
    `all_gather` over "model" reassembles the feature dim. No id routing
    at all, at the cost of holding all V rows per device — right when the
    vocab fits per-device but the lookup fan-out is hot. The flax model
    path of parallel/embedding_sharding.py's ColumnShardedEmbedding.
    """

    num_items: int
    item_embedding_dim: int
    num_shards: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if self.item_embedding_dim % self.num_shards:
            raise ValueError(
                f"item_embedding_dim {self.item_embedding_dim} not divisible "
                f"by {self.num_shards} column shards"
            )
        table = self.param(
            "item_emb",
            _padded_trunc_normal(self.init_std),
            (self.num_items + 1, self.item_embedding_dim),
        )
        flat = ids.reshape(-1).astype(jnp.int32)
        mesh, flat_p, n, _, id_spec, out_spec = _data_spec_and_pad(flat, 1)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(None, "model"), id_spec),
            out_specs=out_spec,
            check_vma=False,  # the all_gather output IS model-replicated
        )
        def _lookup(local_table, flat_ids):
            cols = jnp.take(local_table, flat_ids, axis=0)  # [n_local, D/R]
            return jax.lax.all_gather(cols, "model", axis=1, tiled=True)

        out = _lookup(table, flat_p)[:n]
        return out.reshape(ids.shape + (self.item_embedding_dim,))

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim


class Sharded2DEmbedding(EmbeddingModule):
    """2-D (row x column) sharded item table for pod-scale vocabularies.

    The [V, D] table is partitioned P("model", "col"): `num_shards` row
    shards over the "model" axis x `col_shards` column shards over the
    "col" axis — device (r, c) holds rows r-block x cols c-block, so the
    per-device table slice is V*D/(R*C). Lookup composes the two
    mechanisms: the owner-routed all-to-all exchange over "model" moves
    [n, D/C] column slices to/from row owners, then one tiled all_gather
    over "col" reassembles the feature dim. Exact (incl. bucket overflow)
    and differentiable; grads stay sharded on both axes.

    This is BASELINE config #5's "row/column sharding and all-to-all ID
    exchange" as one table: 100M x 64 f32 = 25.6 GB splits to 400 MB per
    device on an 8x8 (row x col) layout.
    """

    num_items: int
    item_embedding_dim: int
    num_shards: int  # row shards over "model"
    col_shards: int  # column shards over "col"
    capacity_factor: float = 2.0
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from mygenerativerecommenders_tpu.parallel.embedding_sharding import (
            owner_routed_lookup_sliced,
        )

        if self.item_embedding_dim % self.col_shards:
            raise ValueError(
                f"item_embedding_dim {self.item_embedding_dim} not divisible "
                f"by {self.col_shards} column shards"
            )
        vocab = ((self.num_items + 1 + self.num_shards - 1) // self.num_shards
                 ) * self.num_shards
        rows_per_shard = vocab // self.num_shards
        num_shards = self.num_shards
        table = self.param(
            "item_emb",
            _padded_trunc_normal(self.init_std),
            (vocab, self.item_embedding_dim),
        )
        flat = ids.reshape(-1).astype(jnp.int32)
        mesh, flat_p, n, data, id_spec, out_spec = _data_spec_and_pad(
            flat, num_shards
        )
        chunk = flat_p.shape[0] // (data * num_shards)
        cap = max(
            1,
            min(int(np.ceil(chunk / num_shards * self.capacity_factor)), chunk),
        )

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("model", "col"), id_spec),
            out_specs=out_spec,
            check_vma=False,
        )
        def _lookup(local_table, local_ids):
            # local_table: [rows_per_shard, D/C]; each model shard routes
            # its own 1/R request slice, the a2a exchange over "model"
            # moves D/C column slices (each "col" member routes its own),
            # the model all_gather rebuilds the request list, and the col
            # all_gather rebuilds full D
            r = jax.lax.axis_index("model")
            my_ids = jax.lax.dynamic_slice(local_ids, (r * chunk,), (chunk,))
            routed = owner_routed_lookup_sliced(
                local_table,
                my_ids,
                axis="model",
                rows_per_shard=rows_per_shard,
                num_shards=num_shards,
                cap=cap,
            )  # [chunk, D/C]
            rows = jax.lax.all_gather(
                routed, "model", axis=0, tiled=True
            )  # [n_local, D/C]
            return jax.lax.all_gather(rows, "col", axis=1, tiled=True)

        out = _lookup(table, flat_p)[:n]
        return out.reshape(ids.shape + (self.item_embedding_dim,))

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim


class CategoricalEmbedding(EmbeddingModule):
    """Item -> category -> embedding (embeddings.py:104-139)."""

    num_items: int
    item_embedding_dim: int
    item_id_to_category_id: tuple  # static tuple, len num_items
    init_std: float = 0.02

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cat_map = jnp.asarray(self.item_id_to_category_id, dtype=jnp.int32)
        cat_ids = jnp.take(cat_map, jnp.clip(ids - 1, 0, None), axis=0) + 1
        table = self.param(
            "item_emb",
            _padded_trunc_normal(self.init_std),
            (self.num_items + 1, self.item_embedding_dim),
        )
        return jnp.take(table, cat_ids, axis=0)

    @property
    def embedding_dim(self) -> int:
        return self.item_embedding_dim
