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


class ShardedLocalEmbedding(EmbeddingModule):
    """Row-sharded item table over the mesh's "model" axis.

    The distributed half the reference's `LocalEmbeddingModule` lacks
    (embeddings.py:40-101 replicates the table per rank): the [V, D]
    table is annotated with nn.with_partitioning over ("model", None),
    and the lookup runs under shard_map — each shard gathers the rows it
    owns, a psum over "model" assembles full embeddings, and the psum's
    transpose keeps table gradients fully local to the owning shard
    (see parallel/embedding_sharding.py for the standalone version).

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
        mesh = jax.sharding.get_abstract_mesh()

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("model", None), P()),
            out_specs=P(),
        )
        def _lookup(local_table, flat_ids):
            shard = jax.lax.axis_index("model")
            lo = shard * rows_per_shard
            local_idx = flat_ids - lo
            in_shard = jnp.logical_and(local_idx >= 0, local_idx < rows_per_shard)
            rows = jnp.take(local_table, jnp.clip(local_idx, 0, rows_per_shard - 1), axis=0)
            rows = jnp.where(in_shard[:, None], rows, 0.0)
            return jax.lax.psum(rows, "model")

        flat = ids.reshape(-1).astype(jnp.int32)
        out = _lookup(table, flat)
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
