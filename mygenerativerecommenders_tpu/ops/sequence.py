"""Static-shape sequence ops — the TPU-native replacement for jagged tensors.

The reference framework represents variable-length sequences as jagged
[sum(N_i), D] tensors with offset vectors, backed by fbgemm CUDA kernels
(reference: src/generative_recommenders_pl/models/utils/ops.py:18-260).
XLA wants static shapes, so this framework keeps sequences as dense
[B, N, ...] arrays plus a `lengths: [B]` vector, and reproduces every
jagged op as a masked dense op:

  asynchronous_complete_cumsum + dense_to_jagged + jagged_to_padded_dense
      -> never needed: compute stays dense; `lengths_to_mask` produces the
         validity mask that makes the dense math equal to the jagged math.
  get_current_embeddings (ops.py:171-187)  -> `get_current_embeddings`
  past_ids.scatter_(target at lengths)     -> `scatter_at_lengths`
  mask_dense_by_aux_mask (ops.py:229-260)  -> `mask_dense_by_aux_mask`

All functions are jit-safe (no data-dependent shapes) and differentiable
where it matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lengths_to_mask(lengths: jax.Array, max_len: int, dtype=jnp.bool_) -> jax.Array:
    """[B] lengths -> [B, max_len] mask with mask[b, i] = i < lengths[b]."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def get_current_embeddings(lengths: jax.Array, encoded: jax.Array) -> jax.Array:
    """Gather the last valid position per row.

    Equivalent to reference ops.get_current_embeddings (ops.py:171-187):
    out[b] = encoded[b, lengths[b] - 1].

    Args:
      lengths: [B] int, all >= 1.
      encoded: [B, N, D] float.

    Returns:
      [B, D] float.
    """
    idx = jnp.clip(lengths - 1, 0, encoded.shape[1] - 1)
    return jnp.take_along_axis(encoded, idx[:, None, None], axis=1)[:, 0, :]


def scatter_at_lengths(seq: jax.Array, lengths: jax.Array, values: jax.Array) -> jax.Array:
    """Write values[b] at position lengths[b] of each row.

    Equivalent to the reference's in-place
    `past_ids.scatter_(1, past_lengths.view(-1,1), target_ids.view(-1,1))`
    (retrieval.py:86-90) but functional.

    Args:
      seq: [B, N].
      lengths: [B] int, each in [0, N).
      values: [B] same dtype as seq.

    Returns:
      [B, N] with the update applied.
    """
    pos = jnp.arange(seq.shape[1], dtype=lengths.dtype)
    return jnp.where(pos[None, :] == lengths[:, None], values[:, None], seq)


def compact_by_mask(x: jax.Array, keep: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stable left-compaction of kept rows, zero-padding the tail.

    For each batch row, moves the positions where `keep` is True to the
    front (preserving order) and zeroes the rest — the static-shape
    equivalent of boolean indexing a jagged tensor.

    Args:
      x: [B, N, ...] values.
      keep: [B, N] bool.

    Returns:
      (compacted [B, N, ...], new_lengths [B]).
    """
    keep_i = keep.astype(jnp.int32)
    new_lengths = keep_i.sum(axis=1)
    # Destination slot for each kept element; parked at N (dropped) otherwise.
    dest = jnp.cumsum(keep_i, axis=1) - 1
    n = keep.shape[1]
    dest = jnp.where(keep, dest, n)

    def scatter_row(row_x, row_dest):
        out_shape = (n + 1,) + row_x.shape[1:]
        out = jnp.zeros(out_shape, dtype=row_x.dtype)
        out = out.at[row_dest].set(row_x, mode="drop")
        return out[:n]

    compacted = jax.vmap(scatter_row)(x, dest)
    return compacted, new_lengths


def mask_dense_by_aux_mask(
    dense: jax.Array,
    aux_mask: jax.Array,
    lengths: jax.Array,
    max_len: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop aux token positions and re-compact each sequence to the left.

    Equivalent to reference ops.mask_dense_by_aux_mask (ops.py:229-260):
    positions outside [0, lengths) or with aux_mask False are removed; the
    surviving positions are packed to the front and zero-padded.

    Args:
      dense: [B, N, D].
      aux_mask: [B, N] bool — True for positions to KEEP.
      lengths: [B] int — current valid lengths (aux positions beyond
        lengths are never kept).

    Returns:
      (compacted [B, N, D], new_lengths [B]).
    """
    del max_len  # output keeps the static N; kept for API parity.
    valid = lengths_to_mask(lengths, dense.shape[1])
    keep = jnp.logical_and(aux_mask.astype(jnp.bool_), valid)
    return compact_by_mask(dense, keep)
