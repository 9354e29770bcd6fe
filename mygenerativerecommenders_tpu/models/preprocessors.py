"""Input-feature preprocessors (reference: models/preprocessors/, 4 variants).

Each preprocessor consumes raw sequence features and produces
  (past_lengths [B], user_embeddings [B, N', D'], valid_mask [B, N', 1],
   aux_mask [B, N'] | None, past_payloads)
matching `InputFeaturesPreprocessorModule` (preprocessors/base.py:7-20),
plus the (possibly shifted/expanded) payloads — the reference mutates the
payload dict in place (learnable_positional_embedding_aux.py:156-176,
combined_item_and_rating.py:108-111); here the new dict is returned.

Variants:
- `LearnablePositionalEmbeddingPreprocessor`
  (learnable_positional_embedding.py:42-58): emb*sqrt(D) + pos_emb,
  dropout, zero-out invalid.
- `LearnablePositionalEmbeddingRatedPreprocessor`
  (learnable_positional_embedding_rated.py:53-72): concat(item_emb,
  rating_emb) * sqrt(D_total) + pos_emb; output dim grows by
  rating_embedding_dim (the postprocessor truncates back).
- `LearnablePositionalEmbeddingAuxPreprocessor`
  (learnable_positional_embedding_aux.py:121-196): prepends one projected
  L2-normalized user-feature token, shifting the sequence right by one
  (lengths+1); emits aux_mask excluding position 0 so the token is
  compacted away after the encoder; shifts ratings/timestamps payloads.
- `CombinedItemAndRatingPreprocessor` (combined_item_and_rating.py:86-131):
  interleaves item and rating tokens (doubling N), duplicates timestamps,
  returns lengths*2 and an aux_mask keeping only item-token positions.
  NOTE deviation: the reference compares positions against the UNdoubled
  lengths (combined_item_and_rating.py:126-128), silently halving the
  supervised region; here the doubled length is used.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize


def _trunc_normal_inv_sqrt_dim(dim: int):
    return jax.nn.initializers.truncated_normal(stddev=math.sqrt(1.0 / dim))


PreprocessorOutput = Tuple[
    jax.Array, jax.Array, jax.Array, Optional[jax.Array], Dict[str, jax.Array]
]


class InputPreprocessor(nn.Module):
    """Base class; subclasses implement __call__ -> PreprocessorOutput."""

    @property
    def output_seq_multiplier(self) -> int:
        """How many output positions per input position (combined: 2)."""
        return 1


class LearnablePositionalEmbeddingPreprocessor(InputPreprocessor):
    max_sequence_len: int
    embedding_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        *,
        deterministic: bool = True,
    ) -> PreprocessorOutput:
        b, n = past_ids.shape
        pos_emb = self.param(
            "pos_emb",
            _trunc_normal_inv_sqrt_dim(self.embedding_dim),
            (self.max_sequence_len, self.embedding_dim),
        )
        positions = past_payloads.get("positions")
        if positions is not None:
            # PACKED rows: per-token within-segment positions ride as a
            # payload (each segment's positions restart at 0); same
            # pos_emb table, gathered instead of sliced
            pos = jnp.take(
                pos_emb,
                jnp.clip(positions.astype(jnp.int32), 0, self.max_sequence_len - 1),
                axis=0,
            )
        else:
            pos = pos_emb[None, :n, :]
        user_embeddings = past_embeddings * (self.embedding_dim**0.5) + pos
        user_embeddings = nn.Dropout(rate=self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )
        valid_mask = (past_ids != 0)[:, :, None].astype(user_embeddings.dtype)
        user_embeddings = user_embeddings * valid_mask
        return past_lengths, user_embeddings, valid_mask, None, past_payloads


class LearnablePositionalEmbeddingRatedPreprocessor(InputPreprocessor):
    max_sequence_len: int
    item_embedding_dim: int
    rating_embedding_dim: int
    num_ratings: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        *,
        deterministic: bool = True,
    ) -> PreprocessorOutput:
        b, n = past_ids.shape
        d_total = self.item_embedding_dim + self.rating_embedding_dim
        rating_table = self.param(
            "rating_emb",
            _trunc_normal_inv_sqrt_dim(d_total),
            (self.num_ratings, self.rating_embedding_dim),
        )
        pos_emb = self.param(
            "pos_emb", _trunc_normal_inv_sqrt_dim(d_total), (self.max_sequence_len, d_total)
        )
        ratings = jnp.clip(
            past_payloads["ratings"].astype(jnp.int32), 0, self.num_ratings - 1
        )
        combined = jnp.concatenate(
            [past_embeddings, jnp.take(rating_table, ratings, axis=0)], axis=-1
        )
        positions = past_payloads.get("positions")
        if positions is not None:
            # PACKED rows: within-segment positions ride as a payload
            # (see LearnablePositionalEmbeddingPreprocessor)
            pos = jnp.take(
                pos_emb,
                jnp.clip(positions.astype(jnp.int32), 0, self.max_sequence_len - 1),
                axis=0,
            )
        else:
            pos = pos_emb[None, :n, :]
        user_embeddings = combined * (d_total**0.5) + pos
        user_embeddings = nn.Dropout(rate=self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )
        valid_mask = (past_ids != 0)[:, :, None].astype(user_embeddings.dtype)
        user_embeddings = user_embeddings * valid_mask
        return past_lengths, user_embeddings, valid_mask, None, past_payloads


class LearnablePositionalEmbeddingAuxPreprocessor(InputPreprocessor):
    """Prepend a projected user-feature token (aux variant)."""

    max_sequence_len: int
    embedding_dim: int
    dropout_rate: float
    auxiliary_columns: Tuple[str, ...]
    encoding_types: Tuple[str, ...]  # onehot | embed | numeric
    categorical_dims: Tuple[int, ...]
    categorical_embedding_dims: Tuple[int, ...]

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        *,
        deterministic: bool = True,
    ) -> PreprocessorOutput:
        b, n = past_ids.shape
        valid_mask = (past_ids != 0)[:, :, None].astype(past_embeddings.dtype)

        # encode + concat aux features, project to D, L2-normalize
        encoded: List[jax.Array] = []
        for col, enc, cat_dim, cat_emb_dim in zip(
            self.auxiliary_columns,
            self.encoding_types,
            self.categorical_dims,
            self.categorical_embedding_dims,
        ):
            feat = past_payloads[col]
            if enc == "onehot":
                encoded.append(jax.nn.one_hot(feat.astype(jnp.int32), cat_dim))
            elif enc == "embed":
                table = self.param(
                    f"aux_emb_{col}",
                    _trunc_normal_inv_sqrt_dim(cat_emb_dim),
                    (cat_dim, cat_emb_dim),
                )
                encoded.append(jnp.take(table, feat.astype(jnp.int32), axis=0))
            elif enc == "numeric":
                encoded.append(feat[..., None].astype(past_embeddings.dtype))
            else:
                raise ValueError(f"Invalid encoding type {enc}")
        aux_vec = jnp.concatenate(encoded, axis=-1)  # [B, F]
        aux_embeddings = nn.Dense(
            self.embedding_dim,
            kernel_init=jax.nn.initializers.xavier_uniform(),
            bias_init=jax.nn.initializers.zeros,
            name="aux_projection",
        )(aux_vec)
        aux_embeddings = l2_normalize(aux_embeddings)  # [B, D]

        # shift sequence right by one; aux token at position 0; drop last
        new_lengths = past_lengths + 1
        shifted = jnp.concatenate(
            [
                aux_embeddings[:, None, :],
                past_embeddings[:, : n - 1, :] * (self.embedding_dim**0.5),
            ],
            axis=1,
        )
        valid_mask = jnp.concatenate(
            [jnp.ones_like(valid_mask[:, :1]), valid_mask[:, : n - 1]], axis=1
        )
        payloads = dict(past_payloads)
        payloads["ratings"] = jnp.concatenate(
            [-jnp.ones_like(payloads["ratings"][:, :1]), payloads["ratings"][:, : n - 1]],
            axis=1,
        )
        payloads["timestamps"] = jnp.concatenate(
            [
                jnp.zeros_like(payloads["timestamps"][:, :1]),
                payloads["timestamps"][:, : n - 1],
            ],
            axis=1,
        )

        pos_emb = self.param(
            "pos_emb",
            _trunc_normal_inv_sqrt_dim(self.embedding_dim),
            (self.max_sequence_len, self.embedding_dim),
        )
        user_embeddings = shifted + pos_emb[None, :n, :]
        user_embeddings = nn.Dropout(rate=self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )
        user_embeddings = user_embeddings * valid_mask

        pos = jnp.arange(n, dtype=new_lengths.dtype)[None, :]
        aux_mask = pos < new_lengths[:, None]
        aux_mask = aux_mask.at[:, 0].set(False)
        return new_lengths, user_embeddings, valid_mask, aux_mask, payloads


class CombinedItemAndRatingPreprocessor(InputPreprocessor):
    """Interleave item and rating tokens: [i0, r0, i1, r1, ...]."""

    max_sequence_len: int  # in INPUT positions; output is 2x
    embedding_dim: int
    num_ratings: int
    dropout_rate: float = 0.0

    @property
    def output_seq_multiplier(self) -> int:
        return 2

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,
        past_ids: jax.Array,
        past_embeddings: jax.Array,
        past_payloads: Dict[str, jax.Array],
        *,
        deterministic: bool = True,
    ) -> PreprocessorOutput:
        b, n = past_ids.shape
        d = past_embeddings.shape[-1]
        rating_table = self.param(
            "rating_emb",
            _trunc_normal_inv_sqrt_dim(self.embedding_dim),
            (self.num_ratings, self.embedding_dim),
        )
        ratings = jnp.clip(
            past_payloads["ratings"].astype(jnp.int32), 0, self.num_ratings - 1
        )
        interleaved = jnp.stack(
            [past_embeddings, jnp.take(rating_table, ratings, axis=0)], axis=2
        ).reshape(b, n * 2, d) * (self.embedding_dim**0.5)

        pos_emb = self.param(
            "pos_emb",
            _trunc_normal_inv_sqrt_dim(self.embedding_dim),
            (self.max_sequence_len * 2, self.embedding_dim),
        )
        positions = past_payloads.get("positions")
        if positions is not None:
            # PACKED rows: within-segment positions ride as a payload.
            # Token j doubles into slots (2j, 2j+1); its doubled
            # within-segment position is (2p_j, 2p_j + 1) — segments
            # stay contiguous, so the block-diagonal attention mask and
            # the positional gather both remain exact after doubling.
            p2 = 2 * positions.astype(jnp.int32)
            pos_idx = jnp.stack([p2, p2 + 1], axis=2).reshape(b, n * 2)
            pos = jnp.take(
                pos_emb,
                jnp.clip(pos_idx, 0, self.max_sequence_len * 2 - 1),
                axis=0,
            )
        else:
            pos = pos_emb[None, : n * 2, :]
        user_embeddings = interleaved + pos
        user_embeddings = nn.Dropout(rate=self.dropout_rate)(
            user_embeddings, deterministic=deterministic
        )

        payloads = dict(past_payloads)
        payloads["timestamps"] = jnp.repeat(payloads["timestamps"], 2, axis=1)
        if positions is not None:
            payloads["positions"] = pos_idx
        if "seg_ids" in payloads:
            payloads["seg_ids"] = jnp.repeat(payloads["seg_ids"], 2, axis=1)

        valid_mask = (
            jnp.repeat(past_ids != 0, 2, axis=1)[:, :, None]
        ).astype(user_embeddings.dtype)
        user_embeddings = user_embeddings * valid_mask

        new_lengths = past_lengths * 2
        pos = jnp.arange(n * 2, dtype=new_lengths.dtype)[None, :]
        aux_mask = pos < new_lengths[:, None]
        aux_mask = jnp.logical_and(aux_mask, pos % 2 == 0)  # keep item tokens
        return new_lengths, user_embeddings, valid_mask, aux_mask, payloads

    def ratings_emb(self) -> jax.Array:
        """The shared rating embedding table (Ranking head reads this;
        combined_item_and_rating.py:36-38)."""
        return self.get_variable("params", "rating_emb")
