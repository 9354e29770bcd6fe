"""The composed generative-recommender model.

TPU-first rework of the reference's `GenerativeRecommenders` Lightning
module (models/generative_recommenders.py): the 10 component families keep
their taxonomy but become flax submodules / pure functions under a single
parameter pytree, and the forward pass
(generative_recommenders.py:355-393)
    preprocessor -> sequence encoder -> aux-mask compaction -> postprocessor
is one jit-traceable method. The training/eval "steps" live in
train/task_retrieval.py and train/task_ranking.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.configs import Config, ModelConfig, max_seq_len


def _resolve_use_pallas(value) -> bool:
    """"auto" -> TPU backend only; accepts bools and true/false strings."""
    if isinstance(value, bool):
        return value
    v = str(value).lower()
    if v == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return v in ("1", "true", "yes", "on")
from mygenerativerecommenders_tpu.models import embeddings as emb_lib
from mygenerativerecommenders_tpu.models import preprocessors as pre_lib
from mygenerativerecommenders_tpu.models.hstu import HSTU
from mygenerativerecommenders_tpu.models.postprocessors import (
    L2NormPostprocessor,
    LayerNormPostprocessor,
)
from mygenerativerecommenders_tpu.models.similarity import DotProductSimilarity
from mygenerativerecommenders_tpu.ops.sequence import mask_dense_by_aux_mask
from mygenerativerecommenders_tpu.utils.features import SequenceBatch


class GenerativeRecommender(nn.Module):
    """Embedding + preprocessor + encoder + postprocessor (+ similarity).

    Methods:
      __call__(seq)       -> encoded [B, N, D'] (postprocessed), new_lengths
      item_embeddings(ids)-> raw embedding lookup [..., D]
      score(q, items)     -> similarity scores
    """

    cfg: ModelConfig
    total_seq_len: int  # data.max_sequence_length + gr_output_length + 1
    year_of_item: tuple = ()  # item id -> year, for the item_year embedding

    def setup(self):
        m = self.cfg
        if m.embedding.kind == "local":
            self.embeddings = emb_lib.LocalEmbedding(
                num_items=m.embedding.num_items,
                item_embedding_dim=m.item_embedding_dim,
                init_std=m.embedding.init_std,
            )
        elif m.embedding.kind == "sharded_local":
            self.embeddings = emb_lib.ShardedLocalEmbedding(
                num_items=m.embedding.num_items,
                item_embedding_dim=m.item_embedding_dim,
                num_shards=m.embedding.num_shards,
                init_std=m.embedding.init_std,
            )
        elif m.embedding.kind == "sharded_a2a":
            self.embeddings = emb_lib.ShardedA2AEmbedding(
                num_items=m.embedding.num_items,
                item_embedding_dim=m.item_embedding_dim,
                num_shards=m.embedding.num_shards,
                capacity_factor=m.embedding.a2a_capacity_factor,
                init_std=m.embedding.init_std,
            )
        elif m.embedding.kind == "sharded_column":
            self.embeddings = emb_lib.ColumnShardedLocalEmbedding(
                num_items=m.embedding.num_items,
                item_embedding_dim=m.item_embedding_dim,
                num_shards=m.embedding.num_shards,
                init_std=m.embedding.init_std,
            )
        elif m.embedding.kind == "sharded_2d":
            self.embeddings = emb_lib.Sharded2DEmbedding(
                num_items=m.embedding.num_items,
                item_embedding_dim=m.item_embedding_dim,
                num_shards=m.embedding.num_shards,
                col_shards=m.embedding.col_shards,
                capacity_factor=m.embedding.a2a_capacity_factor,
                init_std=m.embedding.init_std,
            )
        elif m.embedding.kind == "item_year":
            if not self.year_of_item:
                raise ValueError(
                    "item_year embedding requires year_of_item (pass the "
                    "data catalog's item->year table to build_model)"
                )
            self.embeddings = emb_lib.ItemYearEmbedding(
                num_items=m.embedding.num_items,
                item_embedding_dim=m.item_embedding_dim,
                year_of_item=self.year_of_item,
                init_std=m.embedding.init_std,
            )
        else:
            raise ValueError(f"Unknown embedding kind {m.embedding.kind}")

        p = m.preprocessor
        if p.kind == "learnable_positional":
            self.preprocessor = pre_lib.LearnablePositionalEmbeddingPreprocessor(
                max_sequence_len=self.total_seq_len,
                embedding_dim=m.item_embedding_dim,
                dropout_rate=p.dropout_rate,
            )
        elif p.kind == "learnable_positional_rated":
            self.preprocessor = pre_lib.LearnablePositionalEmbeddingRatedPreprocessor(
                max_sequence_len=self.total_seq_len,
                item_embedding_dim=m.item_embedding_dim,
                rating_embedding_dim=p.rating_embedding_dim,
                num_ratings=p.num_ratings,
                dropout_rate=p.dropout_rate,
            )
        elif p.kind == "learnable_positional_aux":
            self.preprocessor = pre_lib.LearnablePositionalEmbeddingAuxPreprocessor(
                max_sequence_len=self.total_seq_len,
                embedding_dim=m.item_embedding_dim,
                dropout_rate=p.dropout_rate,
                auxiliary_columns=tuple(p.auxiliary_columns),
                encoding_types=tuple(p.encoding_types),
                categorical_dims=tuple(p.categorical_dims),
                categorical_embedding_dims=tuple(p.categorical_embedding_dims),
            )
        elif p.kind == "combined_item_and_rating":
            self.preprocessor = pre_lib.CombinedItemAndRatingPreprocessor(
                max_sequence_len=self.total_seq_len,
                embedding_dim=m.item_embedding_dim,
                num_ratings=p.num_ratings,
                dropout_rate=p.dropout_rate,
            )
        else:
            raise ValueError(f"Unknown preprocessor kind {p.kind}")

        # encoder dims follow the preprocessor's output layout: the rated
        # variant widens D (postprocessor truncates back, like the
        # reference's L2Norm slice); the combined variant doubles N
        # (experiment/ml-1m-hstu-rank.yaml: 2*max_seq_len, 2*out+2).
        seq_mult = 2 if p.kind == "combined_item_and_rating" else 1
        enc_dim = m.item_embedding_dim + (
            p.rating_embedding_dim if p.kind == "learnable_positional_rated" else 0
        )
        enc = m.encoder
        if enc.kind == "hstu":
            self.encoder = HSTU(
                max_sequence_len=seq_mult * (self.total_seq_len - (m.gr_output_length + 1)),
                max_output_len=seq_mult * (m.gr_output_length + 1),
                embedding_dim=enc_dim,
                num_blocks=enc.num_blocks,
                num_heads=enc.num_heads,
                linear_dim=enc.linear_dim,
                attention_dim=enc.attention_dim,
                normalization=enc.normalization,
                linear_activation=enc.linear_activation,
                linear_dropout_rate=enc.linear_dropout_rate,
                attn_dropout_rate=enc.attn_dropout_rate,
                enable_relative_attention_bias=enc.enable_relative_attention_bias,
                relative_bias_type=enc.relative_bias_type,
                num_time_buckets=enc.num_time_buckets,
                concat_ua=enc.concat_ua,
                # composes with sp_shards: the ring routes per-chunk math
                # through the fused offset-tile chunk kernel
                use_pallas=_resolve_use_pallas(enc.use_pallas),
                sp_shards=enc.sp_shards,
                sp_zigzag=enc.sp_zigzag,
                tp_shards=enc.tp_shards,
                remat=enc.remat,
            )
        elif enc.kind == "sasrec":
            from mygenerativerecommenders_tpu.models.sasrec import SASRec

            self.encoder = SASRec(
                max_sequence_len=seq_mult * self.total_seq_len,
                embedding_dim=enc_dim,
                num_blocks=enc.num_blocks,
                num_heads=enc.num_heads,
                ffn_hidden_dim=enc.ffn_hidden_dim,
                dropout_rate=enc.linear_dropout_rate,
            )
        else:
            raise ValueError(f"Unknown encoder kind {enc.kind}")

        if m.postprocessor.kind == "l2_norm":
            self.postprocessor = L2NormPostprocessor(
                embedding_dim=m.item_embedding_dim, eps=m.postprocessor.eps
            )
        elif m.postprocessor.kind == "layer_norm":
            self.postprocessor = LayerNormPostprocessor(
                embedding_dim=m.item_embedding_dim, eps=m.postprocessor.eps
            )
        else:
            raise ValueError(f"Unknown postprocessor kind {m.postprocessor.kind}")

        if m.similarity.kind == "dot_product":
            self.similarity = DotProductSimilarity()
        elif m.similarity.kind == "mol":
            from mygenerativerecommenders_tpu.models.similarity_mol import MoLSimilarity

            self.similarity = MoLSimilarity(
                embedding_dim=m.item_embedding_dim,
                query_dot_product_groups=m.similarity.query_dot_product_groups,
                item_dot_product_groups=m.similarity.item_dot_product_groups,
                dot_product_dimension=m.similarity.dot_product_dimension,
                dot_product_l2_norm=m.similarity.dot_product_l2_norm,
                temperature=m.similarity.temperature,
            )
        else:
            raise ValueError(f"Unknown similarity kind {m.similarity.kind}")

    def init_all(self, seq: SequenceBatch):
        """Init entry point touching every parameterized submodule —
        linen only creates params for traced calls, and `score` (MoL has
        params) is not on the __call__ path."""
        encoded, lengths = self(seq)
        _ = self.score(encoded[:, 0, :], encoded[:, :1, :])
        return encoded, lengths

    def item_embeddings(self, ids: jax.Array) -> jax.Array:
        return self.embeddings(ids)

    def ratings_embeddings(self) -> jax.Array:
        """Shared rating embedding table for the ranking head
        (ranking.py:16-22 reads preprocessor.ratings_emb)."""
        if not hasattr(self.preprocessor, "ratings_emb"):
            raise ValueError(
                "Preprocessor has no ratings embeddings; the ranking task "
                "requires the combined_item_and_rating preprocessor"
            )
        return self.preprocessor.ratings_emb()

    def score(
        self,
        input_embeddings: jax.Array,
        item_embeddings: jax.Array,
        item_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.similarity(input_embeddings, item_embeddings, item_ids)

    def __call__(
        self,
        seq: SequenceBatch,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Full forward (generative_recommenders.py:355-393).

        Returns (encoded [B, N, D'], lengths [B]) — lengths change when an
        aux preprocessor drops its prepended token.
        """
        past_embeddings = seq.past_embeddings
        if past_embeddings is None:
            past_embeddings = self.embeddings(seq.past_ids)

        lengths, user_embeddings, valid_mask, aux_mask, payloads = self.preprocessor(
            past_lengths=seq.past_lengths,
            past_ids=seq.past_ids,
            past_embeddings=past_embeddings,
            past_payloads=seq.past_payloads,
            deterministic=deterministic,
        )

        dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        encoded = self.encoder(
            past_lengths=lengths,
            user_embeddings=user_embeddings.astype(dtype),
            valid_mask=valid_mask,
            past_payloads=payloads,
            deterministic=deterministic,
        ).astype(jnp.float32)

        if aux_mask is not None:
            encoded, lengths = mask_dense_by_aux_mask(encoded, aux_mask, lengths)
            # the reference compacts back to past_ids' N
            # (generative_recommenders.py:383-389, max_lengths=past_ids.size(1));
            # lossless because at most `lengths` <= N positions survive.
            encoded = encoded[:, : seq.past_ids.shape[1], :]

        return self.postprocessor(encoded), lengths


def build_model(cfg: Config, year_of_item=None) -> GenerativeRecommender:
    years = ()
    if cfg.model.embedding.kind == "item_year" and year_of_item is not None:
        years = tuple(int(y) for y in year_of_item)
    return GenerativeRecommender(
        cfg=cfg.model, total_seq_len=max_seq_len(cfg), year_of_item=years
    )
