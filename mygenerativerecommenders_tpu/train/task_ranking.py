"""Ranking task: rating prediction (reference: models/ranking.py).

- train step (ranking.py:49-109): scatter target id AND rating at position
  `length`; forward; CE over the shared rating-embedding logits on the
  FULL output sequence (lengths+1 supervised positions, no shift).
- eval (ranking.py:24-47, 115-182): logits = score(normalize(last-position
  embedding), normalize(rating table)); multiclass AUROC/AP metrics.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config
from mygenerativerecommenders_tpu.models.losses import ce_rating_loss
from mygenerativerecommenders_tpu.models.model import GenerativeRecommender
from mygenerativerecommenders_tpu.ops.sequence import (
    get_current_embeddings,
    scatter_at_lengths,
)
from mygenerativerecommenders_tpu.train.task_retrieval import (
    TrainStepOutput,
    make_sampler,
    train_step_from_loss,
)
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


def make_loss_fn(
    model: GenerativeRecommender, cfg: Config, packed: bool = False
) -> Callable:
    """packed=True consumes PackedBatchLoader batches: targets (id AND
    rating) are already inline as each segment's last token, so there is
    no scatter; supervision covers every packed token (id != 0), exactly
    the unpacked per-example term set. The combined item+rating
    preprocessor doubles packed rows the same way it doubles padded rows
    (positions interleave to (2p, 2p+1), seg_ids repeat) and the aux
    compaction maps the encoder output back to item slots."""
    if packed:
        problems = []
        if cfg.model.preprocessor.kind not in (
            "learnable_positional",
            "learnable_positional_rated",
            "combined_item_and_rating",
        ):
            problems.append(
                "a preprocessor that models packed positions "
                "(learnable_positional[_rated] or combined_item_and_rating)"
            )
        # same encoder requirement as the retrieval packed gate: only the
        # HSTU rel_bias path consumes seg_ids/positions — sasrec would
        # silently attend across packed segments
        if cfg.model.encoder.kind != "hstu" or (
            cfg.model.encoder.normalization not in ("rel_bias", "hstu_rel_bias")
        ):
            problems.append("encoder.kind=hstu with rel_bias normalization")
        if problems:
            raise ValueError(
                "data.pack_sequences with model.task=ranking requires: "
                + ", ".join(problems)
            )
    sampler = make_sampler(cfg)
    t = cfg.model.loss.temperature
    max_out = cfg.model.gr_output_length + 1

    def loss_fn(params: Any, batch: Dict[str, jax.Array], rng: jax.Array) -> jax.Array:
        if packed:
            from mygenerativerecommenders_tpu.utils.features import (
                packed_seq_features,
            )

            seq = packed_seq_features(batch)
            past_ids = seq.past_ids
            ratings = seq.past_payloads["ratings"]
        else:
            seq, target_ids, target_ratings = seq_features_from_batch(batch, max_out)
            past_ids = scatter_at_lengths(seq.past_ids, seq.past_lengths, target_ids)
            ratings = scatter_at_lengths(
                seq.past_payloads["ratings"], seq.past_lengths, target_ratings
            )
            payloads = dict(seq.past_payloads)
            payloads["ratings"] = ratings
            seq = seq._replace(past_ids=past_ids, past_payloads=payloads)

        encoded, _ = model.apply(
            params, seq, deterministic=False, rngs={"dropout": rng}
        )  # [B, N, D]

        rating_table = model.apply(params, method=model.ratings_embeddings)
        rating_table = sampler.normalize_embeddings(rating_table)  # [R, D]

        logits = (
            model.apply(
                params, encoded, rating_table[None, None, :, :], method=model.score
            )
            / t
        )  # [B, N, R]
        weights = (past_ids != 0).astype(jnp.float32)
        if not packed and "sample_weight" in batch:
            weights = weights * batch["sample_weight"][:, None]
        return ce_rating_loss(logits, ratings, weights)

    return loss_fn


def make_train_step(
    model: GenerativeRecommender, cfg: Config, steps: int = 1,
    packed: bool = False,
) -> Callable:
    loss_fn = make_loss_fn(model, cfg, packed=packed)
    return train_step_from_loss(loss_fn, cfg, steps)


def make_eval_step(model: GenerativeRecommender, cfg: Config) -> Callable:
    """eval_step(params, batch) -> [B, R] class probabilities."""
    sampler = make_sampler(cfg)
    max_out = cfg.model.gr_output_length + 1

    @jax.jit
    def eval_step(params, batch: Dict[str, jax.Array]) -> jax.Array:
        seq, _, _ = seq_features_from_batch(batch, max_out)
        encoded, lengths = model.apply(params, seq, deterministic=True)
        current = sampler.normalize_embeddings(
            get_current_embeddings(lengths, encoded)
        )
        rating_table = sampler.normalize_embeddings(
            model.apply(params, method=model.ratings_embeddings)
        )
        logits = model.apply(
            params, current, rating_table[None, :, :], method=model.score
        )  # [B, R]
        return jax.nn.softmax(logits, axis=-1)

    return eval_step
