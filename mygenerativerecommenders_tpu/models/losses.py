"""Autoregressive losses (reference: models/losses/autoregressive_losses.py).

The reference computes each loss on jagged [N', ...] tensors. Here every
loss runs dense over [B, T, ...] with a `weights` mask whose sum equals
the jagged N' — numerically identical (masked positions contribute 0 to
both numerator and denominator; see SURVEY.md §7 hard-part (3)).

All losses return `sum(per_pos_loss * weights) / sum(weights)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ACCIDENTAL_HIT_LOGIT = -5e4  # autoregressive_losses.py:298-302


def _weighted_mean(per_pos: jax.Array, weights: jax.Array) -> jax.Array:
    w = weights.astype(per_pos.dtype)
    return (per_pos * w).sum() / jnp.maximum(w.sum(), 1e-12)


def sampled_softmax_loss(
    positive_logits: jax.Array,  # [B, T] (already / temperature)
    negative_logits: jax.Array,  # [B, T, R] (already / temperature)
    accidental_hits: jax.Array,  # [B, T, R] bool — sampled id == positive id
    weights: jax.Array,  # [B, T]
) -> jax.Array:
    """-log softmax(pos | pos ++ negs) with accidental hits masked to -5e4.

    Matches SampledSoftmaxLoss.jagged_forward (autoregressive_losses.py:
    249-306): accidental-hit logits are REPLACED by -5e4 (not divided by
    temperature), then the positive's -log_softmax over [pos, negs].
    """
    negative_logits = jnp.where(accidental_hits, _ACCIDENTAL_HIT_LOGIT, negative_logits)
    # -log_softmax(concat([pos, negs]))[0] == logaddexp(pos, lse(negs)) - pos.
    # The concat-free form avoids materializing the [B, T, 1+R] tensor,
    # which XLA lays out poorly on TPU (measured ~25 ms vs ~1 ms at the
    # ml-1m recipe shapes).
    neg_lse = jax.nn.logsumexp(negative_logits, axis=-1)
    per_pos = jnp.logaddexp(positive_logits, neg_lse) - positive_logits
    return _weighted_mean(per_pos, weights)


def bce_loss(
    positive_logits: jax.Array,  # [B, T]
    negative_logits: jax.Array,  # [B, T] (single negative)
    negative_is_accidental: jax.Array,  # [B, T] bool
    weights: jax.Array,  # [B, T]
) -> jax.Array:
    """1-negative binary CE (BCELoss, autoregressive_losses.py:41-113).

    Positions whose sampled negative equals the positive are dropped from
    BOTH numerator and denominator (loss_weights includes the valid mask).
    """
    loss_weights = weights * (~negative_is_accidental).astype(weights.dtype)
    pos_term = jax.nn.softplus(-positive_logits)  # BCE vs target 1
    neg_term = jax.nn.softplus(negative_logits)  # BCE vs target 0
    per_pos = (pos_term + neg_term) * 0.5
    return _weighted_mean(per_pos, loss_weights)


def bce_with_ratings_loss(
    target_logits: jax.Array,  # [B, T]
    ratings: jax.Array,  # [B, T] in {0, 1}
    weights: jax.Array,
) -> jax.Array:
    """Binary CE against the (binary) rating (BCELossWithRatings, 116-161)."""
    r = ratings.astype(target_logits.dtype)
    per_pos = jax.nn.softplus(target_logits) - target_logits * r
    return _weighted_mean(per_pos, weights)


def ce_rating_loss(
    logits: jax.Array,  # [B, T, R] scores vs the R rating embeddings
    ratings: jax.Array,  # [B, T] int class labels
    weights: jax.Array,
) -> jax.Array:
    """Multiclass CE over shared rating embeddings (CERatingLoss, 164-246)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    safe_ratings = jnp.clip(ratings, 0, logits.shape[-1] - 1)
    per_pos = -jnp.take_along_axis(log_probs, safe_ratings[..., None], axis=-1)[..., 0]
    return _weighted_mean(per_pos, weights)
