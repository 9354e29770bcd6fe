"""Negative samplers (reference: models/negatives_samples/negative_sampler.py).

Functional, RNG-keyed redesign of the torch module samplers:

- `LocalNegativesSampler` (negative_sampler.py:65-131): uniform ids over
  the catalog, embedded via the live embedding module.
- `InBatchNegativesSampler` (135-212): uniform over the current batch's
  valid (optionally deduped) ids. torch's dynamic-size `torch.unique`
  becomes a static-shape sort + first-occurrence compaction.

Both own the optional L2 normalization applied to sampled/supervision
embeddings (`normalize_embeddings`, 28-37).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize

# Maps item ids -> [..., D] embeddings (the live embedding table lookup).
EmbeddingLookup = Callable[[jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class NegativesSampler:
    l2_norm: bool = True
    l2_norm_eps: float = 1e-6

    def normalize_embeddings(self, x: jax.Array) -> jax.Array:
        if self.l2_norm:
            return l2_normalize(x, self.l2_norm_eps)
        return x


@dataclasses.dataclass(frozen=True)
class LocalNegativesSampler(NegativesSampler):
    """Uniform negatives over the full catalog (with replacement).

    When `catalog_embeddings` (rows aligned with all_item_ids, already
    normalized) is provided, sampled rows are gathered from it directly —
    one [X, D] normalize per step instead of normalizing the full
    [B, T, R, D] sample tensor (identical math, ~2x less HBM traffic).
    """

    def __call__(
        self,
        rng: jax.Array,
        positive_ids: jax.Array,  # [...]
        num_to_sample: int,
        all_item_ids: jax.Array,  # [X] int
        lookup: EmbeddingLookup,
        catalog_embeddings: jax.Array | None = None,  # [X, D] pre-normalized
    ) -> Tuple[jax.Array, jax.Array]:
        shape = positive_ids.shape + (num_to_sample,)
        offsets = jax.random.randint(rng, shape, 0, all_item_ids.shape[0])
        sampled_ids = jnp.take(all_item_ids, offsets, axis=0)
        if catalog_embeddings is not None:
            return sampled_ids, jnp.take(catalog_embeddings, offsets, axis=0)
        return sampled_ids, self.normalize_embeddings(lookup(sampled_ids))

    def sample_offsets(
        self,
        rng: jax.Array,
        positive_ids: jax.Array,
        num_to_sample: int,
        catalog_embeddings: jax.Array,  # [X, D] pre-normalized
    ) -> Tuple[jax.Array, jax.Array]:
        """Offset-space variant: returns (offsets [..., R], embeddings).

        Skips the [.., R]-sized id gather entirely — callers that only
        need ids for the accidental-hit mask should compare catalog
        OFFSETS instead (map positives via an id->offset table once:
        ~1000x fewer gathered elements; measured 24 ms/step on ml-1m).
        """
        shape = positive_ids.shape + (num_to_sample,)
        offsets = jax.random.randint(rng, shape, 0, catalog_embeddings.shape[0])
        return offsets, jnp.take(catalog_embeddings, offsets, axis=0)

    def offsets_only(
        self,
        rng: jax.Array,
        positive_ids: jax.Array,
        num_to_sample: int,
        num_catalog: int,
    ) -> jax.Array:
        """Same draw as sample_offsets (identical RNG stream) with NO
        embedding gather — for the dense-catalog loss path, which scores
        against the whole catalog instead of gathered rows."""
        shape = positive_ids.shape + (num_to_sample,)
        return jax.random.randint(rng, shape, 0, num_catalog)


@dataclasses.dataclass(frozen=True)
class InBatchNegativesSampler(NegativesSampler):
    """Uniform negatives over the batch's valid ids.

    `process_batch` compacts (and optionally dedups) the batch ids into a
    fixed-size pool [P] with a valid-count; `__call__` samples uniformly
    from the first `count` pool slots. Matches negative_sampler.py:154-212
    in distribution while keeping every shape static.
    """

    dedup_embeddings: bool = True

    def process_batch(
        self, ids: jax.Array, presences: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Flatten + compact valid ids; returns (pool [P] ids, count scalar)."""
        flat_ids = ids.reshape(-1)
        flat_pres = presences.reshape(-1)
        p = flat_ids.shape[0]
        if self.dedup_embeddings:
            # Static-shape unique: sort ids (invalid parked at +inf end),
            # keep first occurrence of each run.
            big = jnp.iinfo(flat_ids.dtype).max
            sort_keys = jnp.where(flat_pres, flat_ids, big)
            sorted_ids = jnp.sort(sort_keys)
            is_first = jnp.concatenate(
                [jnp.array([True]), sorted_ids[1:] != sorted_ids[:-1]]
            )
            keep = jnp.logical_and(is_first, sorted_ids != big)
            count = keep.sum()
            dest = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, p)
            pool = jnp.zeros((p + 1,), dtype=flat_ids.dtype)
            pool = pool.at[dest].set(sorted_ids, mode="drop")[:p]
        else:
            count = flat_pres.sum()
            dest = jnp.where(
                flat_pres, jnp.cumsum(flat_pres.astype(jnp.int32)) - 1, p
            )
            pool = jnp.zeros((p + 1,), dtype=flat_ids.dtype)
            pool = pool.at[dest].set(flat_ids, mode="drop")[:p]
        return pool, count

    def __call__(
        self,
        rng: jax.Array,
        positive_ids: jax.Array,
        num_to_sample: int,
        pool: jax.Array,  # [P] compacted ids
        count: jax.Array,  # scalar, number of valid pool entries
        lookup: EmbeddingLookup,
    ) -> Tuple[jax.Array, jax.Array]:
        shape = positive_ids.shape + (num_to_sample,)
        # Uniform over [0, count) with static shapes: scale uniforms by count.
        u = jax.random.uniform(rng, shape)
        offsets = jnp.minimum(
            (u * count.astype(jnp.float32)).astype(jnp.int32),
            jnp.maximum(count - 1, 0),
        )
        sampled_ids = jnp.take(pool, offsets, axis=0)
        return sampled_ids, self.normalize_embeddings(lookup(sampled_ids))
