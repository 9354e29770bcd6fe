"""Output postprocessors (reference: models/postprocessors/postprocessors.py).

Both truncate to `embedding_dim` then normalize: L2 (postprocessors.py:34-55)
or parameter-free LayerNorm (58-80).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x / max(||x||_2, eps) along the last axis (clamped, not added).

    Forward-identical to the reference's x / clamp(norm, min=eps)
    (negative_sampler.py:31-37, postprocessors.py:48-55). The max sits
    INSIDE the sqrt because jnp's norm has a NaN gradient at exactly-zero
    rows (padded positions are exactly zero here); torch defines a zero
    subgradient there, and this form reproduces that behavior.
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return x / norm


class OutputPostprocessor(nn.Module):
    pass


class L2NormPostprocessor(OutputPostprocessor):
    embedding_dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, output_embeddings: jax.Array) -> jax.Array:
        x = output_embeddings[..., : self.embedding_dim]
        return l2_normalize(x, self.eps)


class LayerNormPostprocessor(OutputPostprocessor):
    embedding_dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, output_embeddings: jax.Array) -> jax.Array:
        x = output_embeddings[..., : self.embedding_dim]
        return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=self.eps)(x)
