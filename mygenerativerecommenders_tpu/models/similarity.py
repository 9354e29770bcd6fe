"""Similarity (NDP) modules (reference: models/similarity/).

`DotProductSimilarity` matches dot_product.py:31-64 across its broadcast
cases; here the three torch shape cases collapse into one einsum per
calling convention:

  scores(queries [..., D], items [..., X, D]) -> [..., X]

MoL (Mixture-of-Logits, mol.py) lives in `similarity_mol.py`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SimilarityModule(nn.Module):
    pass


class DotProductSimilarity(SimilarityModule):
    @nn.compact
    def __call__(
        self,
        input_embeddings: jax.Array,  # [..., D]
        item_embeddings: jax.Array,  # [..., X, D] broadcastable against input
        item_ids: jax.Array | None = None,
        item_sideinfo: jax.Array | None = None,
    ) -> jax.Array:
        del item_ids, item_sideinfo
        return jnp.einsum(
            "...d,...xd->...x",
            input_embeddings,
            item_embeddings,
            preferred_element_type=jnp.float32,
        ).astype(input_embeddings.dtype)
