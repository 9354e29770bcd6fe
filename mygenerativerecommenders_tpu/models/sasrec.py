"""SASRec baseline encoder (reference: sequential_encoders/sasrec.py).

Per-block (sasrec.py:146-172):
  Q = LN(x, eps=1e-8)
  attn = MHA(Q, key=x, value=x, causal)       # standard softmax attention
  x = FFN(LN(Q + attn, eps=1e-8))             # 1x1-conv MLP == per-position
  x = x * valid_mask                           #   dense, with inner residual

The torch MultiheadAttention packs qkv into one in_proj + out_proj; here
that is nn.MultiHeadDotProductAttention with a causal mask. The Conv1d
kernel-size-1 FFN is a position-wise Dense pair (identical math, and the
dense form is what the TPU wants anyway).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class SASRecFFN(nn.Module):
    embedding_dim: int
    hidden_dim: int
    activation: str = "relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = nn.Dense(self.hidden_dim, name="conv1")(x)
        h = nn.relu(h) if self.activation == "relu" else nn.gelu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.embedding_dim, name="conv2")(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h + x


class SASRec(nn.Module):
    max_sequence_len: int
    embedding_dim: int
    num_blocks: int
    num_heads: int
    ffn_hidden_dim: int
    activation: str = "relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self,
        past_lengths: jax.Array,
        user_embeddings: jax.Array,  # [B, N, D]
        valid_mask: jax.Array,  # [B, N, 1]
        past_payloads: Dict[str, jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        del past_lengths, past_payloads
        n = user_embeddings.shape[1]
        causal = jnp.tril(jnp.ones((n, n), dtype=jnp.bool_))[None, None, :, :]
        x = user_embeddings
        mask = valid_mask.astype(x.dtype)
        for i in range(self.num_blocks):
            q = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-8)(x)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.embedding_dim,
                dropout_rate=self.dropout_rate,
                deterministic=deterministic,
                name=f"mha_{i}",
            )(q, x, x, mask=causal)
            h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-8)(q + attn)
            x = SASRecFFN(
                embedding_dim=self.embedding_dim,
                hidden_dim=self.ffn_hidden_dim,
                activation=self.activation,
                dropout_rate=self.dropout_rate,
                name=f"ffn_{i}",
            )(h, deterministic=deterministic)
            x = x * mask
        return x
