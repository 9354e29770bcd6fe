"""MoL (Mixture-of-Logits) learned similarity (reference: similarity/mol.py,
arXiv:2306.04039).

Structure mirrors MoLSimilarity (mol.py:336-599):
  - context proj: D -> P groups x d' component embeddings (optionally
    L2-normalized per component);
  - item proj: D -> Q groups x d' components;
  - all-pairs group logits einsum -> [.., X, P*Q], divided by temperature;
  - gating: context-only / item-only / context-item MLPs combined by
    glu_silu / silu / none (MoLGatingFn, mol.py:185-333);
  - SoftmaxDropoutCombiner (mol.py:38-65): softmax over logit groups,
    dropout, renormalize, weighted sum.

GeGLU / SwiGLU building blocks (mol.py:117-182) are provided for the
gating MLPs. The LnX frequency estimator (mol.py:400-448) is stateful
batch-count machinery the reference never wires into any config; it is
intentionally omitted here.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize
from mygenerativerecommenders_tpu.models.similarity import SimilarityModule


def _normal_init(std: float = 0.02):
    return jax.nn.initializers.normal(stddev=std)


class GeGLU(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("w", _normal_init(), (x.shape[-1], self.out_features * 2))
        b = self.param("b", jax.nn.initializers.zeros, (self.out_features * 2,))
        lhs, rhs = jnp.split(x @ w + b, 2, axis=-1)
        return jax.nn.gelu(lhs) * rhs


class SwiGLU(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("w", _normal_init(), (x.shape[-1], self.out_features * 2))
        b = self.param("b", jax.nn.initializers.zeros, (self.out_features * 2,))
        lhs, rhs = jnp.split(x @ w + b, 2, axis=-1)
        return jax.nn.silu(lhs) * rhs


def _gating_mlp(kind: str, out_features: int, name: str):
    if kind == "linear":
        return nn.Dense(
            out_features,
            kernel_init=jax.nn.initializers.xavier_uniform(),
            bias_init=jax.nn.initializers.zeros,
            name=name,
        )
    if kind == "geglu":
        return GeGLU(out_features, name=name)
    if kind == "swiglu":
        return SwiGLU(out_features, name=name)
    if kind == "none":
        return None
    raise ValueError(f"Unknown gating mlp kind {kind}")


class MoLSimilarity(SimilarityModule):
    embedding_dim: int
    query_dot_product_groups: int = 4
    item_dot_product_groups: int = 4
    dot_product_dimension: int = 16
    dot_product_l2_norm: bool = True
    temperature: float = 0.05
    gating_combination_type: str = "glu_silu"  # glu_silu | silu | none
    gating_context_mlp: str = "linear"
    gating_item_mlp: str = "linear"
    gating_ci_mlp: str = "linear"
    softmax_dropout_rate: float = 0.0
    eps: float = 1e-6

    @nn.compact
    def __call__(
        self,
        input_embeddings: jax.Array,  # [..., D]
        item_embeddings: jax.Array,  # [X, D] or [..., X, D]
        item_ids: Optional[jax.Array] = None,
        item_sideinfo: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        del item_ids, item_sideinfo
        p, q, dd = (
            self.query_dot_product_groups,
            self.item_dot_product_groups,
            self.dot_product_dimension,
        )
        num_logits = p * q

        ctx = nn.Dense(
            p * dd,
            kernel_init=jax.nn.initializers.xavier_uniform(),
            bias_init=jax.nn.initializers.zeros,
            name="context_proj",
        )(input_embeddings)
        ctx = ctx.reshape(input_embeddings.shape[:-1] + (p, dd))
        itm = nn.Dense(
            q * dd,
            kernel_init=jax.nn.initializers.xavier_uniform(),
            bias_init=jax.nn.initializers.zeros,
            name="item_proj",
        )(item_embeddings)
        itm = itm.reshape(item_embeddings.shape[:-1] + (q, dd))
        if self.dot_product_l2_norm:
            ctx = l2_normalize(ctx, self.eps)
            itm = l2_normalize(itm, self.eps)

        # all-pairs group logits: [..., X, P*Q]
        logits = jnp.einsum(
            "...pd,...xqd->...xpq", ctx, itm, preferred_element_type=jnp.float32
        )
        logits = logits.reshape(logits.shape[:-2] + (num_logits,)) / self.temperature

        # gating inputs
        ctx_gate = itm_gate = ci_gate = None
        m_ctx = _gating_mlp(self.gating_context_mlp, num_logits, "gate_context")
        if m_ctx is not None:
            ctx_gate = m_ctx(input_embeddings)[..., None, :]  # [..., 1, L]
        m_itm = _gating_mlp(self.gating_item_mlp, num_logits, "gate_item")
        if m_itm is not None:
            itm_gate = m_itm(item_embeddings)  # [..., X, L]
        m_ci = _gating_mlp(self.gating_ci_mlp, num_logits, "gate_ci")
        if m_ci is not None:
            ci_gate = m_ci(logits)  # [..., X, L]

        if self.gating_combination_type == "glu_silu":
            gating_inputs = ctx_gate * itm_gate + ci_gate
            gating_weights = jax.nn.silu(gating_inputs)
        elif self.gating_combination_type == "silu":
            gating_inputs = None
            for g in (ctx_gate, itm_gate, ci_gate):
                if g is None:
                    continue
                gating_inputs = g if gating_inputs is None else gating_inputs + g
            gating_weights = jax.nn.silu(gating_inputs)
        elif self.gating_combination_type == "none":
            gating_inputs = None
            for g in (ctx_gate, itm_gate, ci_gate):
                if g is None:
                    continue
                gating_inputs = g if gating_inputs is None else gating_inputs + g
            gating_weights = gating_inputs
        else:
            raise ValueError(
                f"Unknown combination_type {self.gating_combination_type}"
            )

        # SoftmaxDropoutCombiner (mol.py:38-65)
        weights = jax.nn.softmax(gating_weights, axis=-1)
        weights = nn.Dropout(rate=self.softmax_dropout_rate)(
            weights, deterministic=deterministic
        )
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), self.eps
        )
        return (weights * logits).sum(axis=-1)
