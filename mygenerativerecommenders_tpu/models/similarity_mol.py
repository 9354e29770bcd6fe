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
gating MLPs. Extras beyond the configs the reference actually exercises:

  - item sideinfo pathways (MoLGatingFn, mol.py:204-216, 278-287): the
    item-only gating MLP consumes [item_emb ++ sideinfo]; optionally the
    ci MLP consumes [logits ++ sideinfo] (combine_item_sideinfo_into_ci).
  - per-item learned temperature TauFn (mol.py:96-113):
    tau = (sigmoid(Linear(sideinfo)) + alpha) / alpha, dividing the
    gating weights before the combiner softmax (mol.py:30-35, 330-333).
  - glu_silu_ln combination (mol.py:295-301).
  - LnX frequency estimator (mol.py:413-448) as a pure function over an
    explicit state pytree (`lnx_init_state` / `lnx_frequency_estimate`)
    instead of mutable module buffers — the TPU-functional redesign of
    the reference's _A/_B buffer machinery.
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
    # glu_silu | glu_silu_ln | silu | none
    gating_combination_type: str = "glu_silu"
    gating_context_mlp: str = "linear"
    gating_item_mlp: str = "linear"
    gating_ci_mlp: str = "linear"
    softmax_dropout_rate: float = 0.0
    item_sideinfo_dim: int = 0
    combine_item_sideinfo_into_ci: bool = False
    gating_use_custom_tau: bool = False
    gating_tau_alpha: float = 0.01
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
        del item_ids
        if self.item_sideinfo_dim > 0 and item_sideinfo is None:
            raise ValueError("item_sideinfo_dim > 0 but no item_sideinfo passed")
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
            # item-only gating consumes [item_emb ++ sideinfo] (mol.py:278-281)
            item_gate_in = item_embeddings
            if self.item_sideinfo_dim > 0:
                item_gate_in = jnp.concatenate(
                    [item_embeddings, item_sideinfo], axis=-1
                )
            itm_gate = m_itm(item_gate_in)  # [..., X, L]
        m_ci = _gating_mlp(self.gating_ci_mlp, num_logits, "gate_ci")
        if m_ci is not None:
            ci_in = logits
            if self.combine_item_sideinfo_into_ci:
                # broadcast [..., X, F] sideinfo against per-row logits
                # (mol.py:283-290's B'=1 expand)
                sideinfo_b = jnp.broadcast_to(
                    item_sideinfo,
                    logits.shape[:-1] + (self.item_sideinfo_dim,),
                )
                ci_in = jnp.concatenate([logits, sideinfo_b], axis=-1)
            ci_gate = m_ci(ci_in)  # [..., X, L]

        if self.gating_combination_type == "glu_silu":
            gating_inputs = ctx_gate * itm_gate + ci_gate
            gating_weights = jax.nn.silu(gating_inputs)
        elif self.gating_combination_type == "glu_silu_ln":
            # x * sigmoid(layernorm(x)) (mol.py:295-301)
            gating_inputs = ctx_gate * itm_gate + ci_gate
            mean = gating_inputs.mean(axis=-1, keepdims=True)
            var = ((gating_inputs - mean) ** 2).mean(axis=-1, keepdims=True)
            normed = (gating_inputs - mean) * jax.lax.rsqrt(var + 1e-5)
            gating_weights = gating_inputs * jax.nn.sigmoid(normed)
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

        # per-item learned temperature (TauFn, mol.py:96-113, applied at
        # mol.py:30-33 before the combiner softmax)
        if self.gating_use_custom_tau:
            tau_logit = nn.Dense(
                1,
                kernel_init=jax.nn.initializers.xavier_uniform(),
                bias_init=jax.nn.initializers.zeros,
                name="tau_fn",
            )(item_sideinfo)
            tau = (jax.nn.sigmoid(tau_logit) + self.gating_tau_alpha) / (
                self.gating_tau_alpha
            )  # [..., X, 1], broadcasts over the logit-group axis
            gating_weights = gating_weights / tau

        # SoftmaxDropoutCombiner (mol.py:38-65)
        weights = jax.nn.softmax(gating_weights, axis=-1)
        weights = nn.Dropout(rate=self.softmax_dropout_rate)(
            weights, deterministic=deterministic
        )
        weights = weights / jnp.maximum(
            weights.sum(axis=-1, keepdims=True), self.eps
        )
        return (weights * logits).sum(axis=-1)


# ---------------------------------------------------------------------------
# LnX frequency estimator (mol.py:400-448) — functional-state redesign.
#
# The reference keeps per-item mutable buffers `_A` (element index of the
# id's last occurrence) and `_B` (EMA of the mean inter-occurrence gap) plus
# a running element counter, updated in-place per batch. Under jit that
# becomes an explicit state pytree threaded through a pure function. The
# reference's sort/unique_consecutive bookkeeping (mol.py:413-437) reduces
# to two static-shape scatters: per-id occurrence counts and per-id max
# element position (last-write-wins over a stably-sorted run == max original
# index), which is how it is expressed here.
# ---------------------------------------------------------------------------


def lnx_init_state(num_ids: int) -> dict:
    """Zero state for ids in [0, num_ids). int32 counters (JAX x64 is off
    by default); wraps after 2^31 elements — beyond any reference run."""
    return {
        "A": jnp.zeros((num_ids,), dtype=jnp.int32),
        "B": jnp.zeros((num_ids,), dtype=jnp.float32),
        "num_elements": jnp.zeros((), dtype=jnp.int32),
    }


def lnx_frequency_estimate(
    state: dict,
    ids: jax.Array,
    *,
    alpha: float = 0.1,
    b_cap: float = 1e6,
    update: bool = True,
):
    """Estimated occurrence frequency 1/E[gap] for each id (mol.py:419-448).

    Returns (frequencies shaped like `ids`, new_state). With update=False
    the state passes through unchanged (the reference's eval mode).
    """
    flat = ids.reshape(-1)
    n = flat.shape[0]
    positions = jnp.arange(n, dtype=state["A"].dtype) + state["num_elements"]
    most_recent = (
        jnp.full_like(state["A"], jnp.iinfo(state["A"].dtype).min)
        .at[flat]
        .max(positions)
    )
    counts = jnp.zeros_like(state["B"]).at[flat].add(1.0)
    seen = counts > 0
    delta = jnp.where(
        seen, (most_recent - state["A"]).astype(jnp.float32), 0.0
    ) / jnp.maximum(counts, 1.0)
    temp = jnp.minimum((1.0 - alpha) * state["B"] + alpha * delta, b_cap)
    # 1/temp, inf on the very first sighting of an id — matches the
    # reference (mol.py:417, 437), which relies on B warming up.
    freqs = (1.0 / temp[flat]).reshape(ids.shape)
    if update:
        state = {
            "A": jnp.where(seen, most_recent, state["A"]),
            "B": jnp.where(seen, temp, state["B"]),
            "num_elements": state["num_elements"] + n,
        }
    return freqs, state
