"""Incremental decoding for HSTU — the serving-path equivalent of the
reference's cache machinery (HSTUCacheState + delta_x_offsets,
sequential_encoders/hstu.py:131, 266-423).

The reference caches (v, padded_q, padded_k, outputs) per block and
index-copies the delta rows. The TPU-native equivalent keeps static-shape
per-block K/V caches and appends one position per step:

  prefill:  one full fused forward; caches filled for positions < length.
  step:     for the token at position p (= current length):
              per block: LN -> uvqk row -> q/k/v for the single position,
              attention row over cached K/V[<= p] with the row's rel bias,
              gating + residual; K/V caches updated at p.
            O(N * D) per step instead of O(N^2 * D).

`greedy_generate` rolls the decode step autoregressively for
`gr_output_length` steps (the "generative" in generative recommenders),
picking the top-1 filtered candidate each step.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.models.model import GenerativeRecommender
from mygenerativerecommenders_tpu.ops.hstu_attention import (
    bucketize_timedelta,
)
from mygenerativerecommenders_tpu.ops.sequence import (
    get_current_embeddings,
    scatter_at_lengths,
)
from mygenerativerecommenders_tpu.ops.topk import masked_mips_scores, mips_top_k
from mygenerativerecommenders_tpu.utils.features import SequenceBatch


class DecodeCache(NamedTuple):
    k: jax.Array  # [num_blocks, B, N, H*Dqk]
    v: jax.Array  # [num_blocks, B, N, H*Dv]
    lengths: jax.Array  # [B]
    timestamps: jax.Array  # [B, N]


def _block_params(params, i: int) -> Dict:
    return params["params"]["encoder"][f"block_{i}"]


def _ln(x, eps=1e-6):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def prefill(
    model: GenerativeRecommender, params, seq: SequenceBatch
) -> Tuple[jax.Array, DecodeCache]:
    """Full forward + cache build. Returns (encoded [B,N,D'], cache)."""
    m = model.cfg
    d = m.item_embedding_dim
    h, dqk, dv = m.encoder.num_heads, m.encoder.attention_dim, m.encoder.linear_dim
    if m.encoder.attention_dim == 0:
        dqk = dv = d

    encoded, lengths = model.apply(params, seq, deterministic=True)

    # rebuild per-block K/V from the deterministic forward internals
    emb = model.apply(params, seq.past_ids, method=model.item_embeddings)
    seq2 = seq._replace(past_embeddings=emb)
    _, user_embeddings, valid_mask, _, payloads = model.apply(
        params,
        seq2.past_lengths,
        seq2.past_ids,
        emb,
        seq2.past_payloads,
        deterministic=True,
        method=lambda mdl, *a, **kw: mdl.preprocessor(*a, **kw),
    )
    x = user_embeddings * valid_mask
    ks, vs = [], []
    num_blocks = m.encoder.num_blocks
    b, n, _ = x.shape
    ts = payloads["timestamps"]
    ext = jnp.concatenate([ts, ts[:, -1:]], axis=1)
    tril = jnp.tril(jnp.ones((n, n)))
    for i in range(num_blocks):
        blk = _block_params(params, i)
        x = x * valid_mask
        proj = jax.nn.silu(_ln(x) @ blk["uvqk"])
        u, v, q, k = jnp.split(proj, [dv * h, 2 * dv * h, 2 * dv * h + dqk * h], -1)
        ks.append(k)
        vs.append(v)
        pos_w, ts_w = blk["rel_bias_pos_w"], blk["rel_bias_ts_w"]
        i_idx = jnp.arange(n)[:, None]
        j_idx = jnp.arange(n)[None, :]
        bias = pos_w[(j_idx - i_idx) + (n - 1)][None]
        delta = ext[:, 1:, None] - ext[:, None, :-1]
        bias = bias + ts_w[bucketize_timedelta(delta, 128)]  # [B, N, N]
        # per-head attention (bias shared across heads, hstu.py:191-192)
        qh = q.reshape(b, n, h, dqk)
        kh = k.reshape(b, n, h, dqk)
        vh = v.reshape(b, n, h, dv)
        logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) + bias[:, None]
        attn = jax.nn.silu(logits) / n * tril[None, None]
        av = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(b, n, h * dv)
        x = (u * _ln(av)) @ blk["o"]["kernel"] + blk["o"]["bias"] + x

    cache = DecodeCache(
        k=jnp.stack(ks), v=jnp.stack(vs),
        lengths=seq.past_lengths, timestamps=ts,
    )
    return encoded, cache


def decode_step(
    model: GenerativeRecommender,
    params,
    cache: DecodeCache,
    new_ids: jax.Array,  # [B] item id appended at position `lengths`
    new_timestamps: jax.Array,  # [B]
) -> Tuple[jax.Array, DecodeCache]:
    """Append one token; returns (its postprocessed embedding [B, D'], cache')."""
    m = model.cfg
    d = m.item_embedding_dim
    h = m.encoder.num_heads
    dqk = m.encoder.attention_dim or d
    dv = m.encoder.linear_dim or d
    num_blocks, b, n, _ = cache.k.shape
    p = cache.lengths  # [B] position of the new token

    ts = scatter_at_lengths(cache.timestamps, p, new_timestamps)

    emb = model.apply(params, new_ids, method=model.item_embeddings)  # [B, D]
    pos_emb = params["params"]["preprocessor"]["pos_emb"]
    x = emb * (d**0.5) + jnp.take(pos_emb, jnp.clip(p, 0, n - 1), axis=0)

    # key positions and masks (keys <= p are live)
    j_idx = jnp.arange(n)[None, :]
    key_mask = j_idx <= p[:, None]  # [B, N]
    # the new row's "next" timestamp is unknown at decode time -> its own
    # (ext trick: ext[p+1] falls back to ts[p] at the boundary)
    delta = new_timestamps[:, None] - ts  # [B, N]
    new_k = cache.k
    new_v = cache.v

    for i in range(num_blocks):
        blk = _block_params(params, i)
        proj = jax.nn.silu(_ln(x) @ blk["uvqk"])  # [B, 2hdv+2hdqk]
        u, v_new, q_new, k_new = jnp.split(
            proj, [dv * h, 2 * dv * h, 2 * dv * h + dqk * h], -1
        )
        k_cache = new_k[i]
        v_cache = new_v[i]
        # write the new position into the caches
        onehot = (j_idx == p[:, None]).astype(k_cache.dtype)[..., None]
        k_cache = k_cache * (1 - onehot) + onehot * k_new[:, None, :]
        v_cache = v_cache * (1 - onehot) + onehot * v_new[:, None, :]
        new_k = new_k.at[i].set(k_cache)
        new_v = new_v.at[i].set(v_cache)

        pos_w, ts_w = blk["rel_bias_pos_w"], blk["rel_bias_ts_w"]
        rel = jnp.clip((j_idx - p[:, None]) + (n - 1), 0, 2 * n - 2)
        bias = jnp.take(pos_w, rel) + jnp.take(
            ts_w, bucketize_timedelta(delta, 128)
        )  # [B, N]
        # per-head attention row (bias shared across heads)
        qh = q_new.reshape(b, h, dqk)
        kh = k_cache.reshape(b, n, h, dqk)
        vh = v_cache.reshape(b, n, h, dv)
        logits = jnp.einsum("bhd,bnhd->bhn", qh, kh) + bias[:, None, :]
        attn = jax.nn.silu(logits) / n
        attn = jnp.where(key_mask[:, None, :], attn, 0.0)
        av = jnp.einsum("bhn,bnhd->bhd", attn, vh).reshape(b, h * dv)
        x = (u * _ln(av)) @ blk["o"]["kernel"] + blk["o"]["bias"] + x

    out = model.apply(
        params, x[:, None, :], method=lambda mdl, y: mdl.postprocessor(y)
    )
    cache = DecodeCache(k=new_k, v=new_v, lengths=p + 1, timestamps=ts)
    return out[:, 0, :], cache


def greedy_generate(
    model: GenerativeRecommender,
    params,
    seq: SequenceBatch,
    candidates: jax.Array,  # [X, D] normalized catalog embeddings
    candidate_ids: jax.Array,  # [X]
    steps: int,
    max_item_id: int,
) -> jax.Array:
    """Autoregressive greedy next-item generation. Returns [B, steps] ids."""
    encoded, cache = prefill(model, params, seq)
    query = get_current_embeddings(cache.lengths, encoded)
    generated = []
    invalid = seq.past_ids
    for _ in range(steps):
        top_ids, _ = mips_top_k(
            query, candidates, candidate_ids, k=1,
            invalid_ids=invalid, max_item_id=max_item_id,
        )
        next_ids = top_ids[:, 0]
        generated.append(next_ids)
        invalid = scatter_at_lengths(invalid, cache.lengths, next_ids)
        next_ts = jnp.take_along_axis(
            cache.timestamps, jnp.clip(cache.lengths - 1, 0, None)[:, None], axis=1
        )[:, 0]
        query, cache = decode_step(model, params, cache, next_ids, next_ts)
    return jnp.stack(generated, axis=1)


def _last_timestamps(cache: DecodeCache) -> jax.Array:
    return jnp.take_along_axis(
        cache.timestamps, jnp.clip(cache.lengths - 1, 0, None)[:, None], axis=1
    )[:, 0]


def sample_generate(
    model: GenerativeRecommender,
    params,
    seq: SequenceBatch,
    candidates: jax.Array,  # [X, D] normalized catalog embeddings
    candidate_ids: jax.Array,  # [X]
    steps: int,
    max_item_id: int,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Stochastic autoregressive generation. Returns [B, steps] ids.

    MIPS scores over the (history-filtered) catalog are treated as logits:
    optional top-k truncation, optional nucleus (top-p) truncation, then a
    categorical draw at `temperature`. temperature -> 0 recovers greedy.
    The serving-side counterpart of greedy_generate; the reference exposes
    only deterministic top-k retrieval (models/retrieval.py:248-275).
    """
    encoded, cache = prefill(model, params, seq)
    query = get_current_embeddings(cache.lengths, encoded)
    generated = []
    invalid = seq.past_ids
    x = candidates.shape[0]
    for step in range(steps):
        scores = masked_mips_scores(
            query, candidates, candidate_ids,
            invalid_ids=invalid, max_item_id=max_item_id,
        )  # [B, X]; invalid at -1e30
        logits = scores / max(temperature, 1e-6)
        if top_k and top_k < x:
            kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if top_p and 0.0 < top_p < 1.0:
            sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # smallest prefix with mass >= top_p stays (shifted keep mask)
            keep = jnp.concatenate(
                [jnp.ones_like(cum[:, :1], bool), cum[:, :-1] < top_p], axis=-1
            )
            cutoff = jnp.min(
                jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
            )
            logits = jnp.where(logits < cutoff, -jnp.inf, logits)
        rng, sub = jax.random.split(rng)
        idx = jax.random.categorical(sub, logits, axis=-1)  # [B]
        next_ids = jnp.take(candidate_ids, idx)
        generated.append(next_ids)
        invalid = scatter_at_lengths(invalid, cache.lengths, next_ids)
        query, cache = decode_step(
            model, params, cache, next_ids, _last_timestamps(cache)
        )
    return jnp.stack(generated, axis=1)


def beam_generate(
    model: GenerativeRecommender,
    params,
    seq: SequenceBatch,
    candidates: jax.Array,  # [X, D] normalized catalog embeddings
    candidate_ids: jax.Array,  # [X]
    steps: int,
    max_item_id: int,
    num_beams: int,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search over item sequences. Returns (ids [B, steps], score [B]).

    Beam score = sum of per-step log-softmax over the filtered catalog.
    With num_beams=1 this reduces to greedy_generate (log-softmax is a
    monotone transform of the scores greedy argmaxes over).
    """
    b = seq.past_lengths.shape[0]
    w = num_beams
    x = candidates.shape[0]
    encoded, cache = prefill(model, params, seq)
    query = get_current_embeddings(cache.lengths, encoded)  # [B, D]

    # ---- step 0: expand the single context into W beams
    scores0 = masked_mips_scores(
        query, candidates, candidate_ids,
        invalid_ids=seq.past_ids, max_item_id=max_item_id,
    )
    logp0 = jax.nn.log_softmax(scores0, axis=-1)
    beam_logp, first_idx = jax.lax.top_k(logp0, w)  # [B, W]
    first_ids = jnp.take(candidate_ids, first_idx)  # [B, W]

    def tile(a: jax.Array, axis: int) -> jax.Array:
        """[.., B, ..] -> [.., B*W, ..] repeating each row W times."""
        return jnp.repeat(a, w, axis=axis)

    cache = DecodeCache(
        k=tile(cache.k, 1), v=tile(cache.v, 1),
        lengths=tile(cache.lengths, 0), timestamps=tile(cache.timestamps, 0),
    )
    invalid = tile(seq.past_ids, 0)  # [B*W, N]
    flat_first = first_ids.reshape(-1)  # [B*W]
    invalid = scatter_at_lengths(invalid, cache.lengths, flat_first)
    generated = flat_first[:, None]  # [B*W, 1]
    query, cache = decode_step(
        model, params, cache, flat_first, _last_timestamps(cache)
    )

    rows = jnp.arange(b, dtype=jnp.int32)[:, None]  # [B, 1]
    for _ in range(1, steps):
        scores = masked_mips_scores(
            query, candidates, candidate_ids,
            invalid_ids=invalid, max_item_id=max_item_id,
        )  # [B*W, X]
        logp = jax.nn.log_softmax(scores, axis=-1)
        total = beam_logp.reshape(-1, 1) + logp  # [B*W, X]
        total = total.reshape(b, w * x)
        beam_logp, flat_idx = jax.lax.top_k(total, w)  # [B, W]
        parent = flat_idx // x  # [B, W] beam index within row
        item_idx = flat_idx % x
        next_ids = jnp.take(candidate_ids, item_idx)  # [B, W]

        # reorder all per-beam state by the surviving beams' parents
        sel = (rows * w + parent).reshape(-1)  # [B*W] flat parent rows
        cache = DecodeCache(
            k=jnp.take(cache.k, sel, axis=1),
            v=jnp.take(cache.v, sel, axis=1),
            lengths=jnp.take(cache.lengths, sel, axis=0),
            timestamps=jnp.take(cache.timestamps, sel, axis=0),
        )
        invalid = jnp.take(invalid, sel, axis=0)
        generated = jnp.take(generated, sel, axis=0)

        flat_next = next_ids.reshape(-1)
        invalid = scatter_at_lengths(invalid, cache.lengths, flat_next)
        generated = jnp.concatenate([generated, flat_next[:, None]], axis=1)
        query, cache = decode_step(
            model, params, cache, flat_next, _last_timestamps(cache)
        )

    # best beam is index 0 (top_k sorts descending)
    out = generated.reshape(b, w, -1)[:, 0, :]
    return out, beam_logp[:, 0]
