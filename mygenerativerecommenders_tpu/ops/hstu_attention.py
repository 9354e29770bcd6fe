"""HSTU pointwise attention — functional op with jnp reference implementation.

HSTU attention (arXiv:2402.17152) is deliberately *not* softmax attention:

    attn[b, h, n, m] = silu(q[b,n,h,:] . k[b,m,h,:] + bias[b,n,m]) / N
    out[b, n, h, :]  = sum_m attn[b,h,n,m] * causal[n,m] * v[b,m,h,:]

where N is the (static) max sequence length and `causal` is a lower-
triangular-inclusive mask. Semantics match the reference's
`_hstu_attention_maybe_from_cache` (sequential_encoders/hstu.py:134-205):
the silu'd logits are divided by the *max* length (a constant), the causal
mask multiplies *after* the silu, and padded key positions contribute
nothing because their `v` rows are exactly zero (jagged parity — see
models/hstu.py).

The relative time+position bias matches
`RelativeBucketedTimeAndPositionBasedBias` (hstu.py:71-128):
  pos term:  pos_w[(m - n) + N - 1]
  time term: ts_w[clip(floor(log(max(|ts[n+1] - ts[m]|, 1)) / 0.301), 0, num_buckets)]
(ts[n+1] uses timestamps extended by repeating the last column, giving the
"next-item" timestamp for each query position.)

This file is the jnp reference path; `ops/pallas/hstu_attention.py`
provides the fused TPU kernel (selected by the encoder's `use_pallas`
flag in models/hstu.py, which calls `hstu_attention_fused` directly —
the fused kernel generates the bias in-kernel, so it has a different
signature than the precomputed-bias reference below).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bucketize_timedelta(delta: jax.Array, num_buckets: int) -> jax.Array:
    """log-bucketize a timestamp delta: floor(ln(max(|d|,1)) / 0.301), clipped.

    Matches the reference bucketization_fn (hstu.py:579-581) including the
    clamp to [0, num_buckets].
    """
    x = jnp.log(jnp.maximum(jnp.abs(delta).astype(jnp.float32), 1.0)) / 0.301
    return jnp.clip(x.astype(jnp.int32), 0, num_buckets)


def relative_position_bias(
    pos_w: jax.Array, n: int, max_len: int | None = None
) -> jax.Array:
    """[2*max_len-1] table -> [N, N] bias, bias[i, j] = pos_w[j - i + max_len - 1].

    Matches the pad/repeat/reshape trick in RelativePositionalBias.forward
    (hstu.py:59-68) — verified numerically against it. `max_len` is the
    static table center (defaults to n); under length-bucketed batching
    n < max_len and only the central [N, N] window of the table is read.
    """
    if max_len is None:
        max_len = n
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    return pos_w[(j - i) + (max_len - 1)]


def relative_time_bias(
    ts_w: jax.Array, timestamps: jax.Array, num_buckets: int
) -> jax.Array:
    """Bucketed next-item timestamp-delta bias, [B, N] -> [B, N, N].

    bias[b, n, m] = ts_w[bucket(ext_ts[b, n+1] - ts[b, m])] with ext_ts the
    timestamps extended by repeating the last column (hstu.py:112-123).
    Gradients do not flow into the bucket indices (they are integers).
    """
    ext = jnp.concatenate([timestamps, timestamps[:, -1:]], axis=1)
    delta = ext[:, 1:, None] - ext[:, None, :-1]  # [B, N, N]
    return ts_w[bucketize_timedelta(delta, num_buckets)]


@functools.partial(jax.jit, static_argnames=("max_len", "causal"))
def hstu_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None,
    *,
    max_len: int,
    causal: bool = True,
    seg_ids: jax.Array | None = None,
) -> jax.Array:
    """Dense jnp HSTU attention.

    Args:
      q, k: [B, N, H, Dqk] float.
      v: [B, N, H, Dv] float.
      bias: optional [B, N, N] float, added to logits pre-activation.
      max_len: the static N used as the 1/n normalizer (reference divides
        by invalid_attn_mask.size(-1), hstu.py:193).
      causal: apply the lower-triangular-inclusive mask (hstu.py:595-607).
      seg_ids: optional [B, N] int32 segment ids for PACKED rows (several
        independent sequences laid end-to-end in one row, the TPU analog
        of the reference's [sum(N_i), D] jagged layout): attention is
        additionally masked to same-segment pairs, making it
        block-diagonal. Because segments are contiguous, the relative
        position (j - i) inside a segment equals the within-segment
        offset, so the positional bias needs no adjustment.

    Returns:
      [B, N, H, Dv] float.
    """
    n = q.shape[1]
    qk = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        qk = qk + bias[:, None, :, :].astype(qk.dtype)
    attn = jax.nn.silu(qk) / max_len
    if causal:
        causal_mask = jnp.tril(jnp.ones((n, n), dtype=jnp.bool_))
        attn = jnp.where(causal_mask[None, None, :, :], attn, 0.0)
    if seg_ids is not None:
        same_seg = seg_ids[:, :, None] == seg_ids[:, None, :]  # [B, N, N]
        attn = jnp.where(same_seg[:, None, :, :], attn, 0.0)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", attn, v.astype(attn.dtype), preferred_element_type=jnp.float32
    )
    return out.astype(v.dtype)
