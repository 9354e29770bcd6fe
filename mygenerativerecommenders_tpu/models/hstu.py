"""HSTU sequential encoder, TPU-first (reference: sequential_encoders/hstu.py).

Design notes vs the reference:

- The reference runs each block on a jagged [sum(N_i), D] tensor and
  round-trips q/k/v through jagged<->padded conversions per block
  (hstu.py:179-204). On TPU everything stays dense [B, N, D] with static
  N; jagged parity is preserved by zeroing invalid positions between
  blocks. That reproduces the jagged math exactly:
    * q/k/v/u at invalid positions are silu(LN(0) @ W) = 0 (the uvqk
      projection has no bias),
    * so attention receives zero contributions from padded keys exactly as
      in the jagged path (where padded rows don't exist and padded `v`
      rows are zero after jagged_to_padded_dense),
    * the residual+output-bias drift that a naive dense stack would
      accumulate at padded positions (the `_o` Linear has a bias) is
      removed by the inter-block re-masking.
- Each block owns its OWN relative-attention-bias tables, as in the
  reference (hstu.py:565-589 constructs one bias module per block).
- The rel time+pos bias (RelativeBucketedTimeAndPositionBasedBias,
  hstu.py:71-128) is computed as direct gathers (see ops/hstu_attention);
  with use_pallas=True the bias generation is fused into the attention
  kernel and the [B, N, N] bias tensor is never materialized in HBM.
- `normalization="rel_bias"` is the HSTU pointwise silu path
  (hstu.py:134-205); `"softmax_rel_bias"` matches the alternative softmax
  path (hstu.py:341-389).
- Parameter init matches: uvqk ~ N(0, 0.02) (hstu.py:237-246), output
  projection Xavier-uniform with zero bias (hstu.py:251-255), bias tables
  ~ N(0, 0.02) (hstu.py:85-90).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mygenerativerecommenders_tpu.ops.hstu_attention import (
    hstu_attention_reference,
    relative_position_bias,
    relative_time_bias,
)

TIMESTAMPS_KEY = "timestamps"
# packed-row segment ids payload ([B, N] int32, -1 at padding): several
# independent sequences laid end-to-end per row; attention goes
# block-diagonal (see ops/hstu_attention.py seg_ids)
SEGMENT_IDS_KEY = "seg_ids"


def _normal_init(std: float):
    return jax.nn.initializers.normal(stddev=std)


class HSTUBlock(nn.Module):
    """Sequential Transduction Unit (hstu.py:208-423), dense masked form.

    LN -> fused uvqk matmul -> silu -> split(u,v,q,k) -> pointwise
    silu-attention with rel bias -> u * LN(attn) -> output linear ->
    dropout -> +residual.
    """

    embedding_dim: int
    linear_dim: int
    attention_dim: int
    num_heads: int
    max_attn_len: int  # static N used for the 1/n normalizer and bias tables
    dropout_rate: float = 0.0
    normalization: str = "rel_bias"  # or "softmax_rel_bias"
    linear_activation: str = "silu"  # or "none"
    enable_relative_attention_bias: bool = True
    relative_bias_type: str = "time_position"  # or "position"
    num_time_buckets: int = 128
    concat_ua: bool = False
    eps: float = 1e-6
    use_pallas: bool = False
    # >1: ring (sequence-parallel) attention over the ambient mesh's
    # sp_mesh_axes[1] axis; sp_mesh_axes[0] (or None) is the batch axis.
    # Requires the time_position bias. With use_pallas, the per-chunk
    # product routes through the fused offset-tile chunk kernel
    # (ops/pallas/hstu_chunk.py). See parallel/ring_attention.py.
    sp_shards: int = 1
    sp_mesh_axes: tuple = ("data", "sp")
    # zigzag (load-balanced) sequence layout for the ring: device p holds
    # the chunk pair (p, 2P-1-p), halving per-step causal attention work.
    sp_zigzag: bool = False
    # >1: shard attention HEADS over the "model" mesh axis inside the
    # ring shard_map (Megatron TP composed with SP) — each device runs
    # the ring on num_heads/tp_shards local heads.
    tp_shards: int = 1

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, N, D], zero at invalid positions
        timestamps: Optional[jax.Array],  # [B, N] or None
        lengths: Optional[jax.Array] = None,  # [B] valid row counts
        seg_pos: Optional[jax.Array] = None,  # [B, N] packed within-seg positions
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        h, dv, dqk = self.num_heads, self.linear_dim, self.attention_dim
        b, n, d = x.shape
        n_total = self.max_attn_len

        normed_x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=self.eps)(x)
        uvqk_w = self.param("uvqk", _normal_init(0.02), (d, 2 * dv * h + 2 * dqk * h))
        proj = normed_x @ uvqk_w
        if self.linear_activation == "silu":
            proj = jax.nn.silu(proj)
        elif self.linear_activation != "none":
            raise ValueError(f"Unknown linear_activation {self.linear_activation}")
        u, v, q, k = jnp.split(proj, [dv * h, 2 * dv * h, 2 * dv * h + dqk * h], axis=-1)

        # per-block bias tables (hstu.py:565-589: one bias module per block)
        pos_w = ts_w = None
        if self.enable_relative_attention_bias:
            pos_w = self.param(
                "rel_bias_pos_w", _normal_init(0.02), (2 * n_total - 1,)
            )
            if self.relative_bias_type == "time_position" and timestamps is not None:
                ts_w = self.param(
                    "rel_bias_ts_w", _normal_init(0.02), (self.num_time_buckets + 1,)
                )

        def materialize_bias() -> Optional[jax.Array]:
            if pos_w is None:
                return None
            bias = relative_position_bias(pos_w, n, n_total)[None, :, :]
            if ts_w is not None:
                bias = bias + relative_time_bias(ts_w, timestamps, self.num_time_buckets)
            return bias

        qh = q.reshape(b, n, h, dqk)
        kh = k.reshape(b, n, h, dqk)
        vh = v.reshape(b, n, h, dv)

        if self.normalization in ("rel_bias", "hstu_rel_bias"):
            if self.sp_shards > 1:
                if ts_w is None:
                    raise ValueError(
                        "sp_shards > 1 requires relative_bias_type="
                        "'time_position' (ring attention generates the "
                        "time bias per chunk)"
                    )
                if seg_pos is not None:
                    raise ValueError(
                        "packed rows are not supported with ring attention "
                        "(sp_shards > 1) — packing already removes the "
                        "padding the ring would shard"
                    )
                attn = self._ring_attention(qh, kh, vh, timestamps, pos_w, ts_w)
            elif self.use_pallas and ts_w is not None:
                from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
                    hstu_attention_fused,
                )

                # lengths enable jagged tile skipping in the kernel: query
                # and key tiles beyond each sequence's valid rows are never
                # computed (exact — see hstu_attention_fused docstring);
                # seg_ids make the attention block-diagonal for PACKED rows
                attn = hstu_attention_fused(
                    qh, kh, vh, timestamps, pos_w, ts_w,
                    max_len=n_total, num_buckets=self.num_time_buckets,
                    lengths=lengths, seg_positions=seg_pos,
                )
            else:
                # segments are contiguous, so segment start (row index -
                # within-segment position) is a unique per-segment id
                seg_equiv = (
                    jnp.arange(n, dtype=jnp.int32)[None, :] - seg_pos
                    if seg_pos is not None else None
                )
                attn = hstu_attention_reference(
                    qh, kh, vh, materialize_bias(), max_len=n_total, causal=True,
                    seg_ids=seg_equiv,
                )
            attn_out = attn.reshape(b, n, h * dv)
        elif self.normalization == "softmax_rel_bias":
            if seg_pos is not None:
                raise ValueError(
                    "packed rows (seg_ids) are not supported with "
                    "normalization='softmax_rel_bias'"
                )
            # softmax path (hstu.py:341-389): single-head layout, softmax over
            # scaled logits, causal mask applied after softmax.
            bias = materialize_bias()
            logits = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
            if bias is not None:
                logits = logits + bias.astype(logits.dtype)
            probs = jax.nn.softmax(logits / math.sqrt(dqk), axis=-1)
            causal_mask = jnp.tril(jnp.ones((n, n), dtype=jnp.bool_))
            probs = jnp.where(causal_mask[None, :, :], probs, 0.0)
            attn_out = jnp.einsum(
                "bnm,bmd->bnd", probs, v.astype(probs.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            raise ValueError(f"Unknown normalization {self.normalization}")

        a = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=self.eps)(attn_out)
        if self.concat_ua:
            o_input = jnp.concatenate([u, a, u * a], axis=-1)
        else:
            o_input = u * a
        o_input = nn.Dropout(rate=self.dropout_rate)(o_input, deterministic=deterministic)
        out = nn.Dense(
            features=self.embedding_dim,
            kernel_init=jax.nn.initializers.xavier_uniform(),
            bias_init=jax.nn.initializers.zeros,
            name="o",
        )(o_input)
        return out + x

    def _ring_attention(self, qh, kh, vh, timestamps, pos_w, ts_w):
        """Sequence-parallel attention: shard N over the sp mesh axis and
        ring-rotate K/V (exact — HSTU attention is a plain sum over keys).

        N is padded up to a multiple of sp_shards; padded keys contribute
        nothing (their v rows are zero) and padded query rows are sliced
        off. Timestamps pad by repeating the last column, so the last real
        row's "next-item" timestamp matches the dense ext[n+1] trick
        (reference hstu.py:112-123) exactly.
        """
        import functools

        from jax.sharding import PartitionSpec as P

        from mygenerativerecommenders_tpu.parallel import ring_attention as ra

        n = qh.shape[1]
        sp = self.sp_shards
        chunks = 2 * sp if self.sp_zigzag else sp
        n_pad = ((n + chunks - 1) // chunks) * chunks
        pad = n_pad - n
        if pad:
            widths = ((0, 0), (0, pad), (0, 0), (0, 0))
            qh = jnp.pad(qh, widths)
            kh = jnp.pad(kh, widths)
            vh = jnp.pad(vh, widths)
            timestamps = jnp.pad(timestamps, ((0, 0), (0, pad)), mode="edge")
        dp, sp_name = self.sp_mesh_axes
        # TP x SP: with tp_shards > 1 the head axis is sharded over the
        # "model" mesh axis, so each device's ring body sees
        # num_heads / tp_shards local heads (attention is per-head, the
        # body is unchanged). GSPMD inserts the reshard from the
        # column-sharded uvqk layout at shard_map entry.
        head_axis = "model" if self.tp_shards > 1 else None
        if self.tp_shards > 1 and self.num_heads % self.tp_shards:
            raise ValueError(
                f"num_heads {self.num_heads} must divide by tp_shards "
                f"{self.tp_shards} for head-sharded ring attention"
            )
        seq = P(dp, sp_name, head_axis, None)
        local = (
            ra.ring_hstu_attention_zigzag_local if self.sp_zigzag
            else ra.ring_hstu_attention_local
        )
        fn = jax.shard_map(  # mesh=None: the trainer-set ambient mesh
            functools.partial(
                local,
                # 1/n normalizer and pos-table center use the UNPADDED n
                # (= max_attn_len in every real configuration)
                max_len=self.max_attn_len,
                num_buckets=self.num_time_buckets,
                axis_name=sp_name,
                use_pallas=self.use_pallas,
            ),
            in_specs=(seq, seq, seq, P(dp, sp_name), P(), P()),
            out_specs=seq,
            check_vma=False,
        )
        if self.sp_zigzag:
            # contiguous -> zigzag -> (ring) -> contiguous; numpy perms
            # (device-array closure constants stall remote lowering)
            perm = ra.zigzag_order(sp, n_pad)
            inv = ra.inverse_permutation(perm)
            zz = lambda x: jnp.take(x, perm, axis=1)
            out = fn(zz(qh), zz(kh), zz(vh), zz(timestamps), pos_w, ts_w)
            return jnp.take(out, inv, axis=1)[:, :n]
        return fn(qh, kh, vh, timestamps, pos_w, ts_w)[:, :n]


class HSTU(nn.Module):
    """Stack of HSTU blocks over a dense masked batch (hstu.py:521-672).

    Input user_embeddings must already be zero at invalid positions (the
    preprocessor guarantees this); the stack re-applies the zero-mask
    between blocks to maintain jagged parity (see module docstring).
    Output is [B, N, D], zero at invalid positions.
    """

    max_sequence_len: int
    max_output_len: int
    embedding_dim: int
    num_blocks: int
    num_heads: int
    linear_dim: int
    attention_dim: int
    normalization: str = "rel_bias"
    linear_activation: str = "silu"
    linear_dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0
    enable_relative_attention_bias: bool = True
    relative_bias_type: str = "time_position"  # or "position"
    num_time_buckets: int = 128
    concat_ua: bool = False
    use_pallas: bool = False
    sp_shards: int = 1
    sp_mesh_axes: tuple = ("data", "sp")
    # zigzag (load-balanced) sequence layout for the ring: device p holds
    # the chunk pair (p, 2P-1-p), halving per-step causal attention work.
    sp_zigzag: bool = False
    # shard heads over "model" inside the ring shard_map (TP x SP)
    tp_shards: int = 1
    # rematerialize each block under jax.checkpoint (see EncoderConfig.remat)
    remat: bool = False

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
        del past_lengths
        n_total = self.max_sequence_len + self.max_output_len
        x = user_embeddings
        timestamps = past_payloads.get(TIMESTAMPS_KEY)
        # packed marker: seg_ids payload present -> positions drive the
        # block-diagonal mask + tile skipping
        seg_pos = (
            past_payloads.get("positions")
            if past_payloads.get(SEGMENT_IDS_KEY) is not None else None
        )

        mask = valid_mask.astype(x.dtype)
        # per-sequence valid row count for the jagged kernel's tile
        # skipping: last valid position + 1 (robust to any mask pattern,
        # not just prefix masks). Derived from valid_mask rather than
        # past_lengths because preprocessors change the row count (aux
        # token prepend, item+rating interleaving).
        n = x.shape[1]
        kernel_lengths = jnp.max(
            valid_mask[:, :, 0].astype(jnp.int32) * (jnp.arange(n, dtype=jnp.int32) + 1),
            axis=1,
        )

        # On the fused-kernel path, pad the residual stream to the
        # kernels' 128-row tile ONCE for the whole stack instead of
        # letting every block's wrapper pad its q/k/v/g and slice its
        # output (the r5 long-N trace showed ~2.4 ms/step of those
        # per-block pad/slice copies at 8 blocks). Padded rows stay
        # exactly zero through LN/uvqk (no bias) and are re-masked
        # between blocks like any invalid row; the kernels already ran
        # at this padded width internally, so the math is bit-identical.
        pad_stream = (
            self.use_pallas
            and self.sp_shards == 1
            and self.normalization in ("rel_bias", "hstu_rel_bias")
            and self.enable_relative_attention_bias
            and self.relative_bias_type == "time_position"
            and timestamps is not None
            and n % 128 != 0
        )
        if pad_stream:
            npad = (-n) % 128
            x = jnp.pad(x, ((0, 0), (0, npad), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, npad), (0, 0)))
            timestamps = jnp.pad(timestamps, ((0, 0), (0, npad)))
            if seg_pos is not None:
                seg_pos = jnp.pad(seg_pos, ((0, 0), (0, npad)))

        def apply_block(block: HSTUBlock, bx: jax.Array, bts, blens, bseg) -> jax.Array:
            return block(bx, bts, blens, bseg, deterministic=deterministic)

        if self.remat:
            # drop each block's residuals (incl. the training-fwd kernel's
            # [B*H, N, N] saved z) and recompute the block forward inside
            # its backward — O(num_blocks * N^2) activation memory becomes
            # O(N^2)
            apply_block = nn.remat(apply_block)

        for i in range(self.num_blocks):
            x = x * mask  # jagged parity: padded rows stay exactly zero
            block = HSTUBlock(
                embedding_dim=self.embedding_dim,
                linear_dim=self.linear_dim,
                attention_dim=self.attention_dim,
                num_heads=self.num_heads,
                max_attn_len=n_total,
                dropout_rate=self.linear_dropout_rate,
                normalization=self.normalization,
                linear_activation=self.linear_activation,
                enable_relative_attention_bias=self.enable_relative_attention_bias,
                relative_bias_type=self.relative_bias_type,
                num_time_buckets=self.num_time_buckets,
                concat_ua=self.concat_ua,
                use_pallas=self.use_pallas,
                sp_shards=self.sp_shards,
                sp_mesh_axes=self.sp_mesh_axes,
                sp_zigzag=self.sp_zigzag,
                tp_shards=self.tp_shards,
                name=f"block_{i}",
            )
            x = apply_block(block, x, timestamps, kernel_lengths, seg_pos)
        x = x * mask
        return x[:, :n] if pad_stream else x
