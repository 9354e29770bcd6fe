"""Fused HSTU attention Pallas TPU kernel.

Replaces the reference's hot loop (_hstu_attention_maybe_from_cache,
sequential_encoders/hstu.py:134-205), which materializes a [B, N, N]
bias + attention tensor in HBM per block. This kernel streams K/V tiles
through VMEM flash-attention style and generates the relative time-bucket
bias on the fly from the raw timestamps + the [num_buckets+1] table, so
HBM traffic is O(B*N*D) instead of O(B*N^2):

  out[b,n,h,:] = sum_m  silu(q.k + pos_bias[n,m] + ts_w[bucket(dt)]) / N
                       * causal(n,m) * v[b,m,h,:]

- the position bias is batch-independent and block-Toeplitz (tile
  content depends only on kj - qi), so ONE [BQ, NP] stripe serves every
  tile via a lane slice — fetched once per pallas_call;
- the time-bucket gather ts_w[bucket] is computed in-kernel as Mosaic
  lane gathers (take_along_axis against a lane-broadcast table chunk,
  one gather + select per 128 table lanes) — ~2x faster per tile than
  the previous select-accumulate bucket sweep and independent of the
  tile's bucket range (the sweep degraded on wide timestamp spans);
- per-sequence `lengths` (scalar prefetch) bound the tile loops: query
  and key tiles beyond each sequence's valid rows are never computed —
  the jagged no-padding-waste property, exact by construction;
- the backward is a fully-fused Pallas kernel that RECOMPUTES z tiles
  flash-attention style (custom_vjp saves only the raw inputs — nothing
  [N, N]-shaped survives the forward), forming dq/dk/dv in-kernel and
  emitting only the head-summed dz for the bias-table gradients.

Tile sizes: BQ = BK = 128 (MXU-native), head dim padded to a multiple
of 128 lanes handled by XLA layout (we pad to >=8 sublane, 128 lane
alignment via the wrapper's zero-padding).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygenerativerecommenders_tpu.ops.hstu_attention import (
    bucketize_timedelta,
    hstu_attention_reference,
    relative_position_bias,
    relative_time_bias,
)


# query-tile rows per grid step (env knob MYGR_TPU_BQ_ROWS, multiple of
# 128). All tile-offset math below is written for bq = r * bk (r >= 1),
# but 128 is the measured optimum and the default: bq=256 at NP=256
# (ml-1m shapes) was neutral-to-worse on v5e (fwd 1.16 -> 1.18,
# fwd+bwd 1.72 -> 1.88 ms — the per-grid-step floor is DMA/bookkeeping
# latency that pipelines across steps, not per-step count), and padding
# NP to a 256 multiple grows the NP²-shaped bias-grad work (1035 -> 1280
# vs 1152; that program also hung the Mosaic compile >40 min at bq=256).
_BQ_ROWS = max(128, (int(os.environ.get("MYGR_TPU_BQ_ROWS", 128)) // 128) * 128)


def _pick_bq(np_total: int) -> int:
    """Widest configured query tile that divides the 128-rounded padded
    length — never grow NP beyond round_up(n, 128)."""
    return _BQ_ROWS if np_total % _BQ_ROWS == 0 else 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def _ts_bias_gather(bucket, tsw_ref, num_buckets):
    """ts_w[bucket] via Mosaic lane gathers: one take_along_axis against a
    lane-broadcast 128-wide table chunk (+ masking select) per chunk.
    Exact for any num_buckets; bucket must already be clipped to
    [0, num_buckets]."""
    bq, bk = bucket.shape
    out = jnp.zeros((bq, bk), dtype=jnp.float32)
    for c in range(0, num_buckets + 1, 128):
        width = min(128, num_buckets + 1 - c)
        if width == 1:
            out = jnp.where(bucket == c, tsw_ref[0, c], out)
            continue
        tab = jnp.broadcast_to(tsw_ref[0:1, c:c + 128], (bq, 128))
        local = jnp.clip(bucket - c, 0, 127)
        g = jnp.take_along_axis(tab, local, axis=1)
        sel = jnp.logical_and(bucket >= c, bucket < c + 128)
        out = jnp.where(sel, g, out)
    return out

def _kernel(
    len_ref,  # scalar prefetch: [B*H] int32 per-sequence valid length
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, NP, D]
    v_ref,  # [1, NP, DV]
    tsq_ref,  # [1, 1, NP]  next-item timestamps for query rows
    tsk_ref,  # [1, 1, NP]  timestamps for key cols
    *rest,  # [seg_ref [1, 1, NP] when has_seg,] posb_ref, tsw_ref, out_ref
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
    n_valid: int,
    has_seg: bool = False,
):
    if has_seg:
        seg_ref, posb_ref, tsw_ref, out_ref = rest
    else:
        seg_ref, (posb_ref, tsw_ref, out_ref) = None, rest
    qi = pl.program_id(2)
    np_total = k_ref.shape[1]
    seq_len = jnp.minimum(len_ref[pl.program_id(0)], n_valid)

    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)  # [BQ]
    if has_seg:
        # packed rows: seg_ref carries WITHIN-SEGMENT positions, so each
        # query row's segment start is row - position. That yields both
        # the block-diagonal mask (col >= seg_start, on top of causal)
        # and the live key-tile LOWER bound: key tiles before the
        # earliest segment start in this query tile are entirely
        # cross-segment and are never iterated — a packed row costs
        # sum(seg_i^2), not row_len^2. Positions are contiguous within a
        # segment, so the Toeplitz positional stripe stays valid as-is.
        pos_q = seg_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)  # [BQ]
        seg_start_q = qi * bq + jax.lax.iota(jnp.int32, bq) - pos_q

    acc = jnp.zeros((bq, v_ref.shape[2]), dtype=jnp.float32)

    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(kj, acc):
        k_tile = k_ref[0, pl.ds(kj * bk, bk), :].astype(jnp.float32)  # [BK, D]
        v_tile = v_ref[0, pl.ds(kj * bk, bk), :].astype(jnp.float32)  # [BK, DV]
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)  # [BK]

        s = jax.lax.dot_general(
            q, k_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]

        # bias: block-Toeplitz positional stripe slice (tile content
        # depends only on kj*bk - qi*bq) + in-kernel time-bucket lane
        # gather; K = (NP - bq)/bk shifts the most-negative offset to 0
        k_off = (np_total - bq) // bk
        bias = posb_ref[:, pl.ds((kj - qi * (bq // bk) + k_off) * bk, bk)].astype(
            jnp.float32
        )
        delta = tsq[:, None] - tsk[None, :]
        bucket = bucketize_timedelta(delta, num_buckets)  # [BQ, BK] int32
        bias = bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)

        a = jax.nn.silu(s + bias) * inv_n
        col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        causal = row_ids >= col_ids
        in_range = jnp.logical_and(col_ids < seq_len, row_ids < seq_len)
        live = jnp.logical_and(causal, in_range)
        if has_seg:
            # same segment <=> col within [seg_start, row] (causal above)
            live = jnp.logical_and(live, col_ids >= seg_start_q[:, None])
        a = jnp.where(live, a, 0.0)

        return acc + jax.lax.dot_general(
            a, v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # jagged + causal tile skipping: key blocks beyond the current query
    # block OR beyond this sequence's valid length contribute nothing;
    # query blocks fully past the length produce zero rows outright
    n_kj = jnp.minimum((qi + 1) * (bq // bk), (seq_len + bk - 1) // bk)
    n_kj = jnp.where(qi * bq < seq_len, n_kj, 0)
    kj_lo = 0
    if has_seg:
        # packed: key tiles before this query tile's earliest segment
        # start are entirely cross-segment — skip them
        kj_lo = jnp.maximum(jnp.min(seg_start_q), 0) // bk
        kj_lo = jnp.minimum(kj_lo, n_kj)
    acc = jax.lax.fori_loop(kj_lo, n_kj, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)




def hstu_attention_fused(
    q, k, v, timestamps, pos_w, ts_w, max_len, num_buckets, lengths=None,
    seg_positions=None,
):
    """Fused HSTU attention with on-the-fly relative time+position bias.

    Args:
      q, k: [B, N, H, Dqk]; v: [B, N, H, Dv] (invalid rows must be zero).
      timestamps: [B, N] int32.
      pos_w: [2*max_len - 1] positional table.
      ts_w: [num_buckets + 1] time-bucket table.
      max_len: static N (the 1/n normalizer; must equal N).
      num_buckets: time buckets (reference: 128).
      lengths: optional [B] int32 per-sequence valid row counts. When
        given, the kernels skip query/key tiles beyond each sequence's
        length (the jagged no-padding-waste property, reference
        hstu.py:439-480) and output rows >= length are exactly zero.
        Bit-exact for rows < length: the skipped tiles' contributions are
        exact zeros in the dense math (masked keys have v == 0).
      seg_positions: optional [B, N] int32 WITHIN-SEGMENT positions for
        PACKED rows (several independent sequences end-to-end per row;
        each segment's positions restart at 0). Attention is masked to
        same-segment pairs (block-diagonal, derived as col >= row -
        position) and the kernels' key-tile loops skip tiles before each
        query tile's earliest segment start — a packed row costs
        sum(seg_i^2) tiles, not row_len^2. Positions are contiguous
        within a segment, so the block-Toeplitz positional stripe is
        already correct per segment; the timestamp bias reads the
        per-token data. Compose with `lengths` = total packed tokens per
        row.

    Returns [B, N, H, Dv] float32.
    """
    if lengths is None:
        lengths = jnp.full((q.shape[0],), q.shape[1], dtype=jnp.int32)
    if seg_positions is not None:
        seg_positions = seg_positions.astype(jnp.int32)
    return _fused_len(
        q, k, v, timestamps, seg_positions, lengths.astype(jnp.int32),
        pos_w, ts_w, max_len, num_buckets,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_len(q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets):
    return _fused_fwd_impl(
        q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets
    )


def _fused_fwd_impl(q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets):
    b, n, h, dqk = q.shape
    dv = v.shape[-1]
    # n < max_len under length-bucketed batching: the 1/max_len normalizer
    # and the pos-table center stay at the full static length (the
    # reference normalizes by its constant mask buffer size, hstu.py:193)
    # packed rows may exceed max_len (their SEGMENTS are bounded by it):
    # pos-table offsets beyond +-(max_len-1) occur only on cross-segment
    # pairs, which the block-diagonal mask zeroes (clipped stripe values
    # never contribute)
    assert seg_pos is not None or n <= max_len, (
        f"sequence dim {n} > max_len {max_len}"
    )

    bk = 128  # lane-dim slices must be 128-aligned on TPU
    np_total = _round_up(n, bk)
    bq = _pick_bq(np_total)
    d_pad = _round_up(dqk, 128)
    dv_pad = _round_up(dv, 128)

    def pad_to(x, target, axis):
        pad = target - x.shape[axis]
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    # fold heads into batch; pad seq + feature dims to tile boundaries
    qf = pad_to(pad_to(q.transpose(0, 2, 1, 3).reshape(b * h, n, dqk), np_total, 1), d_pad, 2)
    kf = pad_to(pad_to(k.transpose(0, 2, 1, 3).reshape(b * h, n, dqk), np_total, 1), d_pad, 2)
    vf = pad_to(pad_to(v.transpose(0, 2, 1, 3).reshape(b * h, n, dv), np_total, 1), dv_pad, 2)

    ts = timestamps.astype(jnp.int32)
    ts_next = jnp.concatenate([ts[:, 1:], ts[:, -1:]], axis=1)  # ext[n+1]
    ts_next = pad_to(ts_next, np_total, 1)
    ts_key = pad_to(ts, np_total, 1)
    has_seg = seg_pos is not None
    if has_seg:
        seg = pad_to(seg_pos.astype(jnp.int32), np_total, 1)
    if h > 1:
        ts_next = jnp.repeat(ts_next, h, axis=0)
        ts_key = jnp.repeat(ts_key, h, axis=0)
        if has_seg:
            seg = jnp.repeat(seg, h, axis=0)
    # 3-D layout so the (sublane, lane) block dims can cover the full row
    ts_next = ts_next[:, None, :]
    ts_key = ts_key[:, None, :]

    pos_bias = _pos_toeplitz(pos_w, np_total, max_len, bq, bk)  # [BQ, NP]

    # lane-pad the table so the chunked lane gather's 128-wide slices
    # never run past the array (no-op at the reference's 129 entries,
    # where the final chunk is a single select)
    nb1 = ts_w.shape[0]
    ts_w_2d = jnp.pad(
        ts_w.reshape(1, -1).astype(jnp.float32),
        ((0, 0), (0, _round_up(nb1, 128) - nb1)),
    )

    n_q_blocks = np_total // bq
    grid = (b * h, 1, n_q_blocks)
    lens_bh = jnp.repeat(lengths, h) if h > 1 else lengths

    row_spec = pl.BlockSpec((1, 1, np_total), lambda bh, _, qi, lens: (bh, 0, 0))
    in_specs = [
        pl.BlockSpec((1, bq, d_pad), lambda bh, _, qi, lens: (bh, qi, 0)),
        pl.BlockSpec((1, np_total, d_pad), lambda bh, _, qi, lens: (bh, 0, 0)),
        pl.BlockSpec((1, np_total, dv_pad), lambda bh, _, qi, lens: (bh, 0, 0)),
        row_spec,
        row_spec,
    ]
    inputs = [lens_bh, qf, kf, vf, ts_next, ts_key]
    if has_seg:
        in_specs.append(row_spec)
        inputs.append(seg[:, None, :])
    in_specs.extend([
        pl.BlockSpec((bq, np_total), lambda bh, _, qi, lens: (0, 0)),
        pl.BlockSpec(
            (1, _round_up(num_buckets + 1, 128)),
            lambda bh, _, qi, lens: (0, 0),
        ),
    ])
    inputs.extend([pos_bias, ts_w_2d])

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            bq=bq,
            bk=bk,
            num_buckets=num_buckets,
            inv_n=1.0 / max_len,
            n_valid=n,
            has_seg=has_seg,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, bq, dv_pad), lambda bh, _, qi, lens: (bh, qi, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, np_total, dv_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * n * (dqk + dv),
            bytes_accessed=4 * b * h * n * (2 * dqk + 2 * dv),
            transcendentals=b * h * n * n * 2,
        ),
    )(*inputs)

    out = out[:, :n, :dv].reshape(b, h, n, dv).transpose(0, 2, 1, 3)
    return out


def _jnp_equivalent(q, k, v, timestamps, pos_w, ts_w, max_len, num_buckets):
    bias = relative_position_bias(pos_w, q.shape[1])[None, :, :]
    bias = bias + relative_time_bias(ts_w, timestamps, num_buckets)
    return hstu_attention_reference(q, k, v, bias, max_len=max_len, causal=True)


# --------------------------------------------------------------------------
# Fully-fused backward with in-kernel z RECOMPUTE (flash-attention style):
# the training forward is the plain inference kernel (no residual writes);
# the backward regenerates z = q.k^T + pos_bias + ts_bias per live tile
# from the raw inputs and contracts on the spot:
#
#   sig = sigmoid(z)
#   p  = z * sig * (1/N) * mask                      (the fwd attention)
#   dp = g @ v^T
#   dz = dp * (sig + z*sig*(1-sig)) * (1/N) * mask   (silu' chain)
#   dq = dz @ k ; dk = dz^T @ q ; dv = p^T @ g       (in-kernel)
#   d_pos_w[(m-n)+N-1] += sum_b dz ; d_ts_w[bucket(dt)] += dz
#
# vs the previous saved-z design this removes the [B*H, NP, NP] f32 z
# residual entirely — 1.4 GB of HBM at ml-20m-long shapes (which forced
# encoder.remat at B=128) plus its write+read traffic, at the cost of one
# extra dot + the bias generation per LIVE tile. Dead tiles (beyond the
# causal frontier or the sequence length) skip all five dots via
# lax.cond. The only [B, N, N]-shaped HBM output is the HEAD-SUMMED dz
# (what the bias-table gradients consume — buckets/offsets are
# head-independent). Grid is (b, qi, h) with h INNERMOST so the dzh
# output block (index (b, qi), constant across h) accumulates across
# consecutive steps in VMEM; dk/dv accumulate across qi in per-b resident
# [H, NP, D] output blocks (index (b,), written once per b).
# --------------------------------------------------------------------------


def _bwd_fused_kernel(
    len_ref,  # scalar prefetch: [B] int32 per-sequence valid length
    k_ref,  # [1, H, NP, D]   resident per b
    v_ref,  # [1, H, NP, DV]  resident per b
    q_ref,  # [1, BQ, D]      (b*H+h, qi)
    g_ref,  # [1, BQ, DV]     cotangent tile (b*H+h, qi)
    tsq_ref,  # [1, 1, NP] next-item timestamps (per b)
    tsk_ref,  # [1, 1, NP] key timestamps (per b)
    *rest,  # [seg_ref [1, 1, NP] when has_seg,] posb_ref, tsw_ref, then
    # outputs: dq_ref [1, BQ, D], dk_ref [1, H, NP, D] (accumulated
    # across qi, resident per b), dv_ref [1, H, NP, DV],
    # dzh_ref [1, BQ, NP] (head-summed dz, accumulated across h)
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
    n_valid: int,
    has_seg: bool = False,
    dtw_in_kernel: bool = True,
):
    if has_seg:
        seg_ref, rest = rest[0], rest[1:]
    else:
        seg_ref = None
    posb_ref, tsw_ref, dq_ref, dk_ref, dv_ref = rest[:5]
    if dtw_in_kernel:
        # dzh is VMEM scratch; both bias-table grads leave as stripes
        dpw_ref, dtw_ref, dzh_ref = rest[5:]
    else:
        # short sequences: dzh leaves via HBM for the XLA d_ts_w einsum
        # (cheap at small NP^2; the in-kernel sweep's serialized scalar
        # reductions don't amortize there — measured 25.6k -> 18.8k
        # ex/s on packed ml-1m at NP=256)
        dzh_ref, dpw_ref = rest[5:]
        dtw_ref = None
    qi = pl.program_id(1)
    h = pl.program_id(2)
    np_total = k_ref.shape[2]
    k_off = (np_total - bq) // bk
    seq_len = jnp.minimum(len_ref[pl.program_id(0)], n_valid)

    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
    if has_seg:
        # seg_ref carries within-segment positions (see forward kernel)
        pos_q = seg_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
        seg_start_q = qi * bq + jax.lax.iota(jnp.int32, bq) - pos_q
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    d_dim, dv_dim = k_ref.shape[3], v_ref.shape[3]

    # the accumulated out blocks (dk/dv resident per b across (qi, h);
    # dzh resident per (b, qi) across h) are zeroed ONCE in VMEM, so the
    # k-loop below can run over the LIVE tile range only — dead tiles
    # (past the causal frontier or the sequence length) are never
    # iterated, matching the forward's jagged skipping. Previously every
    # (kj, qi, h) tile paid the accumulate-writes even when dead, which
    # made the backward's cost independent of sequence length.
    @pl.when(jnp.logical_and(qi == 0, h == 0))
    def _init_kv():
        dk_ref[0] = jnp.zeros(dk_ref.shape[1:], dk_ref.dtype)
        dv_ref[0] = jnp.zeros(dv_ref.shape[1:], dv_ref.dtype)

    @pl.when(h == 0)
    def _init_dzh():
        dzh_ref[0] = jnp.zeros(dzh_ref.shape[1:], dzh_ref.dtype)

    # the bias-table accumulators (constant block index: VMEM-resident
    # for the WHOLE grid, summed over b, h, and every tile) zero once at
    # the very first grid step
    @pl.when(
        jnp.logical_and(pl.program_id(0) == 0, jnp.logical_and(qi == 0, h == 0))
    )
    def _init_dpw():
        dpw_ref[...] = jnp.zeros(dpw_ref.shape, dpw_ref.dtype)
        if dtw_in_kernel:
            dtw_ref[...] = jnp.zeros(dtw_ref.shape, dtw_ref.dtype)

    def body(kj, dq_blk):
        col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        k_tile = k_ref[0, h, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        v_tile = v_ref[0, h, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        mask = jnp.logical_and(row_ids >= col_ids, col_ids < seq_len)
        mask = jnp.logical_and(mask, row_ids < seq_len)
        if has_seg:
            mask = jnp.logical_and(mask, col_ids >= seg_start_q[:, None])

        # recompute z exactly as the forward kernel does
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bias = posb_ref[:, pl.ds((kj - qi * (bq // bk) + k_off) * bk, bk)].astype(
            jnp.float32
        )
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)
        delta = tsq[:, None] - tsk[None, :]
        bucket = bucketize_timedelta(delta, num_buckets)
        z = s + bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)
        sig = jax.nn.sigmoid(z)
        p = jnp.where(mask, z * sig * inv_n, 0.0)

        dp = jax.lax.dot_general(
            g, v_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dsilu = sig + z * sig * (1.0 - sig)
        dz = jnp.where(mask, dp * dsilu * inv_n, 0.0)

        dq_c = jax.lax.dot_general(
            dz, k_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_c = jax.lax.dot_general(
            dz, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_c = jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dq_blk = dq_blk + dq_c
        sl = pl.ds(kj * bk, bk)
        dk_ref[0, h, sl, :] = dk_ref[0, h, sl, :] + dk_c
        dv_ref[0, h, sl, :] = dv_ref[0, h, sl, :] + dv_c
        # head-summed dz accumulates across h (innermost grid dim, so the
        # dzh block stays resident between h steps)
        dzh_ref[0, :, sl] = dzh_ref[0, :, sl] + dz

        # ---- d_pos_w in-kernel: the positional-bias gradient is the
        # per-DIAGONAL sum of dz over every tile, batch, and head. Skew
        # the tile so diagonals align into lanes (a log2(bq)-step barrel
        # rotate: roll row r left by r), column-sum, and accumulate into
        # the grid-resident [1, NP+BQ] stripe at this tile's 128-aligned
        # lane offset. Replaces an XLA Kronecker-one-hot einsum over the
        # [NP, NP] dz sum that cost ~2.4 ms/block at NP=1152 (~40% of the
        # long-N step together with d_ts_w, PERFORMANCE.md r3). Element
        # dz[r, c] is diagonal d = c - r + (kj*bk - qi*bq); it lands at
        # skew lane u = c - r + bq in [1, bq+bk), so stripe index
        # np_total + d = base + u with base = np_total + kj*bk - qi*bq
        # - bq — a multiple of 128 by construction.
        ws = bq + bk
        sk = jnp.concatenate(
            [jnp.zeros((bq, bq), dtype=jnp.float32), dz], axis=1
        )  # [bq, ws]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (bq, ws), 0)
        shift = 1
        while shift < bq:
            rolled = jnp.roll(sk, -shift, axis=1)
            sk = jnp.where((r_iota & shift) != 0, rolled, sk)
            shift *= 2
        colsum = jnp.sum(sk, axis=0, keepdims=True)  # [1, ws]
        # single trailing *bk so Mosaic can prove 128-divisibility
        base = (np_total // bk + kj - (qi + 1) * (bq // bk)) * bk
        dpw_ref[:, pl.ds(base, ws)] = dpw_ref[:, pl.ds(base, ws)] + colsum
        return dq_blk

    # live tile range, exactly as the forward: key blocks <= the causal
    # frontier AND within this sequence's length; dead query blocks run
    # zero iterations (their dq is zero, dzh stays at the memset zeros);
    # packed rows additionally skip tiles before the earliest segment
    n_kj = jnp.minimum((qi + 1) * (bq // bk), (seq_len + bk - 1) // bk)
    n_kj = jnp.where(qi * bq < seq_len, n_kj, 0)
    kj_lo = 0
    if has_seg:
        kj_lo = jnp.maximum(jnp.min(seg_start_q), 0) // bk
        kj_lo = jnp.minimum(kj_lo, n_kj)
    dq = jax.lax.fori_loop(
        kj_lo, n_kj, body, jnp.zeros((bq, d_dim), dtype=jnp.float32)
    )
    dq_ref[0] = dq

    # ---- d_ts_w in-kernel: after the LAST head (h innermost, so the
    # dzh scratch now holds this (b, qi) row-block's head-summed dz),
    # sweep each live tile's OCCURRING bucket range and accumulate
    # sum(dz * [bucket == t]) into the grid-resident [1, 256] stripe.
    # Buckets are log-scaled in the time delta, so a 128x128 tile of a
    # sorted-timestamp sequence spans only a handful of bucket values
    # (far tiles ~1-2, near-diagonal tiles ~10-30) — the dynamic
    # [bmin, bmax] trip count makes the sweep pay per OCCURRING value,
    # not per possible value. Dead entries hold dz == 0 (contribute
    # nothing to the sums) and are excluded from the range so padded
    # timestamps cannot widen it. Replaces an XLA Kronecker-one-hot
    # einsum over the [B, NP, NP] head-summed dz that cost ~1.3 ms/block
    # at ml-20m-long shapes — and with it the only consumer of dzh in
    # HBM, so the [B, NP, NP] buffer is now kernel scratch.
    if dtw_in_kernel:
        num_heads = k_ref.shape[1]

        @pl.when(h == num_heads - 1)
        def _dtw_sweep():
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, dtw_ref.shape[1]), 1)

            def tile_sweep(kj, carry):
                sl = pl.ds(kj * bk, bk)
                dz_t = dzh_ref[0, :, sl]
                tsk = tsk_ref[0, 0, sl].astype(jnp.int32)
                bucket = bucketize_timedelta(
                    tsq[:, None] - tsk[None, :], num_buckets
                )
                col_ids = kj * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk), 1
                )
                live = jnp.logical_and(row_ids >= col_ids, col_ids < seq_len)
                live = jnp.logical_and(live, row_ids < seq_len)
                if has_seg:
                    live = jnp.logical_and(live, col_ids >= seg_start_q[:, None])
                bmin = jnp.min(jnp.where(live, bucket, num_buckets + 1))
                bmax = jnp.max(jnp.where(live, bucket, -1))

                # 8 bucket values per iteration: the 8 masked sums are
                # independent (ILP hides the scalar-reduce latency that
                # dominated a 1-value-per-iteration loop)
                def bucket_body(i8, c):
                    t0 = bmin + i8 * 8
                    upd = jnp.zeros((1, dtw_ref.shape[1]), jnp.float32)
                    for kk in range(8):
                        t = t0 + kk
                        s = jnp.sum(jnp.where(bucket == t, dz_t, 0.0))
                        upd = upd + s * (lane == t).astype(jnp.float32)
                    dtw_ref[...] = dtw_ref[...] + upd
                    return c

                n8 = (bmax + 1 - bmin + 7) // 8
                jax.lax.fori_loop(0, n8, bucket_body, 0)
                return carry

            jax.lax.fori_loop(kj_lo, n_kj, tile_sweep, 0)


# d_ts_w radix factors: bucket = _DTW_HI_RADIX-ary high digit x low digit,
# so the bucket one-hot factors into two narrow one-hots and the histogram
# becomes an MXU contraction (see _dtw_from_dz). 12*11 = 132 >= 129 slots.
_DTW_LO = 12


def _dtw_from_dz(dz, ts_next, ts_key, num_buckets):
    """Time-bucket-table gradient from the HEAD-SUMMED dz [B, NP, NP]
    (the fused backward kernel sums over heads in-kernel — buckets depend
    only on timestamps, never heads, so per-head dz rows are redundant
    here and would double the dominant compare/select work).

    d_ts_w[k] = sum_e dz_e * [bucket_e == k], evaluated as a Kronecker
    one-hot einsum: onehot(bucket) = onehot(bucket // LO) (x)
    onehot(bucket % LO). The two factors are [E, 11] and [E, 12] bf16
    (exact 0/1), so the reduction is one small MXU contraction instead of
    a 129-iteration in-kernel VPU sweep (measured 11.8 ms -> ~1 ms per
    block at the ml-1m recipe shapes). Padded dz entries are zero, so
    their (arbitrary) buckets contribute nothing. ts_next/ts_key are the
    per-b [B, 1, NP] rows (no head repeat).
    """
    n_hi = (num_buckets + _DTW_LO) // _DTW_LO  # ceil((nb+1)/LO)
    delta = ts_next[:, 0, :, None] - ts_key[:, 0, None, :]  # [BH, NP, NP]
    # u8 indices: buckets <= 132, and the materialized [BH, NP, NP] index
    # buffer (shared across all blocks' grad fusions) is re-read once per
    # block — s32 cost 536 MB of reads per step at ml-20m, u8 a quarter
    bucket = bucketize_timedelta(delta, num_buckets).astype(jnp.uint8)
    hi = bucket // jnp.uint8(_DTW_LO)
    lo = bucket % jnp.uint8(_DTW_LO)
    h = (hi[..., None] == jnp.arange(n_hi, dtype=jnp.uint8)).astype(jnp.bfloat16)
    low = (lo[..., None] == jnp.arange(_DTW_LO, dtype=jnp.uint8)).astype(
        jnp.bfloat16
    )
    dtw2 = jnp.einsum(
        "bnm,bnmh,bnml->hl", dz, h, low, preferred_element_type=jnp.float32
    )
    return dtw2.reshape(-1)[: num_buckets + 1]


def _prepare(q, k, v, timestamps, max_len):
    """Shared padding/layout prep for the fused kernels."""
    b, n, h, dqk = q.shape
    dv_dim = v.shape[-1]
    bk = 128  # lane-dim slices must be 128-aligned on TPU
    np_total = _round_up(n, bk)
    bq = _pick_bq(np_total)
    d_pad = _round_up(dqk, 128)
    dv_pad = _round_up(dv_dim, 128)

    def pad_to(x, target, axis):
        pad = target - x.shape[axis]
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    def fold(x, d, target_d):
        return pad_to(
            pad_to(x.transpose(0, 2, 1, 3).reshape(b * h, n, d), np_total, 1),
            target_d, 2,
        )

    qf, kf = fold(q, dqk, d_pad), fold(k, dqk, d_pad)
    vf = fold(v, dv_dim, dv_pad)

    ts = timestamps.astype(jnp.int32)
    ts_next = pad_to(jnp.concatenate([ts[:, 1:], ts[:, -1:]], axis=1), np_total, 1)
    ts_key = pad_to(ts, np_total, 1)
    if h > 1:
        ts_next = jnp.repeat(ts_next, h, axis=0)
        ts_key = jnp.repeat(ts_key, h, axis=0)
    ts_next, ts_key = ts_next[:, None, :], ts_key[:, None, :]
    return dict(
        b=b, n=n, h=h, dqk=dqk, dv=dv_dim, bq=bq, bk=bk,
        np_total=np_total, d_pad=d_pad, dv_pad=dv_pad,
        qf=qf, kf=kf, vf=vf, ts_next=ts_next, ts_key=ts_key,
        pad_to=pad_to, fold=fold,
    )


def _pos_toeplitz(pos_w, np_total, max_len, bq, bk):
    """[BQ, NP] block-Toeplitz positional-bias stripe. The full [NP, NP]
    bias (bias[i, j] = pos_w[j - i + max_len - 1]) is constant along
    diagonals, so every (qi, kj) tile is the lane slice
    [(kj - qi + nq - 1) * bk : +bk] of this one stripe — the kernels
    fetch it ONCE per pallas_call (constant block index) instead of a
    fresh [BQ, NP] stripe per q-block grid step (measured 1.4 GB/step of
    posb DMA at ml-20m-long shapes). Clipped indices only land on
    causally-masked positions, matching the old per-tile clip."""
    # most-negative tile offset is kj*bk - qi*bq = -(NP - bq); the
    # kernels' slice base (kj - qi*(bq/bk) + (NP-bq)/bk)*bk maps it to 0
    b0 = (max_len - 1) - (np_total - bq)
    # gather-free construction (a [BQ, NP] 2-D gather measured ~1 ms/step
    # on TPU): sample the table over one contiguous wrapped index range
    # (a [NP+BQ]-element 1-D gather, trivial), then the tile-and-reshape
    # trick realizes flat[r, c] = x[(c - r) mod m] as a pure copy.
    m = np_total + bq
    i = jnp.arange(m)
    w_idx = jnp.where(i < np_total, i + b0, i - m + b0)
    x = pos_w[jnp.clip(w_idx, 0, 2 * max_len - 2)]
    flat = jnp.tile(x, bq)[: bq * (m - 1)].reshape(bq, m - 1)
    return flat[:, :np_total].astype(jnp.float32)


def _fused_bwd_impl(q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets, g):
    pr = _prepare(q, k, v, timestamps, max_len)
    bq, bk, np_total = pr["bq"], pr["bk"], pr["np_total"]
    b, h, n = pr["b"], pr["h"], pr["n"]
    d_pad, dv_pad = pr["d_pad"], pr["dv_pad"]
    gf = pr["fold"](g, pr["dv"], dv_pad)
    # k/v reshaped [B, H, NP, D] so one resident block serves the whole
    # per-b sweep (the kernel's dk/dv out blocks mirror this layout)
    k4 = pr["kf"].reshape(b, h, np_total, d_pad)
    v4 = pr["vf"].reshape(b, h, np_total, dv_pad)
    grid = (b, np_total // bq, h)
    # per-b timestamp rows (stride h: _prepare repeats per head)
    tsq_b, tsk_b = pr["ts_next"][::h], pr["ts_key"][::h]
    pos_bias = _pos_toeplitz(pos_w, np_total, max_len, bq, bk)  # [BQ, NP]
    nb1 = ts_w.shape[0]
    ts_w_2d = jnp.pad(
        ts_w.reshape(1, -1).astype(jnp.float32),
        ((0, 0), (0, _round_up(nb1, 128) - nb1)),
    )
    has_seg = seg_pos is not None

    row_spec = pl.BlockSpec((1, 1, np_total), lambda bi, qi, hi, lens: (bi, 0, 0))
    in_specs = [
        pl.BlockSpec((1, h, np_total, d_pad), lambda bi, qi, hi, lens: (bi, 0, 0, 0)),
        pl.BlockSpec((1, h, np_total, dv_pad), lambda bi, qi, hi, lens: (bi, 0, 0, 0)),
        pl.BlockSpec((1, bq, d_pad), lambda bi, qi, hi, lens, H=h: (bi * H + hi, qi, 0)),
        pl.BlockSpec((1, bq, dv_pad), lambda bi, qi, hi, lens, H=h: (bi * H + hi, qi, 0)),
        row_spec,
        row_spec,
    ]
    inputs = [lengths, k4, v4, pr["qf"], gf, tsq_b, tsk_b]
    if has_seg:
        seg_b = pr["pad_to"](seg_pos.astype(jnp.int32), np_total, 1)[:, None, :]
        in_specs.append(row_spec)
        inputs.append(seg_b)
    in_specs.extend([
        pl.BlockSpec((bq, np_total), lambda bi, qi, hi, lens: (0, 0)),
        pl.BlockSpec(
            (1, _round_up(num_buckets + 1, 128)),
            lambda bi, qi, hi, lens: (0, 0),
        ),
    ])
    inputs.extend([pos_bias, ts_w_2d])

    w_acc = np_total + bq
    w_tw = _round_up(num_buckets + 1, 128)
    # in-kernel d_ts_w pays off once the XLA einsum's NP^2-shaped reduce
    # dominates (long sequences); at short NP the sweep's serialized
    # scalar reductions cost more than the einsum saves
    dtw_in_kernel = np_total >= 512
    out_specs = [
        pl.BlockSpec((1, bq, d_pad), lambda bi, qi, hi, lens, H=h: (bi * H + hi, qi, 0)),
        pl.BlockSpec((1, h, np_total, d_pad), lambda bi, qi, hi, lens: (bi, 0, 0, 0)),
        pl.BlockSpec((1, h, np_total, dv_pad), lambda bi, qi, hi, lens: (bi, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b * h, np_total, d_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, h, np_total, d_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, h, np_total, dv_pad), jnp.float32),
    ]
    dpw_spec = pl.BlockSpec((1, w_acc), lambda bi, qi, hi, lens: (0, 0))
    dpw_shape = jax.ShapeDtypeStruct((1, w_acc), jnp.float32)
    scratch_shapes = []
    if dtw_in_kernel:
        out_specs += [
            dpw_spec,
            pl.BlockSpec((1, w_tw), lambda bi, qi, hi, lens: (0, 0)),
        ]
        out_shape += [dpw_shape, jax.ShapeDtypeStruct((1, w_tw), jnp.float32)]
        # head-summed dz for the current (b, qi) row block — pure VMEM
        # scratch when both bias-table gradients leave as stripes (was a
        # [B, NP, NP] HBM output: 170 MB/block of write+read traffic at
        # ml-20m-long)
        scratch_shapes = [pltpu.VMEM((1, bq, np_total), jnp.float32)]
    else:
        out_specs += [
            pl.BlockSpec((1, bq, np_total), lambda bi, qi, hi, lens: (bi, qi, 0)),
            dpw_spec,
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, np_total, np_total), jnp.float32),
            dpw_shape,
        ]
    outs = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel,
            bq=bq, bk=bk, num_buckets=num_buckets,
            inv_n=1.0 / max_len, n_valid=n, has_seg=has_seg,
            dtw_in_kernel=dtw_in_kernel,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * n * n * (pr["dqk"] + pr["dv"]),
            bytes_accessed=4 * b * h * n * (2 * pr["dqk"] + 2 * pr["dv"]),
            transcendentals=b * h * n * n,
        ),
    )(*inputs)
    if dtw_in_kernel:
        dqf, dk4, dv4, dpw_acc, dtw_acc = outs
        dtw_out = dtw_acc[0, : num_buckets + 1]
    else:
        dqf, dk4, dv4, dzh, dpw_acc = outs
        # dzh is already head-summed in-kernel; ts rows are per-b
        dtw_out = _dtw_from_dz(dzh, tsq_b, tsk_b, num_buckets)

    def unfold(x, d):
        return x[:, :n, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)

    dq = unfold(dqf, pr["dqk"]).astype(q.dtype)
    dk = unfold(dk4.reshape(b * h, np_total, d_pad), pr["dqk"]).astype(k.dtype)
    dv = unfold(dv4.reshape(b * h, np_total, dv_pad), pr["dv"]).astype(v.dtype)

    # d_pos_w from the kernel's diagonal-sum stripe: stripe index w holds
    # diagonal d = w - np_total, table index t = d + max_len - 1. Stripe
    # entries outside the table window are provably zero (positions past
    # +-(max_len-1) are cross-segment or causally dead), matching the old
    # clipped-index einsum.
    table = 2 * max_len - 1
    w_lo = max(1, np_total - max_len + 1)
    w_hi = min(w_acc, np_total + max_len - 1)
    t_lo = w_lo - np_total + max_len - 1
    dpw = jnp.zeros((table,), jnp.float32)
    dpw = jax.lax.dynamic_update_slice(
        dpw, dpw_acc[0, w_lo:w_hi], (t_lo,)
    )
    return dq, dk, dv, dpw, dtw_out


def _fused_fwd(q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets):
    # flash-style: no activation residuals — the backward recomputes the
    # z tiles from the raw inputs, so the training forward IS the
    # inference kernel and nothing [N, N]-shaped is saved
    out = _fused_fwd_impl(
        q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets
    )
    return out, (q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w)


def _fused_bwd(max_len, num_buckets, residuals, g):
    q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w = residuals
    dq, dk, dv, dpw, dtw = _fused_bwd_impl(
        q, k, v, timestamps, seg_pos, lengths, pos_w, ts_w, max_len, num_buckets, g
    )
    return dq, dk, dv, None, None, None, dpw, dtw


_fused_len.defvjp(_fused_fwd, _fused_bwd)
