"""Fused Pallas chunk kernels for ring (sequence-parallel) HSTU attention.

The ring bodies in parallel/ring_attention.py accumulate, per ring step,
the partial HSTU attention of the local query shard against one visiting
K/V chunk:

    partial[b, n, h, :] = sum_m silu(q.k + bias[n, m]) * inv_n
                                * mask[n, m] * v[b, m, h, :]

These kernels are the TPU-fused form of that chunk product (the jnp body
materializes the [B, H, Nq, Nc] bias/attention in HBM; reference analog:
sequential_encoders/hstu.py:134-205 at chunk granularity). Design:

- The chunk's GLOBAL row/col offsets are traced values (mesh
  axis_index), so the single offset DELTA (col_off - row_off) rides in
  as scalar-prefetch data. The causal mask is generated in-kernel from
  it (local row - col >= delta), and it bounds the key-tile loop — tiles
  past the causal frontier of the diagonal chunk are never iterated.
- The positional bias is Toeplitz within a chunk (depends only on
  m - n + delta), so the caller gathers ONE [Nq + Nc]-entry table slice
  at the traced offset and the kernels read [BQ, BK] lane slices of its
  skewed [BQ, ...] expansion — same stripe scheme as the full-sequence
  kernel (ops/pallas/hstu_attention._pos_toeplitz), no [Nq, Nc] bias
  tile and no Kronecker one-hot einsums in either direction.
- The timestamp-bucket bias is generated IN-kernel from the raw
  timestamps with the same Mosaic lane-gather used by the full-sequence
  kernel.
- The backward is a fully-fused Pallas kernel (the r4 single-chip design
  ported to chunks, VERDICT r4 item 3): z tiles are RECOMPUTED
  flash-style, dq/dk/dv contract in-kernel, d_pos_w accumulates via the
  barrel-rotate diagonal skew into a grid-resident stripe, and d_ts_w
  via the occurring-bucket-range sweep over the head-summed dz held in
  VMEM scratch — no [B, H, Nq, Nc] transients in HBM anywhere. The
  ring's reverse ppermute structure stays autodiff-derived in
  parallel/ring_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygenerativerecommenders_tpu.ops.hstu_attention import bucketize_timedelta
from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
    _feature_pad,
    _round_up,
    _ts_bias_gather,
)


def _live_n_kj(qi, bq, bk, offd, nq_valid, nc_valid):
    """Number of live key tiles for query block qi: tile kj has a live
    (causal) element iff qi*bq + bq - 1 - kj*bk >= offd; dead query
    blocks (entirely past nq_valid) run zero tiles. Integer // on traced
    values truncates toward zero, so the negative case is branched out
    explicitly."""
    num = qi * bq + bq - 1 - offd
    n_kj = jnp.where(num < 0, 0, num // bk + 1)
    n_kj = jnp.minimum(n_kj, (nc_valid + bk - 1) // bk)
    return jnp.where(qi * bq < nq_valid, n_kj, 0)


def _chunk_kernel(
    offd_ref,  # scalar prefetch: [1] int32, col_off - row_off
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, NCP, D]
    v_ref,  # [1, NCP, DV]
    tsq_ref,  # [1, 1, NQP]  next-item timestamps for query rows
    tsk_ref,  # [1, 1, NCP]  timestamps for key cols
    posb_ref,  # [BQ, NQP + NCP - BQ]  Toeplitz positional stripe
    tsw_ref,  # [1, lane-padded NB+1]
    out_ref,  # [1, BQ, DV]
    *,
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
    nq_valid: int,
    nc_valid: int,
    nqp: int,
):
    qi = pl.program_id(2)
    offd = offd_ref[0]
    k_off = (nqp - bq) // bk

    q = q_ref[0].astype(jnp.float32)
    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    acc = jnp.zeros((bq, v_ref.shape[2]), dtype=jnp.float32)

    def body(kj, acc):
        k_tile = k_ref[0, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        v_tile = v_ref[0, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        bias = posb_ref[:, pl.ds((kj - qi * (bq // bk) + k_off) * bk, bk)].astype(
            jnp.float32
        )
        delta = tsq[:, None] - tsk[None, :]
        bucket = bucketize_timedelta(delta, num_buckets)
        bias = bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)
        a = jax.nn.silu(s + bias) * inv_n
        col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        live = jnp.logical_and(
            row_ids - col_ids >= offd,
            jnp.logical_and(row_ids < nq_valid, col_ids < nc_valid),
        )
        a = jnp.where(live, a, 0.0)
        return acc + jax.lax.dot_general(
            a, v_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # causal tile skipping driven by the traced offset delta: the diagonal
    # chunk's dead upper-triangle tiles are never iterated (fully-dead
    # CHUNKS are already skipped at the ring layer via zigzag lax.cond)
    acc = jax.lax.fori_loop(
        0, _live_n_kj(qi, bq, bk, offd, nq_valid, nc_valid), body, acc
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _pos_stripe(pos_w, offd, nqp, ncp, bq, max_len):
    """[BQ, NQP + NCP - BQ] Toeplitz positional stripe for a chunk whose
    column offset exceeds its row offset by the TRACED `offd`: local
    diagonal d = m - n carries table index d + offd + max_len - 1. One
    [NQP + NCP]-entry 1-D gather (traced indices are fine — it is tiny)
    plus the same tile-and-reshape expansion as _pos_toeplitz; kernels
    slice lanes at (kj - qi*(bq/bk) + (NQP-bq)/bk)*bk so element
    (rr, cc) of tile (qi, kj) reads diagonal kj*bk + cc - qi*bq - rr.
    Clipped (out-of-table) diagonals only occur on causally-dead or
    padded pairs, which the in-kernel mask zeroes."""
    m = nqp + ncp
    table = pos_w.shape[0]
    i = jnp.arange(m)
    d = jnp.where(i < m - bq, i - (nqp - bq), i - m - (nqp - bq))
    t = d + offd + (max_len - 1)
    x = jnp.take(pos_w.astype(jnp.float32), jnp.clip(t, 0, table - 1))
    flat = jnp.tile(x, bq)[: bq * (m - 1)].reshape(bq, m - 1)
    return flat[:, : m - bq]


def _layout(q, k, v, tsq_next, tsk):
    """Shared padding/fold prep for the chunk kernels."""
    b, nq, h, dqk = q.shape
    nc, dv = k.shape[1], v.shape[-1]
    bq = bk = 128
    nqp, ncp = _round_up(nq, bq), _round_up(nc, bk)
    d_pad, dv_pad = _feature_pad(dqk), _feature_pad(dv)

    def pad_to(x, target, axis):
        p = target - x.shape[axis]
        if p == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, p)
        return jnp.pad(x, widths)

    def fold(x, n_target, d_target):
        bh = jnp.transpose(jnp.asarray(x), (0, 2, 1, 3)).reshape(
            b * h, x.shape[1], x.shape[-1]
        )
        return pad_to(pad_to(bh, n_target, 1), d_target, 2)

    def ts_rows(ts, n_target):
        # per-b rows [B, 1, N*] (no head repeat)
        return pad_to(jnp.asarray(ts).astype(jnp.int32), n_target, 1)[:, None, :]

    return dict(
        b=b, nq=nq, h=h, dqk=dqk, nc=nc, dv=dv, bq=bq, bk=bk,
        nqp=nqp, ncp=ncp, d_pad=d_pad, dv_pad=dv_pad,
        qf=fold(q, nqp, d_pad), kf=fold(k, ncp, d_pad),
        vf=fold(v, ncp, dv_pad),
        tsq_b=ts_rows(tsq_next, nqp), tsk_b=ts_rows(tsk, ncp),
        pad_to=pad_to, fold=fold,
    )


def _tsw_2d(ts_w):
    nb1 = ts_w.shape[0]
    return jnp.pad(
        jnp.asarray(ts_w, jnp.float32).reshape(1, -1),
        ((0, 0), (0, _round_up(nb1, 128) - nb1)),
    )


def _fwd_impl(q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
              inv_n, max_len, num_buckets, interpret):
    pr = _layout(q, k, v, tsq_next, tsk)
    b, h, nq = pr["b"], pr["h"], pr["nq"]
    bq, bk, nqp, ncp = pr["bq"], pr["bk"], pr["nqp"], pr["ncp"]

    offd_arr = jnp.asarray(offd, jnp.int32).reshape(1)
    posb = _pos_stripe(pos_w, offd_arr[0], nqp, ncp, bq, max_len)

    def rep(t):
        return jnp.repeat(t, h, axis=0) if h > 1 else t

    grid = (b * h, 1, nqp // bq)
    out = pl.pallas_call(
        functools.partial(
            _chunk_kernel, bq=bq, bk=bk, num_buckets=num_buckets,
            inv_n=inv_n, nq_valid=nq, nc_valid=pr["nc"], nqp=nqp,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, pr["d_pad"]), lambda bh_, _, qi, o: (bh_, qi, 0)),
                pl.BlockSpec((1, ncp, pr["d_pad"]), lambda bh_, _, qi, o: (bh_, 0, 0)),
                pl.BlockSpec((1, ncp, pr["dv_pad"]), lambda bh_, _, qi, o: (bh_, 0, 0)),
                pl.BlockSpec((1, 1, nqp), lambda bh_, _, qi, o: (bh_, 0, 0)),
                pl.BlockSpec((1, 1, ncp), lambda bh_, _, qi, o: (bh_, 0, 0)),
                pl.BlockSpec((bq, nqp + ncp - bq), lambda bh_, _, qi, o: (0, 0)),
                pl.BlockSpec(
                    (1, _round_up(num_buckets + 1, 128)),
                    lambda bh_, _, qi, o: (0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, pr["dv_pad"]), lambda bh_, _, qi, o: (bh_, qi, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nqp, pr["dv_pad"]), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq * pr["nc"] * (pr["dqk"] + pr["dv"]),
            bytes_accessed=4 * b * h * (nq + pr["nc"]) * (pr["dqk"] + pr["dv"]),
            transcendentals=b * h * nq * pr["nc"],
        ),
        interpret=interpret,
    )(
        offd_arr, pr["qf"], pr["kf"], pr["vf"],
        rep(pr["tsq_b"]), rep(pr["tsk_b"]), posb, _tsw_2d(ts_w),
    )
    return (
        out[:, :nq, : pr["dv"]].reshape(b, h, nq, pr["dv"]).transpose(0, 2, 1, 3)
    )


def _bwd_kernel(
    offd_ref,  # scalar prefetch: [1] int32
    k_ref,  # [1, H, NCP, D]   resident per b
    v_ref,  # [1, H, NCP, DV]  resident per b
    q_ref,  # [1, BQ, D]       (b*H+h, qi)
    g_ref,  # [1, BQ, DV]      cotangent tile
    tsq_ref,  # [1, 1, NQP]  per b
    tsk_ref,  # [1, 1, NCP]  per b
    posb_ref,  # [BQ, NQP + NCP - BQ]
    tsw_ref,  # [1, lane-padded NB+1]
    dq_ref,  # [1, BQ, D]
    dk_ref,  # [1, H, NCP, D]   accumulated across (qi, h), resident per b
    dv_ref,  # [1, H, NCP, DV]
    dpw_ref,  # [1, NQP + NCP]  grid-resident diagonal-sum stripe
    dtw_ref,  # [1, lane-padded NB+1]  grid-resident bucket histogram
    dzh_ref,  # VMEM scratch [1, BQ, NCP]: head-summed dz for this (b, qi)
    *,
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
    nq_valid: int,
    nc_valid: int,
    nqp: int,
):
    qi = pl.program_id(1)
    h = pl.program_id(2)
    offd = offd_ref[0]
    ncp = k_ref.shape[2]
    k_off = (nqp - bq) // bk

    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    d_dim = k_ref.shape[3]

    @pl.when(jnp.logical_and(qi == 0, h == 0))
    def _init_kv():
        dk_ref[0] = jnp.zeros(dk_ref.shape[1:], dk_ref.dtype)
        dv_ref[0] = jnp.zeros(dv_ref.shape[1:], dv_ref.dtype)

    @pl.when(h == 0)
    def _init_dzh():
        dzh_ref[0] = jnp.zeros(dzh_ref.shape[1:], dzh_ref.dtype)

    @pl.when(
        jnp.logical_and(pl.program_id(0) == 0, jnp.logical_and(qi == 0, h == 0))
    )
    def _init_acc():
        dpw_ref[...] = jnp.zeros(dpw_ref.shape, dpw_ref.dtype)
        dtw_ref[...] = jnp.zeros(dtw_ref.shape, dtw_ref.dtype)

    def live_tile(kj, col_ids):
        return jnp.logical_and(
            row_ids - col_ids >= offd,
            jnp.logical_and(row_ids < nq_valid, col_ids < nc_valid),
        )

    def body(kj, dq_blk):
        col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        k_tile = k_ref[0, h, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        v_tile = v_ref[0, h, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        live = live_tile(kj, col_ids)

        # recompute z exactly as the forward kernel does
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bias = posb_ref[:, pl.ds((kj - qi * (bq // bk) + k_off) * bk, bk)].astype(
            jnp.float32
        )
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)
        bucket = bucketize_timedelta(tsq[:, None] - tsk[None, :], num_buckets)
        z = s + bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)
        sig = jax.nn.sigmoid(z)
        p = jnp.where(live, z * sig * inv_n, 0.0)

        dp = jax.lax.dot_general(
            g, v_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz = jnp.where(live, dp * (sig + z * sig * (1.0 - sig)) * inv_n, 0.0)

        dq_blk = dq_blk + jax.lax.dot_general(
            dz, k_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sl = pl.ds(kj * bk, bk)
        dk_ref[0, h, sl, :] = dk_ref[0, h, sl, :] + jax.lax.dot_general(
            dz, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_ref[0, h, sl, :] = dv_ref[0, h, sl, :] + jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dzh_ref[0, :, sl] = dzh_ref[0, :, sl] + dz

        # d_pos_w: per-diagonal sum via the barrel-rotate skew (roll row
        # r left by r so diagonals align into lanes), column-sum, and
        # accumulate at the tile's 128-aligned stripe offset. Element
        # dz[r, c] is local diagonal d = kj*bk + c - qi*bq - r and lands
        # at stripe index nqp + d = base + (c - r + bq). See
        # ops/pallas/hstu_attention._bwd_fused_kernel for the original.
        ws = bq + bk
        sk = jnp.concatenate(
            [jnp.zeros((bq, bq), dtype=jnp.float32), dz], axis=1
        )
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (bq, ws), 0)
        shift = 1
        while shift < bq:
            rolled = jnp.roll(sk, -shift, axis=1)
            sk = jnp.where((r_iota & shift) != 0, rolled, sk)
            shift *= 2
        colsum = jnp.sum(sk, axis=0, keepdims=True)
        base = (nqp // bk + kj - (qi + 1) * (bq // bk)) * bk
        dpw_ref[:, pl.ds(base, ws)] = dpw_ref[:, pl.ds(base, ws)] + colsum
        return dq_blk

    n_kj = _live_n_kj(qi, bq, bk, offd, nq_valid, nc_valid)
    dq = jax.lax.fori_loop(
        0, n_kj, body, jnp.zeros((bq, d_dim), dtype=jnp.float32)
    )
    dq_ref[0] = dq

    # d_ts_w: after the LAST head (h innermost — dzh now holds this
    # (b, qi) row block's head-summed dz), sweep each live tile's
    # OCCURRING bucket range, 8 masked sums per iteration for ILP.
    num_heads = k_ref.shape[1]

    @pl.when(h == num_heads - 1)
    def _dtw_sweep():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, dtw_ref.shape[1]), 1)

        def tile_sweep(kj, carry):
            sl = pl.ds(kj * bk, bk)
            dz_t = dzh_ref[0, :, sl]
            tsk = tsk_ref[0, 0, sl].astype(jnp.int32)
            bucket = bucketize_timedelta(tsq[:, None] - tsk[None, :], num_buckets)
            col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            live = live_tile(kj, col_ids)
            bmin = jnp.min(jnp.where(live, bucket, num_buckets + 1))
            bmax = jnp.max(jnp.where(live, bucket, -1))

            def bucket_body(i8, c):
                t0 = bmin + i8 * 8
                upd = jnp.zeros((1, dtw_ref.shape[1]), jnp.float32)
                for kk in range(8):
                    t = t0 + kk
                    s = jnp.sum(jnp.where(bucket == t, dz_t, 0.0))
                    upd = upd + s * (lane == t).astype(jnp.float32)
                dtw_ref[...] = dtw_ref[...] + upd
                return c

            jax.lax.fori_loop(0, (bmax + 1 - bmin + 7) // 8, bucket_body, 0)
            return carry

        jax.lax.fori_loop(0, n_kj, tile_sweep, 0)


def _bwd_impl(q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
              inv_n, max_len, num_buckets, interpret, g):
    pr = _layout(q, k, v, tsq_next, tsk)
    b, h, nq = pr["b"], pr["h"], pr["nq"]
    bq, bk, nqp, ncp = pr["bq"], pr["bk"], pr["nqp"], pr["ncp"]
    d_pad, dv_pad = pr["d_pad"], pr["dv_pad"]

    offd_arr = jnp.asarray(offd, jnp.int32).reshape(1)
    posb = _pos_stripe(pos_w, offd_arr[0], nqp, ncp, bq, max_len)
    gf = pr["fold"](g, nqp, dv_pad)
    k4 = pr["kf"].reshape(b, h, ncp, d_pad)
    v4 = pr["vf"].reshape(b, h, ncp, dv_pad)

    m = nqp + ncp
    w_tw = _round_up(num_buckets + 1, 128)
    grid = (b, nqp // bq, h)
    row_q = pl.BlockSpec((1, 1, nqp), lambda bi, qi, hi, o: (bi, 0, 0))
    row_c = pl.BlockSpec((1, 1, ncp), lambda bi, qi, hi, o: (bi, 0, 0))
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, bq=bq, bk=bk, num_buckets=num_buckets,
            inv_n=inv_n, nq_valid=nq, nc_valid=pr["nc"], nqp=nqp,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h, ncp, d_pad), lambda bi, qi, hi, o: (bi, 0, 0, 0)),
                pl.BlockSpec((1, h, ncp, dv_pad), lambda bi, qi, hi, o: (bi, 0, 0, 0)),
                pl.BlockSpec(
                    (1, bq, d_pad), lambda bi, qi, hi, o, H=h: (bi * H + hi, qi, 0)
                ),
                pl.BlockSpec(
                    (1, bq, dv_pad), lambda bi, qi, hi, o, H=h: (bi * H + hi, qi, 0)
                ),
                row_q,
                row_c,
                pl.BlockSpec((bq, nqp + ncp - bq), lambda bi, qi, hi, o: (0, 0)),
                pl.BlockSpec((1, w_tw), lambda bi, qi, hi, o: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, bq, d_pad), lambda bi, qi, hi, o, H=h: (bi * H + hi, qi, 0)
                ),
                pl.BlockSpec((1, h, ncp, d_pad), lambda bi, qi, hi, o: (bi, 0, 0, 0)),
                pl.BlockSpec((1, h, ncp, dv_pad), lambda bi, qi, hi, o: (bi, 0, 0, 0)),
                pl.BlockSpec((1, m), lambda bi, qi, hi, o: (0, 0)),
                pl.BlockSpec((1, w_tw), lambda bi, qi, hi, o: (0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, bq, ncp), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nqp, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h, ncp, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h, ncp, dv_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, w_tw), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * nq * pr["nc"] * (pr["dqk"] + pr["dv"]),
            bytes_accessed=4 * b * h * (nq + pr["nc"]) * (pr["dqk"] + pr["dv"]),
            transcendentals=b * h * nq * pr["nc"],
        ),
        interpret=interpret,
    )(
        offd_arr, k4, v4, pr["qf"], gf, pr["tsq_b"], pr["tsk_b"],
        posb, _tsw_2d(ts_w),
    )
    dqf, dk4, dv4, dpw_acc, dtw_acc = outs

    def unfold(x, n, d):
        return x[:, :n, :d].reshape(b, h, n, d).transpose(0, 2, 1, 3)

    nc = pr["nc"]
    dq = unfold(dqf, nq, pr["dqk"]).astype(q.dtype)
    dk = unfold(dk4.reshape(b * h, ncp, d_pad), nc, pr["dqk"]).astype(k.dtype)
    dv = unfold(dv4.reshape(b * h, ncp, dv_pad), nc, pr["dv"]).astype(v.dtype)

    # stripe index w holds local diagonal d = w - nqp; its table slot is
    # d + offd + max_len - 1 (traced), CLIPPED to the table exactly like
    # the forward read (and the jnp chunk body's pos_idx clip) — an
    # out-of-range live diagonal contributes its gradient to the
    # boundary slot it read from. In the real ring all live pairs land
    # in range (global rows/cols < max_len).
    table = pos_w.shape[0]
    t_idx = jnp.arange(m) - nqp + offd_arr[0] + (max_len - 1)
    dpw = jnp.zeros((table,), jnp.float32).at[
        jnp.clip(t_idx, 0, table - 1)
    ].add(dpw_acc[0])
    dtw = dtw_acc[0, : num_buckets + 1]
    return dq, dk, dv, dpw.astype(pos_w.dtype), dtw.astype(ts_w.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _chunk_attention(q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
                     inv_n, max_len, num_buckets, interpret):
    return _fwd_impl(
        q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
        inv_n, max_len, num_buckets, interpret,
    )


def _chunk_fwd(q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
               inv_n, max_len, num_buckets, interpret):
    out = _fwd_impl(
        q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
        inv_n, max_len, num_buckets, interpret,
    )
    # flash-style: no activation residuals — the backward recomputes z
    return out, (q, k, v, tsq_next, tsk, offd, pos_w, ts_w)


def _chunk_bwd(inv_n, max_len, num_buckets, interpret, res, g):
    q, k, v, tsq_next, tsk, offd, pos_w, ts_w = res
    dq, dk, dv, dpw, dtw = _bwd_impl(
        q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
        inv_n, max_len, num_buckets, interpret, g,
    )
    return dq, dk, dv, None, None, None, dpw, dtw


_chunk_attention.defvjp(_chunk_fwd, _chunk_bwd)


def hstu_chunk_attention(
    q, k, v, tsq_next, tsk, off_delta, pos_w, ts_w, *,
    inv_n: float, max_len: int, num_buckets: int, interpret: bool = False,
):
    """Fused partial HSTU attention of local queries vs one K/V chunk.

    q: [B, Nq, H, Dqk]; k/v: [B, Nc, H, Dqk/Dv]; tsq_next: [B, Nq] (the
    ext[n+1] timestamps of the query rows); tsk: [B, Nc]; off_delta:
    TRACED int32 scalar = col_off - row_off (the chunk's global column
    offset minus the query shard's global row offset — drives the causal
    mask, the key-tile skipping, and the positional-bias table window).
    Returns [B, Nq, H, Dv] float32. Differentiable in q, k, v, pos_w,
    ts_w with a fully-fused Pallas backward (in-kernel dq/dk/dv +
    bias-table gradients).
    """
    return _chunk_attention(
        q, k, v, tsq_next, tsk, jnp.asarray(off_delta, jnp.int32),
        pos_w, ts_w, float(inv_n), int(max_len), int(num_buckets),
        bool(interpret),
    )
