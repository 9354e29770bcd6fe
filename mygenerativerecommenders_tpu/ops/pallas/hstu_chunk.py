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
- Operands ride in the model's NATIVE [B, N, H*dh] layout (free
  minor-dim merge of the head split); heads run as a STATIC in-kernel
  loop over constant lane slices, the bias (positional stripe slice +
  in-kernel time-bucket lane gather) is generated once per tile and
  SHARED across heads, and no transpose/reshape/feature-pad layout ops
  exist around the kernels (the r5 full-sequence redesign, ported).
- The backward is a fully-fused Pallas kernel (VERDICT r4 item 3): z
  tiles are RECOMPUTED flash-style, dq/dk/dv contract in-kernel,
  d_pos_w accumulates via the barrel-rotate diagonal skew into a
  grid-resident stripe, and d_ts_w via the occurring-bucket-range sweep
  over the head-summed dz — computed INLINE per tile (the head sum is
  just the static-loop sum), so no dz buffer exists anywhere. The
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
    _head_cols,
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
    q_ref,  # [1, BQ, H*dh]
    k_ref,  # [1, NCP, H*dh]
    v_ref,  # [1, NCP, H*dvh]
    tsq_ref,  # [1, 1, NQP]  next-item timestamps for query rows
    tsk_ref,  # [1, 1, NCP]  timestamps for key cols
    posb_ref,  # [BQ, NQP + NCP - BQ]  Toeplitz positional stripe
    tsw_ref,  # [1, lane-padded NB+1]
    out_ref,  # [1, BQ, H*dvh]
    *,
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
    nq_valid: int,
    nc_valid: int,
    nqp: int,
    num_heads: int,
    dh: int,
    dvh: int,
):
    qi = pl.program_id(1)
    offd = offd_ref[0]
    k_off = (nqp - bq) // bk

    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    qs = [
        _head_cols(q_ref[0], h, dh).astype(jnp.float32)
        for h in range(num_heads)
    ]

    def body(kj, accs):
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)
        bias = posb_ref[:, pl.ds((kj - qi * (bq // bk) + k_off) * bk, bk)].astype(
            jnp.float32
        )
        bucket = bucketize_timedelta(tsq[:, None] - tsk[None, :], num_buckets)
        bias = bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)
        col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        live = jnp.logical_and(
            row_ids - col_ids >= offd,
            jnp.logical_and(row_ids < nq_valid, col_ids < nc_valid),
        )
        sl = pl.ds(kj * bk, bk)
        new = []
        for h in range(num_heads):
            k_tile = _head_cols(k_ref[0, sl], h, dh).astype(jnp.float32)
            v_tile = _head_cols(v_ref[0, sl], h, dvh).astype(jnp.float32)
            s = jax.lax.dot_general(
                qs[h], k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a = jnp.where(live, jax.nn.silu(s + bias) * inv_n, 0.0)
            new.append(accs[h] + jax.lax.dot_general(
                a, v_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        return tuple(new)

    # causal tile skipping driven by the traced offset delta: the diagonal
    # chunk's dead upper-triangle tiles are never iterated (fully-dead
    # CHUNKS are already skipped at the ring layer via zigzag lax.cond)
    accs = jax.lax.fori_loop(
        0, _live_n_kj(qi, bq, bk, offd, nq_valid, nc_valid), body,
        tuple(
            jnp.zeros((bq, dvh), dtype=jnp.float32) for _ in range(num_heads)
        ),
    )
    out = accs[0] if num_heads == 1 else jnp.concatenate(accs, axis=-1)
    out_ref[0] = out.astype(out_ref.dtype)


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
    """Shared prep: merge the head split into [B, N, H*dh] (free) and pad
    the sequence dims to the 128-tile."""
    b, nq, h, dqk = q.shape
    nc, dv = k.shape[1], v.shape[-1]
    bq = bk = 128
    nqp, ncp = _round_up(nq, bq), _round_up(nc, bk)

    def pad_to(x, target, axis):
        p = target - x.shape[axis]
        if p == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, p)
        return jnp.pad(x, widths)

    def merge(x, n_target, d):
        return pad_to(jnp.asarray(x).reshape(b, x.shape[1], h * d), n_target, 1)

    def ts_rows(ts, n_target):
        return pad_to(jnp.asarray(ts).astype(jnp.int32), n_target, 1)[:, None, :]

    return dict(
        b=b, nq=nq, h=h, dqk=dqk, nc=nc, dv=dv, bq=bq, bk=bk,
        nqp=nqp, ncp=ncp,
        qm=merge(q, nqp, dqk), km=merge(k, ncp, dqk), vm=merge(v, ncp, dv),
        tsq_b=ts_rows(tsq_next, nqp), tsk_b=ts_rows(tsk, ncp),
        pad_to=pad_to, merge=merge,
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
    dqk, dv = pr["dqk"], pr["dv"]

    offd_arr = jnp.asarray(offd, jnp.int32).reshape(1)
    posb = _pos_stripe(pos_w, offd_arr[0], nqp, ncp, bq, max_len)

    grid = (b, nqp // bq)
    out = pl.pallas_call(
        functools.partial(
            _chunk_kernel, bq=bq, bk=bk, num_buckets=num_buckets,
            inv_n=inv_n, nq_valid=nq, nc_valid=pr["nc"], nqp=nqp,
            num_heads=h, dh=dqk, dvh=dv,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, h * dqk), lambda bi, qi, o: (bi, qi, 0)),
                pl.BlockSpec((1, ncp, h * dqk), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, ncp, h * dv), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, 1, nqp), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, 1, ncp), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((bq, nqp + ncp - bq), lambda bi, qi, o: (0, 0)),
                pl.BlockSpec(
                    (1, _round_up(num_buckets + 1, 128)),
                    lambda bi, qi, o: (0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, bq, h * dv), lambda bi, qi, o: (bi, qi, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, nqp, h * dv), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq * pr["nc"] * (dqk + dv),
            bytes_accessed=4 * b * h * (nq + pr["nc"]) * (dqk + dv),
            transcendentals=b * h * nq * pr["nc"],
        ),
        interpret=interpret,
    )(offd_arr, pr["qm"], pr["km"], pr["vm"], pr["tsq_b"], pr["tsk_b"],
      posb, _tsw_2d(ts_w))
    return out[:, :nq].reshape(b, nq, h, dv)


def _bwd_kernel(
    offd_ref,  # scalar prefetch: [1] int32
    k_ref,  # [1, NCP, H*dh]   resident per b
    v_ref,  # [1, NCP, H*dvh]  resident per b
    q_ref,  # [1, BQ, H*dh]
    g_ref,  # [1, BQ, H*dvh]  cotangent tile
    tsq_ref,  # [1, 1, NQP]  per b
    tsk_ref,  # [1, 1, NCP]  per b
    posb_ref,  # [BQ, NQP + NCP - BQ]
    tsw_ref,  # [1, lane-padded NB+1]
    dq_ref,  # [1, BQ, H*dh]
    dk_ref,  # [1, NCP, H*dh]   accumulated across qi, resident per b
    dv_ref,  # [1, NCP, H*dvh]
    dpw_ref,  # [1, NQP + NCP]  grid-resident diagonal-sum stripe
    dtw_ref,  # [1, lane-padded NB+1]  grid-resident bucket histogram
    *,
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
    nq_valid: int,
    nc_valid: int,
    nqp: int,
    num_heads: int,
    dh: int,
    dvh: int,
):
    qi = pl.program_id(1)
    offd = offd_ref[0]
    k_off = (nqp - bq) // bk

    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
    row_ids = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    qs = [
        _head_cols(q_ref[0], h, dh).astype(jnp.float32)
        for h in range(num_heads)
    ]
    gs = [
        _head_cols(g_ref[0], h, dvh).astype(jnp.float32)
        for h in range(num_heads)
    ]

    @pl.when(qi == 0)
    def _init_kv():
        dk_ref[0] = jnp.zeros(dk_ref.shape[1:], dk_ref.dtype)
        dv_ref[0] = jnp.zeros(dv_ref.shape[1:], dv_ref.dtype)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, qi == 0))
    def _init_acc():
        dpw_ref[...] = jnp.zeros(dpw_ref.shape, dpw_ref.dtype)
        dtw_ref[...] = jnp.zeros(dtw_ref.shape, dtw_ref.dtype)

    lane_tw = jax.lax.broadcasted_iota(jnp.int32, (1, dtw_ref.shape[1]), 1)

    def body(kj, dq_accs):
        col_ids = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        live = jnp.logical_and(
            row_ids - col_ids >= offd,
            jnp.logical_and(row_ids < nq_valid, col_ids < nc_valid),
        )
        # recompute the shared bias exactly as the forward kernel does
        bias = posb_ref[:, pl.ds((kj - qi * (bq // bk) + k_off) * bk, bk)].astype(
            jnp.float32
        )
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)
        bucket = bucketize_timedelta(tsq[:, None] - tsk[None, :], num_buckets)
        bias = bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)

        sl = pl.ds(kj * bk, bk)
        dz_sum = jnp.zeros((bq, bk), dtype=jnp.float32)
        new_dq = []
        for h in range(num_heads):
            k_tile = _head_cols(k_ref[0, sl], h, dh).astype(jnp.float32)
            v_tile = _head_cols(v_ref[0, sl], h, dvh).astype(jnp.float32)
            s = jax.lax.dot_general(
                qs[h], k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = s + bias
            sig = jax.nn.sigmoid(z)
            p = jnp.where(live, z * sig * inv_n, 0.0)
            dp = jax.lax.dot_general(
                gs[h], v_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dz = jnp.where(live, dp * (sig + z * sig * (1.0 - sig)) * inv_n, 0.0)
            new_dq.append(dq_accs[h] + jax.lax.dot_general(
                dz, k_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            hc = slice(h * dh, (h + 1) * dh)
            dk_ref[0, sl, hc] = dk_ref[0, sl, hc] + jax.lax.dot_general(
                dz, qs[h], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hcv = slice(h * dvh, (h + 1) * dvh)
            dv_ref[0, sl, hcv] = dv_ref[0, sl, hcv] + jax.lax.dot_general(
                p, gs[h], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dz_sum = dz_sum + dz

        # d_pos_w: per-diagonal sum via the barrel-rotate skew (roll row
        # r left by r so diagonals align into lanes), column-sum, and
        # accumulate at the tile's 128-aligned stripe offset. Element
        # dz[r, c] is local diagonal d = kj*bk + c - qi*bq - r and lands
        # at stripe index nqp + d = base + (c - r + bq). See
        # ops/pallas/hstu_attention._bwd_fused_kernel for the original.
        ws = bq + bk
        sk = jnp.concatenate(
            [jnp.zeros((bq, bq), dtype=jnp.float32), dz_sum], axis=1
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

        # d_ts_w inline: sweep this tile's OCCURRING bucket range over
        # the head-summed dz, reusing the tile's buckets; 8 values per
        # iteration for ILP (see hstu_attention._bwd_fused_kernel)
        bmin = jnp.min(jnp.where(live, bucket, num_buckets + 1))
        bmax = jnp.max(jnp.where(live, bucket, -1))

        def bucket_body(i8, c):
            t0 = bmin + i8 * 8
            upd = jnp.zeros((1, dtw_ref.shape[1]), jnp.float32)
            for kk in range(8):
                t = t0 + kk
                s_ = jnp.sum(jnp.where(bucket == t, dz_sum, 0.0))
                upd = upd + s_ * (lane_tw == t).astype(jnp.float32)
            dtw_ref[...] = dtw_ref[...] + upd
            return c

        jax.lax.fori_loop(0, (bmax + 1 - bmin + 7) // 8, bucket_body, 0)
        return tuple(new_dq)

    n_kj = _live_n_kj(qi, bq, bk, offd, nq_valid, nc_valid)
    dq_accs = jax.lax.fori_loop(
        0, n_kj, body,
        tuple(jnp.zeros((bq, dh), dtype=jnp.float32) for _ in range(num_heads)),
    )
    dq = dq_accs[0] if num_heads == 1 else jnp.concatenate(dq_accs, axis=-1)
    dq_ref[0] = dq


def _bwd_impl(q, k, v, tsq_next, tsk, offd, pos_w, ts_w,
              inv_n, max_len, num_buckets, interpret, g):
    pr = _layout(q, k, v, tsq_next, tsk)
    b, h, nq, nc = pr["b"], pr["h"], pr["nq"], pr["nc"]
    bq, bk, nqp, ncp = pr["bq"], pr["bk"], pr["nqp"], pr["ncp"]
    dqk, dv = pr["dqk"], pr["dv"]

    offd_arr = jnp.asarray(offd, jnp.int32).reshape(1)
    posb = _pos_stripe(pos_w, offd_arr[0], nqp, ncp, bq, max_len)
    gm = pr["merge"](g, nqp, dv)

    m = nqp + ncp
    w_tw = _round_up(num_buckets + 1, 128)
    grid = (b, nqp // bq)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, bq=bq, bk=bk, num_buckets=num_buckets,
            inv_n=inv_n, nq_valid=nq, nc_valid=nc, nqp=nqp,
            num_heads=h, dh=dqk, dvh=dv,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, ncp, h * dqk), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, ncp, h * dv), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, bq, h * dqk), lambda bi, qi, o: (bi, qi, 0)),
                pl.BlockSpec((1, bq, h * dv), lambda bi, qi, o: (bi, qi, 0)),
                pl.BlockSpec((1, 1, nqp), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, 1, ncp), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((bq, nqp + ncp - bq), lambda bi, qi, o: (0, 0)),
                pl.BlockSpec((1, w_tw), lambda bi, qi, o: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, h * dqk), lambda bi, qi, o: (bi, qi, 0)),
                pl.BlockSpec((1, ncp, h * dqk), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, ncp, h * dv), lambda bi, qi, o: (bi, 0, 0)),
                pl.BlockSpec((1, m), lambda bi, qi, o: (0, 0)),
                pl.BlockSpec((1, w_tw), lambda bi, qi, o: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, nqp, h * dqk), jnp.float32),
            jax.ShapeDtypeStruct((b, ncp, h * dqk), jnp.float32),
            jax.ShapeDtypeStruct((b, ncp, h * dv), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, w_tw), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * nq * nc * (dqk + dv),
            bytes_accessed=4 * b * h * (nq + nc) * (dqk + dv),
            transcendentals=b * h * nq * nc,
        ),
        interpret=interpret,
    )(offd_arr, pr["km"], pr["vm"], pr["qm"], gm, pr["tsq_b"], pr["tsk_b"],
      posb, _tsw_2d(ts_w))
    dqm, dkm, dvm, dpw_acc, dtw_acc = outs

    dq = dqm[:, :nq].reshape(b, nq, h, dqk).astype(q.dtype)
    dk = dkm[:, :nc].reshape(b, nc, h, dqk).astype(k.dtype)
    dv_out = dvm[:, :nc].reshape(b, nc, h, dv).astype(v.dtype)

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
    return dq, dk, dv_out, dpw.astype(pos_w.dtype), dtw.astype(ts_w.dtype)


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
