"""Fused Pallas chunk kernel for ring (sequence-parallel) HSTU attention.

The ring bodies in parallel/ring_attention.py accumulate, per ring step,
the partial HSTU attention of the local query shard against one visiting
K/V chunk:

    partial[b, n, h, :] = sum_m silu(q.k + bias[n, m]) * inv_n
                                * mask[n, m] * v[b, m, h, :]

This kernel is the TPU-fused form of that chunk product (the jnp body
materializes the [B, H, Nq, Nc] bias/attention in HBM; reference analog:
sequential_encoders/hstu.py:134-205 at chunk granularity). Design:

- The chunk's GLOBAL row/col offsets are traced values (mesh axis_index),
  so offset-dependent terms are handed in as data rather than baked into
  the kernel: the caller passes the positional-bias tile [Nq, Nc]
  (computed from pos_w with the exact Kronecker one-hot selection, so
  d_pos_w flows through plain einsum autodiff) and the causal/padding
  mask tile [Nq, Nc]. The kernel itself is offset-free.
- The timestamp-bucket bias is generated IN-kernel from the raw
  timestamps with the same Mosaic lane-gather used by the full-sequence
  kernel (ops/pallas/hstu_attention.py), so no [B, Nq, Nc] bias tensor
  ever hits HBM.
- Backward recomputes through plain jnp at chunk granularity
  (custom_vjp): transient [B, H, Nq, Nc] chunk tensors, d_ts_w via the
  Kronecker one-hot MXU contraction. The ring's reverse ppermute
  structure stays autodiff-derived in parallel/ring_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygenerativerecommenders_tpu.ops.hstu_attention import bucketize_timedelta
from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
    _round_up,
    _ts_bias_gather,
)


def _chunk_kernel(
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, NCP, D]
    v_ref,  # [1, NCP, DV]
    tsq_ref,  # [1, 1, NQP]  next-item timestamps for query rows
    tsk_ref,  # [1, 1, NCP]  timestamps for key cols
    posb_ref,  # [BQ, NCP]   positional-bias tile (offset-dependent, precomputed)
    mask_ref,  # [BQ, NCP]   causal/padding mask tile (0/1 f32)
    tsw_ref,  # [1, lane-padded NB+1]
    out_ref,  # [1, BQ, DV]
    *,
    bq: int,
    bk: int,
    num_buckets: int,
    inv_n: float,
):
    qi = pl.program_id(2)
    ncp = k_ref.shape[1]

    q = q_ref[0].astype(jnp.float32)
    tsq = tsq_ref[0, 0, pl.ds(qi * bq, bq)].astype(jnp.int32)
    acc = jnp.zeros((bq, v_ref.shape[2]), dtype=jnp.float32)

    def body(kj, acc):
        k_tile = k_ref[0, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        v_tile = v_ref[0, pl.ds(kj * bk, bk), :].astype(jnp.float32)
        tsk = tsk_ref[0, 0, pl.ds(kj * bk, bk)].astype(jnp.int32)
        s = jax.lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        bias = posb_ref[:, pl.ds(kj * bk, bk)].astype(jnp.float32)
        delta = tsq[:, None] - tsk[None, :]
        bucket = bucketize_timedelta(delta, num_buckets)
        bias = bias + _ts_bias_gather(bucket, tsw_ref, num_buckets)
        a = jax.nn.silu(s + bias) * inv_n
        a = a * mask_ref[:, pl.ds(kj * bk, bk)].astype(jnp.float32)
        return acc + jax.lax.dot_general(
            a, v_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # NOTE: all key tiles are swept — the chunk's global offsets are
    # traced (ring axis_index), so unlike the full-sequence kernel there
    # is no static causal frontier to bound the loop with. Fully-dead
    # CHUNKS are already skipped at the ring layer (zigzag lax.cond); the
    # residual waste is ~half the tiles of the one diagonal chunk.
    acc = jax.lax.fori_loop(0, ncp // bk, body, acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _fwd_impl(q, k, v, tsq_next, tsk, pos_bias, mask, ts_w,
              inv_n, num_buckets, interpret):
    b, nq, h, dqk = q.shape
    nc, dv = k.shape[1], v.shape[-1]
    bq = bk = 128
    nqp, ncp = _round_up(nq, bq), _round_up(nc, bk)
    d_pad, dv_pad = _round_up(dqk, 128), _round_up(dv, 128)

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

    qf = fold(q, nqp, d_pad)
    kf = fold(k, ncp, d_pad)
    vf = fold(v, ncp, dv_pad)

    def fold_ts(ts, n_target):
        t = pad_to(jnp.asarray(ts).astype(jnp.int32), n_target, 1)
        if h > 1:
            t = jnp.repeat(t, h, axis=0)
        return t[:, None, :]

    tsqf = fold_ts(tsq_next, nqp)
    tskf = fold_ts(tsk, ncp)

    # mask pads with 0 (padded cols contribute nothing; padded out rows
    # are sliced off), pos bias pads with 0
    posb = pad_to(pad_to(jnp.asarray(pos_bias, jnp.float32), nqp, 0), ncp, 1)
    maskf = pad_to(pad_to(jnp.asarray(mask, jnp.float32), nqp, 0), ncp, 1)

    nb1 = ts_w.shape[0]
    ts_w_2d = jnp.pad(
        jnp.asarray(ts_w, jnp.float32).reshape(1, -1),
        ((0, 0), (0, _round_up(nb1, 128) - nb1)),
    )

    grid = (b * h, 1, nqp // bq)
    out = pl.pallas_call(
        functools.partial(
            _chunk_kernel, bq=bq, bk=bk, num_buckets=num_buckets, inv_n=inv_n
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bh_, _, qi: (bh_, qi, 0)),
            pl.BlockSpec((1, ncp, d_pad), lambda bh_, _, qi: (bh_, 0, 0)),
            pl.BlockSpec((1, ncp, dv_pad), lambda bh_, _, qi: (bh_, 0, 0)),
            pl.BlockSpec((1, 1, nqp), lambda bh_, _, qi: (bh_, 0, 0)),
            pl.BlockSpec((1, 1, ncp), lambda bh_, _, qi: (bh_, 0, 0)),
            pl.BlockSpec((bq, ncp), lambda bh_, _, qi: (qi, 0)),
            pl.BlockSpec((bq, ncp), lambda bh_, _, qi: (qi, 0)),
            pl.BlockSpec(
                (1, _round_up(num_buckets + 1, 128)), lambda bh_, _, qi: (0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, bq, dv_pad), lambda bh_, _, qi: (bh_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, nqp, dv_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq * nc * (dqk + dv),
            bytes_accessed=4 * b * h * (nq + nc) * (dqk + dv),
            transcendentals=b * h * nq * nc,
        ),
        interpret=interpret,
    )(qf, kf, vf, tsqf, tskf, posb, maskf, ts_w_2d)

    return out[:, :nq, :dv].reshape(b, h, nq, dv).transpose(0, 2, 1, 3)


# d_ts_w Kronecker radix (see ops/pallas/hstu_attention._dtw_from_dz)
_LO = 12


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _chunk_attention(q, k, v, tsq_next, tsk, pos_bias, mask, ts_w,
                     inv_n, num_buckets, interpret):
    return _fwd_impl(
        q, k, v, tsq_next, tsk, pos_bias, mask, ts_w, inv_n, num_buckets, interpret
    )


def _chunk_fwd(q, k, v, tsq_next, tsk, pos_bias, mask, ts_w,
               inv_n, num_buckets, interpret):
    out = _fwd_impl(
        q, k, v, tsq_next, tsk, pos_bias, mask, ts_w, inv_n, num_buckets, interpret
    )
    return out, (q, k, v, tsq_next, tsk, pos_bias, mask, ts_w)


def _chunk_bwd(inv_n, num_buckets, interpret, res, g):
    """jnp recompute at chunk granularity (transient [B, H, Nq, Nc]).

    The time-bucket bias is rebuilt with the same Kronecker one-hot
    factors used for d_ts_w (exact single-term selections) instead of a
    ts_w[bucket] gather — TPU gathers cost ~cycles/element."""
    q, k, v, tsq_next, tsk, pos_bias, mask, ts_w = res
    delta = tsq_next[:, :, None] - tsk[:, None, :]  # [B, Nq, Nc]
    bucket = bucketize_timedelta(delta, num_buckets)

    nb1 = ts_w.shape[0]
    n_hi = (num_buckets + _LO) // _LO
    bu = bucket.astype(jnp.uint8)
    hi = bu // jnp.uint8(_LO)
    lo = bu % jnp.uint8(_LO)
    oh_hi = (hi[..., None] == jnp.arange(n_hi, dtype=jnp.uint8)).astype(jnp.bfloat16)
    oh_lo = (lo[..., None] == jnp.arange(_LO, dtype=jnp.uint8)).astype(jnp.bfloat16)
    w2 = jnp.pad(ts_w.astype(jnp.float32), (0, n_hi * _LO - nb1)).reshape(
        n_hi, _LO
    )
    t1 = jnp.einsum("bnmh,hl->bnml", oh_hi, w2, preferred_element_type=jnp.float32)
    tsb = jnp.einsum(
        "bnml,bnml->bnm", oh_lo, t1, preferred_element_type=jnp.float32
    )

    s = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    z = s + (pos_bias[None, :, :] + tsb)[:, None, :, :]
    sig = jax.nn.sigmoid(z)
    m = mask.astype(jnp.float32)[None, None, :, :]
    a = z * sig * inv_n * m  # the forward attention weights
    gf = g.astype(jnp.float32)
    dp = jnp.einsum("bnhd,bmhd->bhnm", gf, v, preferred_element_type=jnp.float32)
    dz = dp * (sig + z * sig * (1.0 - sig)) * inv_n * m
    dq = jnp.einsum("bhnm,bmhd->bnhd", dz, k, preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhnm,bnhd->bmhd", dz, q, preferred_element_type=jnp.float32)
    dv = jnp.einsum("bhnm,bnhd->bmhd", a, gf, preferred_element_type=jnp.float32)
    dposb = dz.sum(axis=(0, 1))  # [Nq, Nc]

    # d_ts_w: the same factors contract the head-summed dz on the MXU
    dz_h = dz.sum(axis=1)  # [B, Nq, Nc]
    dtsw = jnp.einsum(
        "bnm,bnmh,bnml->hl", dz_h, oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(-1)[:nb1]

    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        None, None, dposb.astype(pos_bias.dtype), None, dtsw.astype(ts_w.dtype),
    )


_chunk_attention.defvjp(_chunk_fwd, _chunk_bwd)


def pos_bias_tile(pos_w, pos_idx):
    """pos_w[pos_idx] as an exact two-stage Kronecker one-hot selection —
    works with TRACED pos_idx (ring offsets are mesh axis_index values)
    and differentiates to d_pos_w through plain einsums, with no TPU
    gather/scatter in either direction."""
    table = pos_w.shape[0]
    lo_r = 128
    n_hi = (table + lo_r - 1) // lo_r
    w2 = jnp.pad(pos_w.astype(jnp.float32), (0, n_hi * lo_r - table)).reshape(
        n_hi, lo_r
    )
    oh_hi = (pos_idx[..., None] // lo_r == jnp.arange(n_hi)).astype(jnp.float32)
    t1 = jnp.einsum("nmh,hl->nml", oh_hi, w2, preferred_element_type=jnp.float32)
    oh_lo = (pos_idx[..., None] % lo_r == jnp.arange(lo_r)).astype(jnp.float32)
    return jnp.einsum("nml,nml->nm", oh_lo, t1, preferred_element_type=jnp.float32)


def hstu_chunk_attention(
    q, k, v, tsq_next, tsk, pos_bias, mask, ts_w, *,
    inv_n: float, num_buckets: int, interpret: bool = False,
):
    """Fused partial HSTU attention of local queries vs one K/V chunk.

    q: [B, Nq, H, Dqk]; k/v: [B, Nc, H, Dqk/Dv]; tsq_next: [B, Nq] (the
    ext[n+1] timestamps of the query rows); tsk: [B, Nc]; pos_bias /
    mask: [Nq, Nc] tiles carrying the offset-dependent positional bias
    and causal/padding structure. Returns [B, Nq, H, Dv] float32.
    Differentiable in q, k, v, pos_bias, ts_w.
    """
    return _chunk_attention(
        q, k, v, tsq_next, tsk, pos_bias, mask, ts_w,
        float(inv_n), int(num_buckets), bool(interpret),
    )
