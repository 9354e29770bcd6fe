"""Fused sampled-softmax negative term: Pallas TPU kernel.

Computes ops/dense_negatives.py's count-weighted logsumexp

    neg_lse[i] = log sum_x cmask[i,x] * exp(q[i]·cat[x] / tau)
    cmask[i,x] = count[i,x] * [x != positive_offset[i]]

without ever writing the [BT, X] logit matrix to HBM: each row tile's
logits live in VMEM for the one pass that needs them (matmul -> masked
max -> exp-sum). The backward recomputes the tile's logits (one cheap
MXU matmul) and reduces straight to dq and d(catalog) — two more MXU
matmuls per tile — so the whole negative path never materializes a
[BT, X] tensor in HBM in either direction.

XLA equivalent cost at the ml-1m recipe (BT=26880, X=3952): ~8 ms of
bandwidth-bound elementwise passes over 425 MB logits; this kernel does
~35 GFLOP of f32 MXU work + one 213 MB count read per direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_TINY = 1e-30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, *, inv_tau):
    q = q_ref[...].astype(jnp.float32)  # [BQ, D]
    cat = cat_ref[...].astype(jnp.float32)  # [XP, D]
    al = (
        jax.lax.dot_general(
            q, cat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * inv_tau
    )  # [BQ, XP]
    cnt = cnt_ref[...].astype(jnp.float32)
    sup = sup_ref[0, :]  # [BQ] i32
    x_iota = jax.lax.broadcasted_iota(jnp.int32, al.shape, 1)
    cmask = jnp.where(x_iota == sup[:, None], 0.0, cnt)
    # select BEFORE exponentiating (masked logits above the surviving max
    # would overflow exp into 0*inf = NaN)
    al_live = jnp.where(cmask > 0, al, _NEG_INF)
    m = jnp.max(al_live, axis=1)  # [BQ]
    m_safe = jnp.where(m > 0.5 * _NEG_INF, m, 0.0)
    s = jnp.sum(cmask * jnp.exp(al_live - m_safe[:, None]), axis=1)
    m_ref[0, :] = m_safe
    s_ref[0, :] = s


def _bwd_kernel(
    q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref,
    dq_ref, dcat_ref, *, inv_tau
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dcat_ref[...] = jnp.zeros(dcat_ref.shape, dtype=dcat_ref.dtype)

    q = q_ref[...].astype(jnp.float32)
    cat = cat_ref[...].astype(jnp.float32)
    al = (
        jax.lax.dot_general(
            q, cat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * inv_tau
    )
    cnt = cnt_ref[...].astype(jnp.float32)
    sup = sup_ref[0, :]
    x_iota = jax.lax.broadcasted_iota(jnp.int32, al.shape, 1)
    cmask = jnp.where(x_iota == sup[:, None], 0.0, cnt)
    m_safe = m_ref[0, :]
    s = s_ref[0, :]
    gl = gl_ref[0, :]
    # d neg_lse / d al[x] = cmask * exp(al - m) / S; rows with S == 0 get
    # zero upstream gradient (logaddexp at -inf), so 0/tiny is safe
    w = gl / jnp.maximum(s, _TINY)  # [BQ]
    al_live = jnp.where(cmask > 0, al, _NEG_INF)
    dal = cmask * jnp.exp(al_live - m_safe[:, None]) * w[:, None] * inv_tau
    dq_ref[...] = jax.lax.dot_general(
        dal, cat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dcat_ref[...] += jax.lax.dot_general(
        dal, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_dense_neg_lse(q2, norm_catalog, count, sup_off, temperature):
    """neg_lse [BT] for flattened queries q2 [BT, D] vs catalog [X, D].

    count: [BT, X] multiplicity matrix (non-differentiable);
    sup_off: [BT] catalog offset of each row's positive (-1 = none).
    """
    m, s = _fused_fwd(q2, norm_catalog, count, sup_off, temperature)
    return _lse_from_ms(m, s)


def _lse_from_ms(m, s):
    return jnp.where(
        s > 0, m + jnp.log(jnp.maximum(s, _TINY)), jnp.float32(-jnp.inf)
    )


def _prep(q2, norm_catalog, count):
    bt, d = q2.shape
    x = norm_catalog.shape[0]
    bq = 128
    bt_pad = _round_up(bt, bq)
    d_pad = _round_up(d, 128)
    x_pad = _round_up(x, 128)
    assert count.shape[1] in (x, x_pad), count.shape

    def pad2(a, r, c):
        return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))

    return (
        pad2(q2, bt_pad, d_pad),
        pad2(norm_catalog, x_pad, d_pad),
        pad2(count, bt_pad, x_pad),  # no-op on the lane dim when the
        # caller passes count at its Kronecker-natural x_pad width (bf16)
        bt, d, x, bq, bt_pad, d_pad, x_pad,
    )


def _fused_fwd(q2, norm_catalog, count, sup_off, temperature):
    qp, catp, cntp, bt, d, x, bq, bt_pad, d_pad, x_pad = _prep(
        q2, norm_catalog, count
    )
    # padded rows: sup=-1, count rows are zero -> S=0 (ignored)
    supp = jnp.pad(
        sup_off.astype(jnp.int32), (0, bt_pad - bt), constant_values=-1
    )[None, :]
    grid = (bt_pad // bq,)
    m, s = pl.pallas_call(
        functools.partial(_fwd_kernel, inv_tau=1.0 / temperature),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
            pl.BlockSpec((x_pad, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((bq, x_pad), lambda i: (i, 0)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq), lambda i: (0, i)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, bt_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, bt_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qp, catp, cntp, supp)
    return m[0, :bt], s[0, :bt]


def _vjp_fwd(q2, norm_catalog, count, sup_off, temperature):
    m, s = _fused_fwd(q2, norm_catalog, count, sup_off, temperature)
    return _lse_from_ms(m, s), (q2, norm_catalog, count, sup_off, m, s)


def _vjp_bwd(temperature, residuals, gl):
    q2, norm_catalog, count, sup_off, m, s = residuals
    qp, catp, cntp, bt, d, x, bq, bt_pad, d_pad, x_pad = _prep(
        q2, norm_catalog, count
    )
    supp = jnp.pad(
        sup_off.astype(jnp.int32), (0, bt_pad - bt), constant_values=-1
    )[None, :]
    pad1 = lambda a: jnp.pad(a.astype(jnp.float32), (0, bt_pad - bt))[None, :]
    # rows with s == 0 have neg_lse = -inf; their upstream cotangent is 0
    # by logaddexp's gradient, but guard NaN-propagation anyway
    gl_clean = jnp.where(s > 0, gl, 0.0)
    grid = (bt_pad // bq,)
    dq, dcat = pl.pallas_call(
        functools.partial(_bwd_kernel, inv_tau=1.0 / temperature),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
            pl.BlockSpec((x_pad, d_pad), lambda i: (0, 0)),
            pl.BlockSpec((bq, x_pad), lambda i: (i, 0)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
            pl.BlockSpec((1, bq), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
            pl.BlockSpec((x_pad, d_pad), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((x_pad, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # dcat accumulates
        ),
    )(qp, catp, cntp, supp, pad1(m), pad1(s), pad1(gl_clean))
    return (
        dq[:bt, :d].astype(q2.dtype),
        dcat[:x, :d].astype(norm_catalog.dtype),
        None,  # count: integer multiplicities, non-differentiable
        None,  # sup_off
    )


fused_dense_neg_lse.defvjp(_vjp_fwd, _vjp_bwd)
