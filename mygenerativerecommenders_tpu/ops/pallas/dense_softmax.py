"""Fused sampled-softmax negative term: Pallas TPU kernels.

Computes ops/dense_negatives.py's count-weighted logsumexp

    neg_lse[i] = log sum_x cmask[i,x] * exp(q[i]·cat[x] / tau)
    cmask[i,x] = count[i,x] * [x != positive_offset[i]]

without ever writing the [BT, X] logit matrix to HBM: logits exist only
as per-tile VMEM blocks. The catalog axis is TILED (flash-attention-style
online max/sum carry), so the kernels hold only a [BQ, XB] logit block at
a time and scale to catalogs far beyond VMEM (an untiled version OOMs
scoped vmem at ml-20m's X=26744).

The backward recomputes each tile's logits (cheap MXU matmul) and reduces
straight to dq and d(catalog). It is split into TWO kernels so each
accumulator's grid visits are contiguous (a Pallas output block must be
revisited consecutively to accumulate):

  * dq kernel:   grid (bt, x) — dq[bt-tile] accumulates over inner x
  * dcat kernel: grid (x, bt) — dcat[x-block] accumulates over inner bt

XLA-equivalent cost at the ml-1m recipe (BT=26880, X=3952): ~8 ms of
bandwidth-bound elementwise passes over 425 MB logits; these kernels do
~46 GFLOP of f32 MXU work + count reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_TINY = 1e-30
_XB = 4096  # max catalog-axis tile (lanes); VMEM per tile ~ XB * 1.3 KB
_BQ3 = 512  # bt tile of the transposed-count (count3) kernels


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _d_pad(d: int) -> int:
    """Feature-dim padding: blocks covering the whole minor dim need not
    be 128-wide (see ops/pallas/hstu_attention._feature_pad) — keeping
    D=64 at its native size halves the q/catalog/dq/dcat DMA bytes,
    which is exactly what forced the 512-row bt tile on multi-x-block
    catalogs (catalog re-fetch per grid step)."""
    return _round_up(d, 128) if d >= 128 else _round_up(d, 8)


def _tile_logits(q_ref, cat_ref, cnt_ref, sup_ref, j, xb, inv_tau):
    """Shared per-tile prep: (masked-live logits, cmask) for x-block j."""
    q = q_ref[...].astype(jnp.float32)  # [BQ, D]
    cat = cat_ref[...].astype(jnp.float32)  # [XB, D]
    al = (
        jax.lax.dot_general(
            q, cat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * inv_tau
    )  # [BQ, XB]
    cnt = cnt_ref[...].astype(jnp.float32)
    sup = sup_ref[0, :]  # [BQ] i32
    x_global = j * xb + jax.lax.broadcasted_iota(jnp.int32, al.shape, 1)
    cmask = jnp.where(x_global == sup[:, None], 0.0, cnt)
    # select BEFORE exponentiating (masked logits above the surviving max
    # would overflow exp into 0*inf = NaN)
    al_live = jnp.where(cmask > 0, al, _NEG_INF)
    return al_live, cmask


def _fwd_kernel(
    q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, *, xb, inv_tau, single
):
    j = 0 if single else pl.program_id(1)
    al_live, cmask = _tile_logits(q_ref, cat_ref, cnt_ref, sup_ref, j, xb, inv_tau)

    m_blk = jnp.max(al_live, axis=1)  # [BQ] (raw; -1e30 if block all-dead)
    if single:
        # one x-block: no carry, no output reads (statically specialized)
        m_safe = jnp.where(m_blk > 0.5 * _NEG_INF, m_blk, 0.0)
        m_ref[0, :] = m_blk
        s_ref[0, :] = jnp.sum(cmask * jnp.exp(al_live - m_safe[:, None]), axis=1)
        return
    m_prev = jnp.where(j == 0, jnp.full_like(m_blk, _NEG_INF), m_ref[0, :])
    s_prev = jnp.where(j == 0, jnp.zeros_like(m_blk), s_ref[0, :])

    m_new = jnp.maximum(m_prev, m_blk)
    m_safe = jnp.where(m_new > 0.5 * _NEG_INF, m_new, 0.0)
    s_blk = jnp.sum(cmask * jnp.exp(al_live - m_safe[:, None]), axis=1)
    m_prev_safe = jnp.where(m_prev > 0.5 * _NEG_INF, m_prev, 0.0)
    # rescale the carry to the new max; s_prev is 0 whenever m_prev was
    # -inf, so the (arbitrary) scale there multiplies zero
    s_new = s_prev * jnp.exp(m_prev_safe - m_safe) + s_blk

    m_ref[0, :] = m_new
    s_ref[0, :] = s_new


def _dal_tile(
    q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref, j, xb, inv_tau
):
    al_live, cmask = _tile_logits(q_ref, cat_ref, cnt_ref, sup_ref, j, xb, inv_tau)
    m_safe = m_ref[0, :]
    s = s_ref[0, :]
    gl = gl_ref[0, :]
    # d neg_lse / d al[x] = cmask * exp(al - m) / S; rows with S == 0 get
    # zero upstream gradient (logaddexp at -inf), so 0/tiny is safe
    w = gl / jnp.maximum(s, _TINY)
    return cmask * jnp.exp(al_live - m_safe[:, None]) * w[:, None] * inv_tau


def _bwd_single_kernel(
    q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref,
    dq_ref, dcat_ref, *, xb, inv_tau
):
    """Single-x-block backward (xb == padded X): one kernel produces both
    grads — dcat's block is constant over the 1-D bt grid, so its visits
    are trivially contiguous and it can accumulate in place."""
    i = pl.program_id(0)
    dal = _dal_tile(
        q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref, 0, xb, inv_tau
    )
    q = q_ref[...].astype(jnp.float32)
    cat = cat_ref[...].astype(jnp.float32)
    dq_ref[...] = jax.lax.dot_general(
        dal, cat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    contrib = jax.lax.dot_general(
        dal, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dcat_ref[...] = jnp.where(i == 0, contrib, dcat_ref[...] + contrib)


def _bwd_dq_kernel(
    q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref, dq_ref, *, xb, inv_tau
):
    j = pl.program_id(1)
    dal = _dal_tile(
        q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref, j, xb, inv_tau
    )
    contrib = jax.lax.dot_general(
        dal, cat_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [BQ, D]
    dq_ref[...] = jnp.where(j == 0, contrib, dq_ref[...] + contrib)


def _bwd_dcat_kernel(
    q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref, dcat_ref, *, xb, inv_tau
):
    j = pl.program_id(0)  # x-block (outer); bt tiles run on the inner dim
    i = pl.program_id(1)
    dal = _dal_tile(
        q_ref, cat_ref, cnt_ref, sup_ref, m_ref, s_ref, gl_ref, j, xb, inv_tau
    )
    contrib = jax.lax.dot_general(
        dal, q_ref[...].astype(jnp.float32),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [XB, D]
    dcat_ref[...] = jnp.where(i == 0, contrib, dcat_ref[...] + contrib)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_dense_neg_lse(q2, norm_catalog, count, sup_off, temperature):
    """neg_lse [BT] for flattened queries q2 [BT, D] vs catalog [X, D].

    count: [BT, X or lane-padded X] multiplicity matrix (non-diff);
    sup_off: [BT] catalog offset of each row's positive (-1 = none).
    """
    m, s = _fused_fwd(q2, norm_catalog, count, sup_off, temperature)
    return _lse_from_ms(m, s)


def _lse_from_ms(m, s):
    m_safe = jnp.where(m > 0.5 * _NEG_INF, m, 0.0)
    return jnp.where(
        s > 0, m_safe + jnp.log(jnp.maximum(s, _TINY)), jnp.float32(-jnp.inf)
    )


def _prep(q2, norm_catalog, count):
    bt, d = q2.shape
    x = norm_catalog.shape[0]
    bq = 128
    bt_pad = _round_up(bt, bq)
    d_pad = _d_pad(d)
    # x tile: largest 128-multiple <= _XB that exactly divides the
    # lane-padded width, so count (born at that width) is never re-padded
    x_pad = _round_up(x, 128)
    n_lanes = x_pad // 128
    div = max(dd for dd in range(1, n_lanes + 1) if n_lanes % dd == 0 and 128 * dd <= _XB)
    xb = 128 * div
    assert count.shape[1] in (x, x_pad), count.shape

    def pad2(a, r, c):
        return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))

    return (
        pad2(q2, bt_pad, d_pad),
        pad2(norm_catalog, x_pad, d_pad),
        pad2(count, bt_pad, x_pad),  # all-zero pad columns: never counted
        bt, d, x, bq, xb, bt_pad, d_pad, x_pad,
    )


def _sup_padded(sup_off, bt, bt_pad):
    return jnp.pad(
        sup_off.astype(jnp.int32), (0, bt_pad - bt), constant_values=-1
    )[None, :]


def _fused_fwd(q2, norm_catalog, count, sup_off, temperature):
    qp, catp, cntp, bt, d, x, bq, xb, bt_pad, d_pad, x_pad = _prep(
        q2, norm_catalog, count
    )
    supp = _sup_padded(sup_off, bt, bt_pad)
    grid = (bt_pad // bq, x_pad // xb)
    m, s = pl.pallas_call(
        functools.partial(
            _fwd_kernel, xb=xb, inv_tau=1.0 / temperature,
            single=(x_pad == xb),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((xb, d_pad), lambda i, j: (j, 0)),
            pl.BlockSpec((bq, xb), lambda i, j: (i, j)),
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, bt_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, bt_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qp, catp, cntp, supp)
    return m[0, :bt], s[0, :bt]


def _vjp_fwd(q2, norm_catalog, count, sup_off, temperature):
    m, s = _fused_fwd(q2, norm_catalog, count, sup_off, temperature)
    return _lse_from_ms(m, s), (q2, norm_catalog, count, sup_off, m, s)


def _vjp_bwd(temperature, residuals, gl):
    q2, norm_catalog, count, sup_off, m, s = residuals
    qp, catp, cntp, bt, d, x, bq, xb, bt_pad, d_pad, x_pad = _prep(
        q2, norm_catalog, count
    )
    supp = _sup_padded(sup_off, bt, bt_pad)
    m_safe = jnp.where(m > 0.5 * _NEG_INF, m, 0.0)
    pad1 = lambda a: jnp.pad(a.astype(jnp.float32), (0, bt_pad - bt))[None, :]
    # rows with s == 0 have neg_lse = -inf; their upstream cotangent is 0
    # by logaddexp's gradient, but guard NaN-propagation anyway
    gl_clean = jnp.where(s > 0, gl, 0.0)
    row_args = (pad1(m_safe), pad1(s), pad1(gl_clean))
    inv_tau = 1.0 / temperature

    if xb == x_pad:
        dq, dcat = pl.pallas_call(
            functools.partial(_bwd_single_kernel, xb=xb, inv_tau=inv_tau),
            grid=(bt_pad // bq,),
            in_specs=[
                pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
                pl.BlockSpec((xb, d_pad), lambda i: (0, 0)),
                pl.BlockSpec((bq, xb), lambda i: (i, 0)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
                pl.BlockSpec((xb, d_pad), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bt_pad, d_pad), jnp.float32),
                jax.ShapeDtypeStruct((x_pad, d_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(qp, catp, cntp, supp, *row_args)
        return (
            dq[:bt, :d].astype(q2.dtype),
            dcat[:x, :d].astype(norm_catalog.dtype),
            None,
            None,
        )

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, xb=xb, inv_tau=inv_tau),
        grid=(bt_pad // bq, x_pad // xb),
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((xb, d_pad), lambda i, j: (j, 0)),
            pl.BlockSpec((bq, xb), lambda i, j: (i, j)),
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
            pl.BlockSpec((1, bq), lambda i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bt_pad, d_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qp, catp, cntp, supp, *row_args)

    dcat = pl.pallas_call(
        functools.partial(_bwd_dcat_kernel, xb=xb, inv_tau=inv_tau),
        grid=(x_pad // xb, bt_pad // bq),
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda j, i: (i, 0)),
            pl.BlockSpec((xb, d_pad), lambda j, i: (j, 0)),
            pl.BlockSpec((bq, xb), lambda j, i: (i, j)),
            pl.BlockSpec((1, bq), lambda j, i: (0, i)),
            pl.BlockSpec((1, bq), lambda j, i: (0, i)),
            pl.BlockSpec((1, bq), lambda j, i: (0, i)),
            pl.BlockSpec((1, bq), lambda j, i: (0, i)),
        ],
        out_specs=pl.BlockSpec((xb, d_pad), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((x_pad, d_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(qp, catp, cntp, supp, *row_args)

    return (
        dq[:bt, :d].astype(q2.dtype),
        dcat[:x, :d].astype(norm_catalog.dtype),
        None,  # count: integer multiplicities, non-differentiable
        None,  # sup_off
    )


fused_dense_neg_lse.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Transposed-count variant: consumes the count matrix in its EINSUM-NATIVE
# layout count3 [HB, BT, 128] (count3[h, i, l] = count[i, h*128 + l]) so the
# [BT, hi, lo] -> [BT, X] flatten — a real relayout copy on TPU (sublane
# re-tiling, ~1.3 ms at the ml-1m recipe; ~8.8 ms at ml-20m's X=26744) —
# never happens. The catalog axis is processed in 128-lane slices inside
# the kernel: per slice one [BQ, D] x [D, 128] MXU dot + VPU tile math,
# with an online (m, s) carry across slices (same math as the tiled
# kernels above). Blocks of the [HB, BT, 128] operand slice cleanly: the
# TILED dims of a rank-3 block are the last two (bt-tile sublanes, 128
# lanes), and the slice index h is a static leading offset.
#
# Catalogs whose padded width exceeds one VMEM x-block (_XB) are TILED
# over a second grid dimension of hb-slice groups, carrying (m, s) online
# across x-blocks exactly like the 2-D kernels; the backward splits into
# dq (grid bt, x) and dcat (grid x, bt) kernels so each accumulator's
# grid visits stay contiguous.
# ---------------------------------------------------------------------------


def _wide_al_cmask(q_ref, cat3_ref, cnt3_ref, j, hb, inv_tau):
    """Block-wide (masked-live logits, cmask), both [BQ, hb*128].

    The [hb, 128, D] catalog block is LAYOUT-IDENTICAL to [hb*128, D]
    (both h-major, 128 sublane rows, D lanes), so the logits come from one
    wide MXU dot — the per-slice dot + online-carry form measured 7x
    slower (serialized per-slice VPU reductions). The count block arrives
    b-major [BQ, hb, 128] — the count einsum's NATIVE output order, which
    kills the XLA-side [b,hi,lo]->[hi,b,lo] transpose (2.2 GB of HBM
    traffic, ~3.3 ms/step at ml-20m) — and the row-major [BQ, hb*128]
    flatten it needs here is a VMEM-local relayout.

    A uint32 count block is RADIX-256 PACKED [BQ, hb//4, 128] (four hi
    slices per lane, ops/dense_negatives.py:count_offsets_packed4): the
    four digit planes unpack with shifts and concatenate along lanes,
    which recovers the block's slices in original order because the
    packing is block-local plane-major (digit j holds slices
    [j*hb//4, (j+1)*hb//4)). This quarters the count-build einsum's
    reduction work in the XLA step context.
    """
    q = q_ref[...].astype(jnp.float32)  # [BQ, D]
    cat = cat3_ref[...].reshape(hb * 128, cat3_ref.shape[2])  # free bitcast
    al = (
        jax.lax.dot_general(
            q, cat.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * inv_tau
    )  # [BQ, W]
    cnt_raw = cnt3_ref[...]
    if cnt_raw.dtype == jnp.uint32:
        gb = cnt_raw.shape[1]
        pw = cnt_raw.reshape(cnt_raw.shape[0], gb * 128)
        cnt = jnp.concatenate(
            [
                ((pw >> jnp.uint32(8 * dig)) & jnp.uint32(255)).astype(
                    jnp.int32
                )
                for dig in range(4)
            ],
            axis=1,
        )  # [BQ, hb*128], original slice order
    else:
        # relayout [BQ, hb, 128] -> [BQ, hb*128] while still u8 (4x less
        # VMEM shuffle traffic than after the f32 conversion)
        cnt = cnt_raw.reshape(cnt_raw.shape[0], hb * 128)
        if cnt.dtype == jnp.uint8:  # Mosaic lacks u8->f32; hop via i32
            cnt = cnt.astype(jnp.int32)
    # accidental-hit masking already happened at count-build time (the
    # caller folds it into the count fusion / the packed draw weights),
    # so cmask IS the count
    cmask = cnt.astype(jnp.float32)
    al_live = jnp.where(cmask > 0, al, _NEG_INF)
    return al_live, cmask, cat


def _fwd_kernel3(
    q_ref,  # [BQ, D]
    cat3_ref,  # [HB, 128, D]
    cnt3_ref,  # [BQ, HB, 128] bf16/u8 (b-major; hit-masked at build)
    m_ref,  # out [1, 1, BQ]
    s_ref,  # out [1, 1, BQ]
    *,
    hb: int,
    inv_tau: float,
    single: bool,
):
    # per-x-block partials, each output block written exactly ONCE: no
    # carry, so the grid runs x-OUTER and Pallas fetches each catalog
    # block a single time (the online-carry form needed x inner and
    # re-fetched the catalog once per bt tile — ~750 MB/step at ml-20m).
    # The tiny [n_j, BT] partials combine in jnp afterwards.
    j = 0 if single else pl.program_id(0)
    al_live, cmask, _ = _wide_al_cmask(
        q_ref, cat3_ref, cnt3_ref, j, hb, inv_tau
    )
    m_blk = jnp.max(al_live, axis=1)  # [BQ] (raw; -1e30 if block all-dead)
    m_safe = jnp.where(m_blk > 0.5 * _NEG_INF, m_blk, 0.0)
    m_ref[0, 0, :] = m_blk
    s_ref[0, 0, :] = jnp.sum(cmask * jnp.exp(al_live - m_safe[:, None]), axis=1)


def _wide_dal(q_ref, cat3_ref, cnt3_ref, m_ref, s_ref,
              gl_ref, j, hb, inv_tau):
    """(dal, q, cat) for one x-block: dal [BQ, hb*128] wide."""
    al_live, cmask, cat = _wide_al_cmask(
        q_ref, cat3_ref, cnt3_ref, j, hb, inv_tau
    )
    m_safe = m_ref[0, :]
    s = s_ref[0, :]
    w = gl_ref[0, :] / jnp.maximum(s, _TINY)
    dal = cmask * jnp.exp(al_live - m_safe[:, None]) * w[:, None] * inv_tau
    return dal, q_ref[...].astype(jnp.float32), cat


def _bwd_kernel3(
    q_ref,  # [BQ, D]
    cat3_ref,  # [HB, 128, D]
    cnt3_ref,  # [BQ, HB, 128]
    m_ref, s_ref, gl_ref,  # [1, BQ] rows
    dq_ref,  # out [BQ, D]
    dcat3_ref,  # out [HB, 128, D], accumulated over the bt grid
    *,
    hb: int,
    inv_tau: float,
):
    """Single-x-block backward: one pass produces both grads (dal shared)."""
    i = pl.program_id(0)
    dal, q, cat = _wide_dal(
        q_ref, cat3_ref, cnt3_ref, m_ref, s_ref, gl_ref,
        0, hb, inv_tau,
    )
    dq_ref[...] = jax.lax.dot_general(
        dal, cat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    contrib = jax.lax.dot_general(
        dal, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [W, D] — layout-identical to the [HB, 128, D] output block
    contrib = contrib.reshape(dcat3_ref.shape)
    dcat3_ref[...] = jnp.where(i == 0, contrib, dcat3_ref[...] + contrib)


def _bwd_dq_kernel3(
    q_ref, cat3_ref, cnt3_ref, m_ref, s_ref, gl_ref,
    dq_ref,  # out [BQ, D], accumulated over the x grid (inner dim)
    *,
    hb: int,
    inv_tau: float,
):
    j = pl.program_id(1)
    dal, _, cat = _wide_dal(
        q_ref, cat3_ref, cnt3_ref, m_ref, s_ref, gl_ref,
        j, hb, inv_tau,
    )
    dq = jax.lax.dot_general(
        dal, cat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[...] = jnp.where(j == 0, dq, dq_ref[...] + dq)


def _bwd_dcat_kernel3(
    q_ref, cat3_ref, cnt3_ref, m_ref, s_ref, gl_ref,
    dcat3_ref,  # out [HB, 128, D], accumulated over the bt grid (inner dim)
    *,
    hb: int,
    inv_tau: float,
):
    j = pl.program_id(0)  # x-block (outer); bt tiles run on the inner dim
    i = pl.program_id(1)
    dal, q, _ = _wide_dal(
        q_ref, cat3_ref, cnt3_ref, m_ref, s_ref, gl_ref,
        j, hb, inv_tau,
    )
    contrib = jax.lax.dot_general(
        dal, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(dcat3_ref.shape)
    dcat3_ref[...] = jnp.where(i == 0, contrib, dcat3_ref[...] + contrib)


def _hb_blocks(n_lanes: int) -> tuple:
    """(hb, n_j): hi-slices per x-block and number of x-blocks. hb maxes
    out at _XB//128; beyond that the catalog tiles over a second grid dim,
    choosing the hb with the least zero-slice padding (ties -> larger hb,
    i.e. fewer blocks). Tiled hb must be a sublane multiple (8): the
    b-major count block [BQ, hb, 128] carries hb on the sublane dim, and
    Mosaic requires partial blocks there to be 8-divisible."""
    max_hb = _XB // 128
    if n_lanes <= max_hb:
        return n_lanes, 1
    best = None
    for hb in range(max_hb, 0, -8):
        n_j = -(-n_lanes // hb)
        waste = hb * n_j - n_lanes
        if best is None or waste < best[0]:
            best = (waste, hb, n_j)
        if waste == 0:
            break
    return best[1], best[2]


def _hb_blocks_packed(n_lanes: int) -> tuple | None:
    """x-block split for RADIX-256 PACKED u32 counts: hb must be a
    multiple of 4 (four slices per packed lane) and the [BQ, hb//4, 128]
    count block's sublane dim (hb//4) must be 8-divisible when the block
    is partial — so tiled catalogs use hb = 32 exactly, and single-block
    catalogs round n_lanes up to a multiple of 4 (full-cover blocks are
    exempt from the 8-divisibility rule). Returns None when no valid
    packed tiling exists (x-block budget below 32 slices) — callers fall
    back to the unpacked u8 path."""
    max_hb = _XB // 128
    if n_lanes <= max_hb:
        return _round_up(n_lanes, 4), 1
    if max_hb < 32:
        return None
    return 32, -(-n_lanes // 32)


def hi_blocks(x: int, packed: bool = False) -> tuple:
    """(hb, n_j) x-block split for catalog size x (see _hb_blocks).

    hi_pad = hb * n_j is the hi-digit count the transposed-count kernels
    expect; callers that build the count tensor at this width (and
    sentinel-pad offsets past hi_pad * 128) let _prep3 skip every pad
    copy of the count buffer. packed=True gives the split for u32
    radix-256 packed counts (count tensor width hi_pad // 4).
    """
    n_lanes = _round_up(x, 128) // 128
    return _hb_blocks_packed(n_lanes) if packed else _hb_blocks(n_lanes)


def bt_tile(x: int, packed: bool = False) -> int:
    """bt-tile width of the transposed-count kernels for catalog size x.

    Multi-x-block catalogs (n_j > 1) re-fetch the ~2 MB catalog block
    every grid step, so a 128-row bt tile is DMA-bound (2.4 us fetch vs
    ~1.3 us of MXU work at D=128); 512 rows quadruple the arithmetic
    intensity for ~10 MB of VMEM working set (measured ml-20m 55 -> 54
    ms/step). Single-block catalogs keep the whole catalog VMEM-resident
    across the bt grid, where narrow tiles pipeline better (measured
    ml-1m 11.1 vs 12.7 ms/step at 512).
    """
    n_hi = _round_up(x, 128) // 128
    _, n_j = _hb_blocks_packed(n_hi) if packed else _hb_blocks(n_hi)
    return _BQ3 if n_j > 1 else 128


def _prep3(q2, norm_catalog, count3):
    packed = count3.dtype == jnp.uint32
    bt, d = q2.shape
    x = norm_catalog.shape[0]
    bq = bt_tile(x, packed=packed)
    bt_pad = _round_up(bt, bq)
    d_pad = _d_pad(d)
    n_hi = _round_up(x, 128) // 128
    hb, n_j = _hb_blocks_packed(n_hi) if packed else _hb_blocks(n_hi)
    # count3 is b-major [BT, HI, 128] — the one-hot count einsum's native
    # output order, so no physical transpose is ever materialized. The
    # fast path (sampled_softmax_dense_neg_lse) builds it already padded
    # on both axes (sentinel-padded offsets + hi-one-hot at hb*n_j width);
    # a post-hoc pad here copies the whole buffer, so it only runs for
    # direct callers on unpadded inputs (tests, ad-hoc use). Packed u32
    # counts carry four slices per lane: width hb*n_j//4, always born
    # fully padded by count_offsets_packed4.
    hi_width = hb * n_j // 4 if packed else hb * n_j
    assert count3.shape[1] in ((hi_width,) if packed else (n_hi, hi_width)) and (
        count3.shape[0] in (bt, bt_pad)
    ), (count3.shape, n_hi, hi_width, bt, bt_pad)
    x_pad = n_j * hb * 128  # zero-padded slices count nothing: exact
    qp = jnp.pad(q2, ((0, bt_pad - bt), (0, d_pad - d)))
    cat3 = jnp.pad(
        norm_catalog, ((0, x_pad - x), (0, d_pad - d))
    ).reshape(n_j * hb, 128, d_pad)
    cnt3 = jnp.pad(
        count3,
        (
            (0, bt_pad - count3.shape[0]),
            (0, hi_width - count3.shape[1]),
            (0, 0),
        ),
    )
    return qp, cat3, cnt3, bt, d, x, bq, bt_pad, d_pad, hb, n_j


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dense_neg_lse_t(q2, norm_catalog, count3, temperature):
    """neg_lse [BT] — 3-D-count fast path (any catalog size).

    count3: [BT, ceil(X/128), 128] bf16/u8 multiplicities, b-major
    (einsum-native; non-diff) with the accidental-hit mask ALREADY
    APPLIED (zero the positive's lane at count-build time) — see
    count_offsets_b and sampled_softmax_dense_neg_lse. Same math as
    fused_dense_neg_lse, different operand layout; catalogs beyond one
    VMEM x-block tile over a second grid dimension as per-block
    partials combined in jnp.
    """
    m, s = _fused_fwd3(q2, norm_catalog, count3, temperature)
    return _lse_from_ms(m, s)


def _fused_fwd3(q2, norm_catalog, count3, temperature):
    qp, cat3, cnt3, bt, d, x, bq, bt_pad, d_pad, hb, n_j = _prep3(
        q2, norm_catalog, count3
    )
    cb = hb // 4 if cnt3.dtype == jnp.uint32 else hb
    m_p, s_p = pl.pallas_call(
        functools.partial(
            _fwd_kernel3, hb=hb, inv_tau=1.0 / temperature, single=(n_j == 1)
        ),
        grid=(n_j, bt_pad // bq),
        in_specs=[
            pl.BlockSpec((bq, d_pad), lambda j, i: (i, 0)),
            pl.BlockSpec((hb, 128, d_pad), lambda j, i: (j, 0, 0)),
            pl.BlockSpec((bq, cb, 128), lambda j, i: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq), lambda j, i: (j, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda j, i: (j, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_j, 1, bt_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_j, 1, bt_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,  # wide [BQ3, hb*128] tiles
        ),
    )(qp, cat3, cnt3)
    m_p, s_p = m_p[:, 0, :], s_p[:, 0, :]
    if n_j == 1:
        return m_p[0, :bt], s_p[0, :bt]
    # combine the per-x-block partials (tiny [n_j, BT] arrays)
    m = jnp.max(m_p, axis=0)
    m_safe = jnp.where(m > 0.5 * _NEG_INF, m, 0.0)
    m_p_safe = jnp.where(m_p > 0.5 * _NEG_INF, m_p, 0.0)
    s = jnp.sum(s_p * jnp.exp(m_p_safe - m_safe[None, :]), axis=0)
    return m[:bt], s[:bt]


def _vjp_fwd3(q2, norm_catalog, count3, temperature):
    m, s = _fused_fwd3(q2, norm_catalog, count3, temperature)
    return _lse_from_ms(m, s), (q2, norm_catalog, count3, m, s)


def _vjp_bwd3(temperature, residuals, gl):
    q2, norm_catalog, count3, m, s = residuals
    qp, cat3, cnt3, bt, d, x, bq, bt_pad, d_pad, hb, n_j = _prep3(
        q2, norm_catalog, count3
    )
    cb = hb // 4 if cnt3.dtype == jnp.uint32 else hb
    m_safe = jnp.where(m > 0.5 * _NEG_INF, m, 0.0)
    pad1 = lambda a: jnp.pad(a.astype(jnp.float32), (0, bt_pad - bt))[None, :]
    gl_clean = jnp.where(s > 0, gl, 0.0)
    row_args = (pad1(m_safe), pad1(s), pad1(gl_clean))
    inv_tau = 1.0 / temperature
    row_spec = lambda: pl.BlockSpec((1, bq), lambda i, j: (0, i))

    if n_j == 1:
        # one x-block: a single pass shares dal between both grads
        dq, dcat3 = pl.pallas_call(
            functools.partial(_bwd_kernel3, hb=hb, inv_tau=inv_tau),
            grid=(bt_pad // bq,),
            in_specs=[
                pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
                pl.BlockSpec((hb, 128, d_pad), lambda i: (0, 0, 0)),
                pl.BlockSpec((bq, cb, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
                pl.BlockSpec((1, bq), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((bq, d_pad), lambda i: (i, 0)),
                pl.BlockSpec((hb, 128, d_pad), lambda i: (0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bt_pad, d_pad), jnp.float32),
                jax.ShapeDtypeStruct((hb, 128, d_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(qp, cat3, cnt3, *row_args)
    else:
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel3, hb=hb, inv_tau=inv_tau),
            grid=(bt_pad // bq, n_j),
            in_specs=[
                pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0)),
                pl.BlockSpec((hb, 128, d_pad), lambda i, j: (j, 0, 0)),
                pl.BlockSpec((bq, cb, 128), lambda i, j: (i, j, 0)),
                row_spec(), row_spec(), row_spec(),
            ],
            out_specs=pl.BlockSpec((bq, d_pad), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((bt_pad, d_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(qp, cat3, cnt3, *row_args)
        xrow_spec = lambda: pl.BlockSpec((1, bq), lambda j, i: (0, i))
        dcat3 = pl.pallas_call(
            functools.partial(_bwd_dcat_kernel3, hb=hb, inv_tau=inv_tau),
            grid=(n_j, bt_pad // bq),
            in_specs=[
                pl.BlockSpec((bq, d_pad), lambda j, i: (i, 0)),
                pl.BlockSpec((hb, 128, d_pad), lambda j, i: (j, 0, 0)),
                pl.BlockSpec((bq, cb, 128), lambda j, i: (i, j, 0)),
                xrow_spec(), xrow_spec(), xrow_spec(),
            ],
            out_specs=pl.BlockSpec((hb, 128, d_pad), lambda j, i: (j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_j * hb, 128, d_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(qp, cat3, cnt3, *row_args)
    dcat = dcat3.reshape(-1, d_pad)[:x, :d]
    return (
        dq[:bt, :d].astype(q2.dtype),
        dcat.astype(norm_catalog.dtype),
        None,  # count3
    )


fused_dense_neg_lse_t.defvjp(_vjp_fwd3, _vjp_bwd3)
