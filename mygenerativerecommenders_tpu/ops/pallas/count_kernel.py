"""Pallas TPU kernel for the radix-256 packed negative-count build.

Computes ops/dense_negatives.py:count_offsets_packed4 — the [BT, S//4,
128] uint32 multiplicity matrix of each row's R sampled catalog offsets,
four hi slices packed per lane — without ever materializing the one-hot
factors in HBM. XLA's lowering of the count einsum in step context
either materializes the [BT, R, 128] bf16 low-digit one-hot (~470 MB at
the ml-1m recipe) or rewrites the dot into a compare-select reduction
(O(BT*S*128*R) VPU work, measured 1.1-1.8 ms/step); this kernel builds
both one-hot factors tile-locally in VMEM and contracts them on the MXU.

The per-row batched matmul (count[b] = H[b]^T @ L[b], R-contraction) is
too small to feed the MXU one row at a time (a Mosaic batched dot
serializes per batch item: measured 2.8 ms). Instead BQI=128//(2G) rows
share ONE BLOCK-DIAGONAL 2-D dot:

    bd [BQI*2G, BQI*R] @ low [BQI*R, 128] -> p [BQI*2G, 128]

where bd[row, col] puts draw col=(b, r)'s weight at row b*2G + group'
(group' = packed group + G*(digit pair)), i.e. the rows of p are the 2G
per-row output groups of the BQI rows stacked. bd costs ONE compare +
select: the caller precomputes gpext[b, r] = group' + 2G*(b % BQI) in
XLA (a [BT, R] elementwise pass), so bd = (gpext_row == row_iota) ?
w_row : 0 — dead draws (sentinel rows, accidental hits, and out-of-range
gpext aliases) carry w = 0 and contribute nothing. The block-diagonal
zero padding wastes BQI x the minimal FLOPs, but at BQI*2G = 128 the dot
is exactly one full MXU pass per R columns and the total stays ~60
GFLOP at the ml-1m recipe (~0.3 ms of MXU).

Digit packing: digits 0/1 and 2/3 are separate output groups (each f32
accumulator holds a 2-digit radix-256 value <= 255*257 < 2^24, exact);
the halves combine into u32 in VMEM: lo_pair | (hi_pair << 16). Digit-
plane order is block-local plane-major (digit j of group g within
consumer x-block jb holds slice jb*hb + j*(hb//4) + g), matching what
ops/pallas/dense_softmax.py's _wide_al_cmask unpacks. Bit-equal to the
einsum reference for any draw set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128  # bt rows per grid step
_SUB = 8  # rows per inner write (sublane-aligned dynamic slices)


def supported(slices: int) -> bool:
    """Kernel handles catalogs whose packed group count allows >= 4 rows
    per block-diagonal dot (g_total <= 16, i.e. x <= 8192)."""
    return 128 // (2 * (slices // 4)) >= 4


def _kernel(offs_ref, gpext_ref, w_ref, out_ref, *, g_total: int, bqi: int):
    r = offs_ref.shape[1]
    two_g = 2 * g_total
    dots_per_iter = _SUB // bqi

    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, r, 128), 2)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (bqi * two_g, bqi * r), 0)

    # statically unrolled (16 iterations): Mosaic requires dynamic
    # sublane indices to be provably 8-aligned; constants always are
    for t in range(_BQ // _SUB):
        o8 = offs_ref[t * _SUB:(t + 1) * _SUB, :]  # [8, R]
        low = ((o8 % 128)[..., None] == lo_iota).astype(jnp.bfloat16)
        low2 = low.reshape(_SUB * r, 128)  # free: merge leading dims
        outs = []
        for d in range(dots_per_iter):
            i = t * dots_per_iter + d
            gpx = gpext_ref[i:i + 1, :]  # [1, BQI*R]
            wr = w_ref[i:i + 1, :]  # [1, BQI*R]
            # arithmetic broadcasts of the [1, BQI*R] rows (Mosaic rejects
            # the sublane-replicated i1 relayout a direct compare+select
            # against the row-iota would need)
            mask = (gpx - row_iota == 0).astype(jnp.bfloat16)  # [M, BQI*R]
            bd = mask * wr
            p = jax.lax.dot_general(
                bd, low2[d * bqi * r:(d + 1) * bqi * r, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQI*2G, 128]
            p3 = p.reshape(bqi, two_g, 128)  # free: split leading dim
            # Mosaic has no f32->u32 cast: combine in i32 (bit-identical —
            # both pairs <= 0xFFFF, the shift only sets the high half)
            lo_pair = p3[:, :g_total, :].astype(jnp.int32)
            hi_pair = p3[:, g_total:, :].astype(jnp.int32)
            outs.append(lo_pair | (hi_pair << 16))
        blk = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        out_ref[t * _SUB:(t + 1) * _SUB] = jax.lax.bitcast_convert_type(
            blk, jnp.uint32
        )


def count_offsets_packed4_tpu(
    offsets: jax.Array,  # [BT, R] int32, BT % 128 == 0
    positive_offsets: jax.Array,  # [BT] int32 (-1 = none)
    slices: int,
    block_slices: int,
) -> jax.Array:
    """[BT, slices//4, 128] uint32 packed counts (kernel fast path).

    Bit-equal to ops/dense_negatives.py:count_offsets_packed4; callers
    guarantee BT is a multiple of 128 (the lse kernels' bt tiling already
    pads to 128/512), R <= 255, and supported(slices).
    """
    assert slices % 4 == 0 and block_slices % 4 == 0
    assert offsets.shape[-1] <= 255, offsets.shape
    bt, r = offsets.shape
    assert bt % _BQ == 0, bt
    g_total = slices // 4
    bqi = min(_SUB, 128 // (2 * g_total))
    # the supported() gate + the hi-block splits only produce g_total in
    # {1..8, 16}, so bqi is always 8 or 4; the kernel's row bookkeeping
    # (dots_per_iter, gpext2 reshape) requires it to divide _SUB
    assert bqi >= 4 and _SUB % bqi == 0, (slices, bqi)

    # draw metadata, computed once in XLA ([BT, R] elementwise, fuses):
    # group' = packed group + G*(digit pair), extended by the row's slot
    # in its block-diagonal dot; dead draws park at bqi*2G (no rowid)
    # with weight 0
    o = offsets.astype(jnp.int32)
    gb = block_slices // 4
    h = o // 128
    live = (o < slices * 128) & (
        o != positive_offsets.astype(jnp.int32)[:, None]
    )
    jb = h // block_slices
    h_local = h % block_slices
    dig = (h_local // gb) & 3
    g = jb * gb + h_local % gb
    gp = g + jnp.where(dig >= 2, g_total, 0)
    b_inner = (
        jax.lax.broadcasted_iota(jnp.int32, o.shape, 0) % bqi
    )
    gpext = jnp.where(live, gp + 2 * g_total * b_inner, bqi * 2 * g_total)
    w = jnp.where(
        live, jnp.exp2(8.0 * (dig & 1).astype(jnp.float32)), 0.0
    ).astype(jnp.bfloat16)
    gpext2 = gpext.reshape(bt // bqi, bqi * r)
    w2 = w.reshape(bt // bqi, bqi * r)

    return pl.pallas_call(
        functools.partial(_kernel, g_total=g_total, bqi=bqi),
        grid=(bt // _BQ,),
        in_specs=[
            pl.BlockSpec((_BQ, r), lambda i: (i, 0)),
            pl.BlockSpec((_BQ // bqi, bqi * r), lambda i: (i, 0)),
            pl.BlockSpec((_BQ // bqi, bqi * r), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_BQ, g_total, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bt, g_total, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            # the [8, R, 128] bf16 one-hot + [BQI*2G, BQI*R] bd tiles live
            # on the kernel stack; default 16M is enough but leave slack
            # for double-buffered operands at R=255
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(o, gpext2, w2)
