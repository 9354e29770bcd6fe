"""Dense-catalog evaluation of per-position sampled-softmax negatives.

The reference's SampledSoftmaxLoss (losses/autoregressive_losses.py:
249-306) samples R negatives per supervision position and scores each by
gathering its embedding row — on TPU that materializes [B*T*R, D] rows
(3.4M at the ml-1m recipe) whose forward gather and backward scatter-add
dominate the train step (~36 ms of 65 ms, see PERFORMANCE.md).

This module computes the SAME loss through the full catalog instead:

  all_logits = q @ norm_catalog^T / tau              (one MXU matmul)
  count[i,x] = #{r : offsets[i,r] = x}               (multiplicity matrix)
  neg_lse[i] = log sum_x count[i,x] * exp(all_logits[i,x])   (masked)

Identities used:
  * sum_r exp(l[offsets_r]) == sum_x count_x * exp(l_x) exactly (floating
    summation order differs; values agree to roundoff, gradients exactly).
  * the reference's accidental-hit handling — REPLACING hit logits with
    -5e4 before log-softmax — is bit-equivalent to EXCLUDING them from
    the sum whenever any surviving logit exceeds -49900 (always true for
    L2-normalized embeddings, |l| <= 1/tau), because exp(-5e4 - m)
    flushes to 0.0 in float32: mask count at x = positive's offset.
  * backward: d(all_logits) is dense, so dq and d(norm_catalog) are two
    dense MXU matmuls — the 23 ms scatter-add disappears.

count is built WITHOUT any gather/scatter via a Kronecker (hi, lo) digit
decomposition of the offset: onehot(x) = onehot(x >> 7) (x) onehot(x & 127),
so count = einsum("...rh,...rl->...hl", H, L) — a batched MXU matmul over
one-hot factors that are exact in bfloat16 (counts <= R <= 256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LO = 128  # low-digit radix: one MXU lane tile


def count_offsets(
    offsets: jax.Array, num_catalog: int, keep_pad: bool = False
) -> jax.Array:
    """Multiplicity matrix count[..., x] = #{r : offsets[..., r] == x}.

    offsets: [..., R] int32 in [0, num_catalog).
    Returns [..., num_catalog] bfloat16 (exact: counts <= R <= 256).
    keep_pad leaves the trailing dim at the Kronecker-natural
    ceil(num_catalog/128)*128 — which IS the Pallas kernel's lane-padded
    width, so the fused path avoids a slice + re-pad round trip (the
    padded columns are all-zero: no offset maps there).
    """
    num_hi = (num_catalog + _LO - 1) // _LO
    hi = offsets // _LO  # [..., R]
    lo = offsets % _LO
    h = (hi[..., None] == jnp.arange(num_hi, dtype=hi.dtype)).astype(jnp.bfloat16)
    low = (lo[..., None] == jnp.arange(_LO, dtype=lo.dtype)).astype(jnp.bfloat16)
    count = jnp.einsum(
        "...rh,...rl->...hl", h, low, preferred_element_type=jnp.bfloat16
    )
    count = count.reshape(count.shape[:-2] + (num_hi * _LO,))
    if keep_pad:
        return count
    return count[..., :num_catalog]


def count_offsets_b(
    offsets: jax.Array, num_catalog: int, num_hi: int | None = None
) -> jax.Array:
    """count_offsets in 3-D b-major layout: [BT, HI, 128] with
    out[i, h, l] = #{r : offsets[i, r] == h*128 + l}.

    offsets: [BT, R] int32. b-major IS the one-hot dot's native output
    order, so XLA fuses the uint8 cast into the count fusion and never
    materializes a transpose (the earlier [HI, BT, 128] layout cost a
    2.2 GB relayout copy, ~3.3 ms/step at ml-20m). num_hi widens the hi
    one-hot past ceil(X/128) so the consumer kernels' hi padding is baked
    in (extra slices are all-zero: no offset maps there).
    """
    if num_hi is None:
        num_hi = (num_catalog + _LO - 1) // _LO
    hi = offsets // _LO
    lo = offsets % _LO
    h = (hi[..., None] == jnp.arange(num_hi, dtype=hi.dtype)).astype(jnp.bfloat16)
    low = (lo[..., None] == jnp.arange(_LO, dtype=lo.dtype)).astype(jnp.bfloat16)
    count = jnp.einsum(
        "brh,brl->bhl", h, low, preferred_element_type=jnp.bfloat16
    )
    if offsets.shape[-1] <= 255:
        # counts <= R fit uint8: halves the HBM traffic of the kernels'
        # full reads (exact: bf16 holds integers <= 256 exactly, and the
        # cast back to f32 is exact)
        count = count.astype(jnp.uint8)
    return count


def count_offsets_packed4(
    offsets: jax.Array,  # [BT, R] int32 (sentinel >= slices*128 -> dropped)
    positive_offsets: jax.Array,  # [BT] catalog offset of the positive
    slices: int,  # total hi-slice capacity, multiple of 4
    block_slices: int,  # hi slices per consumer x-block (hb); multiple of 4
) -> jax.Array:
    """Radix-256 packed multiplicity matrix: [BT, slices//4, 128] uint32.

    FOUR hi slices share one u32 accumulator lane. Digit planes are
    BLOCK-LOCAL plane-major: within consumer x-block jb (slices
    [jb*hb, (jb+1)*hb)), digit j of group g holds slice jb*hb + j*(hb//4)
    + g — so a consumer that unpacks the four digit planes of its count
    block and concatenates them along lanes recovers the block's slices
    in ORIGINAL order (no catalog permutation anywhere). Exact: counts
    <= R <= 255 and 255 * (1 + 256 + 2^16 + 2^24) = 2^32 - 1, so the u32
    accumulator cannot overflow.

    The accidental-hit mask is folded into the DRAW weights (a [BT, R]
    compare — offsets == positive never counts), replacing the
    [BT, HI, 128] lane-mask pass of the unpacked path. The einsum's
    reduction, which XLA lowers as a fused compare-select reduce in step
    context, does 4x less work than the one-hot-per-slice form.
    """
    assert slices % 4 == 0 and block_slices % 4 == 0, (slices, block_slices)
    assert offsets.shape[-1] <= 255, offsets.shape
    gb = block_slices // 4
    ngrp = slices // 4
    h = offsets // _LO
    lo = offsets % _LO
    jb = h // block_slices
    h_local = h % block_slices
    dig = h_local // gb
    g = jb * gb + h_local % gb
    live = (offsets < slices * _LO) & (
        offsets != positive_offsets[:, None].astype(offsets.dtype)
    )
    # dig & 3: sentinel rows can carry arbitrary h; keep the shift amount
    # in-range (their weight is zeroed by `live` regardless)
    w = jnp.where(live, jnp.uint32(1) << (8 * (dig & 3)).astype(jnp.uint32), 0)
    hg = jnp.where(
        g[..., None] == jnp.arange(ngrp, dtype=g.dtype), w[..., None], 0
    )  # [BT, R, G] u32
    low_oh = (lo[..., None] == jnp.arange(_LO, dtype=lo.dtype)).astype(jnp.uint32)
    return jnp.einsum(
        "brg,brl->bgl", hg, low_oh, preferred_element_type=jnp.uint32
    )


def sampled_softmax_dense_neg_lse(
    query: jax.Array,  # [..., D] (postprocessed outputs)
    norm_catalog: jax.Array,  # [X, D] normalized catalog embeddings
    neg_offsets: jax.Array,  # [..., R] sampled catalog offsets
    positive_offsets: jax.Array,  # [...] catalog offset of the positive
    #                                (-1 when the positive is not in the
    #                                 catalog, e.g. padding)
    temperature: float,
    use_pallas: bool = False,
) -> jax.Array:
    """logsumexp of the R sampled negative logits, hits excluded ([...]).

    use_pallas routes through ops/pallas/dense_softmax.py, which keeps the
    [BT, X] logits in VMEM in both directions (same math, TPU fast path).
    """
    if use_pallas:
        from mygenerativerecommenders_tpu.ops.pallas import dense_softmax

        lead = query.shape[:-1]
        r = neg_offsets.shape[-1]
        x = norm_catalog.shape[0]
        offs2 = neg_offsets.reshape(-1, r)
        # sentinel-pad the bt rows BEFORE the count einsum so count3 is
        # born at the kernels' bt tile width — a post-hoc jnp.pad copies
        # the whole buffer (~2.2 ms at ml-20m). The sentinel offset's hi
        # digit is out of the widened one-hot iota range, so padded rows
        # produce all-zero counts (exact). The hi axis is likewise born
        # at the kernels' hb*n_j width.
        from mygenerativerecommenders_tpu.ops.pallas import count_kernel

        hb_packed = dense_softmax.hi_blocks(x, packed=True)
        # packed only where the block-diagonal count kernel applies: the
        # plain u32 einsum lowering is SLOWER than the u8 one (integer
        # reduce fusions miss the u8 vectorization), so without the
        # kernel the u8 path + mask pass wins
        packed = (
            r <= 255
            and hb_packed is not None
            and count_kernel.supported(hb_packed[0] * hb_packed[1])
        )
        bt = offs2.shape[0]
        bq = dense_softmax.bt_tile(x, packed=packed)
        bt_pad = ((bt + bq - 1) // bq) * bq
        hb, n_j = dense_softmax.hi_blocks(x, packed=packed)
        hi_pad = hb * n_j
        if bt_pad != bt:
            offs2 = jnp.pad(
                offs2, ((0, bt_pad - bt), (0, 0)), constant_values=hi_pad * 128
            )
        sup = positive_offsets.reshape(-1).astype(jnp.int32)
        if bt_pad != bt:
            sup = jnp.pad(sup, (0, bt_pad - bt), constant_values=-1)
        if packed:
            # radix-256 packed u32 counts via the block-diagonal MXU
            # kernel: one-hots never touch HBM, and the accidental-hit
            # mask folds into the [BT, R] draw weights instead of a
            # [BT, HI, 128] lane-mask pass
            count3 = jax.lax.stop_gradient(
                count_kernel.count_offsets_packed4_tpu(
                    offs2, sup, hi_pad, hb
                )
            )
        else:
            # 3-D count kernels (any catalog size: large catalogs tile
            # over x-blocks in-kernel) skip the [BT, hi, lo] -> [BT, X]
            # relayout copies entirely (~8.8 ms/step at ml-20m's X=26744)
            count3 = jax.lax.stop_gradient(count_offsets_b(offs2, x, hi_pad))
            # fold the accidental-hit mask into the count fusion (XLA
            # fuses the elementwise epilogue): the fwd + both bwd kernels
            # then skip their per-tile iota/compare/select passes
            x_of_lane = (
                jnp.arange(hi_pad, dtype=jnp.int32)[None, :, None] * 128
                + jnp.arange(128, dtype=jnp.int32)[None, None, :]
            )
            count3 = count3 * (x_of_lane != sup[:, None, None]).astype(
                count3.dtype
            )
        lse = dense_softmax.fused_dense_neg_lse_t(
            query.reshape(-1, query.shape[-1]),
            norm_catalog,
            count3,
            temperature,
        )
        return lse.reshape(lead)

    count = jax.lax.stop_gradient(
        count_offsets(neg_offsets, norm_catalog.shape[0])
    ).astype(jnp.float32)

    al = (
        jnp.einsum(
            "...d,xd->...x", query, norm_catalog,
            preferred_element_type=jnp.float32,
        )
        / temperature
    )  # [..., X]
    x_iota = jnp.arange(norm_catalog.shape[0], dtype=jnp.int32)
    not_hit = x_iota != positive_offsets[..., None].astype(jnp.int32)
    cmask = jnp.where(not_hit, count, 0.0)  # [..., X]

    # stabilized log-sum with multiplicities; rows whose surviving count
    # is all-zero (every sample hit the positive) get -inf, which
    # logaddexp(pos, -inf) treats exactly like the reference's all--5e4 row
    neg_inf = jnp.float32(-jnp.inf)
    # select BEFORE exponentiating: a masked logit above the surviving max
    # would overflow exp and poison the sum with 0*inf = NaN (possible
    # when embeddings are not L2-normalized)
    al_live = jnp.where(cmask > 0, al, -1e30)
    m = jnp.max(al_live, axis=-1)  # [...]
    m_safe = jnp.where(m > -0.5e30, m, 0.0)
    s = jnp.sum(cmask * jnp.exp(al_live - m_safe[..., None]), axis=-1)
    return jnp.where(s > 0, m_safe + jnp.log(jnp.maximum(s, 1e-30)), neg_inf)
