"""Ring (context/sequence-parallel) HSTU attention over a mesh axis.

Scales the HSTU encoder to sequence lengths far beyond one chip's memory
by sharding the sequence axis N across a mesh axis ("sp") and rotating
K/V shards around the ring with `jax.lax.ppermute` — the TPU-native
answer to ring attention / context parallelism, a capability the
reference lacks entirely (SURVEY.md §2.4: no SP/CP/ring code exists;
its attention materializes the full [B, N, N] bias,
sequential_encoders/hstu.py:186-204, capping practical N).

Why HSTU makes ring attention EXACT and simple: HSTU attention is not
softmax attention —

    out[n] = sum_m silu(q[n].k[m] + bias[n, m]) / max_len * causal * v[m]

is a plain linear accumulation over key positions (hstu.py:134-205 of the
reference). There is no row-max/denominator to carry, so each device can
accumulate partial outputs chunk-by-chunk with no online rescaling and
bit-reproducible results (fixed summation order over the ring steps).

Layout: inputs are sharded contiguously on the sequence axis — device p
of P holds rows [p*Nl, (p+1)*Nl) with Nl = N/P. Each ring step t the
local K/V chunk that ORIGINATED on device s = (p - t) mod P is resident;
we add its contribution (with global row/col offsets driving the causal
mask and the relative position/time biases) and pass the chunk to the
next device. After P steps every (query row, key col) pair has been
visited exactly once.

The relative time bias needs the NEXT position's timestamp for each
query row (ext[n+1], reference hstu.py:112-123); the last row of each
shard reads the first timestamp of the following shard — one [B]-column
ppermute before the loop.

Causal note: with contiguous sharding, later devices do more useful work
(earlier chunks are fully masked for early devices). All devices still
execute P steps, so wall-clock matches the worst shard — the standard
zigzag/striped layout halves this and can be layered on later; parity
and memory scaling (O(N*Nl) per device instead of O(N^2)) hold today.

Gradients: written in plain jnp + ppermute, so `jax.grad` through
`shard_map` derives the reverse ring (ppermute's transpose is the
inverse permutation) automatically — no custom VJP needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mygenerativerecommenders_tpu.ops.hstu_attention import bucketize_timedelta


def _chunk_contribution(
    q, k_chunk, v_chunk, tsq_next, tsk_chunk, row_off, col_off,
    pos_w, ts_w, max_len, num_buckets, use_pallas=False, interpret=False,
):
    """Partial HSTU attention of local queries vs one K/V chunk.

    q: [B, Nq, H, D]; k_chunk/v_chunk: [B, Nc, H, D*]; tsq_next: [B, Nq]
    (the ext[n+1] timestamps for local query rows); tsk_chunk: [B, Nc].
    row_off/col_off: global offsets of the first local row / chunk col.
    Returns [B, Nq, H, Dv] float32 partial sum.

    use_pallas routes through the fused chunk kernel
    (ops/pallas/hstu_chunk.py): only the offset DELTA rides in (scalar
    prefetch) — the causal mask, the positional-bias stripe window, and
    the time-bucket bias are generated in-kernel, and the fused backward
    produces dq/dk/dv plus both bias-table gradients in-kernel — no
    [B, H, Nq, Nc] bias/attention tensors in HBM in either direction.
    """
    if use_pallas:
        from mygenerativerecommenders_tpu.ops.pallas.hstu_chunk import (
            hstu_chunk_attention,
        )

        return hstu_chunk_attention(
            q, k_chunk, v_chunk, tsq_next, tsk_chunk,
            col_off - row_off, pos_w, ts_w,
            inv_n=1.0 / max_len, max_len=max_len, num_buckets=num_buckets,
            interpret=interpret,
        )
    nq, nc = q.shape[1], k_chunk.shape[1]
    rows = row_off + jnp.arange(nq)[:, None]  # global n
    cols = col_off + jnp.arange(nc)[None, :]  # global m
    # pos term: pos_w[(m - n) + max_len - 1], clipped like the fused kernel
    pos_idx = jnp.clip((cols - rows) + (max_len - 1), 0, 2 * max_len - 2)
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k_chunk, preferred_element_type=jnp.float32
    )
    bias = pos_w[pos_idx].astype(jnp.float32)[None, :, :]  # [1, Nq, Nc]
    delta = tsq_next[:, :, None] - tsk_chunk[:, None, :]  # [B, Nq, Nc]
    bias = bias + ts_w[bucketize_timedelta(delta, num_buckets)]
    attn = jax.nn.silu(s + bias[:, None, :, :]) / max_len
    attn = jnp.where((rows >= cols)[None, None, :, :], attn, 0.0)
    return jnp.einsum(
        "bhnm,bmhd->bnhd", attn, v_chunk.astype(attn.dtype),
        preferred_element_type=jnp.float32,
    )


def ring_hstu_attention_local(
    q, k, v, timestamps, pos_w, ts_w, *, max_len, num_buckets, axis_name,
    use_pallas=False, interpret=False,
):
    """The per-shard body: call inside shard_map with the sequence axis of
    q/k/v/timestamps sharded over `axis_name` (all other args replicated).

    q, k: [B, Nl, H, Dqk]; v: [B, Nl, H, Dv]; timestamps: [B, Nl] int32.
    max_len is the GLOBAL N (the 1/n normalizer and pos-table center).
    Returns the local output shard [B, Nl, H, Dv] float32.
    """
    p = jax.lax.axis_index(axis_name)
    num_shards = jax.lax.psum(1, axis_name)
    nl = q.shape[1]
    fwd_perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    bwd_perm = [(i, (i - 1) % num_shards) for i in range(num_shards)]

    ts = timestamps.astype(jnp.int32)
    # ext[n+1] per local query row: shift left, last row takes the first
    # timestamp of the NEXT shard — except the globally-last row, which
    # repeats itself (reference extends by repeating the last column).
    first_col_next = jax.lax.ppermute(ts[:, :1], axis_name, bwd_perm)  # [B,1]
    is_last_shard = p == num_shards - 1
    tail = jnp.where(is_last_shard, ts[:, -1:], first_col_next)
    tsq_next = jnp.concatenate([ts[:, 1:], tail], axis=1)  # [B, Nl]

    row_off = p * nl

    def step(t, carry):
        acc, k_c, v_c, tsk_c = carry
        src = (p - t) % num_shards  # shard the chunk originated on
        acc = acc + _chunk_contribution(
            q, k_c, v_c, tsq_next, tsk_c, row_off, src * nl,
            pos_w, ts_w, max_len, num_buckets, use_pallas, interpret,
        )
        k_c, v_c, tsk_c = jax.lax.ppermute(
            (k_c, v_c, tsk_c), axis_name, fwd_perm
        )
        return acc, k_c, v_c, tsk_c

    acc = jnp.zeros(q.shape[:3] + (v.shape[-1],), dtype=jnp.float32)
    acc, *_ = jax.lax.fori_loop(0, num_shards, step, (acc, k, v, ts))
    return acc.astype(v.dtype)


def zigzag_order(num_shards: int, n: int):
    """Permutation taking a contiguous sequence to zigzag layout.

    The sequence splits into 2P chunks; device p of P holds the pair
    (p, 2P-1-p) so every device sees the same causal work: early (mostly
    masked-out) chunks pair with late (mostly live) ones. Returns int
    indices `perm` with zigzag[i] = contiguous[perm[i]]; n must divide by
    2 * num_shards.
    """
    import numpy as np

    nh = n // (2 * num_shards)
    assert nh * 2 * num_shards == n, (n, num_shards)
    chunks = []
    for p in range(num_shards):
        chunks.append(np.arange(p * nh, (p + 1) * nh))
        c2 = 2 * num_shards - 1 - p
        chunks.append(np.arange(c2 * nh, (c2 + 1) * nh))
    return np.concatenate(chunks)


def inverse_permutation(perm):
    import numpy as np

    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


def ring_hstu_attention_zigzag_local(
    q, k, v, timestamps, pos_w, ts_w, *, max_len, num_buckets, axis_name,
    use_pallas=False, interpret=False,
):
    """Load-balanced (zigzag) ring body: inputs must be in zigzag layout
    (see zigzag_order) — device p's local rows are the chunk pair
    (front = chunk p, back = chunk 2P-1-p) of 2P global chunks.

    Under the causal mask a contiguous ring computes every [Nl, Nl]
    chunk product and throws most of early devices' work away; with the
    zigzag pair each ring step has exactly two live half-blocks
    (back-queries x front-keys always; front x front when the resident
    pair originated at src <= p, back x back when src >= p), so the
    per-step compute HALVES and stays identical across devices. The
    skipped half-blocks are real skips (lax.cond), not masked compute.
    Output is the local zigzag shard; same math as the contiguous ring.
    """
    p = jax.lax.axis_index(axis_name)
    num_shards = jax.lax.psum(1, axis_name)
    nl = q.shape[1]
    nh = nl // 2  # rows per chunk; 2P chunks globally
    fwd_perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]

    ts = timestamps.astype(jnp.int32)

    # first timestamp of every global chunk, chunk-indexed [2P, B]:
    # chunk c < P lives on device c (front half); chunk c >= P lives on
    # device 2P-1-c (back half) — reversing the gathered back-halves
    # lines them up.
    firsts = jnp.stack([ts[:, 0], ts[:, nh]], axis=0)  # [2, B]
    ag = jax.lax.all_gather(firsts, axis_name)  # [P, 2, B]
    chunk_firsts = jnp.concatenate(
        [ag[:, 0, :], ag[::-1, 1, :]], axis=0
    )  # [2P, B]

    # ext[n+1] per chunk: shift left; the last row of chunk c takes the
    # first timestamp of chunk c+1, except the globally-last row (chunk
    # 2P-1, i.e. this device's back half when p == 0), which repeats.
    tail_f = jax.lax.dynamic_index_in_dim(
        chunk_firsts, p + 1, axis=0, keepdims=False
    )[:, None]  # [B, 1]
    tail_b_idx = jnp.where(p == 0, 0, 2 * num_shards - p)  # dummy 0 at p=0
    tail_b = jnp.where(
        p == 0,
        ts[:, -1:],
        jax.lax.dynamic_index_in_dim(
            chunk_firsts, tail_b_idx, axis=0, keepdims=False
        )[:, None],
    )
    tsq_next = jnp.concatenate(
        [ts[:, 1:nh], tail_f, ts[:, nh + 1:], tail_b], axis=1
    )  # [B, Nl]

    halves = lambda x: (x[:, :nh], x[:, nh:])
    qf, qb = halves(q)
    nf, nb = halves(tsq_next)
    row_f = p * nh
    row_b = (2 * num_shards - 1 - p) * nh

    def contrib(qh, kc, vc, tsqn, tskc, row_off, col_off):
        return _chunk_contribution(
            qh, kc, vc, tsqn, tskc, row_off, col_off,
            pos_w, ts_w, max_len, num_buckets, use_pallas, interpret,
        )

    def step(t, carry):
        acc_f, acc_b, k_c, v_c, tsk_c = carry
        s = (p - t) % num_shards
        col_f = s * nh
        col_b = (2 * num_shards - 1 - s) * nh
        kcf, kcb = halves(k_c)
        vcf, vcb = halves(v_c)
        tf, tb = halves(tsk_c)
        # back queries x front keys: always causally live
        acc_b = acc_b + contrib(qb, kcf, vcf, nb, tf, row_b, col_f)
        # front x front: live iff the resident front chunk s <= p
        acc_f = acc_f + jax.lax.cond(
            s <= p,
            lambda: contrib(qf, kcf, vcf, nf, tf, row_f, col_f),
            lambda: jnp.zeros_like(acc_f),
        )
        # back x back: live iff s >= p (s == p is the causal diagonal)
        acc_b = acc_b + jax.lax.cond(
            s >= p,
            lambda: contrib(qb, kcb, vcb, nb, tb, row_b, col_b),
            lambda: jnp.zeros_like(acc_b),
        )
        k_c, v_c, tsk_c = jax.lax.ppermute(
            (k_c, v_c, tsk_c), axis_name, fwd_perm
        )
        return acc_f, acc_b, k_c, v_c, tsk_c

    zero = jnp.zeros(qf.shape[:3] + (v.shape[-1],), dtype=jnp.float32)
    acc_f, acc_b, *_ = jax.lax.fori_loop(
        0, num_shards, step, (zero, zero, k, v, ts)
    )
    return jnp.concatenate([acc_f, acc_b], axis=1).astype(v.dtype)


def make_ring_hstu_attention(
    mesh: Mesh, *, max_len: int, num_buckets: int, axis_name: str = "sp",
    data_axis: str | None = "data", zigzag: bool = False,
    use_pallas: bool = False, interpret: bool = False,
):
    """jit-ready ring attention over `mesh`: (q, k, v, ts, pos_w, ts_w) ->
    out, with the sequence dim sharded over `axis_name` (and, when
    `data_axis` names a mesh axis, batch sharded over it). zigzag=True
    routes through the load-balanced body — inputs/outputs stay in
    contiguous order (the wrapper permutes; GSPMD turns the static
    permutation of a sequence-sharded array into the collective), and N
    must divide by 2 * the sp axis size."""
    dp = data_axis if data_axis in mesh.axis_names else None
    seq = P(dp, axis_name)  # [B, N, ...]
    local = (
        ring_hstu_attention_zigzag_local if zigzag
        else ring_hstu_attention_local
    )
    fn = jax.shard_map(
        functools.partial(
            local,
            max_len=max_len, num_buckets=num_buckets, axis_name=axis_name,
            use_pallas=use_pallas, interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(
            seq, seq, seq, P(dp, axis_name), P(), P(),
        ),
        out_specs=seq,
        check_vma=False,
    )
    if not zigzag:
        return jax.jit(fn)
    num_shards = mesh.shape[axis_name]

    def call(q, k, v, timestamps, pos_w, ts_w):
        # numpy (not device) constants: closure device arrays are fetched
        # host-side during lowering over remote backends (PERFORMANCE.md)
        perm = zigzag_order(num_shards, q.shape[1])
        inv = inverse_permutation(perm)
        zz = lambda x: jnp.take(x, perm, axis=1)
        out = fn(zz(q), zz(k), zz(v), zz(timestamps), pos_w, ts_w)
        return jnp.take(out, inv, axis=1)

    return jax.jit(call)
