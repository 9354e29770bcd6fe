"""Fused Pallas ring-chunk kernel (ops/pallas/hstu_chunk.py) parity.

Runs in Pallas interpret mode on the CPU mesh (the kernel-parity analog
of the reference's fbgemm-vs-fallback device parametrization,
tests/test_ops.py:56-59): the chunk kernel must match the jnp chunk
body bit-for-tolerance, and the full ring with use_pallas must match
the dense single-device reference, gradients included.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mygenerativerecommenders_tpu.ops.hstu_attention import (
    hstu_attention_reference,
    relative_position_bias,
    relative_time_bias,
)
from mygenerativerecommenders_tpu.parallel import ring_attention as ra

B, N, H, D, DV = 2, 32, 2, 8, 8
NUM_BUCKETS = 128


def _inputs(rng):
    q = rng.normal(size=(B, N, H, D)).astype(np.float32)
    k = rng.normal(size=(B, N, H, D)).astype(np.float32)
    v = rng.normal(size=(B, N, H, DV)).astype(np.float32)
    base = 978_000_000
    ts = np.sort(rng.integers(0, 10**7, size=(B, N)), axis=1).astype(np.int32) + base
    pos_w = rng.normal(size=(2 * N - 1,)).astype(np.float32) * 0.1
    ts_w = rng.normal(size=(NUM_BUCKETS + 1,)).astype(np.float32) * 0.1
    return q, k, v, ts, pos_w, ts_w


def test_chunk_kernel_matches_jnp_chunk(rng):
    """Single chunk product: Pallas (interpret) vs the jnp body, with
    offset-driven causal masking, forward and all gradients."""
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    nc = 16
    kc, vc = k[:, :nc], v[:, :nc]
    tsq_next = np.concatenate([ts[:, 1:], ts[:, -1:]], axis=1)
    tsk = ts[:, :nc]
    row_off, col_off = 8, 4  # deliberately unaligned global offsets

    def run(use_pallas, q, kc, vc, pos_w, ts_w):
        out = ra._chunk_contribution(
            q, kc, vc, tsq_next, tsk, row_off, col_off,
            pos_w, ts_w, N, NUM_BUCKETS,
            use_pallas=use_pallas, interpret=True,
        )
        return out

    want = run(False, q, kc, vc, pos_w, ts_w)
    got = run(True, q, kc, vc, pos_w, ts_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def loss(use_pallas, *args):
        return (run(use_pallas, *args) ** 2).sum()

    want_g = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2, 3, 4))(
        q, kc, vc, pos_w, ts_w
    )
    got_g = jax.grad(functools.partial(loss, True), argnums=(0, 1, 2, 3, 4))(
        q, kc, vc, pos_w, ts_w
    )
    for g, w, name in zip(got_g, want_g, ["dq", "dk", "dv", "dpos_w", "dts_w"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=name
        )


def _reference(q, k, v, ts, pos_w, ts_w):
    bias = relative_position_bias(pos_w, N)[None] + relative_time_bias(
        ts_w, ts, NUM_BUCKETS
    )
    return hstu_attention_reference(q, k, v, bias, max_len=N, causal=True)


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))


@pytest.mark.parametrize("zigzag", [False, True])
def test_ring_pallas_matches_reference(rng, mesh, zigzag):
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = ra.make_ring_hstu_attention(
        mesh, max_len=N, num_buckets=NUM_BUCKETS, zigzag=zigzag,
        use_pallas=True, interpret=True,
    )
    got = np.asarray(ring(q, k, v, ts, pos_w, ts_w))
    want = np.asarray(_reference(q, k, v, ts, pos_w, ts_w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_pallas_gradients_match(rng, mesh):
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = ra.make_ring_hstu_attention(
        mesh, max_len=N, num_buckets=NUM_BUCKETS, zigzag=True,
        use_pallas=True, interpret=True,
    )

    def loss_ring(q, k, v, pos_w, ts_w):
        return (ring(q, k, v, ts, pos_w, ts_w) ** 2).sum()

    def loss_ref(q, k, v, pos_w, ts_w):
        return (_reference(q, k, v, ts, pos_w, ts_w) ** 2).sum()

    got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pos_w, ts_w
    )
    want = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pos_w, ts_w
    )
    for g, w, name in zip(got, want, ["dq", "dk", "dv", "dpos_w", "dts_w"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=name
        )
