"""Ring (sequence-parallel) HSTU attention vs the single-device reference.

The TPU analog of distributed-correctness testing: an 8-virtual-device
CPU mesh (tests/conftest.py) with the sequence axis sharded 4-way and
batch 2-way. HSTU attention is a plain sum over keys, so the ring result
must match the dense reference to float tolerance, gradients included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mygenerativerecommenders_tpu.ops.hstu_attention import (
    hstu_attention_reference,
    relative_position_bias,
    relative_time_bias,
)
from mygenerativerecommenders_tpu.parallel.ring_attention import (
    make_ring_hstu_attention,
)

B, N, H, D, DV = 4, 32, 2, 8, 8
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


def _reference(q, k, v, ts, pos_w, ts_w):
    bias = relative_position_bias(pos_w, N)[None] + relative_time_bias(
        ts_w, ts, NUM_BUCKETS
    )
    return hstu_attention_reference(q, k, v, bias, max_len=N, causal=True)


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))


def test_ring_matches_reference(rng, mesh):
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = make_ring_hstu_attention(mesh, max_len=N, num_buckets=NUM_BUCKETS)
    got = np.asarray(ring(q, k, v, ts, pos_w, ts_w))
    want = np.asarray(_reference(q, k, v, ts, pos_w, ts_w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_gradients_match(rng, mesh):
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = make_ring_hstu_attention(mesh, max_len=N, num_buckets=NUM_BUCKETS)

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


def test_ring_sp_only_mesh(rng):
    """Works on a pure-sp mesh (no data axis present)."""
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    ring = make_ring_hstu_attention(mesh, max_len=N, num_buckets=NUM_BUCKETS)
    got = np.asarray(ring(q, k, v, ts, pos_w, ts_w))
    want = np.asarray(_reference(q, k, v, ts, pos_w, ts_w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
