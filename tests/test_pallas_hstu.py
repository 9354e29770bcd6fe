"""Pallas fused HSTU attention vs the jnp reference (the analog of the
reference's fbgemm-vs-fallback parity tests, tests/test_ops.py:56-59).

On the CPU test backend the kernel runs in interpret mode implicitly only
if supported; we guard with a TPU check and also run interpret via
pltpu.force_tpu_interpret_mode so CI covers the kernel logic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.ops.hstu_attention import (
    hstu_attention_reference,
    relative_position_bias,
    relative_time_bias,
)


def _make(rng, b=2, n=37, h=1, dqk=9, dv=11):
    q = rng.normal(size=(b, n, h, dqk)).astype(np.float32)
    k = rng.normal(size=(b, n, h, dqk)).astype(np.float32)
    v = rng.normal(size=(b, n, h, dv)).astype(np.float32)
    ts = np.sort(rng.integers(1000, 10**6, size=(b, n)), axis=1).astype(np.int32)
    pos_w = rng.normal(size=(2 * n - 1,)).astype(np.float32) * 0.02
    ts_w = rng.normal(size=(129,)).astype(np.float32) * 0.02
    return map(jnp.asarray, (q, k, v, ts, pos_w, ts_w))


def _expected(q, k, v, ts, pos_w, ts_w, n):
    bias = relative_position_bias(pos_w, n)[None, :, :]
    bias = bias + relative_time_bias(ts_w, ts, 128)
    return hstu_attention_reference(q, k, v, bias, max_len=n, causal=True)


@pytest.mark.parametrize("n,h,dqk,dv", [(37, 1, 9, 11), (64, 2, 16, 16), (150, 1, 50, 50)])
def test_fused_matches_reference_interpret(rng, n, h, dqk, dv):
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    q, k, v, ts, pos_w, ts_w = _make(rng, n=n, h=h, dqk=dqk, dv=dv)
    expected = np.asarray(_expected(q, k, v, ts, pos_w, ts_w, n))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(hstu_attention_fused(q, k, v, ts, pos_w, ts_w, n, 128))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


# shapes chosen to exercise the fused backward's accumulation paths:
# multiple q blocks (n > 128 -> dk/dv accumulate across qi), multiple
# heads (dzh accumulates across the innermost h grid dim), multiple
# batch rows (per-b resident out blocks are re-initialized)
@pytest.mark.parametrize(
    "b,n,h,dqk,dv",
    [
        (1, 40, 1, 9, 11),
        (2, 150, 2, 16, 16),
        (3, 260, 2, 8, 8),
        (2, 150, 3, 10, 6),  # odd head count + dqk != dv
    ],
)
def test_fused_grads_match_reference_interpret(rng, b, n, h, dqk, dv):
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    q, k, v, ts, pos_w, ts_w = _make(rng, b=b, n=n, h=h, dqk=dqk, dv=dv)

    def loss_fused(q_, k_, v_, pw_, tw_):
        return (hstu_attention_fused(q_, k_, v_, ts, pw_, tw_, n, 128) ** 2).sum()

    def loss_ref(q_, k_, v_, pw_, tw_):
        return (_expected(q_, k_, v_, ts, pw_, tw_, n) ** 2).sum()

    # the fused bwd is itself a Pallas kernel: the whole grad computation
    # (fwd + custom_vjp bwd) must run under interpret mode on CPU
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    for i, (a, b_) in enumerate(zip(g_fused, g_ref)):
        # bias TABLES (args 3/4) sum ~n^2 f32 terms in a different order
        # than the XLA reference (per-tile in-kernel accumulation);
        # measured error vs float64 ground truth is the same ~4e-4 for
        # BOTH paths at these shapes, so their mutual tolerance is wider
        rtol = 5e-4 if i >= 3 else 2e-4
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=rtol, atol=2e-5)


def _expected_jagged(q, k, v, ts, pos_w, ts_w, n, lengths):
    """Length-masked dense reference: rows >= length are zero in q/k/v and
    in the output — the jagged semantics the fused kernel implements when
    `lengths` is passed."""
    mask = (jnp.arange(n)[None, :] < lengths[:, None]).astype(q.dtype)
    m4 = mask[:, :, None, None]
    out = _expected(q * m4, k * m4, v * m4, ts, pos_w, ts_w, n)
    return out * m4


@pytest.mark.parametrize(
    "b,n,h,lengths",
    [
        (3, 150, 1, [150, 40, 0]),  # full / short / empty
        (2, 300, 2, [144, 299]),  # multiple q blocks, mixed tiles
        (2, 64, 1, [1, 63]),
    ],
)
def test_fused_jagged_matches_masked_reference(rng, b, n, h, lengths):
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    q, k, v, ts, pos_w, ts_w = _make(rng, b=b, n=n, h=h, dqk=10, dv=12)
    lens = jnp.asarray(lengths, dtype=jnp.int32)
    expected = np.asarray(_expected_jagged(q, k, v, ts, pos_w, ts_w, n, lens))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            hstu_attention_fused(q, k, v, ts, pos_w, ts_w, n, 128, lengths=lens)
        )
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)
    # rows beyond each length must be exactly zero
    for i, L in enumerate(lengths):
        assert np.all(got[i, L:] == 0.0)


@pytest.mark.parametrize(
    "b,n,h,lengths",
    [
        (3, 150, 2, [150, 40, 0]),
        (2, 300, 1, [144, 299]),
        # exact tile boundaries: the live-range bwd loop bound
        # ceil(len/128) and the memset-only (never-iterated) trailing
        # q/k blocks must still produce exact-zero accumulator grads
        (2, 300, 2, [128, 256]),
        (3, 384, 1, [128, 129, 383]),
        # np_total >= 512: exercises the in-kernel d_ts_w sweep branch
        # (shorter shapes take the XLA-einsum d_ts_w path)
        (1, 520, 2, [500]),
    ],
)
def test_fused_jagged_grads_match_masked_reference(rng, b, n, h, lengths):
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    q, k, v, ts, pos_w, ts_w = _make(rng, b=b, n=n, h=h, dqk=10, dv=12)
    lens = jnp.asarray(lengths, dtype=jnp.int32)

    def loss_fused(q_, k_, v_, pw_, tw_):
        out = hstu_attention_fused(q_, k_, v_, ts, pw_, tw_, n, 128, lengths=lens)
        return (out ** 2).sum()

    def loss_ref(q_, k_, v_, pw_, tw_):
        return (_expected_jagged(q_, k_, v_, ts, pw_, tw_, n, lens) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    for i, (a, b_) in enumerate(zip(g_fused, g_ref)):
        # bias TABLES (args 3/4) sum ~n^2 f32 terms in a different order
        # than the XLA reference (per-tile in-kernel accumulation);
        # measured error vs float64 ground truth is the same ~4e-4 for
        # BOTH paths at these shapes, so their mutual tolerance is wider
        rtol = 5e-4 if i >= 3 else 2e-4
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=rtol, atol=2e-5)


def test_fused_full_lengths_bit_identical_to_no_lengths(rng):
    """lengths=N must reproduce the lengths=None path bit-for-bit (same
    tile schedule for all valid rows)."""
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    n = 150
    q, k, v, ts, pos_w, ts_w = _make(rng, b=2, n=n, h=2, dqk=16, dv=16)
    full = jnp.full((2,), n, dtype=jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(hstu_attention_fused(q, k, v, ts, pos_w, ts_w, n, 128))
        b_ = np.asarray(
            hstu_attention_fused(q, k, v, ts, pos_w, ts_w, n, 128, lengths=full)
        )
    np.testing.assert_array_equal(a, b_)
