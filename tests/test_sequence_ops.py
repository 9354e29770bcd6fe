"""Golden-value tests for the static-shape sequence ops.

Mirrors the reference's tests/test_ops.py style: small literal tensors
with hand-computed expectations, covering the jagged-op replacements.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.ops.sequence import (
    compact_by_mask,
    get_current_embeddings,
    lengths_to_mask,
    mask_dense_by_aux_mask,
    scatter_at_lengths,
)


def test_lengths_to_mask():
    mask = lengths_to_mask(jnp.array([0, 1, 3]), 4)
    np.testing.assert_array_equal(
        np.asarray(mask),
        [[0, 0, 0, 0], [1, 0, 0, 0], [1, 1, 1, 0]],
    )


def test_get_current_embeddings():
    x = jnp.arange(2 * 3 * 2, dtype=jnp.float32).reshape(2, 3, 2)
    out = get_current_embeddings(jnp.array([1, 3]), x)
    # row 0 -> position 0, row 1 -> position 2
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 1.0], [10.0, 11.0]])


def test_scatter_at_lengths():
    seq = jnp.array([[1, 2, 0, 0], [3, 4, 5, 0]])
    out = scatter_at_lengths(seq, jnp.array([2, 3]), jnp.array([9, 8]))
    np.testing.assert_array_equal(np.asarray(out), [[1, 2, 9, 0], [3, 4, 5, 8]])


def test_compact_by_mask_basic():
    x = jnp.array([[1.0, 2.0, 3.0, 4.0]])[:, :, None]
    keep = jnp.array([[True, False, True, False]])
    out, lengths = compact_by_mask(x, keep)
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0], [1.0, 3.0, 0.0, 0.0])
    assert int(lengths[0]) == 2


def test_compact_by_mask_all_masked():
    x = jnp.ones((1, 3, 2))
    out, lengths = compact_by_mask(x, jnp.zeros((1, 3), dtype=bool))
    assert np.asarray(out).sum() == 0
    assert int(lengths[0]) == 0


def test_compact_by_mask_none_masked():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    out, lengths = compact_by_mask(x, jnp.ones((1, 3), dtype=bool))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert int(lengths[0]) == 3


def test_mask_dense_by_aux_mask_ragged():
    # Two rows with different lengths; aux position 0 dropped.
    dense = jnp.arange(2 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 1)
    aux = jnp.array([[False, True, True, True], [False, True, True, True]])
    lengths = jnp.array([3, 2])
    out, new_lengths = mask_dense_by_aux_mask(dense, aux, lengths)
    # row 0: keeps positions 1,2 (length 3 excludes pos 3)
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0], [1.0, 2.0, 0.0, 0.0])
    # row 1: keeps position 1 only
    np.testing.assert_array_equal(np.asarray(out)[1, :, 0], [5.0, 0.0, 0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(new_lengths), [2, 1])
