"""Loss golden tests against independent numpy math."""

import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.models.losses import (
    bce_loss,
    ce_rating_loss,
    sampled_softmax_loss,
)


def test_sampled_softmax_manual():
    # 1 row, 2 positions, 2 negatives; second position masked out.
    pos = jnp.array([[2.0, 5.0]])
    neg = jnp.array([[[1.0, 0.0], [9.0, 9.0]]])
    hits = jnp.zeros((1, 2, 2), dtype=bool)
    weights = jnp.array([[1.0, 0.0]])
    loss = float(sampled_softmax_loss(pos, neg, hits, weights))
    logits = np.array([2.0, 1.0, 0.0])
    expected = -(logits[0] - np.log(np.exp(logits).sum()))
    np.testing.assert_allclose(loss, expected, rtol=5e-4)


def test_sampled_softmax_accidental_hit_masked():
    pos = jnp.array([[1.0]])
    neg = jnp.array([[[100.0]]])  # would dominate if not masked
    hits = jnp.array([[[True]]])
    weights = jnp.ones((1, 1))
    loss = float(sampled_softmax_loss(pos, neg, hits, weights))
    # negative logit replaced by -5e4 -> softmax is ~1 on the positive
    assert loss < 1e-6


def test_bce_loss_accidental_dropped():
    pos = jnp.array([[0.5, 0.5]])
    neg = jnp.array([[-0.3, 123.0]])
    accidental = jnp.array([[False, True]])
    weights = jnp.ones((1, 2))
    loss = float(bce_loss(pos, neg, accidental, weights))
    p, n = 0.5, -0.3
    expected = 0.5 * (np.log1p(np.exp(-p)) + np.log1p(np.exp(n)))
    np.testing.assert_allclose(loss, expected, rtol=5e-4)


def test_ce_rating_loss():
    logits = jnp.array([[[1.0, 2.0, 0.5]]])
    ratings = jnp.array([[1]])
    weights = jnp.ones((1, 1))
    loss = float(ce_rating_loss(logits, ratings, weights))
    z = np.array([1.0, 2.0, 0.5])
    expected = -(z[1] - np.log(np.exp(z).sum()))
    np.testing.assert_allclose(loss, expected, rtol=5e-4)


def test_weighted_mean_denominator():
    # denominator must be sum(weights), not count
    pos = jnp.array([[1.0, 1.0, 1.0]])
    neg = jnp.zeros((1, 3, 1))
    hits = jnp.zeros((1, 3, 1), dtype=bool)
    w_full = jnp.array([[1.0, 1.0, 0.0]])
    loss_masked = float(sampled_softmax_loss(pos, neg, hits, w_full))
    loss_two = float(
        sampled_softmax_loss(pos[:, :2], neg[:, :2], hits[:, :2], w_full[:, :2])
    )
    np.testing.assert_allclose(loss_masked, loss_two, rtol=5e-4)
