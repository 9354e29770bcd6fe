"""Input-preprocessor unit tests: shapes, masking, and variant semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.models.preprocessors import (
    CombinedItemAndRatingPreprocessor,
    LearnablePositionalEmbeddingAuxPreprocessor,
    LearnablePositionalEmbeddingPreprocessor,
    LearnablePositionalEmbeddingRatedPreprocessor,
)


def make_inputs(rng, b=3, n=10, d=8):
    lengths = np.array([4, 2, 7], dtype=np.int32)
    ids = np.zeros((b, n), dtype=np.int32)
    for i, l in enumerate(lengths):
        ids[i, :l] = rng.integers(1, 50, size=l)
    emb = rng.normal(size=(b, n, d)).astype(np.float32)
    payloads = {
        "timestamps": jnp.asarray(rng.integers(1, 100, size=(b, n)), dtype=jnp.int32),
        "ratings": jnp.asarray(rng.integers(1, 6, size=(b, n)), dtype=jnp.int32),
    }
    return jnp.asarray(lengths), jnp.asarray(ids), jnp.asarray(emb), payloads


def test_positional_masks_invalid(rng):
    lengths, ids, emb, payloads = make_inputs(rng)
    pre = LearnablePositionalEmbeddingPreprocessor(
        max_sequence_len=10, embedding_dim=8, dropout_rate=0.0
    )
    params = pre.init(jax.random.PRNGKey(0), lengths, ids, emb, payloads)
    out_lengths, x, mask, aux, out_payloads = pre.apply(
        params, lengths, ids, emb, payloads
    )
    assert aux is None
    np.testing.assert_array_equal(np.asarray(out_lengths), np.asarray(lengths))
    invalid = np.asarray(ids) == 0
    assert np.abs(np.asarray(x)[invalid]).max() == 0.0
    # valid positions: emb*sqrt(D) + pos table
    assert np.abs(np.asarray(x)[~invalid]).max() > 0


def test_rated_widens_dim(rng):
    lengths, ids, emb, payloads = make_inputs(rng)
    pre = LearnablePositionalEmbeddingRatedPreprocessor(
        max_sequence_len=10, item_embedding_dim=8, rating_embedding_dim=4,
        num_ratings=6, dropout_rate=0.0,
    )
    params = pre.init(jax.random.PRNGKey(0), lengths, ids, emb, payloads)
    _, x, mask, aux, _ = pre.apply(params, lengths, ids, emb, payloads)
    assert x.shape == (3, 10, 12)
    assert aux is None


def test_aux_prepends_token_and_shifts(rng):
    lengths, ids, emb, payloads = make_inputs(rng)
    payloads = dict(payloads)
    payloads["sex"] = jnp.asarray([0, 1, 0], dtype=jnp.int32)
    pre = LearnablePositionalEmbeddingAuxPreprocessor(
        max_sequence_len=10, embedding_dim=8, dropout_rate=0.0,
        auxiliary_columns=("sex",), encoding_types=("onehot",),
        categorical_dims=(2,), categorical_embedding_dims=(0,),
    )
    params = pre.init(jax.random.PRNGKey(0), lengths, ids, emb, payloads)
    new_lengths, x, mask, aux, new_payloads = pre.apply(
        params, lengths, ids, emb, payloads
    )
    np.testing.assert_array_equal(np.asarray(new_lengths), np.asarray(lengths) + 1)
    # position 0 holds the aux token (+ positional embedding): always valid
    assert np.abs(np.asarray(x)[:, 0, :]).max() > 0
    np.testing.assert_array_equal(np.asarray(mask)[:, 0, 0], 1.0)
    # aux mask excludes position 0, includes 1..new_length-1
    aux = np.asarray(aux)
    assert not aux[:, 0].any()
    for i, l in enumerate(np.asarray(new_lengths)):
        assert aux[i, 1:l].all()
        assert not aux[i, l:].any()
    # payloads shifted: timestamp 0 at position 0
    assert int(np.asarray(new_payloads["timestamps"])[:, 0].max()) == 0


def test_combined_interleaves(rng):
    lengths, ids, emb, payloads = make_inputs(rng)
    pre = CombinedItemAndRatingPreprocessor(
        max_sequence_len=10, embedding_dim=8, num_ratings=6, dropout_rate=0.0
    )
    params = pre.init(jax.random.PRNGKey(0), lengths, ids, emb, payloads)
    new_lengths, x, mask, aux, new_payloads = pre.apply(
        params, lengths, ids, emb, payloads
    )
    assert x.shape == (3, 20, 8)
    np.testing.assert_array_equal(np.asarray(new_lengths), np.asarray(lengths) * 2)
    # timestamps duplicated pairwise
    ts = np.asarray(new_payloads["timestamps"])
    np.testing.assert_array_equal(ts[:, 0::2], ts[:, 1::2])
    # aux mask keeps even (item) positions below 2*length
    aux = np.asarray(aux)
    assert not aux[:, 1::2].any()
    for i, l in enumerate(np.asarray(lengths)):
        assert aux[i, 0 : 2 * l : 2].all()
