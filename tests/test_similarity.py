"""Similarity module tests: dot product broadcast cases + MoL."""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.models.similarity import DotProductSimilarity
from mygenerativerecommenders_tpu.models.similarity_mol import MoLSimilarity


def test_dot_product_cases(rng):
    sim = DotProductSimilarity()
    params = sim.init(jax.random.PRNGKey(0), jnp.ones((2, 4)), jnp.ones((2, 3, 4)))
    q = rng.normal(size=(2, 4)).astype(np.float32)
    items = rng.normal(size=(2, 3, 4)).astype(np.float32)
    out = sim.apply(params, jnp.asarray(q), jnp.asarray(items))
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("bd,bxd->bx", q, items), rtol=1e-5
    )
    # shared [X, D] item matrix broadcast
    shared = rng.normal(size=(5, 4)).astype(np.float32)
    out2 = sim.apply(params, jnp.asarray(q), jnp.asarray(shared)[None, :, :])
    expected = q @ shared.T
    np.testing.assert_allclose(np.asarray(out2[:, ...]), expected, rtol=1e-5)


def test_mol_shapes_and_grads(rng):
    mol = MoLSimilarity(
        embedding_dim=16,
        query_dot_product_groups=2,
        item_dot_product_groups=3,
        dot_product_dimension=8,
        temperature=0.1,
    )
    q = jnp.asarray(rng.normal(size=(4, 7, 16)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(4, 7, 5, 16)).astype(np.float32))
    params = mol.init(jax.random.PRNGKey(0), q, items)
    out = mol.apply(params, q, items)
    assert out.shape == (4, 7, 5)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return (mol.apply(p, q, items) ** 2).sum()

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_mol_gating_variants(rng):
    for combo in ("glu_silu", "glu_silu_ln", "silu", "none"):
        mol = MoLSimilarity(
            embedding_dim=8,
            query_dot_product_groups=2,
            item_dot_product_groups=2,
            dot_product_dimension=4,
            gating_combination_type=combo,
        )
        q = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
        items = jnp.asarray(rng.normal(size=(2, 3, 8)).astype(np.float32))
        params = mol.init(jax.random.PRNGKey(0), q, items)
        out = mol.apply(params, q, items)
        assert out.shape == (2, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_mol_sideinfo_and_tau(rng):
    """Item-sideinfo gating pathways + per-item TauFn temperature."""
    mol = MoLSimilarity(
        embedding_dim=8,
        query_dot_product_groups=2,
        item_dot_product_groups=2,
        dot_product_dimension=4,
        item_sideinfo_dim=3,
        combine_item_sideinfo_into_ci=True,
        gating_use_custom_tau=True,
        gating_tau_alpha=0.01,
    )
    q = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    side = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    params = mol.init(jax.random.PRNGKey(0), q, items, item_sideinfo=side)
    out = mol.apply(params, q, items, item_sideinfo=side)
    assert out.shape == (2, 5)
    assert np.isfinite(np.asarray(out)).all()
    # tau actually participates: its params get gradient
    def loss(p):
        return (mol.apply(p, q, items, item_sideinfo=side) ** 2).sum()

    grads = jax.grad(loss)(params)
    tau_g = grads["params"]["tau_fn"]["kernel"]
    assert np.abs(np.asarray(tau_g)).max() > 0
    # sideinfo_dim declared but not passed -> error
    import pytest

    with pytest.raises(ValueError):
        mol.apply(params, q, items)


def _lnx_reference_numpy(A, B, num_elements, ids, alpha, b_cap, update):
    """Numpy mirror of the reference's _frequency_estimator
    (similarity/mol.py:413-448): stable sort + unique_consecutive,
    last-write-wins most-recent positions, per-id mean gap EMA."""
    ids = np.asarray(ids).reshape(-1)
    order = np.argsort(ids, kind="stable")
    sorted_vals = ids[order]
    uniq, inverse_sorted, counts = np.unique(
        sorted_vals, return_inverse=True, return_counts=True
    )
    most_recent = np.zeros(len(uniq), dtype=np.int64)
    most_recent[inverse_sorted] = order + num_elements  # last write wins
    delta_per_occ = np.zeros(len(ids), dtype=np.float32)
    delta_per_occ[order] = (
        (most_recent - A[uniq]).astype(np.float32) / counts.astype(np.float32)
    )[inverse_sorted]
    with np.errstate(divide="ignore"):
        temp = np.minimum((1 - alpha) * B[ids] + alpha * delta_per_occ, b_cap)
    if update:
        B = B.copy()
        A = A.copy()
        B[ids] = temp
        A[uniq] = most_recent
        num_elements += len(ids)
    with np.errstate(divide="ignore"):
        freqs = 1.0 / temp
    return freqs, A, B, num_elements


def test_lnx_frequency_estimator_matches_reference_semantics(rng):
    from mygenerativerecommenders_tpu.models.similarity_mol import (
        lnx_frequency_estimate,
        lnx_init_state,
    )

    num_ids, alpha, b_cap = 17, 0.25, 50.0
    state = lnx_init_state(num_ids)
    A = np.zeros(num_ids, dtype=np.int64)
    B = np.zeros(num_ids, dtype=np.float32)
    ne = 0
    for step in range(5):
        ids = rng.integers(0, num_ids, size=(3, 4))
        freqs, state = lnx_frequency_estimate(
            state, jnp.asarray(ids), alpha=alpha, b_cap=b_cap, update=True
        )
        exp, A, B, ne = _lnx_reference_numpy(A, B, ne, ids, alpha, b_cap, True)
        np.testing.assert_allclose(
            np.asarray(freqs).reshape(-1), exp, rtol=1e-5, err_msg=f"step {step}"
        )
        np.testing.assert_array_equal(np.asarray(state["A"]), A)
        np.testing.assert_allclose(np.asarray(state["B"]), B, rtol=1e-5)
    # update=False leaves state untouched
    ids = rng.integers(0, num_ids, size=(6,))
    _, state2 = lnx_frequency_estimate(
        state, jnp.asarray(ids), alpha=alpha, b_cap=b_cap, update=False
    )
    for k in ("A", "B", "num_elements"):
        np.testing.assert_array_equal(np.asarray(state2[k]), np.asarray(state[k]))
