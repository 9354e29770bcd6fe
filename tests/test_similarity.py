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
    for combo in ("glu_silu", "silu", "none"):
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
