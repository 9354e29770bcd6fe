"""The owner-routed (a2a), column-sharded, and 2-D sharded embedding
kinds as REAL MODEL PATHS (embedding.kind=sharded_a2a / sharded_column /
sharded_2d) — lookup and full-train-loss gradient parity against the
psum-broadcast sharded_local path, plus Trainer fast_dev_run integration.

The north star names "row/column sharding and all-to-all ID exchange"
(BASELINE.json); the reference's LocalEmbeddingModule replicates the
table per rank (embeddings.py:40-101) — these paths are its distributed
supersession.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.parallel.mesh import make_mesh
from mygenerativerecommenders_tpu.train.task_retrieval import make_loss_fn
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

NUM_ITEMS = 220


def make_batch(rng, b, l):
    lengths = rng.integers(2, l - 1, size=b).astype(np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, NUM_ITEMS, size=n)
        ts[i, :n] = np.sort(rng.integers(100, 10**6, size=n))
    return {
        "lengths": lengths,
        "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32),
        "timestamps": ts,
        "target_id": rng.integers(1, NUM_ITEMS, size=b).astype(np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 10).astype(np.int32),
        "sample_weight": np.ones(b, dtype=np.float32),
    }


def _cfg(kind, num_shards=2, col_shards=1, capacity_factor=2.0):
    cfg = get_preset("synthetic-smoke")
    cfg.model.embedding.kind = kind
    cfg.model.embedding.num_shards = num_shards
    cfg.model.embedding.col_shards = col_shards
    cfg.model.embedding.a2a_capacity_factor = capacity_factor
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, NUM_ITEMS)
    return cfg


def _init_and_loss_grads(cfg, mesh, batch, table_spec):
    """Init params under mesh, place the table per `table_spec`, and
    return (loss value, grads) of the full retrieval train loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = build_model(cfg)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    with jax.sharding.set_mesh(mesh):
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            seq,
            method=model.init_all,
        )

        def place(path, leaf):
            keys = [str(getattr(k, "key", k)) for k in path]
            if keys[-2:] == ["embeddings", "item_emb"]:
                return jax.device_put(leaf, NamedSharding(mesh, P(*table_spec)))
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        params = jax.tree_util.tree_map_with_path(place, params)
        all_item_ids = np.arange(1, NUM_ITEMS + 1, dtype=np.int32)
        loss_fn = make_loss_fn(model, cfg, all_item_ids)
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            params, batch, jax.random.PRNGKey(7)
        )
        loss = float(loss)
        grads = jax.device_get(grads)
    return model, params, loss, grads


@pytest.fixture(scope="module")
def mesh2():
    return make_mesh(data=4, model=2)


@pytest.fixture(scope="module")
def batch():
    return make_batch(np.random.default_rng(3), 8, 32)


def test_a2a_matches_sharded_local(mesh2, batch):
    """Same table, same rng: the owner-routed path must reproduce the
    psum-broadcast path. Lookups and the loss are BIT-exact (every output
    element is one table row in both paths); the table gradient's
    scatter-add accumulates cotangents in bucket order instead of
    position order, so rows hit by multiple ids can differ by float
    addition order — asserted at machine-epsilon scale instead."""
    m_local, p_local, loss_local, g_local = _init_and_loss_grads(
        _cfg("sharded_local"), mesh2, batch, ("model", None)
    )
    m_a2a, p_a2a, loss_a2a, g_a2a = _init_and_loss_grads(
        _cfg("sharded_a2a"), mesh2, batch, ("model", None)
    )
    # identical init (same param shapes, same keys)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(p_local["params"]["embeddings"]["item_emb"])),
        np.asarray(jax.device_get(p_a2a["params"]["embeddings"]["item_emb"])),
    )
    # bit-exact lookups
    with jax.sharding.set_mesh(mesh2):
        e_local = jax.jit(
            lambda p, i: m_local.apply(p, i, method=m_local.item_embeddings)
        )(p_local, batch["ids"])
        e_a2a = jax.jit(
            lambda p, i: m_a2a.apply(p, i, method=m_a2a.item_embeddings)
        )(p_a2a, batch["ids"])
        np.testing.assert_array_equal(np.asarray(e_local), np.asarray(e_a2a))
    # bit-exact loss
    assert loss_local == pytest.approx(loss_a2a, abs=0.0)
    # grads equal up to scatter-add ordering (last-ulp)
    flat_l, _ = jax.tree_util.tree_flatten(g_local)
    flat_a, _ = jax.tree_util.tree_flatten(g_a2a)
    for gl, ga in zip(flat_l, flat_a):
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(ga), rtol=1e-4, atol=1e-6
        )


def test_a2a_overflow_stays_exact(mesh2, batch):
    """capacity_factor well below the balanced share forces bucket
    overflow on every shard; the psum residual must keep results exact."""
    _, _, loss_local, g_local = _init_and_loss_grads(
        _cfg("sharded_local"), mesh2, batch, ("model", None)
    )
    _, _, loss_a2a, g_a2a = _init_and_loss_grads(
        _cfg("sharded_a2a", capacity_factor=0.25), mesh2, batch, ("model", None)
    )
    assert loss_local == pytest.approx(loss_a2a, rel=1e-6)
    gl = np.asarray(g_local["params"]["embeddings"]["item_emb"])
    ga = np.asarray(g_a2a["params"]["embeddings"]["item_emb"])
    np.testing.assert_allclose(gl, ga, rtol=1e-4, atol=1e-6)


def test_column_sharded_lookup_and_grads(mesh2, batch):
    """sharded_column: local gathers + feature-dim all_gather must equal
    the replicated-table gather; grads flow to every column shard."""
    cfg = _cfg("sharded_column", num_shards=2)
    model, params, loss, grads = _init_and_loss_grads(
        cfg, mesh2, batch, (None, "model")
    )
    with jax.sharding.set_mesh(mesh2):
        table = np.asarray(
            jax.device_get(params["params"]["embeddings"]["item_emb"])
        )
        ids = batch["ids"]
        emb = jax.jit(
            lambda p, i: model.apply(p, i, method=model.item_embeddings)
        )(params, ids)
        np.testing.assert_allclose(
            np.asarray(emb), table[ids], rtol=1e-6, atol=1e-6
        )
    assert np.isfinite(loss)
    g = np.asarray(grads["params"]["embeddings"]["item_emb"])
    d_half = g.shape[1] // 2
    assert np.abs(g[:, :d_half]).max() > 0
    assert np.abs(g[:, d_half:]).max() > 0


def test_sharded_2d_matches_sharded_local(batch):
    """sharded_2d on a (data=2, model=2, col=2) mesh: the a2a-over-rows +
    all_gather-over-columns composition must reproduce the row-sharded
    psum path's loss and gradients."""
    mesh3 = make_mesh(data=2, model=2, col=2)
    mesh2 = make_mesh(data=4, model=2)
    _, _, loss_local, g_local = _init_and_loss_grads(
        _cfg("sharded_local"), mesh2, batch, ("model", None)
    )
    _, _, loss_2d, g_2d = _init_and_loss_grads(
        _cfg("sharded_2d", num_shards=2, col_shards=2),
        mesh3,
        batch,
        ("model", "col"),
    )
    assert loss_local == pytest.approx(loss_2d, rel=1e-6)
    gl = np.asarray(g_local["params"]["embeddings"]["item_emb"])
    g2 = np.asarray(g_2d["params"]["embeddings"]["item_emb"])
    np.testing.assert_allclose(gl, g2, rtol=1e-4, atol=1e-6)


def test_a2a_trainer_fast_dev_run(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.model.embedding.kind = "sharded_a2a"
    cfg.model.embedding.num_shards = 2
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["model"] == 2
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_sharded_2d_trainer_fast_dev_run(tmp_path):
    """The 100m preset's 2-D (row x col) sharding exercised end-to-end at
    reduced vocab on the (data=2, model=2, col=2) CPU mesh."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-large-vocab-100m")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    # scale down: vocab 50k (still 2-D sharded), tiny model
    cfg.data.expected_num_unique_items = 50_000
    cfg.data.expected_max_item_id = 50_000
    cfg.data.synthetic_num_users = 32
    cfg.data.batch_size = 8
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 16
    cfg.model.embedding.num_shards = 2
    cfg.model.embedding.col_shards = 2
    cfg.model.encoder.num_blocks = 1
    cfg.model.loss.num_to_sample = 16
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["model"] == 2
        assert trainer.mesh.shape["col"] == 2
        results = trainer.fit()
        assert "ndcg@100" in results
        assert np.isfinite(list(results.values())).all()
    finally:
        trainer.close()
