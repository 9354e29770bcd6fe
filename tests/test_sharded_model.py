"""Full model with the row-sharded embedding table on a (data=4, model=2)
mesh — train-step + eval-path sanity on the virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.parallel.mesh import make_mesh
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=4, model=2)


def make_batch(rng, b, l, num_items):
    lengths = rng.integers(2, l - 1, size=b).astype(np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, num_items, size=n)
        ts[i, :n] = np.sort(rng.integers(100, 10**6, size=n))
    return {
        "lengths": lengths,
        "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32),
        "timestamps": ts,
        "target_id": rng.integers(1, num_items, size=b).astype(np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 10).astype(np.int32),
        "sample_weight": np.ones(b, dtype=np.float32),
    }


def test_sharded_embedding_trainer_fast_dev_run(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.model.embedding.kind = "sharded_local"
    cfg.model.embedding.num_shards = 2
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["model"] == 2
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()  # restore the ambient mesh for later tests


def test_sharded_embedding_model_forward_and_grads(mesh, rng):
    cfg = get_preset("synthetic-smoke")
    cfg.model.embedding.kind = "sharded_local"
    cfg.model.embedding.num_shards = 2
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 220)
    model = build_model(cfg)

    batch = make_batch(rng, 8, cfg.data.max_sequence_length, 220)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)

    with jax.sharding.set_mesh(mesh):
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            seq,
            method=model.init_all,
        )
        # place the table row-sharded over "model", everything else replicated
        def place(path, leaf):
            keys = [str(getattr(k, "key", k)) for k in path]
            if keys[-2:] == ["embeddings", "item_emb"]:
                return jax.device_put(leaf, NamedSharding(mesh, P("model", None)))
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        params = jax.tree_util.tree_map_with_path(place, params)

        encoded, lengths = jax.jit(
            lambda p, s: model.apply(p, s, deterministic=True)
        )(params, seq)
        assert np.isfinite(np.asarray(encoded)).all()

        # lookup parity vs a dense gather of the (gathered) table
        table = np.asarray(jax.device_get(params["params"]["embeddings"]["item_emb"]))
        emb = jax.jit(
            lambda p, ids: model.apply(p, ids, method=model.item_embeddings)
        )(params, seq.past_ids)
        np.testing.assert_allclose(
            np.asarray(emb), table[np.asarray(seq.past_ids)], rtol=1e-6, atol=1e-6
        )

        # grads flow and keep the table sharded
        def loss(p):
            out, _ = model.apply(p, seq, deterministic=True)
            return (out**2).sum()

        g = jax.jit(jax.grad(loss))(params)
        g_table = g["params"]["embeddings"]["item_emb"]
        assert np.isfinite(np.asarray(g_table)).all()
        assert float(np.abs(np.asarray(g_table)).max()) > 0


def test_synthetic_large_vocab_preset_fast_dev_run(tmp_path):
    """BASELINE config #5 wired end-to-end from the preset: sharded table
    (8-way model axis) + int8 pre-ranked eval + sharded top-k, scaled
    down for the 8-device CPU mesh."""
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-large-vocab")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    # scale down: vocab 50k (still sharded 8-way), tiny model
    cfg.data.expected_num_unique_items = 50_000
    cfg.data.expected_max_item_id = 50_000
    cfg.data.synthetic_num_users = 32
    cfg.data.batch_size = 8
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.num_blocks = 1
    cfg.model.loss.num_to_sample = 16
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@100" in results
        import numpy as np

        assert np.isfinite(list(results.values())).all()
    finally:
        trainer.close()


def test_amzn_books_preset_fast_dev_run(tmp_path):
    """amzn-books preset end-to-end on a small fake ratings CSV: Amazon
    ETL -> length-bucketed loader -> lazy embedding update -> eval."""
    import numpy as np
    import pandas as pd

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    data_dir = tmp_path / "data"
    data_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    items = [f"B{i:04d}" for i in range(40)]
    for u in range(24):
        n = rng.integers(6, 20)
        ts = np.sort(rng.integers(0, 10**6, size=n)) + 1_400_000_000
        for t in range(n):
            rows.append([f"U{u}", items[rng.integers(0, 8)], 5.0, int(ts[t])])
    pd.DataFrame(rows).to_csv(
        data_dir / "ratings_Books.csv", index=False, header=False
    )

    cfg = get_preset("amzn-books")
    cfg.data.data_dir = str(data_dir)
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.batch_size = 8
    cfg.data.max_sequence_length = 16
    cfg.data.length_buckets = (8, 16)
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.num_blocks = 1
    cfg.model.loss.num_to_sample = 8
    cfg.model.index.k = 5
    cfg.model.metrics.at_k_list = (5,)
    cfg.trainer.monitor = "val/ndcg@5"
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@5" in results
    finally:
        trainer.close()


def test_amzn_books_sharded_preset_fast_dev_run(tmp_path):
    """amzn-books-sharded end-to-end scaled to the CPU mesh: packed
    batches + owner-routed a2a table (2 shards here) + sharded candidate
    index, through the Amazon ETL."""
    import numpy as np
    import pandas as pd

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    data_dir = tmp_path / "data"
    data_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    items = [f"B{i:04d}" for i in range(40)]
    for u in range(24):
        n = rng.integers(6, 20)
        ts = np.sort(rng.integers(0, 10**6, size=n)) + 1_400_000_000
        for t in range(n):
            rows.append([f"U{u}", items[rng.integers(0, 8)], 5.0, int(ts[t])])
    pd.DataFrame(rows).to_csv(
        data_dir / "ratings_Books.csv", index=False, header=False
    )

    cfg = get_preset("amzn-books-sharded")
    cfg.data.data_dir = str(data_dir)
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.batch_size = 8
    cfg.data.max_sequence_length = 16
    cfg.data.length_buckets = (8, 16)
    cfg.data.pack_capacities = (8, 24)
    cfg.model.embedding.num_shards = 2  # 8-way needs 8 model devices
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.num_blocks = 1
    cfg.model.loss.num_to_sample = 8
    cfg.model.index.k = 5
    cfg.model.metrics.at_k_list = (5,)
    cfg.trainer.monitor = "val/ndcg@5"
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["model"] == 2
        from mygenerativerecommenders_tpu.train.task_retrieval import (
            index_sharded_on,
        )

        assert index_sharded_on(cfg)  # sharded candidate index engaged
        results = trainer.fit()
        assert "ndcg@5" in results
    finally:
        trainer.close()
