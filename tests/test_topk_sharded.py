"""Sharded top-k vs single-device brute force on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mygenerativerecommenders_tpu.parallel.mesh import make_mesh
from mygenerativerecommenders_tpu.parallel.topk_sharded import sharded_mips_top_k


def test_sharded_topk_matches_dense(rng):
    mesh = make_mesh(data=2, model=4)
    b, x, d, k = 6, 64, 8, 5
    queries = rng.normal(size=(b, d)).astype(np.float32)
    items = rng.normal(size=(x, d)).astype(np.float32)
    ids = np.arange(1, x + 1, dtype=np.int32)

    q = jax.device_put(jnp.asarray(queries), NamedSharding(mesh, P()))
    it = jax.device_put(jnp.asarray(items), NamedSharding(mesh, P("model", None)))
    idv = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("model")))

    top_ids, top_scores = sharded_mips_top_k(mesh, q, it, idv, k)
    top_ids, top_scores = np.asarray(top_ids), np.asarray(top_scores)

    scores = queries @ items.T
    for i in range(b):
        order = np.argsort(-scores[i], kind="stable")[:k]
        np.testing.assert_array_equal(top_ids[i], ids[order])
        np.testing.assert_allclose(top_scores[i], scores[i][order], rtol=1e-5)


def test_sharded_topk_ignores_padding_rows(rng):
    mesh = make_mesh(data=2, model=4)
    b, x, d, k = 2, 64, 4, 3
    items = rng.normal(size=(x, d)).astype(np.float32)
    ids = np.arange(1, x + 1, dtype=np.int32)
    ids[-8:] = 0  # last shard has padding rows
    items[-8:] = 100.0  # would dominate if not demoted

    q = jax.device_put(
        jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        NamedSharding(mesh, P()),
    )
    it = jax.device_put(jnp.asarray(items), NamedSharding(mesh, P("model", None)))
    idv = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("model")))
    top_ids, _ = sharded_mips_top_k(mesh, q, it, idv, k)
    assert not (np.asarray(top_ids) == 0).any()


def test_sharded_eval_matches_replicated(tmp_path):
    """index.sharded (auto-on for sharded tables): the trainer's eval
    with the row-sharded candidate matrix + per-shard top-k merge must
    reproduce the replicated eval's metrics exactly — including the
    past-id filtering (reference candidate_index.py:107-164)."""
    import numpy as np

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    results = {}
    for mode in ("false", "auto"):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out_{mode}")
        cfg.model.embedding.kind = "sharded_a2a"
        cfg.model.embedding.num_shards = 2
        cfg.model.index.sharded = mode
        trainer = Trainer(cfg)
        try:
            assert (
                __import__(
                    "mygenerativerecommenders_tpu.train.task_retrieval",
                    fromlist=["index_sharded_on"],
                ).index_sharded_on(cfg)
                == (mode == "auto")
            )
            results[mode] = trainer.eval_epoch(trainer.data.loader("val"), "val")
        finally:
            trainer.close()
    assert set(results["false"]) == set(results["auto"])
    for key in results["false"]:
        np.testing.assert_allclose(
            results["auto"][key], results["false"][key], rtol=1e-6,
            err_msg=f"metric {key} differs under sharded eval",
        )


def test_sharded_int8_eval_matches_replicated_int8(tmp_path):
    """index.sharded x index.quantize=int8: per-shard int8 pre-rank +
    local exact re-score must reproduce the replicated int8 eval."""
    import numpy as np

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    results = {}
    for mode in ("false", "auto"):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out8_{mode}")
        cfg.model.embedding.kind = "sharded_a2a"
        cfg.model.embedding.num_shards = 2
        cfg.model.index.quantize = "int8"
        cfg.model.index.sharded = mode
        trainer = Trainer(cfg)
        try:
            results[mode] = trainer.eval_epoch(trainer.data.loader("val"), "val")
        finally:
            trainer.close()
    for key in results["false"]:
        np.testing.assert_allclose(
            results["auto"][key], results["false"][key], rtol=1e-6,
            err_msg=f"metric {key} differs under sharded int8 eval",
        )


def test_sharded_eval_batched_dispatch_matches(tmp_path):
    """Batched eval dispatch (trainer.steps_per_call stacked batches per
    device call) with the SHARDED index: the per-shard top-k's
    collectives ride inside the lax.map, and the metrics must equal the
    per-batch sharded eval exactly (VERDICT r4 item 4 — previously the
    sharded index was pinned to per-batch dispatch)."""
    import numpy as np

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    results = {}
    for k_eval in (1, 3):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out_k{k_eval}")
        cfg.model.embedding.kind = "sharded_a2a"
        cfg.model.embedding.num_shards = 2
        cfg.model.index.sharded = "auto"
        cfg.trainer.steps_per_call = k_eval
        trainer = Trainer(cfg)
        try:
            if k_eval > 1:
                assert trainer.eval_step_many is not None
            results[k_eval] = trainer.eval_epoch(
                trainer.data.loader("val"), "val"
            )
        finally:
            trainer.close()
    for key in results[1]:
        np.testing.assert_allclose(
            results[3][key], results[1][key], rtol=1e-6,
            err_msg=f"metric {key} differs under batched sharded eval",
        )


def test_packed_sharded_eval_matches_unpacked_replicated(tmp_path):
    """pack_sequences x index.sharded x batched dispatch: the packed
    per-segment queries drive the row-sharded per-shard top-k + merge,
    and metrics must equal the plain (unpacked, replicated-index) eval
    exactly — both paths are individually exact, so so is the
    composition (VERDICT r4 item 4)."""
    import numpy as np

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    results = {}
    for mode in ("plain", "packed_sharded", "packed_sharded_batched"):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out_{mode}")
        if mode != "plain":
            cfg.data.pack_sequences = True
            cfg.data.pack_eval = "true"  # short-N smoke: force packed eval
            cfg.model.embedding.kind = "sharded_a2a"
            cfg.model.embedding.num_shards = 2
            cfg.model.index.sharded = "auto"
        if mode == "packed_sharded_batched":
            cfg.trainer.steps_per_call = 2
        trainer = Trainer(cfg)
        try:
            if mode != "plain":
                assert trainer._eval_packed  # gate lifted for sharded
                loader = trainer._loader("val", packed=True)
            else:
                loader = trainer.data.loader("val")
            results[mode] = trainer.eval_epoch(loader, "val")
        finally:
            trainer.close()
    for key in results["plain"]:
        for mode in ("packed_sharded", "packed_sharded_batched"):
            np.testing.assert_allclose(
                results[mode][key], results["plain"][key], rtol=1e-6,
                err_msg=f"metric {key} differs under {mode} eval",
            )
