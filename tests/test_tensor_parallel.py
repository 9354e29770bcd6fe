"""Tensor-parallel encoder matrices (encoder.tp_shards).

The reference has no TP (SURVEY §2.4); parallel/tensor_parallel.py adds
the Megatron column(uvqk)/row(o) split via GSPMD param placement. Checks:
sharded forward/grads match the replicated model to float tolerance (only
summation order may differ), the Trainer builds the right mesh and trains,
and the config validations fire.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.parallel.mesh import make_mesh
from mygenerativerecommenders_tpu.parallel.tensor_parallel import (
    place_tp_params,
    tp_spec,
)
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

from tests.test_sharded_model import make_batch


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=4, model=2)


def _model_and_params(rng, concat_ua=False):
    cfg = get_preset("synthetic-smoke")
    cfg.model.encoder.use_pallas = "false"
    cfg.model.encoder.num_heads = 2
    cfg.model.encoder.concat_ua = concat_ua
    resolve(cfg, 220)
    model = build_model(cfg)
    batch = make_batch(rng, 8, cfg.data.max_sequence_length, 220)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq,
        method=model.init_all,
    )
    return cfg, model, seq, params


def test_tp_spec_targets_only_encoder_matmuls(rng):
    _, _, _, params = _model_and_params(rng)
    specs = {}
    def visit(path, leaf):
        s = tp_spec(path)
        if s is not None:
            keys = "/".join(str(getattr(k, "key", k)) for k in path)
            specs[keys] = (s, leaf.shape)
        return leaf
    jax.tree_util.tree_map_with_path(visit, params)
    uvqk = [k for k in specs if k.endswith("uvqk")]
    okern = [k for k in specs if k.endswith("o/kernel")]
    assert len(uvqk) == 2 and len(okern) == 2  # one per block
    for k in uvqk:
        assert specs[k][0] == P(None, "model")
    for k in okern:
        assert specs[k][0] == P("model", None)
    # biases and non-encoder params untouched
    assert not any(k.endswith("o/bias") for k in specs)
    assert not any("embeddings" in k for k in specs)


@pytest.mark.parametrize("concat_ua", [False, True])
def test_tp_forward_and_grads_match_replicated(mesh, rng, concat_ua):
    _, model, seq, params = _model_and_params(rng, concat_ua=concat_ua)

    def loss(p):
        out, _ = model.apply(p, seq, deterministic=True)
        return (out**2).sum()

    want = jax.jit(loss)(params)
    want_g = jax.jit(jax.grad(loss))(params)

    replicated = NamedSharding(mesh, P())
    params_tp = place_tp_params(jax.device_put(params, replicated), mesh)
    # the placements really are sharded
    uvqk = params_tp["params"]["encoder"]["block_0"]["uvqk"]
    assert uvqk.sharding.spec == P(None, "model")

    got = jax.jit(loss)(params_tp)
    got_g = jax.jit(jax.grad(loss))(params_tp)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for (pa, wl), gl in zip(
        jax.tree_util.tree_leaves_with_path(want_g),
        jax.tree_util.tree_leaves(got_g),
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in pa)
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(wl), rtol=2e-5, atol=1e-5, err_msg=name
        )


def test_tp_trainer_fast_dev_run(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.model.encoder.tp_shards = 2
    cfg.model.encoder.use_pallas = "false"
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["model"] == 2
        uvqk = trainer.params["params"]["encoder"]["block_0"]["uvqk"]
        assert uvqk.sharding.spec == P(None, "model")
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_tp_composes_with_sharded_embedding(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.model.encoder.tp_shards = 2
    cfg.model.embedding.kind = "sharded_local"
    cfg.model.embedding.num_shards = 2
    cfg.model.encoder.use_pallas = "false"
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        table = trainer.params["params"]["embeddings"]["item_emb"]
        assert table.sharding.spec == P("model", None)
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_tp_survives_scion_init(tmp_path):
    """scion_init regenerates exactly the 2-D encoder matrices TP shards;
    placement must happen after it or the shardings are silently lost."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.model.encoder.tp_shards = 2
    cfg.model.encoder.use_pallas = "false"
    cfg.optimizer2.enabled = True
    cfg.optimizer2.kind = "scion"
    cfg.optimizer2.scion_init = True
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        uvqk = trainer.params["params"]["encoder"]["block_0"]["uvqk"]
        assert uvqk.sharding.spec == P(None, "model")
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_tp_config_validations(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    # TP x SP compose (head-sharded ring), but num_heads must divide by
    # tp_shards — synthetic-smoke has 1 head
    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.model.encoder.tp_shards = 2
    cfg.model.encoder.sp_shards = 2
    with pytest.raises(ValueError, match="num_heads"):
        Trainer(cfg)

    cfg2 = get_preset("synthetic-smoke")
    cfg2.data.data_dir = str(tmp_path / "data")
    cfg2.trainer.output_dir = str(tmp_path / "out")
    cfg2.model.encoder.tp_shards = 4
    cfg2.model.embedding.kind = "sharded_local"
    cfg2.model.embedding.num_shards = 2
    with pytest.raises(ValueError, match="model"):
        Trainer(cfg2)
