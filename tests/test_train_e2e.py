"""End-to-end training tests on tiny synthetic data (the analog of the
reference's debug=fdr / debug=overfit Hydra profiles)."""

import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import apply_overrides
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.train.driver import Trainer


@pytest.fixture(scope="module")
def smoke_cfg(tmp_path_factory):
    cfg = get_preset("synthetic-smoke")
    tmp = tmp_path_factory.mktemp("e2e")
    cfg.data.data_dir = str(tmp / "data")
    cfg.trainer.output_dir = str(tmp / "out")
    return cfg


def test_fast_dev_run(smoke_cfg):
    import copy

    cfg = copy.deepcopy(smoke_cfg)
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    results = trainer.fit()
    assert "ndcg@10" in results
    test_results = trainer.test()
    assert 0.0 <= test_results["hr@20"] <= 1.0


def test_loss_decreases_overfit(smoke_cfg):
    import copy

    cfg = copy.deepcopy(smoke_cfg)
    cfg.trainer.max_epochs = 8
    cfg.trainer.min_epochs = 8
    cfg.trainer.overfit_batches = 2
    cfg.trainer.check_val_every_n_epoch = 100  # skip val during overfit
    trainer = Trainer(cfg)
    first = trainer.train_epoch(trainer.data.loader("train"))
    for _ in range(6):
        trainer.epoch += 1
        last = trainer.train_epoch(trainer.data.loader("train"))
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_ranking_task_fast_dev_run(smoke_cfg, tmp_path):
    from mygenerativerecommenders_tpu.configs.presets import get_preset

    cfg = get_preset("synthetic-rank-smoke")
    cfg.data.data_dir = smoke_cfg.data.data_dir
    cfg.trainer.output_dir = str(tmp_path)
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    results = trainer.fit()
    assert "auroc" in results and "ap" in results


def test_aux_preprocessor_fast_dev_run(smoke_cfg, tmp_path):
    from mygenerativerecommenders_tpu.configs.presets import get_preset

    cfg = get_preset("synthetic-aux-smoke")
    cfg.data.data_dir = smoke_cfg.data.data_dir
    cfg.trainer.output_dir = str(tmp_path)
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    results = trainer.fit()
    assert "ndcg@10" in results


def test_mol_similarity_fast_dev_run(smoke_cfg, tmp_path):
    import copy

    cfg = copy.deepcopy(smoke_cfg)
    cfg.model.similarity.kind = "mol"
    cfg.model.similarity.query_dot_product_groups = 2
    cfg.model.similarity.item_dot_product_groups = 2
    cfg.model.similarity.dot_product_dimension = 8
    cfg.trainer.output_dir = str(tmp_path)
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    results = trainer.fit()
    assert "ndcg@10" in results


def test_in_batch_sampler_fast_dev_run(smoke_cfg, tmp_path):
    import copy

    cfg = copy.deepcopy(smoke_cfg)
    cfg.model.sampler.kind = "in_batch"
    cfg.trainer.output_dir = str(tmp_path)
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    results = trainer.fit()
    assert "ndcg@10" in results


def test_sasrec_fast_dev_run(smoke_cfg, tmp_path):
    import copy

    cfg = copy.deepcopy(smoke_cfg)
    cfg.model.encoder.kind = "sasrec"
    cfg.trainer.output_dir = str(tmp_path)
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    results = trainer.fit()
    assert "ndcg@10" in results


def test_checkpoint_resume(smoke_cfg):
    import copy

    cfg = copy.deepcopy(smoke_cfg)
    cfg.trainer.max_epochs = 1
    cfg.trainer.min_epochs = 1
    trainer = Trainer(cfg)
    trainer.fit()
    step, params_before = trainer.global_step, trainer.params
    ckpt = str(trainer.ckpt.ckpt_dir) + "/last"

    cfg2 = copy.deepcopy(cfg)
    cfg2.trainer.ckpt_path = ckpt
    trainer2 = Trainer(cfg2)
    trainer2.restore(ckpt)
    assert trainer2.global_step == step
    import jax

    leaves1 = jax.tree.leaves(params_before)
    leaves2 = jax.tree.leaves(trainer2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
