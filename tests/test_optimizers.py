"""Optimizer tests: Muon/Scion math + the 2-optimizer split + e2e smoke."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import OptimizerConfig, SchedulerConfig
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.train.optimizers import (
    build_optimizer,
    muon,
    param_labels,
    scion,
    zeropower_via_newtonschulz5,
)


def test_newton_schulz_orthogonalizes(rng):
    g = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    x = zeropower_via_newtonschulz5(g, 5).astype(jnp.float32)
    # columns should be near-orthonormal: singular values ~ Uniform(0.5, 1.5)
    s = jnp.linalg.svd(x, compute_uv=False)
    assert float(s.max()) < 2.0
    assert float(s.min()) > 0.2


def test_muon_step_moves_params(rng):
    params = {"w": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))}
    tx = muon(learning_rate=0.1, momentum=0.9)
    state = tx.init(params)
    grads = {"w": jnp.ones((16, 8))}
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0
    # orthogonalized update has bounded scale
    assert float(jnp.abs(updates["w"]).max()) < 1.0


def test_scion_unconstrained_vs_constrained(rng):
    params = {"w": jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))}
    grads = {"w": jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))}
    for unconstrained in (True, False):
        tx = scion(learning_rate=0.1, momentum=0.5, unconstrained=unconstrained)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


def test_param_labels_split():
    params = {
        "embeddings": {"item_emb": jnp.zeros((10, 4))},
        "encoder": {
            "block_0": {
                "uvqk": jnp.zeros((4, 16)),
                "rel_bias_pos_w": jnp.zeros((7,)),
                "o": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros((4,))},
            }
        },
        "preprocessor": {"pos_emb": jnp.zeros((5, 4))},
    }
    labels = param_labels(params)
    assert labels["embeddings"]["item_emb"] == "primary"  # "emb" in name
    assert labels["encoder"]["block_0"]["uvqk"] == "matrix"
    assert labels["encoder"]["block_0"]["rel_bias_pos_w"] == "primary"  # 1-D
    assert labels["encoder"]["block_0"]["o"]["kernel"] == "matrix"
    assert labels["encoder"]["block_0"]["o"]["bias"] == "primary"
    assert labels["preprocessor"]["pos_emb"] == "primary"


@pytest.mark.parametrize("opt2_kind", ["muon", "scion"])
def test_two_optimizer_training_decreases_loss(opt2_kind, tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.optimizer1 = OptimizerConfig(kind="adamw", lr=5e-4, weight_decay=1e-3)
    if opt2_kind == "muon":
        cfg.optimizer2 = OptimizerConfig(kind="muon", lr=5e-3, momentum=0.95)
    else:
        cfg.optimizer2 = OptimizerConfig(
            kind="scion", lr=1e-3, momentum=0.1, norm="auto", unconstrained=True
        )
    cfg.scheduler2 = SchedulerConfig(kind="plateau")
    cfg.trainer.overfit_batches = 2
    cfg.trainer.check_val_every_n_epoch = 100
    trainer = Trainer(cfg)
    first = trainer.train_epoch(trainer.data.loader("train"))
    for _ in range(5):
        trainer.epoch += 1
        last = trainer.train_epoch(trainer.data.loader("train"))
    assert np.isfinite(last)
    assert last < first, f"{opt2_kind}: loss did not decrease {first} -> {last}"
