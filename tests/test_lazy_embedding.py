"""Lazy (sparse-row) embedding optimizer (embedding.lazy_update).

Opt-in algorithm change (torch SparseAdam analog): the item table is
updated only at the rows a step touches. Verified here:

- the lazy loss is bit-equal to the shared-negatives loss (same RNG
  stream, same math, lookups redirected through one gathered row block);
- the factored (ids, row-grads) gradient scatter-adds to exactly the
  dense table gradient;
- one optimizer step with weight_decay=0 matches the dense AdamW step on
  every param (touched rows take the identical update; untouched rows
  move only via decay, which is disabled);
- untouched rows and their moments never move;
- the Trainer runs end-to-end with the lazy step (single and fused
  multi-step calls).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.train import task_retrieval
from mygenerativerecommenders_tpu.train.lazy_embedding import (
    init_lazy_opt_state,
    lazy_applicable,
    make_lazy_parts,
    make_lazy_train_step,
    split_table,
)
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

from tests.test_dense_negatives import _make_batch


def _setup(rng, num_items=120, r=16, wd=1e-3):
    cfg = Config()
    cfg.data.max_sequence_length = 10
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    cfg.model.loss.num_to_sample = r
    cfg.model.loss.shared_negatives = True
    cfg.model.embedding.lazy_update = True
    cfg.optimizer1.weight_decay = wd
    resolve(cfg, num_items)
    model = build_model(cfg)
    all_item_ids = np.arange(1, num_items + 1, dtype=np.int32)
    batch = _make_batch(rng, 4, 10, num_items)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq,
        method=model.init_all,
    )
    return cfg, model, all_item_ids, batch, params


def test_applicability_gate(rng):
    cfg, _, _, _, _ = _setup(rng)
    assert lazy_applicable(cfg)
    bad = copy.deepcopy(cfg)
    bad.model.loss.shared_negatives = False
    with pytest.raises(ValueError, match="shared_negatives"):
        lazy_applicable(bad)
    bad = copy.deepcopy(cfg)
    bad.optimizer1.kind = "muon"
    with pytest.raises(ValueError, match="adamw"):
        lazy_applicable(bad)
    bad = copy.deepcopy(cfg)
    bad.model.embedding.kind = "item_year"
    with pytest.raises(ValueError, match="embedding.kind"):
        lazy_applicable(bad)


def test_loss_matches_shared_negatives(rng):
    cfg, model, ids, batch, params = _setup(rng)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(7)

    cfg_shared = copy.deepcopy(cfg)
    cfg_shared.model.embedding.lazy_update = False
    shared_fn = task_retrieval.make_loss_fn(model, cfg_shared, ids)
    want = float(shared_fn(params, dev_batch, step_rng))

    ids_fn, loss_rows_fn = make_lazy_parts(model, cfg, ids)
    table, rest = split_table(params)
    touched = ids_fn(dev_batch, step_rng)
    rows = jnp.take(table, touched, axis=0)
    got = float(loss_rows_fn(rest, rows, dev_batch, step_rng))
    assert got == want  # identical math + RNG stream: bit-equal


def test_factored_grad_equals_dense_table_grad(rng):
    cfg, model, ids, batch, params = _setup(rng)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(3)

    cfg_shared = copy.deepcopy(cfg)
    cfg_shared.model.embedding.lazy_update = False
    shared_fn = task_retrieval.make_loss_fn(model, cfg_shared, ids)
    dense_grads = jax.grad(shared_fn)(params, dev_batch, step_rng)
    dense_table_grad = dense_grads["params"]["embeddings"]["item_emb"]

    ids_fn, loss_rows_fn = make_lazy_parts(model, cfg, ids)
    table, rest = split_table(params)
    touched = ids_fn(dev_batch, step_rng)
    rows = jnp.take(table, touched, axis=0)
    g_rest, g_rows = jax.grad(
        lambda rr: loss_rows_fn(rr[0], rr[1], dev_batch, step_rng)
    )((rest, rows))

    scattered = jnp.zeros_like(table).at[touched].add(g_rows)
    np.testing.assert_allclose(
        np.asarray(scattered), np.asarray(dense_table_grad), atol=1e-6
    )
    # the non-table grads match the dense path's too
    dense_rest = dict(dense_grads["params"])
    dense_rest.pop("embeddings")
    for path, leaf in jax.tree_util.tree_flatten_with_path(
        g_rest["params"]
    )[0]:
        d = dense_rest
        for k in path:
            d = d[k.key]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(d), atol=1e-6)


def test_single_step_matches_dense_adamw_at_zero_wd(rng):
    # with weight_decay=0 and zero-initialized moments, dense AdamW and
    # lazy AdamW produce the same params after ONE step: touched rows get
    # the identical update, untouched rows move in neither
    cfg, model, ids, batch, params = _setup(rng, wd=0.0)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(11)
    lr1 = jnp.float32(1e-3)
    lr2 = jnp.float32(1e-3)

    cfg_dense = copy.deepcopy(cfg)
    cfg_dense.model.embedding.lazy_update = False
    dense_step = task_retrieval.make_train_step(model, cfg_dense, ids)
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer

    tx = build_optimizer(cfg_dense.optimizer1, None, params, lr1, lr2)
    dense_out = dense_step(
        jax.tree.map(jnp.copy, params), tx.init(params), dev_batch,
        step_rng, lr1, lr2,
    )

    lazy_step = make_lazy_train_step(model, cfg, ids)
    lazy_out = lazy_step(
        jax.tree.map(jnp.copy, params),
        init_lazy_opt_state(cfg, params),
        dev_batch, step_rng, lr1, lr2,
    )

    assert float(lazy_out.loss) == float(dense_out.loss)
    flat_a = jax.tree_util.tree_flatten_with_path(lazy_out.params)[0]
    flat_b = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(dense_out.params)[0]
    )
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat_b[jax.tree_util.keystr(path)]),
            atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_untouched_rows_frozen(rng):
    cfg, model, ids, batch, params = _setup(rng)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(5)

    ids_fn, _ = make_lazy_parts(model, cfg, ids)
    # the step folds the base key with the global step index (0 here)
    touched = np.unique(
        np.asarray(ids_fn(dev_batch, jax.random.fold_in(step_rng, 0)))
    )
    table_before = np.asarray(split_table(params)[0]).copy()
    untouched = np.setdiff1d(np.arange(table_before.shape[0]), touched)
    assert untouched.size > 0  # the tiny batch must not cover the vocab

    lazy_step = make_lazy_train_step(model, cfg, ids)
    out = lazy_step(
        params, init_lazy_opt_state(cfg, params), dev_batch,
        step_rng, jnp.float32(1e-3), jnp.float32(1e-3),
    )
    table_after = np.asarray(split_table(out.params)[0])
    np.testing.assert_array_equal(table_after[untouched], table_before[untouched])
    assert not np.array_equal(table_after[touched], table_before[touched])
    # moments of untouched rows stay zero
    assert np.all(np.asarray(out.opt_state.table.m)[untouched] == 0)
    assert np.all(np.asarray(out.opt_state.table.v)[untouched] == 0)
    assert int(out.opt_state.table.count) == 1


def test_multi_step_scan_matches_sequential(rng):
    cfg, model, ids, batch, params = _setup(rng)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    lr = jnp.float32(1e-3)
    rng0 = jax.random.PRNGKey(9)

    single = make_lazy_train_step(model, cfg, ids)
    p1 = jax.tree.map(jnp.copy, params)
    s1 = init_lazy_opt_state(cfg, params)
    for i in range(3):
        # fold_in(base, global step) matches the scan's per-step keys
        out = single(p1, s1, dev_batch, rng0, lr, lr, i)
        p1, s1 = out.params, out.opt_state

    multi = make_lazy_train_step(model, cfg, ids, steps=3)
    stacked = {k: jnp.stack([v] * 3) for k, v in dev_batch.items()}
    out3 = multi(
        jax.tree.map(jnp.copy, params), init_lazy_opt_state(cfg, params),
        stacked, rng0, lr, lr,
    )
    assert out3.loss.shape == (3,)
    for a, b in zip(jax.tree.leaves(out3.params), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_e2e_smoke(rng, tmp_path):
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.batch_size = 8
    cfg.data.max_sequence_length = 12
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.trainer.fast_dev_run = True
    cfg.model.loss.shared_negatives = True
    cfg.model.embedding.lazy_update = True
    cfg.trainer.num_devices = 1
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_trainer_e2e_multistep(rng, tmp_path):
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.batch_size = 8
    cfg.data.max_sequence_length = 12
    cfg.data.synthetic_num_users = 64
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.trainer.max_epochs = 1
    cfg.trainer.min_epochs = 1
    cfg.trainer.steps_per_call = 2
    cfg.model.loss.shared_negatives = True
    cfg.model.embedding.lazy_update = True
    cfg.trainer.num_devices = 1
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()
