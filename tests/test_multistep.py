"""Multi-step (scanned) train call: trainer.steps_per_call.

Per-step rng keys are fold_in(base, global_step) — a pure function of
the global step index — so the k-step lax.scan call must produce
exactly the same parameter/loss trajectory as k single-step calls (the
VERDICT r2 item 8 criterion: the training stream is bit-identical at
every steps_per_call), and the driver's multi-step epoch must account
steps/examples identically to the per-step epoch.
"""

import copy

import jax
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


def make_batch(b, l, num_items, seed):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(4, l, size=b).astype(np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, num_items, size=n)
        ts[i, :n] = np.sort(rng.integers(0, 10**6, size=n))
    return {
        "lengths": lengths,
        "ids": ids,
        "ratings": rng.integers(1, 6, size=(b, l)).astype(np.int32),
        "timestamps": ts,
        "target_id": rng.integers(1, num_items, size=b).astype(np.int32),
        "target_rating": rng.integers(1, 6, size=b).astype(np.int32),
        "target_timestamp": (ts.max(axis=1) + 100).astype(np.int32),
        "sample_weight": np.ones(b, dtype=np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = get_preset("synthetic-smoke")
    resolve(cfg, cfg.data.expected_max_item_id)
    model = build_model(cfg)
    b, l = cfg.data.batch_size, cfg.data.max_sequence_length
    num_items = cfg.data.expected_max_item_id
    batches = [make_batch(b, l, num_items, seed=s) for s in range(3)]
    key = jax.random.PRNGKey(0)
    seq, _, _ = seq_features_from_batch(batches[0], cfg.model.gr_output_length + 1)

    def init_state():
        params = jax.jit(model.init)({"params": key, "dropout": key}, seq)
        tx = build_optimizer(
            cfg.optimizer1, None, params, cfg.optimizer1.lr, 0.0
        )
        return params, jax.jit(tx.init)(params)

    all_ids = np.arange(1, num_items + 1, dtype=np.int32)
    return cfg, model, all_ids, batches, init_state


def test_multi_step_matches_singles(setup):
    cfg, model, all_ids, batches, init_state = setup
    k = len(batches)
    lr1, lr2 = cfg.optimizer1.lr, cfg.optimizer2.lr
    call_rng = jax.random.PRNGKey(7)

    single = make_train_step(model, cfg, all_ids)
    params, opt_state = init_state()
    single_losses = []
    for i in range(k):
        # same base key at global step i == the scan's fold_in(base, i)
        out = single(params, opt_state, batches[i], call_rng, lr1, lr2, i)
        params, opt_state = out.params, out.opt_state
        single_losses.append(float(out.loss))

    multi = make_train_step(model, cfg, all_ids, steps=k)
    params0, opt_state0 = init_state()
    stacked = {key: np.stack([b[key] for b in batches]) for key in batches[0]}
    out_multi = multi(params0, opt_state0, stacked, call_rng, lr1, lr2, 0)

    # bit-identical stream at k=1 vs k=3 (fold_in(base, global_step))
    np.testing.assert_array_equal(
        np.asarray(out_multi.loss, dtype=np.float32),
        np.asarray(single_losses, dtype=np.float32),
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_driver_steps_per_call(tmp_path):
    """Driver epoch with steps_per_call=2 (including an odd remainder
    batch) trains, counts global_step per optimizer step, and evals."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.trainer.max_epochs = 1
    cfg.trainer.min_epochs = 1
    cfg.trainer.steps_per_call = 2
    trainer = Trainer(cfg)
    try:
        loader = trainer.data.loader("train")
        n = len(loader)
        loss = trainer.train_epoch(loader)
        assert np.isfinite(loss)
        assert trainer.global_step == n
        results = trainer.eval_epoch(trainer.data.loader("val"))
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_driver_multi_matches_single_examples(tmp_path):
    """steps_per_call must not change what is trained on: the multi epoch
    consumes the same batches (same loader order) as the per-step epoch."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    trainer = Trainer(cfg)
    try:
        loader = trainer.data.loader("train")
        want = [b["target_id"].copy() for b in loader]
        got = []
        loader2 = trainer.data.loader("train")
        for host_batches, _, n_steps in trainer._stacked_batches(
            loader2, len(loader2), 2
        ):
            assert n_steps in (1, 2) and len(host_batches) == n_steps
            got.extend(b["target_id"] for b in host_batches)
        assert len(got) == len(want)
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)
    finally:
        trainer.close()


@pytest.mark.parametrize("packed", [False, True])
def test_driver_batched_eval_matches_per_batch(tmp_path, packed):
    """eval_epoch with steps_per_call>1 (stacked-batch dispatch incl. a
    remainder chunk) must produce exactly the per-batch metrics — for
    the padded AND the packed eval paths."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    def results_for(k):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out{packed}{k}")
        cfg.trainer.steps_per_call = k
        cfg.data.pack_sequences = packed
        trainer = Trainer(cfg)
        try:
            loader = trainer._loader(
                "val", packed=getattr(trainer, "_eval_packed", False)
            )
            return trainer.eval_epoch(loader)
        finally:
            trainer.close()

    base = results_for(1)
    batched = results_for(3)  # odd k -> remainder chunk takes per-batch path
    assert base.keys() == batched.keys()
    for key in base:
        np.testing.assert_allclose(batched[key], base[key], rtol=1e-6)


def test_driver_batched_eval_with_length_buckets(tmp_path):
    """Length-bucketed eval loaders interleave batch SHAPES; the batched
    eval dispatcher must flush chunks at shape boundaries instead of
    stacking mixed shapes (which would raise)."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    def results_for(k):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"outb{k}")
        cfg.data.length_buckets = (16, 43)
        cfg.trainer.steps_per_call = k
        trainer = Trainer(cfg)
        try:
            return trainer.eval_epoch(trainer.data.loader("val"))
        finally:
            trainer.close()

    base = results_for(1)
    batched = results_for(2)
    for key in base:
        np.testing.assert_allclose(batched[key], base[key], rtol=1e-6)
