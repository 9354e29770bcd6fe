"""Sequence packing (data/packing.py + packed model/loss paths).

Packing is the TPU analog of the reference's jagged [sum(N_i), D] layout
(hstu.py:439-480): several examples per row, block-diagonal attention.
These tests pin the invariants that make it loss-equivalent:

- the packer emits every example exactly once with correct tokens,
  positions, and segment ids;
- the packed forward reproduces the unpacked forward per segment;
- the packed fused Pallas kernel matches the packed jnp reference
  (fwd + grads, interpret mode);
- the packed shared-negatives loss and its grads equal the unpacked
  loss on the same examples;
- the Trainer runs end-to-end with data.pack_sequences=true.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.data.dataset import SequenceDataset
from mygenerativerecommenders_tpu.data.packing import PackedBatchLoader, pack_rows
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.ops.sequence import scatter_at_lengths
from mygenerativerecommenders_tpu.train.task_retrieval import make_loss_fn
from mygenerativerecommenders_tpu.utils.features import (
    packed_seq_features,
    seq_features_from_batch,
)

NUM_ITEMS = 200


def make_dataset(rng, users=24, l_max=30):
    lengths = rng.integers(3, l_max, size=users).astype(np.int32)
    ids = np.zeros((users, l_max), dtype=np.int32)
    ts = np.zeros((users, l_max), dtype=np.int32)
    ratings = np.zeros((users, l_max), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, NUM_ITEMS, size=n)
        ts[i, :n] = np.sort(rng.integers(1000, 10**6, size=n))
        ratings[i, :n] = rng.integers(1, 6, size=n)
    return SequenceDataset(
        lengths=lengths,
        ids=ids,
        ratings=ratings,
        timestamps=ts,
        target_id=rng.integers(1, NUM_ITEMS, size=users).astype(np.int32),
        target_rating=rng.integers(1, 6, size=users).astype(np.int32),
        target_timestamp=(ts.max(axis=1) + 10).astype(np.int32),
        user_ids=np.arange(users),
        additional={},
    )


def test_pack_rows_next_fit():
    rows = pack_rows(np.array([5, 5, 5, 4, 10, 1]), capacity=10)
    np.testing.assert_array_equal(rows, [0, 0, 1, 1, 2, 3])


def test_packer_round_trip(rng):
    ds = make_dataset(rng)
    loader = PackedBatchLoader(ds, rows_per_batch=4, row_capacity=64,
                               shuffle=True, seed=3)
    seen = []
    for batch in loader:
        assert batch["ids"].shape == (4, 64)
        for r in range(4):
            seg = batch["seg_ids"][r]
            n_segs = int(batch["num_segments"][r])
            assert int(batch["lengths"][r]) == int((seg >= 0).sum())
            for s in range(n_segs):
                tok = np.where(seg == s)[0]
                assert np.all(np.diff(tok) == 1)  # contiguous
                np.testing.assert_array_equal(
                    batch["positions"][r][tok], np.arange(len(tok))
                )
                seen.append(
                    (tuple(batch["ids"][r][tok]),
                     tuple(batch["timestamps"][r][tok]))
                )
    # every example exactly once, with history + target tokens
    expected = []
    for e in range(len(ds)):
        n = ds.lengths[e]
        expected.append(
            (tuple(ds.ids[e, :n]) + (ds.target_id[e],),
             tuple(ds.timestamps[e, :n]) + (ds.target_timestamp[e],))
        )
    assert sorted(seen) == sorted(expected)


def _cfg(use_pallas="false"):
    cfg = get_preset("synthetic-smoke")
    cfg.data.max_sequence_length = 30
    cfg.model.encoder.use_pallas = use_pallas
    # dropout off: packing reshapes rows, so dropout masks (drawn per
    # array position) would differ between layouts
    cfg.model.preprocessor.dropout_rate = 0.0
    cfg.model.encoder.linear_dropout_rate = 0.0
    cfg.model.loss.shared_negatives = True  # layout-independent negatives
    resolve(cfg, NUM_ITEMS)
    return cfg


def _unpacked_batch(ds):
    return {
        "lengths": ds.lengths,
        "ids": ds.ids,
        "ratings": ds.ratings,
        "timestamps": ds.timestamps,
        "target_id": ds.target_id,
        "target_rating": ds.target_rating,
        "target_timestamp": ds.target_timestamp,
        "sample_weight": np.ones(len(ds), dtype=np.float32),
    }


def test_packed_forward_matches_unpacked(rng):
    """Encoded output at each packed position == the same example's
    output at the same within-segment position in the unpacked layout."""
    cfg = _cfg()
    model = build_model(cfg)
    ds = make_dataset(rng)
    batch = _unpacked_batch(ds)

    seq, target_ids, _ = seq_features_from_batch(
        batch, cfg.model.gr_output_length + 1
    )
    past_ids = scatter_at_lengths(seq.past_ids, seq.past_lengths, target_ids)
    seq = seq._replace(past_ids=past_ids)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq, method=model.init_all,
    )
    unpacked, _ = model.apply(params, seq, deterministic=True)
    unpacked = np.asarray(unpacked)

    loader = PackedBatchLoader(ds, rows_per_batch=4, row_capacity=64)
    for pbatch in loader:
        pseq = packed_seq_features(pbatch)
        packed, _ = model.apply(params, pseq, deterministic=True)
        packed = np.asarray(packed)
        for r in range(pbatch["ids"].shape[0]):
            seg = pbatch["seg_ids"][r]
            for s in range(int(pbatch["num_segments"][r])):
                tok = np.where(seg == s)[0]
                # identify the example by its token ids
                ids_seg = pbatch["ids"][r][tok]
                e = next(
                    i for i in range(len(ds))
                    if np.array_equal(
                        np.asarray(past_ids)[i, : len(tok)], ids_seg
                    )
                    and ds.lengths[i] + 1 == len(tok)
                )
                # compare history rows only: the segment's LAST token (the
                # target) legitimately differs — its "next-item" timestamp
                # is the following segment's first ts in the packed layout
                # vs padding in the unpacked one. That row is provably
                # unused: zero supervision weight, and no later
                # same-segment query attends to it as a key.
                np.testing.assert_allclose(
                    packed[r, tok[:-1], :],
                    unpacked[e, : len(tok) - 1, :],
                    rtol=2e-4, atol=2e-5,
                )


def test_packed_fused_kernel_matches_packed_reference(rng):
    """Fused Pallas kernel with seg_ids vs the jnp packed reference —
    fwd and grads, interpret mode (the fbgemm-vs-fallback analog)."""
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.hstu_attention import (
        hstu_attention_reference,
        relative_position_bias,
        relative_time_bias,
    )
    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    b, n, h, dqk, dv = 2, 150, 2, 16, 16
    q = jnp.asarray(rng.normal(size=(b, n, h, dqk)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h, dqk)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h, dv)), dtype=jnp.float32)
    ts = jnp.asarray(
        np.sort(rng.integers(1000, 10**6, size=(b, n)), axis=1), dtype=jnp.int32
    )
    pos_w = jnp.asarray(rng.normal(size=(2 * n - 1,)) * 0.02, dtype=jnp.float32)
    ts_w = jnp.asarray(rng.normal(size=(129,)) * 0.02, dtype=jnp.float32)
    # 3 segments in row 0, 2 in row 1, plus padding tail
    seg = np.full((b, n), -1, dtype=np.int32)
    pos = np.zeros((b, n), dtype=np.int32)
    bounds = {0: [(0, 50), (50, 90), (90, 130)], 1: [(0, 80), (80, 140)]}
    for r, spans in bounds.items():
        for s, (lo, hi) in enumerate(spans):
            seg[r, lo:hi] = s
            pos[r, lo:hi] = np.arange(hi - lo)
    lengths = jnp.asarray([130, 140], dtype=jnp.int32)
    seg, pos = jnp.asarray(seg), jnp.asarray(pos)

    def ref(q, k, v, pos_w, ts_w):
        bias = relative_position_bias(pos_w, n)[None, :, :]
        bias = bias + relative_time_bias(ts_w, ts, 128)
        out = hstu_attention_reference(
            q, k, v, bias, max_len=n, causal=True, seg_ids=seg
        )
        # zero rows beyond lengths like the kernel's jagged skipping
        valid = (jnp.arange(n)[None, :] < lengths[:, None]).astype(out.dtype)
        return out * valid[:, :, None, None]

    def fused(q, k, v, pos_w, ts_w):
        return hstu_attention_fused(
            q, k, v, ts, pos_w, ts_w, n, 128, lengths=lengths,
            seg_positions=pos,
        )

    expected = np.asarray(ref(q, k, v, pos_w, ts_w))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused(q, k, v, pos_w, ts_w))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)

    def loss_of(fn):
        def f(q, k, v, pos_w, ts_w):
            out = fn(q, k, v, pos_w, ts_w)
            w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
            return (out * w).sum() * 1e-3
        return f

    g_ref = jax.grad(loss_of(ref), argnums=(0, 1, 2, 3, 4))(q, k, v, pos_w, ts_w)
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_of(fused), argnums=(0, 1, 2, 3, 4))(
            q, k, v, pos_w, ts_w
        )
    for gr, gf in zip(g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=5e-3, atol=5e-4
        )


def test_packed_loss_and_grads_match_unpacked(rng):
    """Same examples, same rng, shared negatives: the packed loss is the
    same function of params as the unpacked loss."""
    cfg = _cfg()
    model = build_model(cfg)
    ds = make_dataset(rng)
    batch = _unpacked_batch(ds)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq, method=model.init_all,
    )
    all_ids = np.arange(1, NUM_ITEMS + 1, dtype=np.int32)
    loss_unpacked = make_loss_fn(model, cfg, all_ids, packed=False)
    loss_packed = make_loss_fn(model, cfg, all_ids, packed=True)
    loader = PackedBatchLoader(ds, rows_per_batch=10, row_capacity=64)
    pbatch = next(iter(loader))
    assert int(pbatch["num_segments"].sum()) == len(ds)  # all fit in one batch

    key = jax.random.PRNGKey(11)
    lu, gu = jax.value_and_grad(loss_unpacked)(params, batch, key)
    lp, gp = jax.value_and_grad(loss_packed)(params, pbatch, key)
    assert float(lu) == pytest.approx(float(lp), rel=1e-5)
    flat_u, _ = jax.tree_util.tree_flatten(gu)
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    for a, b2 in zip(flat_u, flat_p):
        np.testing.assert_allclose(
            np.asarray(b2), np.asarray(a), rtol=5e-4, atol=1e-5
        )


def test_trainer_packed_fast_dev_run(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.pack_sequences = True
    cfg.data.pack_eval = "true"  # short-N smoke: keep packed eval in-fit
    cfg.model.loss.shared_negatives = True
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@10" in results
        assert np.isfinite(list(results.values())).all()
    finally:
        trainer.close()


def test_trainer_packed_multistep(tmp_path):
    """Packed batches all share one shape, so the k-step scan stacks
    every batch (no bucket flushes)."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.pack_sequences = True
    cfg.data.pack_eval = "true"
    cfg.trainer.steps_per_call = 2
    cfg.trainer.max_epochs = 1
    cfg.trainer.min_epochs = 1
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_packed_lazy_update_matches_dense(rng):
    """Packed + embedding.lazy_update: the lazy step's loss equals the
    packed dense-table shared-negatives loss (same rng), and untouched
    table rows stay frozen — the amzn-books configuration."""
    import jax.numpy as jnp

    from mygenerativerecommenders_tpu.train.lazy_embedding import (
        init_lazy_opt_state,
        make_lazy_train_step,
        split_table,
    )

    cfg = _cfg()
    cfg.model.embedding.lazy_update = True
    cfg.model.loss.num_to_sample = 16
    model = build_model(cfg)
    ds = make_dataset(rng)
    loader = PackedBatchLoader(ds, rows_per_batch=10, row_capacity=64)
    pbatch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        packed_seq_features(next(iter(loader))), method=model.init_all,
    )
    all_ids = np.arange(1, NUM_ITEMS + 1, dtype=np.int32)
    key = jax.random.PRNGKey(4)

    dense_loss = make_loss_fn(model, cfg, all_ids, packed=True)
    want = float(dense_loss(params, pbatch, jax.random.fold_in(key, 0)))

    lazy_step = make_lazy_train_step(model, cfg, all_ids, packed=True)
    table_before = np.asarray(split_table(params)[0]).copy()
    out = lazy_step(
        params, init_lazy_opt_state(cfg, params), pbatch, key,
        jnp.float32(1e-3), jnp.float32(0.0),
    )
    assert float(out.loss) == pytest.approx(want, rel=1e-6)
    table_after = np.asarray(split_table(out.params)[0])
    touched_ids = np.unique(np.asarray(pbatch["ids"]))
    untouched = np.setdiff1d(np.arange(table_before.shape[0]), touched_ids)
    # negatives also touch rows; check a conservative subset instead:
    # rows whose values moved must be a superset of the batch ids
    moved = np.where(np.any(table_after != table_before, axis=1))[0]
    assert set(touched_ids[touched_ids > 0]).issubset(set(moved))
    assert len(moved) <= len(touched_ids) + cfg.model.loss.num_to_sample


def test_trainer_packed_with_sharded_a2a(tmp_path):
    """The production combination: packed batches + the owner-routed
    sharded table, trained end-to-end on the (data, model) CPU mesh."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.pack_sequences = True
    cfg.model.embedding.kind = "sharded_a2a"
    cfg.model.embedding.num_shards = 2
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["model"] == 2
        results = trainer.fit()
        assert "ndcg@10" in results
        assert np.isfinite(list(results.values())).all()
    finally:
        trainer.close()


def test_trainer_packed_with_muon(tmp_path):
    """Packed batches through the 2-optimizer (AdamW + Muon) split."""
    from mygenerativerecommenders_tpu.configs import OptimizerConfig, SchedulerConfig
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.pack_sequences = True
    cfg.optimizer2 = OptimizerConfig(kind="muon", lr=5e-3, momentum=0.95)
    cfg.scheduler2 = SchedulerConfig(kind="plateau")
    cfg.trainer.fast_dev_run = True
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@10" in results
    finally:
        trainer.close()


def test_packed_loader_multihost_partition(rng):
    """Two processes (pi=0/1, pc=2) see disjoint rows of the SAME global
    packing: equal batch counts and shapes, and the union of emitted
    segments is exactly the dataset (the bucketed-loader global-partition
    property, required so collectives never desync across hosts)."""
    ds = make_dataset(rng, users=48)
    loaders = [
        PackedBatchLoader(
            ds, rows_per_batch=3, row_capacity=64, shuffle=True, seed=5,
            process_index=pi, process_count=2,
        )
        for pi in (0, 1)
    ]
    batches = [list(ld) for ld in loaders]
    assert len(batches[0]) == len(batches[1])
    seen = []
    for per_proc in batches:
        for batch in per_proc:
            assert batch["ids"].shape == (3, 64)
            for r in range(3):
                seg = batch["seg_ids"][r]
                for s in range(int(batch["num_segments"][r])):
                    tok = np.where(seg == s)[0]
                    seen.append(tuple(batch["ids"][r][tok]))
    expected = [
        tuple(ds.ids[e, : ds.lengths[e]]) + (ds.target_id[e],)
        for e in range(len(ds))
    ]
    assert sorted(seen) == sorted(expected)


def test_packed_eval_matches_unpacked(rng):
    """PACKED eval (history-only segments, per-segment query + filter)
    produces the same per-example top-k as the unpacked eval step."""
    from mygenerativerecommenders_tpu.train.task_retrieval import (
        make_candidate_fn,
        make_eval_step,
        make_packed_eval_step,
    )

    cfg = _cfg()
    ds = make_dataset(rng, users=24)
    model = build_model(cfg)
    all_ids = np.arange(1, NUM_ITEMS + 1, dtype=np.int32)
    batch = _unpacked_batch(ds)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = jax.jit(
        lambda r, s: model.init(
            {"params": r, "dropout": r}, s, method=model.init_all
        )
    )(jax.random.PRNGKey(0), seq)
    candidates = make_candidate_fn(model, cfg, all_ids)(params)

    eval_step = make_eval_step(model, cfg, all_ids, NUM_ITEMS)
    ids_u, scores_u = eval_step(params, batch, candidates)

    loader = PackedBatchLoader(
        ds, rows_per_batch=4, row_capacity=64, include_target=False
    )
    pstep = make_packed_eval_step(model, cfg, all_ids, NUM_ITEMS)
    got = {}  # target-slot -> (ids row, scores row), keyed by example order
    order = 0
    for pb in loader:
        ids_p, scores_p, tgt, w = pstep(params, pb, candidates)
        ids_p, scores_p = np.asarray(ids_p), np.asarray(scores_p)
        w = np.asarray(w)
        for s_i in range(len(w)):
            if w[s_i] > 0:
                got[order] = (ids_p[s_i], scores_p[s_i], int(np.asarray(tgt)[s_i]))
                order += 1
    assert order == len(ds)
    # packed plan (no shuffle, single capacity) visits examples in
    # dataset order grouped by packing row — recover example identity by
    # matching targets + exact score rows
    ids_u, scores_u = np.asarray(ids_u), np.asarray(scores_u)
    matched = set()
    for s_i, (pi, psc, ptgt) in got.items():
        found = None
        for ex in range(len(ds)):
            if ex in matched:
                continue
            if np.array_equal(ids_u[ex], pi) and np.allclose(
                scores_u[ex], psc, rtol=1e-5, atol=1e-6
            ):
                found = ex
                break
        assert found is not None, f"segment {s_i} has no matching example"
        matched.add(found)
        assert int(ds.target_id[found]) == ptgt
    assert len(matched) == len(ds)


def test_ranking_packed_trains_in_band(tmp_path):
    """Ranking + packing (rated preprocessor): converges to the same
    AUROC band as the unpacked ranking guard (test_train_e2e)."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-rank")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.synthetic_num_users = 192
    cfg.data.batch_size = 32
    cfg.data.max_sequence_length = 24
    cfg.data.expected_num_unique_items = 150
    cfg.data.expected_max_item_id = 160
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.num_blocks = 2
    cfg.data.pack_sequences = True  # combined preprocessor, packed
    cfg.trainer.max_epochs = 12
    cfg.trainer.min_epochs = 12
    cfg.trainer.check_val_every_n_epoch = 12
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
    finally:
        trainer.close()
    assert results["auroc"] > 0.62, results


def test_packed_predict_preserves_dataset_order(tmp_path):
    """predict() with packing returns rows in DATASET order (cli/predict
    joins by position), matching the unpacked predict exactly."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    def run(packed):
        cfg = get_preset("synthetic-smoke")
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.trainer.output_dir = str(tmp_path / f"out{packed}")
        cfg.data.pack_sequences = packed
        cfg.data.pack_eval = "true"  # exercise the PACKED predict path
        trainer = Trainer(cfg)
        try:
            return trainer.predict()
        finally:
            trainer.close()

    base = run(False)
    packed = run(True)
    assert len(base["top_k_ids"]) == len(packed["top_k_ids"])
    agree = sum(
        a == b for a, b in zip(base["top_k_ids"], packed["top_k_ids"])
    )
    # float-layout noise may flip near-tied neighbors in rare rows; the
    # ORDER (example identity) must hold for every row
    assert agree >= len(base["top_k_ids"]) - 1, (agree, len(base["top_k_ids"]))
    for a, b in zip(base["top_k_scores"], packed["top_k_scores"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
