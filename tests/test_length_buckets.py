"""Length-bucketed batching (DataConfig.length_buckets): the TPU-shape
analog of the reference's jagged no-padding-waste property
(hstu.py:439-480) — short sequences ride in narrow batches instead of
jagged tensors, one compiled program per bucket."""

import copy

import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.data.dataset import BatchLoader, SequenceDataset


def _toy_dataset(n=50, max_len=64, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, max_len + 1, size=n).astype(np.int32)
    ids = np.zeros((n, max_len), dtype=np.int32)
    for i, l in enumerate(lengths):
        ids[i, :l] = rng.integers(1, 100, size=l)
    return SequenceDataset(
        lengths=lengths,
        ids=ids,
        ratings=np.ones_like(ids),
        timestamps=np.cumsum(np.ones_like(ids), axis=1).astype(np.int32) * (ids != 0),
        target_id=rng.integers(1, 100, size=n).astype(np.int32),
        target_rating=np.ones(n, dtype=np.int32),
        target_timestamp=np.full(n, 999, dtype=np.int32),
        user_ids=np.arange(n),
        additional={},
    )


def test_bucketed_loader_covers_every_example_once():
    ds = _toy_dataset()
    loader = BatchLoader(ds, batch_size=8, shuffle=True, buckets=[16, 32, 64])
    seen = []
    for batch in loader:
        cap = batch["ids"].shape[1]
        assert cap in (16, 32, 64)
        valid = batch["sample_weight"] > 0
        assert np.all(batch["lengths"][valid] <= cap)
        # ids beyond each row's length are zero padding, none truncated
        seen.extend(batch["target_id"][valid].tolist())
        # user rows were gathered by index; re-derive which rows they are
    assert len(seen) == len(ds)


def test_bucketed_loader_len_matches_iteration():
    ds = _toy_dataset()
    for bs in (4, 8, 16):
        loader = BatchLoader(ds, batch_size=bs, shuffle=True, buckets=[16, 32, 64])
        n_iter = sum(1 for _ in loader)
        assert n_iter == len(loader)


def test_bucketed_loader_rejects_small_max_bucket():
    ds = _toy_dataset(max_len=64)
    with pytest.raises(ValueError):
        BatchLoader(ds, batch_size=8, buckets=[16, 32])


def test_bucketed_loader_multihost_shapes_sync():
    """Two processes must see the same number of batches with the same
    sequence capacity at every step (anything else deadlocks collectives),
    and together cover every example exactly once."""
    ds = _toy_dataset(n=37)
    loaders = [
        BatchLoader(
            ds, batch_size=4, shuffle=True, seed=7, buckets=[16, 32, 64],
            process_index=p, process_count=2,
        )
        for p in range(2)
    ]
    seqs = [list(l) for l in loaders]
    assert len(seqs[0]) == len(seqs[1]) == len(loaders[0])
    seen = []
    for b0, b1 in zip(*seqs):
        assert b0["ids"].shape == b1["ids"].shape
        assert b0["ids"].shape[0] == 4  # per-process batch size
        for b in (b0, b1):
            valid = b["sample_weight"] > 0
            seen.extend(np.asarray(b["user_ids"]).tolist() if "user_ids" in b else [])
        # coverage tracked via target ids below
    ids0 = np.concatenate([b["target_id"][b["sample_weight"] > 0] for b in seqs[0]])
    ids1 = np.concatenate([b["target_id"][b["sample_weight"] > 0] for b in seqs[1]])
    assert len(ids0) + len(ids1) == len(ds)


def test_model_forward_matches_across_bucket_widths(tmp_path):
    """The encoder must produce the same outputs for a sequence whether it
    rides in a full-width batch or a truncated bucket batch (the 1/N
    normalizer and pos-table center stay at the static max length)."""
    import jax

    from mygenerativerecommenders_tpu.train.driver import Trainer
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    trainer = Trainer(cfg)
    try:
        batch = next(iter(trainer.data.loader("val")))
        cap = 16
        batch["lengths"] = np.minimum(batch["lengths"], cap)
        narrow = dict(batch)
        for key in ("ids", "ratings", "timestamps"):
            batch[key] = batch[key].copy()
            batch[key][:, cap:] = 0  # truncate semantics: drop the tail
            narrow[key] = batch[key][:, :cap]
        max_out = cfg.model.gr_output_length + 1
        model, params = trainer.model, trainer.params

        def encode(b):
            seq, _, _ = seq_features_from_batch(
                {k: jax.numpy.asarray(v) for k, v in b.items()}, max_out
            )
            emb = model.apply(params, seq.past_ids, method=model.item_embeddings)
            seq = seq._replace(past_embeddings=emb)
            encoded, lengths = model.apply(params, seq, deterministic=True)
            return np.asarray(encoded), np.asarray(lengths)

        full_out, full_lens = encode(batch)
        narrow_out, narrow_lens = encode(narrow)
        np.testing.assert_array_equal(full_lens, narrow_lens)
        width = cap + max_out
        np.testing.assert_allclose(
            narrow_out, full_out[:, :width], rtol=2e-5, atol=2e-6
        )
    finally:
        trainer.close()


def test_train_e2e_with_length_buckets(tmp_path):
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    cfg.data.length_buckets = (8, 16, 32)
    cfg.trainer.max_epochs = 2
    cfg.trainer.min_epochs = 1
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        assert "ndcg@10" in results
        assert np.isfinite(list(results.values())).all()
    finally:
        trainer.close()


def test_eval_bucketed_matches_padded(tmp_path):
    """The EVAL loop under length bucketing must reproduce the padded
    eval's metrics exactly: buckets only change batch SHAPES (each
    sequence keeps all its valid tokens — bucket capacity >= length by
    construction), so per-row top-k ids are identical and the metric
    aggregation sees the same rows (VERDICT r2 item 3: eval-path
    bucketing)."""
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    trainer = Trainer(cfg)
    try:
        padded = trainer.eval_epoch(trainer.data.loader("val"), "val")
        bucketed = trainer.eval_epoch(
            trainer.data.loader(
                "val", batch_size=cfg.data.eval_batch_size or cfg.data.batch_size
            ).__class__(
                trainer.data.dataset("val"),
                batch_size=cfg.data.batch_size,
                buckets=[8, 16, 32],
            ),
            "val",
        )
        assert set(padded) == set(bucketed)
        for key in padded:
            np.testing.assert_allclose(
                bucketed[key], padded[key], rtol=1e-6,
                err_msg=f"metric {key} differs under bucketed eval",
            )
    finally:
        trainer.close()
