"""ETL tests: Amazon CSV processing + split semantics + catalog wiring."""

import numpy as np
import pandas as pd
import pytest

from mygenerativerecommenders_tpu.data.preprocessor import (
    AmazonDataProcessor,
    SyntheticDataProcessor,
)


def test_amazon_etl(tmp_path):
    raw = tmp_path / "ratings_Books.csv"
    rows = []
    rng = np.random.default_rng(0)
    users = [f"U{i}" for i in range(8)]
    items = [f"ASIN{i}" for i in range(30)]
    for u in users:
        for t in range(5):
            rows.append([u, items[rng.integers(0, 30)], float(rng.integers(1, 6)),
                         1_400_000_000 + int(rng.integers(0, 10**6))])
    pd.DataFrame(rows).to_csv(raw, index=False, header=False)

    proc = AmazonDataProcessor(
        prefix="amzn-test", data_dir=str(tmp_path), saved_name=str(raw),
        min_count=1,  # tiny fixture: items mostly appear < 5 times
    )
    n = proc.preprocess_rating()
    assert n == 8
    seqs = pd.read_csv(proc.output_format_csv())
    assert set(seqs.columns) >= {
        "user_id", "sequence_item_ids", "sequence_ratings", "sequence_timestamps"
    }
    # ids are 1-based integer codes
    first = eval(seqs["sequence_item_ids"].iloc[0])
    assert min(first) >= 1
    # timestamps sorted within each user
    ts = eval(seqs["sequence_timestamps"].iloc[0])
    assert ts == sorted(ts)
    # item table covers the coded id space
    items_csv = pd.read_csv(proc.processed_item_csv())
    assert items_csv["movie_id"].min() == 1


def test_synthetic_split_threshold(tmp_path):
    proc = SyntheticDataProcessor(
        prefix="syn-test", data_dir=str(tmp_path),
        num_users=20, num_items=50, max_item_id=60, seed=1,
    )
    proc.preprocess_rating()
    train = pd.read_csv(proc.train_split_csv())
    test = pd.read_csv(proc.test_split_csv())
    # user-id-threshold split (preprocessor.py:256-270): disjoint, ordered
    assert train["user_id"].max() < test["user_id"].min()
    assert len(train) + len(test) == 20
    assert len(train) == 18  # 90%


def test_synthetic_max_seq_len_wiring(tmp_path):
    """data.synthetic_max_seq_len reaches the generator (long-N studies)."""
    from mygenerativerecommenders_tpu.configs import DataConfig
    from mygenerativerecommenders_tpu.data.dataset import RecoData

    cfg = DataConfig(
        dataset_name="synthetic-longtest",
        data_dir=str(tmp_path),
        synthetic_num_users=16,
        expected_num_unique_items=50,
        expected_max_item_id=60,
        synthetic_max_seq_len=500,
        max_sequence_length=512,
    )
    data = RecoData(cfg, seed=0)
    seqs = pd.read_csv(data.processor.output_format_csv())
    lens = seqs["sequence_item_ids"].map(lambda s: len(eval(s)))
    assert lens.max() > 200  # beyond the old fixed cap
    assert lens.max() <= 500


def test_ml20mx16x32_npz_etl(tmp_path):
    """npz-shard ETL (reference preprocessor.py:164-184): placeholder
    rating/timestamp columns, sequence CSV consumable by SequenceDataset."""
    from mygenerativerecommenders_tpu.data.dataset import SequenceDataset
    from mygenerativerecommenders_tpu.data.preprocessor import (
        MovielensNpzDataProcessor,
        build_processor,
    )

    raw = tmp_path / "raw" / "ml-20mx16x32"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    num_shards = 4
    for i in range(num_shards):
        pairs = np.stack(
            [
                rng.integers(1, 12, size=40),  # user ids
                rng.integers(1, 90, size=40),  # movie ids
            ],
            axis=1,
        )
        np.savez(raw / f"trainx16x32_{i}.npz", pairs)

    proc = build_processor("ml-20mx16x32", str(tmp_path), num_shards=num_shards)
    assert isinstance(proc, MovielensNpzDataProcessor)
    n_users = proc.preprocess_rating()
    assert n_users == pd.read_csv(proc.output_format_csv())["user_id"].nunique()

    seqs = pd.read_csv(proc.output_format_csv())
    row = seqs.iloc[0]
    ids = eval(row["sequence_item_ids"])
    # placeholder semantics: rating == user_id, timestamp == movie_id
    assert eval(row["sequence_ratings"]) == [row["user_id"]] * len(ids)
    assert eval(row["sequence_timestamps"]) == ids

    ds = SequenceDataset.from_csv(
        proc.output_format_csv(), max_sequence_length=10, ignore_last_n=1
    )
    assert len(ds) == n_users
    assert ds.lengths.max() <= 10


def test_amazon_min_count_filter(tmp_path):
    """>= 5 interactions filter for users AND items (reference
    preprocessor.py:309-339)."""
    raw = tmp_path / "ratings_Filter.csv"
    rows = []
    # 5 "heavy" users x 6 interactions over 5 popular items (each item
    # appears >= 6 times), plus one light user and one rare item that
    # must be dropped
    popular = [f"P{i}" for i in range(5)]
    for u in range(5):
        for t in range(6):
            rows.append([f"H{u}", popular[t % 5], 5.0, 1_400_000_000 + t])
    rows.append(["LIGHT", popular[0], 3.0, 1_400_000_999])
    rows.append(["H0", "RARE", 3.0, 1_400_001_000])
    import pandas as pd

    pd.DataFrame(rows).to_csv(raw, index=False, header=False)
    proc = AmazonDataProcessor(
        prefix="amzn-filter", data_dir=str(tmp_path), saved_name=str(raw)
    )
    n = proc.preprocess_rating()
    assert n == 5  # LIGHT user dropped
    seqs = pd.read_csv(proc.output_format_csv())
    all_ids = set()
    for s in seqs["sequence_item_ids"]:
        all_ids.update(eval(s))
    items_csv = pd.read_csv(proc.processed_item_csv())
    assert len(items_csv) == 5  # RARE item dropped from the catalog
    assert all_ids <= set(items_csv["movie_id"])


def test_amazon_missing_file_error(tmp_path):
    proc = AmazonDataProcessor(
        prefix="amzn-none", data_dir=str(tmp_path),
        saved_name=str(tmp_path / "nope.csv"),
    )
    with pytest.raises(FileNotFoundError):
        proc.preprocess_rating()
