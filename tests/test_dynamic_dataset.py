"""Schema-agnostic dataset front-end tests (miaoxin_recodata parity)."""

import numpy as np
import pandas as pd

from mygenerativerecommenders_tpu.data.dynamic_dataset import (
    DynamicSequenceDataset,
    FeatureLookupTable,
)


def make_frame():
    return pd.DataFrame(
        {
            "uid": [101, 202],
            "sequence_item_ids": ["[3, 5, 7, 9]", "[2, 4]"],
            "sequence_timestamps": ["[10, 20, 30, 40]", "[5, 15]"],
            "sequence_clicks": ["[1, 0, 1, 1]", "[0, 1]"],
        }
    )


def test_dynamic_dataset_autodetect():
    ds = DynamicSequenceDataset.from_csv(make_frame(), max_sequence_length=8)
    assert ds.item_column == "item_ids"
    # target = last item of the sequence itself (miaoxin features.py v2)
    np.testing.assert_array_equal(ds.targets["item_ids"], [9, 4])
    np.testing.assert_array_equal(ds.lengths, [3, 1])
    np.testing.assert_array_equal(ds.sequences["item_ids"][0, :3], [3, 5, 7])
    np.testing.assert_array_equal(ds.sequences["clicks"][0, :3], [1, 0, 1])
    np.testing.assert_array_equal(ds.user_ids, [101, 202])


def test_dynamic_dataset_batches():
    ds = DynamicSequenceDataset.from_csv(make_frame(), max_sequence_length=8)
    batches = list(ds.batches(batch_size=2))
    assert len(batches) == 1
    b = batches[0]
    assert set(b) >= {
        "lengths", "ids", "timestamps", "ratings",
        "target_id", "target_timestamp", "target_rating", "sample_weight",
    }
    np.testing.assert_array_equal(b["target_id"], [9, 4])
    np.testing.assert_array_equal(b["timestamps"][0, :3], [10, 20, 30])
    np.testing.assert_array_equal(b["target_timestamp"], [40, 15])


def test_feature_lookup_table():
    frame = pd.DataFrame(
        {
            "movie_id": [1, 3],
            "year": [1990, 2001],
            "genre_ids": ["[2, 5]", "[7]"],
        }
    )
    t = FeatureLookupTable(frame)
    assert t.id_column == "movie_id"
    np.testing.assert_array_equal(t.lookup("year", np.array([3, 1, 2])), [2001, 1990, 0])
    np.testing.assert_array_equal(t.lookup("genre_ids", np.array([1]))[0], [2, 5])
