"""Native C++ CSV parser vs the Python parser (the framework's analog of
the reference's fbgemm-vs-fallback parity tests)."""

import numpy as np
import pandas as pd
import pytest

from mygenerativerecommenders_tpu import native
from mygenerativerecommenders_tpu.data.dataset import SequenceDataset


@pytest.fixture(scope="module")
def seq_csv(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nativecsv")
    path = tmp / "sasrec_format.csv"
    rows = []
    rng = np.random.default_rng(3)
    for u in range(1, 21):
        n = int(rng.integers(3, 30))
        ids = rng.integers(1, 500, size=n).tolist()
        ratings = rng.integers(1, 6, size=n).tolist()
        ts = np.sort(rng.integers(10**6, 10**9, size=n)).tolist()
        rows.append(
            {
                "user_id": u,
                "sequence_item_ids": str(ids),
                "sequence_ratings": str(ratings),
                "sequence_timestamps": str(ts),
                "sex": int(rng.integers(0, 2)),
            }
        )
    pd.DataFrame(rows).to_csv(path, index=False)
    return str(path)


@pytest.mark.parametrize("ignore_last_n,chronological", [(0, True), (1, True), (0, False)])
def test_native_matches_python(seq_csv, ignore_last_n, chronological):
    if native.load() is None:
        pytest.skip("no C++ toolchain available")
    py = SequenceDataset.from_csv(
        pd.read_csv(seq_csv), 16, ignore_last_n, chronological=chronological
    )
    nat = SequenceDataset.from_csv(
        seq_csv, 16, ignore_last_n, chronological=chronological
    )
    for field in (
        "lengths", "ids", "ratings", "timestamps",
        "target_id", "target_rating", "target_timestamp", "user_ids",
    ):
        np.testing.assert_array_equal(
            getattr(nat, field), getattr(py, field), err_msg=field
        )


def test_native_additional_columns(seq_csv):
    if native.load() is None:
        pytest.skip("no C++ toolchain available")
    ds = SequenceDataset.from_csv(seq_csv, 16, 0, additional_columns=["sex"])
    assert "sex" in ds.additional and len(ds.additional["sex"]) == len(ds)
