"""Grid-sweep CLI (cli/sweep.py): the reference's hparams_search slot."""

import csv
import os

import pytest

from mygenerativerecommenders_tpu.cli import sweep


def test_split_sweep_args():
    grid, fixed = sweep.split_sweep_args(
        ["experiment=synthetic-smoke", "sweep.optimizer1.lr=1e-3,5e-4",
         "trainer.max_epochs=1", "sweep.model.encoder.num_blocks=1,2"]
    )
    assert grid == {
        "optimizer1.lr": ["1e-3", "5e-4"],
        "model.encoder.num_blocks": ["1", "2"],
    }
    assert fixed == ["experiment=synthetic-smoke", "trainer.max_epochs=1"]
    with pytest.raises(ValueError, match="sweep axis"):
        sweep.split_sweep_args(["sweep.optimizer1.lr"])
    with pytest.raises(ValueError, match="no sweep axes"):
        sweep.split_sweep_args(["experiment=synthetic-smoke"])


def test_sweep_end_to_end(tmp_path):
    best = sweep.main([
        "experiment=synthetic-smoke",
        "sweep.optimizer1.lr=1e-3,1e-4",
        "trainer.fast_dev_run=true",
        f"data.data_dir={tmp_path / 'data'}",
        f"trainer.output_dir={tmp_path / 'out'}",
    ])
    assert best["optimizer1.lr"] in ("1e-3", "1e-4")
    csv_path = tmp_path / "out" / "sweep_results.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert {r["optimizer1.lr"] for r in rows} == {"1e-3", "1e-4"}
    # each run trained in its own directory
    assert os.path.isdir(tmp_path / "out" / "sweep_0" / "synthetic-smoke")
