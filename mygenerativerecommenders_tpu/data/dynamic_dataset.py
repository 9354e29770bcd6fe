"""Schema-agnostic sequence dataset front-end.

TPU-native port of the reference's side package `src/miaoxin_recodata/`
(SURVEY §2.2): competition-style CSVs with arbitrary column names are
consumed without per-dataset code —

- `FeatureLookupTable` (miaoxin reco_dataset.py:15-65): a feature CSV
  with an auto-detected id column becomes id -> feature arrays.
- `DynamicSequenceDataset` (miaoxin reco_dataset.py:68-226): auto-detects
  the user-id column and every `sequence_*` column, parses each into a
  dense [U, L] array (per-column dtype inference), right-pads, applies
  shift_id_by, and — like the miaoxin `seq_features_from_row` v2
  (features.py:18-155) — extracts the target as the LAST element of the
  item sequence itself rather than from explicit target columns.

The produced batches use the same keys as data/dataset.py's loader, so
the training stack is unchanged; extra sequence columns ride along as
payloads.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd


def _parse_num_list(s: str) -> np.ndarray:
    return np.fromstring(str(s).strip()[1:-1], dtype=np.float64, sep=",")


def _detect_user_col(frame: pd.DataFrame) -> str:
    for col in frame.columns:
        if "user" in col.lower() and "sequence" not in col.lower():
            return col
    return frame.columns[0]


class FeatureLookupTable:
    """Feature CSV -> per-feature numpy lookup keyed by the id column."""

    def __init__(self, csv_path: str | pd.DataFrame, id_column: Optional[str] = None):
        frame = (
            csv_path if isinstance(csv_path, pd.DataFrame) else pd.read_csv(csv_path)
        )
        if id_column is None:
            candidates = [
                c for c in frame.columns if c.lower().endswith("_id") or c.lower() == "id"
            ]
            id_column = candidates[0] if candidates else frame.columns[0]
        self.id_column = id_column
        ids = frame[id_column].to_numpy().astype(np.int64)
        self.max_id = int(ids.max())
        self.tables: Dict[str, np.ndarray] = {}
        for col in frame.columns:
            if col == id_column:
                continue
            values = frame[col]
            is_list_col = not pd.api.types.is_numeric_dtype(values) and str(
                values.iloc[0]
            ).strip().startswith("[")
            if is_list_col:
                parsed = [_parse_num_list(v) for v in values]
                width = max(len(p) for p in parsed)
                table = np.zeros((self.max_id + 1, width), dtype=np.int64)
                for i, p in zip(ids, parsed):
                    table[i, : len(p)] = p
            else:
                table = np.zeros(self.max_id + 1, dtype=np.int64)
                table[ids] = pd.to_numeric(values, errors="coerce").fillna(0).to_numpy()
            self.tables[col] = table

    def lookup(self, feature: str, item_ids: np.ndarray) -> np.ndarray:
        table = self.tables[feature]
        return table[np.clip(item_ids, 0, self.max_id)]


@dataclass
class DynamicSequenceDataset:
    """Dense arrays for an arbitrary-schema sequence CSV."""

    lengths: np.ndarray  # [U]
    sequences: Dict[str, np.ndarray]  # name (sans sequence_ prefix) -> [U, L]
    targets: Dict[str, np.ndarray]  # name -> [U]
    user_ids: np.ndarray
    item_column: str = "item_ids"

    def __len__(self) -> int:
        return len(self.lengths)

    @staticmethod
    def from_csv(
        csv_path: str | pd.DataFrame,
        max_sequence_length: int,
        ignore_last_n: int = 0,
        shift_id_by: int = 0,
        item_column: Optional[str] = None,
    ) -> "DynamicSequenceDataset":
        frame = (
            csv_path if isinstance(csv_path, pd.DataFrame) else pd.read_csv(csv_path)
        )
        user_col = _detect_user_col(frame)
        seq_cols = [c for c in frame.columns if c.lower().startswith("sequence_")]
        if not seq_cols:
            raise ValueError("No sequence_* columns found")
        names = [c[len("sequence_"):] for c in seq_cols]
        if item_column is None:
            item_column = next(
                (n for n in names if "item" in n.lower()), names[0]
            )

        u, L = len(frame), max_sequence_length
        lengths = np.zeros(u, dtype=np.int32)
        sequences = {n: np.zeros((u, L), dtype=np.int64) for n in names}
        targets = {n: np.zeros(u, dtype=np.int64) for n in names}

        parsed_cols = {
            n: frame[c].to_numpy() for n, c in zip(names, seq_cols)
        }
        for i in range(u):
            row = {n: _parse_num_list(parsed_cols[n][i]) for n in names}
            n_items = len(row[item_column]) - ignore_last_n
            if n_items < 1:
                continue
            for name in names:
                vals = row[name][:n_items].astype(np.int64)
                if name == item_column and shift_id_by:
                    vals = vals + shift_id_by
                targets[name][i] = vals[-1]
                hist = vals[:-1][-L:]
                sequences[name][i, : len(hist)] = hist
            lengths[i] = min(n_items - 1, L)

        return DynamicSequenceDataset(
            lengths=lengths,
            sequences=sequences,
            targets=targets,
            user_ids=frame[user_col].to_numpy(),
            item_column=item_column,
        )

    def batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yields batches in the training stack's canonical schema."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        num_batches = (n + batch_size - 1) // batch_size
        item = self.item_column
        ts_name = next(
            (k for k in self.sequences if "time" in k.lower()), None
        )
        rating_name = next(
            (k for k in self.sequences if "rating" in k.lower()), None
        )
        for bi in range(num_batches):
            idx = order[bi * batch_size : (bi + 1) * batch_size]
            pad = batch_size - len(idx)
            weight = np.ones(batch_size, dtype=np.float32)
            if pad:
                idx = np.concatenate([idx, np.zeros(pad, dtype=idx.dtype)])
                weight[batch_size - pad :] = 0.0
            batch = {
                "lengths": np.maximum(self.lengths[idx], 1),
                "ids": self.sequences[item][idx].astype(np.int32),
                "target_id": self.targets[item][idx].astype(np.int32),
                "sample_weight": weight,
            }
            ts = (
                self.sequences[ts_name][idx]
                if ts_name
                else np.cumsum(np.ones_like(batch["ids"]), axis=1)
            )
            batch["timestamps"] = ts.astype(np.int32)
            batch["target_timestamp"] = (
                self.targets[ts_name][idx].astype(np.int32)
                if ts_name
                else (batch["timestamps"].max(axis=1) + 1)
            )
            ratings = (
                self.sequences[rating_name][idx]
                if rating_name
                else np.zeros_like(batch["ids"])
            )
            batch["ratings"] = ratings.astype(np.int32)
            batch["target_rating"] = (
                self.targets[rating_name][idx].astype(np.int32)
                if rating_name
                else np.zeros(batch_size, dtype=np.int32)
            )
            yield batch
