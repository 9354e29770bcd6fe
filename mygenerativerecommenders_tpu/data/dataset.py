"""Sequence dataset + batch loader (reference: data/reco_dataset.py).

Instead of the reference's per-row `eval()` parsing with an unbounded
per-worker cache (reco_dataset.py:94-309), the whole CSV is parsed ONCE
into dense numpy arrays at construction — [U, L] ids/ratings/timestamps +
[U] lengths/targets — so the per-step loader work is a pure numpy gather.
Split semantics match RecoDataset.load_item exactly:

  seq (chronological) -> drop ignore_last_n tail -> target = new last item
  -> history = remainder, keep the most recent `max_seq_len` (chronological
  mode) or the first after reversal (reverse-chron mode) -> right-pad 0.

`RecoData` plays the DataModule role (reco_dataset.py:312-469): owns the
processor, the three split datasets, and the item catalog
(all_item_ids / max_item_id) consumed by model construction.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from mygenerativerecommenders_tpu.configs import DataConfig
from mygenerativerecommenders_tpu.data.preprocessor import (
    DataProcessor,
    build_processor,
)


def _parse_int_list(s: str) -> np.ndarray:
    return np.fromstring(s.strip()[1:-1], dtype=np.int64, sep=",")


def _parse_num_list(s: str) -> np.ndarray:
    return np.fromstring(s.strip()[1:-1], dtype=np.float64, sep=",")


@dataclass
class SequenceDataset:
    """Dense-array view of one split."""

    lengths: np.ndarray  # [U] int32
    ids: np.ndarray  # [U, L] int32
    ratings: np.ndarray  # [U, L] int32
    timestamps: np.ndarray  # [U, L] int32
    target_id: np.ndarray  # [U] int32
    target_rating: np.ndarray  # [U] int32
    target_timestamp: np.ndarray  # [U] int32
    user_ids: np.ndarray  # [U] int64
    additional: Dict[str, np.ndarray] = None  # per-user scalar feature cols

    def __len__(self) -> int:
        return len(self.lengths)

    @staticmethod
    def from_csv(
        csv_path: str | pd.DataFrame,
        max_sequence_length: int,
        ignore_last_n: int,
        chronological: bool = True,
        shift_id_by: int = 0,
        sample_ratio: float = 1.0,
        seed: int = 42,
        additional_columns: Optional[List[str]] = None,
    ) -> "SequenceDataset":
        # native C++ fast path (no positional subsampling / id shifting)
        if (
            isinstance(csv_path, str)
            and sample_ratio >= 1.0
            and shift_id_by == 0
        ):
            from mygenerativerecommenders_tpu import native

            parsed = native.parse_sequences_native(
                csv_path, max_sequence_length, ignore_last_n, chronological
            )
            if parsed is not None:
                additional = {}
                if additional_columns:
                    extra = pd.read_csv(csv_path, usecols=list(additional_columns))
                    for col in additional_columns:
                        additional[col] = extra[col].to_numpy().astype(np.int32)
                return SequenceDataset(
                    lengths=parsed["lengths"],
                    ids=parsed["ids"],
                    ratings=parsed["ratings"],
                    timestamps=parsed["timestamps"],
                    target_id=parsed["target_id"],
                    target_rating=parsed["target_rating"],
                    target_timestamp=parsed["target_timestamp"],
                    user_ids=parsed["user_ids"],
                    additional=additional,
                )

        frame = (
            csv_path
            if isinstance(csv_path, pd.DataFrame)
            else pd.read_csv(csv_path, delimiter=",")
        )
        L = max_sequence_length
        u = len(frame)
        lengths = np.zeros(u, dtype=np.int32)
        ids = np.zeros((u, L), dtype=np.int32)
        ratings = np.zeros((u, L), dtype=np.int32)
        timestamps = np.zeros((u, L), dtype=np.int32)
        target_id = np.zeros(u, dtype=np.int32)
        target_rating = np.zeros(u, dtype=np.int32)
        target_timestamp = np.zeros(u, dtype=np.int32)

        rng = np.random.default_rng(seed)
        seq_ids = frame["sequence_item_ids"].to_numpy()
        seq_ratings = frame["sequence_ratings"].to_numpy()
        seq_ts = frame["sequence_timestamps"].to_numpy()

        for i in range(u):
            s_ids = _parse_int_list(seq_ids[i])
            s_ratings = _parse_num_list(seq_ratings[i]).astype(np.int64)
            s_ts = _parse_int_list(seq_ts[i])
            if ignore_last_n > 0:
                s_ids = s_ids[:-ignore_last_n]
                s_ratings = s_ratings[:-ignore_last_n]
                s_ts = s_ts[:-ignore_last_n]
            if sample_ratio < 1.0:
                keep = rng.random(len(s_ids)) < sample_ratio
                keep[-1] = True  # never drop the target
                s_ids, s_ratings, s_ts = s_ids[keep], s_ratings[keep], s_ts[keep]
            if shift_id_by:
                s_ids = s_ids + shift_id_by
            if len(s_ids) == 0:
                continue
            target_id[i] = s_ids[-1]
            target_rating[i] = s_ratings[-1]
            target_timestamp[i] = s_ts[-1]
            hist_ids, hist_ratings, hist_ts = s_ids[:-1], s_ratings[:-1], s_ts[:-1]
            if chronological:
                hist_ids, hist_ratings, hist_ts = (
                    hist_ids[-L:],
                    hist_ratings[-L:],
                    hist_ts[-L:],
                )
            else:
                # reverse-chron mode: newest-first order, keep the newest L
                # (reco_dataset.py:124 reverses, then :target_len truncates)
                hist_ids, hist_ratings, hist_ts = (
                    hist_ids[::-1][:L],
                    hist_ratings[::-1][:L],
                    hist_ts[::-1][:L],
                )
            n = len(hist_ids)
            lengths[i] = n
            ids[i, :n] = hist_ids
            ratings[i, :n] = hist_ratings
            timestamps[i, :n] = hist_ts

        additional = {}
        for col in additional_columns or []:
            if col not in frame.columns:
                raise ValueError(f"Column {col!r} not in the sequence CSV")
            additional[col] = frame[col].to_numpy().astype(np.int32)

        # rows with empty history are degenerate but kept (length >= 1 is
        # guaranteed by ml-1m's >= 20 ratings/user; synthetic enforces >= 5)
        return SequenceDataset(
            lengths=lengths,
            ids=ids,
            ratings=ratings,
            timestamps=timestamps,
            target_id=target_id,
            target_rating=target_rating,
            target_timestamp=target_timestamp,
            user_ids=frame["user_id"].to_numpy(),
            additional=additional,
        )


class BatchLoader:
    """Shuffling fixed-shape batch iterator.

    Pads the final partial batch to a full batch (sample_weight 0 for pad
    rows) so every step hits the same compiled XLA program.

    Multi-host: pass (process_index, process_count) to shard the example
    stream — every process computes the SAME permutation (seed+epoch, so
    no cross-host coordination) and takes its strided slice of it. Each
    process then feeds its local devices only; the per-process batch_size
    stays the global batch divided by process_count (caller's choice).

    Length bucketing (`buckets`, ascending capacities whose max covers the
    dataset's max length): each batch holds sequences from ONE bucket,
    with the sequence arrays truncated to that bucket's capacity, so short
    sequences never pay max-length compute (the jagged no-padding-waste
    property; reference hstu.py:439-480 achieves it with fbgemm jagged
    tensors, here it is the batch SHAPE that shrinks and XLA compiles one
    program per bucket). Batches within a bucket are shuffled; bucket
    order is shuffled per epoch but same-capacity batches stay adjacent so
    the driver's multi-step stacking still finds same-shape runs. In
    multi-host mode the bucket partition and batch boundaries are computed
    on the GLOBAL permutation (bucket membership is data-dependent, so a
    process-local partition would desync batch shapes across hosts and
    deadlock collectives); each process takes its strided rows of every
    global batch of batch_size * process_count rows.
    """

    def __init__(
        self,
        dataset: SequenceDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        buckets: Optional[List[int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.epoch = 0
        self.buckets = sorted(buckets) if buckets else None
        if self.buckets:
            max_len = int(dataset.lengths.max()) if len(dataset) else 0
            if self.buckets[-1] < max_len:
                raise ValueError(
                    f"length_buckets max {self.buckets[-1]} < dataset max "
                    f"sequence length {max_len}"
                )
            caps = np.asarray(self.buckets)
            # bucket id per example: smallest capacity >= length
            self._bucket_of = np.searchsorted(
                caps, np.maximum(dataset.lengths, 1)
            )

    def _local_count(self) -> int:
        n = len(self.dataset)
        # strided shard sizes differ by <=1 across processes; use the max
        # so every process runs the SAME number of (padded) batches —
        # collectives inside the step would deadlock otherwise
        return (n + self.process_count - 1) // self.process_count

    def __len__(self) -> int:
        if self.buckets:
            gbs = self.batch_size * self.process_count
            counts = np.bincount(self._bucket_of, minlength=len(self.buckets))
            if self.drop_last:
                return int(sum(c // gbs for c in counts))
            return int(sum((c + gbs - 1) // gbs for c in counts if c))
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _emit(self, idx: np.ndarray, cap: Optional[int]) -> Dict[str, np.ndarray]:
        ds = self.dataset
        weight = (idx >= 0).astype(np.float32)
        idx = np.maximum(idx, 0)
        sl = slice(None) if cap is None else slice(0, cap)
        batch = {
            "lengths": np.maximum(ds.lengths[idx], 1),
            "ids": ds.ids[idx, sl],
            "ratings": ds.ratings[idx, sl],
            "timestamps": ds.timestamps[idx, sl],
            "target_id": ds.target_id[idx],
            "target_rating": ds.target_rating[idx],
            "target_timestamp": ds.target_timestamp[idx],
            "sample_weight": weight,
        }
        for col, values in (ds.additional or {}).items():
            batch[col] = values[idx]
        return batch

    def _iter_bucketed(self, order: np.ndarray, rng) -> Iterator[Dict[str, np.ndarray]]:
        gbs = self.batch_size * self.process_count
        caps = self.buckets
        bucket_of = self._bucket_of[order]
        # global batches per bucket (same partition on every process)
        batches: List[List] = []  # (cap, global idx row block)
        for bi, cap in enumerate(caps):
            members = order[bucket_of == bi]
            if len(members) == 0:
                continue
            for s in range(0, len(members), gbs):
                chunk = members[s : s + gbs]
                if len(chunk) < gbs:
                    if self.drop_last:
                        continue
                    chunk = np.concatenate(
                        [chunk, np.full(gbs - len(chunk), -1, dtype=chunk.dtype)]
                    )
                batches.append((cap, chunk))
        if self.shuffle and rng is not None:
            # shuffle bucket ORDER, keep same-cap batches adjacent (the
            # multi-step stacker needs same-shape runs); batches within a
            # bucket are already example-shuffled via `order`
            cap_rank = {c: i for i, c in enumerate(rng.permutation(caps))}
            batches.sort(key=lambda t: cap_rank[t[0]])
        for cap, chunk in batches:
            if self.process_count > 1:
                chunk = chunk[self.process_index :: self.process_count]
            yield self._emit(chunk, cap)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        rng = None
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        self.epoch += 1
        if self.buckets:
            yield from self._iter_bucketed(order, rng)
            return
        if self.process_count > 1:
            order = order[self.process_index :: self.process_count]
            short = self._local_count() - len(order)
            if short > 0:  # equal batch counts across processes; -1 rows
                order = np.concatenate(  # get sample_weight 0 below
                    [order, np.full(short, -1, dtype=order.dtype)]
                )
        bs = self.batch_size
        num_batches = len(self)
        for b in range(num_batches):
            idx = order[b * bs : (b + 1) * bs]
            pad = bs - len(idx)
            if pad > 0:
                idx = np.concatenate([idx, np.full(pad, -1, dtype=idx.dtype)])
            yield self._emit(idx, None)


class RecoData:
    """DataModule equivalent: processor + splits + item catalog."""

    def __init__(self, cfg: DataConfig, seed: int = 42):
        self.cfg = cfg
        kwargs = {}
        if cfg.dataset_name.startswith("synthetic"):
            kwargs["num_users"] = cfg.synthetic_num_users
            kwargs["num_items"] = cfg.expected_num_unique_items
            kwargs["max_item_id"] = cfg.expected_max_item_id
            kwargs["rating_by_item_quality"] = cfg.synthetic_rating_quality
            kwargs["max_seq_len"] = cfg.synthetic_max_seq_len
        self.processor: DataProcessor = build_processor(
            cfg.dataset_name, cfg.data_dir, **kwargs
        )
        if not os.path.exists(self.processor.output_format_csv()):
            self.processor.preprocess_rating()
        self._seed = seed
        self._init_item_ids()
        self._splits: Dict[str, SequenceDataset] = {}

    def _init_item_ids(self) -> None:
        """Catalog from the item CSV (reco_dataset.py:346-391)."""
        item_csv = self.processor.processed_item_csv()
        if os.path.exists(item_csv):
            items = pd.read_csv(item_csv)
            self.all_item_ids: List[int] = [int(x) for x in items["movie_id"]]
            self.max_item_id = int(
                self.processor.expected_max_item_id or max(self.all_item_ids)
            )
            if "year" in items.columns:
                year_of_item = np.zeros(self.max_item_id + 1, dtype=np.int32)
                year_of_item[items["movie_id"].to_numpy()] = items["year"].to_numpy()
                self.year_of_item = year_of_item
            else:
                self.year_of_item = None
        else:
            n = self.processor.expected_num_unique_items
            self.all_item_ids = list(range(1, n + 1))
            self.max_item_id = n
            self.year_of_item = None

    @property
    def max_sequence_length(self) -> int:
        return self.cfg.max_sequence_length

    def dataset(self, split: str) -> SequenceDataset:
        if split not in self._splits:
            ignore_last_n = 1 if split == "train" else 0
            self._splits[split] = SequenceDataset.from_csv(
                self.processor.output_format_csv(),
                max_sequence_length=self.cfg.max_sequence_length,
                ignore_last_n=ignore_last_n,
                chronological=self.cfg.chronological,
                sample_ratio=(
                    self.cfg.positional_sampling_ratio if split == "train" else 1.0
                ),
                seed=self._seed,
                additional_columns=list(self.cfg.additional_columns),
            )
        return self._splits[split]

    def loader(
        self,
        split: str,
        batch_size: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ) -> BatchLoader:
        bs = batch_size or (
            self.cfg.batch_size if split == "train" else self.cfg.eval_batch_size
        )
        return BatchLoader(
            self.dataset(split),
            batch_size=bs or self.cfg.batch_size,
            shuffle=(split == "train"),
            seed=self._seed,
            process_index=process_index,
            process_count=process_count,
            buckets=list(self.cfg.length_buckets) or None,
        )
