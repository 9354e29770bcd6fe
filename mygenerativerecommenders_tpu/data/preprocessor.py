"""Offline ETL: raw interaction logs -> per-user chronological sequence CSVs.

Reproduces the reference's DataProcessor family (data/preprocessor.py):

- `MovielensDataProcessor` (preprocessor.py:86-283): ml-1m/ml-20m zips ->
  users/movies/ratings frames -> per-user `sasrec_format.csv` with columns
  user_id, sequence_item_ids, sequence_ratings, sequence_timestamps (each
  a Python-list literal, chronologically sorted), plus movies.csv with
  cleaned title/year/genres and a 90/10 user train/test split.
- `AmazonDataProcessor` (preprocessor.py:286-394): ratings CSV with
  string item ids -> integer-coded sequences.
- `SyntheticDataProcessor`: NEW — generates a power-law synthetic catalog
  in the identical output format so the full pipeline runs in
  network-isolated environments (this sandbox, CI) without downloads.

All output formats are byte-compatible with the reference so either
framework can consume either's processed data.
"""

from __future__ import annotations

import os
import zipfile
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd


@dataclass
class DataProcessor:
    download_path: str = ""
    saved_name: str = ""
    prefix: str = "ml-1m"
    data_dir: str = "tmp"
    expected_num_unique_items: int = 0
    expected_max_item_id: int = 0
    convert_timestamp: bool = False

    def processed_dir(self) -> str:
        return os.path.join(self.data_dir, "processed", self.prefix)

    def output_format_csv(self) -> str:
        return os.path.join(self.processed_dir(), "sasrec_format.csv")

    def processed_item_csv(self) -> str:
        return os.path.join(self.processed_dir(), "movies.csv")

    def train_split_csv(self) -> str:
        return os.path.join(self.processed_dir(), "sasrec_format_train.csv")

    def test_split_csv(self) -> str:
        return os.path.join(self.processed_dir(), "sasrec_format_test.csv")

    def preprocess_rating(self) -> int:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _write_sequences(
        self, ratings: pd.DataFrame, users: Optional[pd.DataFrame] = None
    ) -> int:
        """Group chronologically-sorted ratings by user and write the
        sequence CSV (+ user-feature columns) and the 90/10 user-id-
        threshold split (preprocessor.py:232-270)."""
        os.makedirs(self.processed_dir(), exist_ok=True)
        ratings = ratings.sort_values(by=["user_id", "unix_timestamp"], kind="stable")
        grouped = ratings.groupby("user_id", sort=True).agg(list)
        out = pd.DataFrame(
            {
                "user_id": grouped.index,
                "sequence_item_ids": grouped["movie_id"].map(lambda x: str(list(x))),
                "sequence_ratings": grouped["rating"].map(lambda x: str(list(x))),
                "sequence_timestamps": grouped["unix_timestamp"].map(
                    lambda x: str(list(x))
                ),
            }
        ).reset_index(drop=True)
        if users is not None:
            out = out.merge(users, on="user_id", how="left")
        out.to_csv(self.output_format_csv(), index=False)

        # user-id-threshold split like preprocessor.py:256-270
        num_users = out["user_id"].nunique()
        threshold = out["user_id"].sort_values().iloc[int(num_users * 0.9) - 1]
        out[out["user_id"] <= threshold].to_csv(self.train_split_csv(), index=False)
        out[out["user_id"] > threshold].to_csv(self.test_split_csv(), index=False)
        return len(out)


@dataclass
class MovielensDataProcessor(DataProcessor):
    def download(self) -> str:
        import urllib.request

        os.makedirs(os.path.dirname(self.saved_name) or ".", exist_ok=True)
        if not os.path.exists(self.saved_name):
            urllib.request.urlretrieve(self.download_path, self.saved_name)
        extract_dir = os.path.join(self.data_dir, "raw")
        os.makedirs(extract_dir, exist_ok=True)
        with zipfile.ZipFile(self.saved_name) as zf:
            zf.extractall(extract_dir)
        return os.path.join(extract_dir, self.prefix)

    def preprocess_rating(self) -> int:
        raw_dir = self.download()
        users = None
        if self.prefix == "ml-1m":
            ratings = pd.read_csv(
                os.path.join(raw_dir, "ratings.dat"),
                sep="::",
                engine="python",
                names=["user_id", "movie_id", "rating", "unix_timestamp"],
                encoding="latin-1",
            )
            movies = pd.read_csv(
                os.path.join(raw_dir, "movies.dat"),
                sep="::",
                engine="python",
                names=["movie_id", "title", "genres"],
                encoding="latin-1",
            )
            # user features, categorical-coded (preprocessor.py:193-205)
            users = pd.read_csv(
                os.path.join(raw_dir, "users.dat"),
                sep="::",
                engine="python",
                names=["user_id", "sex", "age_group", "occupation", "zip_code"],
                encoding="latin-1",
            )
            for col in ("sex", "age_group", "occupation", "zip_code"):
                users[col] = pd.Categorical(users[col]).codes
        else:  # ml-20m style (no user features)
            ratings = pd.read_csv(os.path.join(raw_dir, "ratings.csv"))
            ratings.columns = ["user_id", "movie_id", "rating", "unix_timestamp"]
            movies = pd.read_csv(os.path.join(raw_dir, "movies.csv"))
            movies.columns = ["movie_id", "title", "genres"]

        # year from the trailing "(YYYY)" in the title; cleaned title w/o it
        years = movies["title"].str.extract(r"\((\d{4})\)\s*$")[0]
        movies["year"] = pd.to_numeric(years, errors="coerce").fillna(0).astype(int)
        movies["cleaned_title"] = (
            movies["title"].str.replace(r"\s*\(\d{4}\)\s*$", "", regex=True).str.strip()
        )
        os.makedirs(self.processed_dir(), exist_ok=True)
        movies.to_csv(self.processed_item_csv(), index=False)
        if users is not None:
            users.to_csv(os.path.join(self.processed_dir(), "users.csv"), index=False)
        return self._write_sequences(ratings, users)


@dataclass
class MovielensNpzDataProcessor(DataProcessor):
    """ml-20mx16x32 ("ml-1b") npz-shard variant (preprocessor.py:164-184).

    The raw dataset is 16 npz shards `trainx16x32_{i}.npz`, each with
    `arr_0` = rows of (user_id, movie_id). Like the reference, the rating
    and timestamp columns are placeholders (user_id / movie_id
    respectively, preprocessor.py:174-181) — the dataset carries no real
    ratings or times. Shards must already be on disk under
    `<data_dir>/raw/<prefix>/` (the reference downloads a tar; this
    environment has no egress, and the download URL died with the ml-1b
    hosting anyway)."""

    num_shards: int = 16

    def raw_dir(self) -> str:
        return os.path.join(self.data_dir, "raw", self.prefix)

    def preprocess_rating(self) -> int:
        pairs = []
        for i in range(self.num_shards):
            path = os.path.join(self.raw_dir(), f"trainx16x32_{i}.npz")
            with np.load(path) as data:
                pairs.append(np.asarray(data["arr_0"], dtype=np.int64))
        arr = np.concatenate(pairs, axis=0)
        ratings = pd.DataFrame(
            {
                "user_id": arr[:, 0],
                "movie_id": arr[:, 1],
                "rating": arr[:, 0],  # placeholder (preprocessor.py:177)
                "unix_timestamp": arr[:, 1],  # placeholder (:178)
            }
        )
        os.makedirs(self.processed_dir(), exist_ok=True)
        return self._write_sequences(ratings)


@dataclass
class AmazonDataProcessor(DataProcessor):
    # matches the reference's >= 5 interactions filter for both users and
    # items (preprocessor.py:309-339)
    min_count: int = 5

    def download(self) -> None:
        if os.path.exists(self.saved_name):
            return
        if not self.download_path:
            raise FileNotFoundError(
                f"Amazon ratings CSV not found at {self.saved_name} and no "
                "download_path configured; place the raw "
                "ratings_<Category>.csv there (snap.stanford.edu Amazon "
                "product data) or point data.data_dir at it"
            )
        import urllib.request

        os.makedirs(os.path.dirname(self.saved_name) or ".", exist_ok=True)
        urllib.request.urlretrieve(self.download_path, self.saved_name)

    def preprocess_rating(self) -> int:
        self.download()
        ratings = pd.read_csv(
            self.saved_name,
            names=["user_id", "movie_id", "rating", "unix_timestamp"],
        )
        if self.min_count > 1:
            # drop users/items with < min_count interactions
            # (reference preprocessor.py:309-339)
            item_counts = ratings["movie_id"].value_counts()
            user_counts = ratings["user_id"].value_counts()
            ratings = ratings[
                ratings["movie_id"].map(item_counts).ge(self.min_count)
                & ratings["user_id"].map(user_counts).ge(self.min_count)
            ]
        # integer-code string ids, 1-based (0 reserved for padding)
        ratings["user_id"] = pd.factorize(ratings["user_id"])[0] + 1
        item_codes, item_uniques = pd.factorize(ratings["movie_id"])
        ratings["movie_id"] = item_codes + 1
        os.makedirs(self.processed_dir(), exist_ok=True)
        pd.DataFrame(
            {
                "movie_id": np.arange(1, len(item_uniques) + 1),
                "title": item_uniques,
                "genres": "unknown",
                "year": 0,
                "cleaned_title": item_uniques,
            }
        ).to_csv(self.processed_item_csv(), index=False)
        return self._write_sequences(ratings)


@dataclass
class SyntheticDataProcessor(DataProcessor):
    """Synthetic power-law interaction data in the same output format."""

    num_users: int = 2048
    num_items: int = 3706
    max_item_id: int = 3952
    min_seq_len: int = 5
    max_seq_len: int = 200
    seed: int = 0
    missing_item_fraction: float = 0.0  # fraction of [1, max_item_id] absent
    # ratings drawn around a per-USER latent bias + per-item quality
    # instead of uniform — makes the RANKING task learnable for recipe
    # convergence studies: the eval protocol predicts the rating of the
    # UNSEEN next item (reference ranking.py:24-47), so the learnable
    # signal must live in the history (user bias; the history's rating
    # tokens reveal it), with the item term as noise-like variation.
    # Uses a separate rng stream so item/timestamp sequences stay
    # byte-identical to rating_by_item_quality=False.
    rating_by_item_quality: bool = False

    def __post_init__(self):
        if self.expected_num_unique_items == 0:
            self.expected_num_unique_items = self.num_items
        if self.expected_max_item_id == 0:
            self.expected_max_item_id = self.max_item_id

    def preprocess_rating(self) -> int:
        rng = np.random.default_rng(self.seed)
        # choose which ids exist in the catalog (like ml-1m's sparse id space)
        all_ids = np.arange(1, self.max_item_id + 1)
        catalog = np.sort(rng.choice(all_ids, size=self.num_items, replace=False))
        pop = 1.0 / np.arange(1, self.num_items + 1) ** 0.8  # zipf-ish
        pop /= pop.sum()

        rng_q = np.random.default_rng(self.seed + 1)
        quality = rng_q.normal(0.0, 0.5, size=self.num_items)  # item term
        quality_of_id = np.zeros(self.max_item_id + 1)
        quality_of_id[catalog] = quality
        user_bias = rng_q.normal(3.0, 1.1, size=self.num_users + 1)

        rows = []
        base_ts = 978_000_000  # ~2001, ml-1m-era timestamps
        for u in range(1, self.num_users + 1):
            n = int(rng.integers(self.min_seq_len, self.max_seq_len + 1))
            items = catalog[rng.choice(self.num_items, size=n, p=pop)]
            ts = np.sort(base_ts + rng.integers(0, 3 * 365 * 86400, size=n))
            ratings = rng.integers(1, 6, size=n)
            if self.rating_by_item_quality:
                ratings = np.clip(
                    np.rint(
                        user_bias[u]
                        + quality_of_id[items]
                        + rng_q.normal(0, 0.5, size=n)
                    ),
                    1, 5,
                ).astype(np.int64)
            rows.append(
                {
                    "user_id": u,
                    "movie_id": items.tolist(),
                    "rating": ratings.tolist(),
                    "unix_timestamp": ts.tolist(),
                }
            )
        frame = pd.DataFrame(rows).explode(
            ["movie_id", "rating", "unix_timestamp"], ignore_index=True
        )

        os.makedirs(self.processed_dir(), exist_ok=True)
        years = 1920 + (catalog % 80)
        pd.DataFrame(
            {
                "movie_id": catalog,
                "title": [f"Synthetic Movie {i} ({y})" for i, y in zip(catalog, years)],
                "genres": "Synthetic",
                "year": years,
                "cleaned_title": [f"Synthetic Movie {i}" for i in catalog],
            }
        ).to_csv(self.processed_item_csv(), index=False)
        # synthetic user features mirroring ml-1m's coded columns so the
        # aux-preprocessor path runs without downloads
        users = pd.DataFrame(
            {
                "user_id": np.arange(1, self.num_users + 1),
                "sex": rng.integers(0, 2, size=self.num_users),
                "age_group": rng.integers(0, 7, size=self.num_users),
                "occupation": rng.integers(0, 21, size=self.num_users),
                "zip_code": rng.integers(0, 100, size=self.num_users),
            }
        )
        return self._write_sequences(frame, users)


def build_processor(dataset_name: str, data_dir: str, **kwargs) -> DataProcessor:
    if dataset_name == "ml-20mx16x32":
        return MovielensNpzDataProcessor(
            prefix=dataset_name, data_dir=data_dir, **kwargs
        )
    if dataset_name in ("ml-1m", "ml-20m"):
        return MovielensDataProcessor(
            download_path=(
                f"http://files.grouplens.org/datasets/movielens/{dataset_name}.zip"
            ),
            saved_name=os.path.join(data_dir, f"movielens_{dataset_name}.zip"),
            prefix=dataset_name,
            data_dir=data_dir,
            expected_num_unique_items=3706 if dataset_name == "ml-1m" else 26744,
            expected_max_item_id=3952 if dataset_name == "ml-1m" else 131262,
            **kwargs,
        )
    if dataset_name.startswith("amzn") or dataset_name.startswith("amazon"):
        # amzn-books -> Books etc. (snap.stanford.edu Amazon product data,
        # the reference's source, preprocessor.py:286-307)
        category = dataset_name.split("-", 1)[1].capitalize() if "-" in dataset_name else ""
        extra = {}
        if category:
            extra = dict(
                download_path=(
                    "http://snap.stanford.edu/data/amazon/productGraph/"
                    f"categoryFiles/ratings_{category}.csv"
                ),
                saved_name=os.path.join(data_dir, f"ratings_{category}.csv"),
            )
        extra.update(kwargs)
        return AmazonDataProcessor(prefix=dataset_name, data_dir=data_dir, **extra)
    if dataset_name.startswith("synthetic"):
        return SyntheticDataProcessor(prefix=dataset_name, data_dir=data_dir, **kwargs)
    raise ValueError(f"Unknown dataset {dataset_name}")
