"""Metrics writers: CSV + JSONL (+ optional TensorBoard) and console.

Replaces the reference's Lightning logger stack (configs/logger/*.yaml:
CSV + TensorBoard, optional MLflow) and the rank-prefixed RankedLogger
(utils/logger.py): on multi-process JAX only process 0 writes.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import sys
import time
from typing import Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


class RankedLogger(logging.LoggerAdapter):
    """Console logger prefixing the JAX process index (utils/logger.py:7-74)."""

    def __init__(self, name: str, rank_zero_only: bool = True):
        logger = logging.getLogger(name)
        if not logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(
                logging.Formatter("[%(asctime)s][%(levelname)s] %(message)s")
            )
            logger.addHandler(handler)
            logger.setLevel(logging.INFO)
            logger.propagate = False
        super().__init__(logger, {})
        self.rank_zero_only = rank_zero_only

    def process(self, msg, kwargs):
        return f"[rank {jax.process_index()}] {msg}", kwargs

    def log(self, level, msg, *args, **kwargs):
        if self.rank_zero_only and not is_main_process():
            return
        super().log(level, msg, *args, **kwargs)


class MetricsWriter:
    """Appends metric dicts to metrics.csv + metrics.jsonl under out_dir."""

    def __init__(self, out_dir: str, enable_tensorboard: bool = False):
        self.out_dir = out_dir
        self.enabled = is_main_process()
        self._csv_path = os.path.join(out_dir, "metrics.csv")
        self._jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self._csv_fields: Optional[list] = None
        self._tb = None
        if self.enabled:
            os.makedirs(out_dir, exist_ok=True)
            if enable_tensorboard:
                try:
                    from tensorboardX import SummaryWriter  # optional

                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except ImportError:
                    self._tb = None

    def log(self, metrics: Dict[str, float], step: int, epoch: int) -> None:
        if not self.enabled:
            return
        row = {"step": step, "epoch": epoch, "time": time.time(), **metrics}
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        write_header = self._csv_fields is None and not os.path.exists(self._csv_path)
        if self._csv_fields is None:
            self._csv_fields = list(row.keys())
        with open(self._csv_path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._csv_fields, extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow({k: row.get(k, "") for k in self._csv_fields})
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
