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


class MlflowFileWriter:
    """MLflow file-store-compatible tracking (the reference's optional
    MLflow channel, configs/logger/mlflow.yaml) with zero dependencies.

    Writes the `mlruns/<exp_id>/<run_id>/` layout the real MLflow UI and
    client read: meta.yaml per experiment/run, one file per param, and
    per-metric append-only files of "<timestamp_ms> <value> <step>" lines.
    """

    def __init__(self, tracking_dir: str, experiment: str, run_name: str):
        import uuid

        self.exp_dir = os.path.join(tracking_dir, "0")
        self.run_id = uuid.uuid4().hex
        self.run_dir = os.path.join(self.exp_dir, self.run_id)
        for sub in ("metrics", "params", "tags"):
            os.makedirs(os.path.join(self.run_dir, sub), exist_ok=True)
        if not os.path.exists(os.path.join(self.exp_dir, "meta.yaml")):
            with open(os.path.join(self.exp_dir, "meta.yaml"), "w") as f:
                f.write(
                    f"artifact_location: {self.exp_dir}\n"
                    f"experiment_id: '0'\nlifecycle_stage: active\n"
                    f"name: {experiment}\n"
                )
        start = int(time.time() * 1000)
        with open(os.path.join(self.run_dir, "meta.yaml"), "w") as f:
            f.write(
                f"artifact_uri: {os.path.join(self.run_dir, 'artifacts')}\n"
                f"experiment_id: '0'\nlifecycle_stage: active\n"
                f"run_id: {self.run_id}\nrun_name: {run_name}\n"
                f"run_uuid: {self.run_id}\nstart_time: {start}\n"
                f"status: 1\nuser_id: {os.environ.get('USER', 'unknown')}\n"
            )
        with open(os.path.join(self.run_dir, "tags", "mlflow.runName"), "w") as f:
            f.write(run_name)

    def log_params(self, params: Dict[str, object]) -> None:
        for k, v in params.items():
            safe = k.replace("/", ".")
            with open(os.path.join(self.run_dir, "params", safe), "w") as f:
                f.write(str(v))

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        ts = int(time.time() * 1000)
        for k, v in metrics.items():
            if not isinstance(v, (int, float)):
                continue
            safe = k.replace("/", ".")
            with open(os.path.join(self.run_dir, "metrics", safe), "a") as f:
                f.write(f"{ts} {v} {step}\n")


class MetricsWriter:
    """Appends metric dicts to metrics.csv + metrics.jsonl under out_dir."""

    def __init__(
        self,
        out_dir: str,
        enable_tensorboard: bool = False,
        mlflow_dir: str = "",
        experiment: str = "default",
    ):
        self.out_dir = out_dir
        self.enabled = is_main_process()
        self._csv_path = os.path.join(out_dir, "metrics.csv")
        self._jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self._csv_fields: Optional[list] = None
        self._tb = None
        self.mlflow: Optional[MlflowFileWriter] = None
        if self.enabled:
            os.makedirs(out_dir, exist_ok=True)
            if enable_tensorboard:
                try:
                    from tensorboardX import SummaryWriter  # optional

                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except ImportError:
                    self._tb = None
            if mlflow_dir:
                self.mlflow = MlflowFileWriter(
                    mlflow_dir, experiment, run_name=os.path.basename(out_dir)
                )

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
        if self.mlflow is not None:
            self.mlflow.log_metrics(metrics, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


class ProgressLine:
    """In-place per-step console progress (the reference's
    configs/callbacks/rich_progress_bar.yaml analog, minus the rich
    dependency): one `\\r`-rewritten stderr line with step/total, a bar,
    the latest pulled loss, throughput, and ETA. Renders only when
    stderr is a TTY (CI/driver logs stay clean) and only on process 0;
    throttled to `min_interval` seconds so the host loop never blocks on
    terminal writes."""

    def __init__(
        self,
        total: int,
        prefix: str,
        enabled: Optional[bool] = None,
        stream=None,
        min_interval: float = 0.1,
    ):
        self.stream = stream if stream is not None else sys.stderr
        if enabled is None:
            enabled = is_main_process() and self.stream.isatty()
        self.enabled = bool(enabled)
        self.total = max(int(total), 1)
        self.prefix = prefix
        self.min_interval = min_interval
        self.t0 = time.time()
        self._last_render = 0.0
        self._wrote = False

    def update(self, done: int, **stats) -> None:
        if not self.enabled:
            return
        now = time.time()
        if now - self._last_render < self.min_interval and done < self.total:
            return
        self._last_render = now
        frac = min(done / self.total, 1.0)
        width = 20
        filled = int(frac * width)
        bar = "━" * filled + "─" * (width - filled)
        elapsed = now - self.t0
        eta = elapsed / frac - elapsed if frac > 0 else 0.0
        parts = [
            f"{self.prefix} {bar} {done}/{self.total}",
            f"{int(elapsed) // 60}:{int(elapsed) % 60:02d}<"
            f"{int(eta) // 60}:{int(eta) % 60:02d}",
        ]
        for k, v in stats.items():
            if v is None:
                continue
            parts.append(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}")
        line = " | ".join(parts)
        self.stream.write("\r\x1b[2K" + line[:200])
        self.stream.flush()
        self._wrote = True

    def close(self) -> None:
        if self.enabled and self._wrote:
            self.stream.write("\n")
            self.stream.flush()
