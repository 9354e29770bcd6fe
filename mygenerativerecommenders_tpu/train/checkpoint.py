"""Orbax checkpointing: (params, opt_state, step, epoch, controllers, rng).

Replaces Lightning's ModelCheckpoint (best-1 by monitored metric + last,
configs/callbacks/model_checkpoint.yaml) and ckpt resume
(scripts/train.py:73). Like the reference's filtered state_dict
(generative_recommenders.py:324-349), eval-time restore can load params
only ("model-weights-only partition").
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        ckpt_dir: str,
        monitor: str = "val/ndcg@100",
        mode: str = "max",
        async_save: bool = False,
    ):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None
        self.best_path: Optional[str] = None
        self._ckptr = ocp.StandardCheckpointer()
        # async: orbax's device->host copy is synchronous, the disk write
        # happens in its background thread; meta.json must land AFTER
        # orbax's atomic finalize-rename, so it is deferred to flush()
        self.async_save = async_save
        self._pending: Optional[tuple] = None

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value > self.best_value if self.mode == "max" else value < self.best_value

    def _write_meta(self, path: str, meta: Dict[str, Any]) -> None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)

    def flush(self) -> None:
        """Finish any in-flight async save and write its meta sidecar.
        Training overlaps the disk write; the next save (or fit teardown /
        restore) synchronizes here."""
        self._ckptr.wait_until_finished()
        if self._pending is not None:
            path, meta = self._pending
            self._pending = None
            self._write_meta(path, meta)

    def _save(self, path: str, state: Dict[str, Any], meta: Dict[str, Any]) -> None:
        self.flush()
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        if self.async_save:
            self._pending = (path, meta)
        else:
            self._ckptr.wait_until_finished()
            self._write_meta(path, meta)

    def save(
        self,
        params: Any,
        opt_state: Any,
        *,
        step: int,
        epoch: int,
        metric_value: Optional[float] = None,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        state = {"params": params, "opt_state": opt_state}
        meta = {
            "step": step,
            "epoch": epoch,
            "monitor": self.monitor,
            "metric_value": metric_value,
            "extra": extra or {},
        }
        self._save(os.path.join(self.ckpt_dir, "last"), state, meta)
        if metric_value is not None and self._is_better(metric_value):
            self.best_value = metric_value
            self.best_path = os.path.join(self.ckpt_dir, "best")
            self._save(self.best_path, state, meta)

    def restore(self, path: str, target: Dict[str, Any]) -> Dict[str, Any]:
        """Restore a full state pytree shaped like `target`."""
        self.flush()
        restored = self._ckptr.restore(os.path.abspath(path), target)
        return restored

    def restore_params(self, path: str, params_target: Any) -> Any:
        """Weights-only restore (the reference's strict=False load)."""
        self.flush()
        restored = self._ckptr.restore(
            os.path.abspath(path), {"params": params_target, "opt_state": None}
        )
        return restored["params"]

    @staticmethod
    def load_meta(path: str) -> Dict[str, Any]:
        """Read the meta sidecar; tolerate a missing meta.json.

        With async_save, a completed orbax save can exist without its
        sidecar until the next flush() — a crash in that window must not
        make an otherwise-complete 'last' checkpoint unrestorable
        (ADVICE r2). Missing sidecar -> conservative defaults (resume
        from step/epoch 0 with fresh controllers; params/opt_state still
        restore fully through `restore`)."""
        meta_path = os.path.join(path, "meta.json")
        if not os.path.exists(meta_path):
            return {
                "step": 0,
                "epoch": -1,
                "monitor": None,
                "metric_value": None,
                "extra": {},
            }
        with open(meta_path) as f:
            return json.load(f)
