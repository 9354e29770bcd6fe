"""Device mesh helpers.

The reference's only distribution mechanism is Lightning DDP over NCCL
(configs/trainer/ddp.yaml). TPU-native equivalent: one global
jax.sharding.Mesh with a "data" axis (batch parallelism; XLA inserts the
gradient all-reduce over ICI) and an optional "model" axis for
row-sharded embedding tables (parallel/embedding_sharding.py).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 0, model: int = 1, col: int = 1) -> Mesh:
    """Mesh over the first data*model*col visible devices, axes
    (data, model[, col]) — "col" shards embedding-table columns
    (sharded_2d)."""
    devices = jax.devices()
    if data == 0:
        data = len(devices) // (model * col)
    if col > 1:
        sel = np.array(devices[: data * model * col]).reshape(data, model, col)
        return Mesh(sel, axis_names=("data", "model", "col"))
    sel = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(sel, axis_names=("data", "model"))
