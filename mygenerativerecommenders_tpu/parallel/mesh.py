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


def make_mesh(data: int = 0, model: int = 1) -> Mesh:
    """Mesh over the first data*model visible devices, axes (data, model)."""
    devices = jax.devices()
    if data == 0:
        data = len(devices) // model
    sel = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(sel, axis_names=("data", "model"))
