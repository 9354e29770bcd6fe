"""Tensor-parallel (Megatron-style) sharding for the HSTU encoder.

The reference has no tensor parallelism at all (SURVEY §2.4: grep-verified
absent); its plan column marks TP as the optional extension "shard `_uvqk`
[D, 4hd] and `_o` along hidden axis" for large-width configs. This module
is the TPU-idiomatic version of exactly that split:

- every block's fused `uvqk` kernel [D, 2·h·dv + 2·h·dqk] is
  column-sharded P(None, "model")  (Megatron column-parallel),
- every block's output projection `o` kernel [h·dv, D] (or [3·h·dv, D]
  with concat_ua) is row-sharded P("model", None)  (Megatron
  row-parallel); its bias stays replicated and is added after the psum.

Unlike CUDA Megatron there is no hand-written collective code: the params
are *placed* with these NamedShardings and XLA/GSPMD partitions the
matmuls and inserts the all-reduce after the row-parallel projection
("pick a mesh, annotate shardings, let XLA insert collectives"). The math
is unchanged — only floating-point summation order differs.

Enable with `encoder.tp_shards=K`; the Trainer sizes the mesh's "model"
axis accordingly (train/driver.py). Composes with the row-sharded
embedding table (embedding.kind=sharded_local) on the same axis.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel fan-in kernels: last dim sharded
_COL_PARALLEL = ("uvqk",)
# row-parallel fan-out kernels: first dim sharded, bias replicated
_ROW_PARALLEL = ("o",)


def tp_spec(path: tuple) -> P | None:
    """PartitionSpec for one encoder param path, or None to leave as-is.

    `path` is a jax.tree_util key path; matches flax names
    params/encoder/block_i/{uvqk, o/kernel}.
    """
    keys = [str(getattr(k, "key", k)) for k in path]
    if "encoder" not in keys:
        return None
    if keys[-1] in _COL_PARALLEL:
        return P(None, "model")
    if len(keys) >= 2 and keys[-2] in _ROW_PARALLEL and keys[-1] == "kernel":
        return P("model", None)
    return None


def place_tp_params(params: Any, mesh: Mesh) -> Any:
    """device_put the encoder's uvqk/o kernels with their TP shardings.

    Leaves every other leaf untouched (whatever placement it already has —
    replicated, or the row-sharded embedding table).
    """

    def place(path, leaf):
        spec = tp_spec(path)
        if spec is None:
            return leaf
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
