"""Convert a reference (PyTorch-Lightning) checkpoint into this
framework's parameter pytree.

The analog of the reference's scripts/convert_ckpt.py (which remaps
upstream facebook checkpoints into its own module names) — here the map
goes torch state_dict -> flax params, so metric parity can be checked
with identical weights:

  embeddings._item_emb.weight              -> embeddings/item_emb
  preprocessor._pos_emb.weight             -> preprocessor/pos_emb
  sequence_encoder..._attention_layers.{i}._uvqk
                                           -> encoder/block_{i}/uvqk
  ..._attention_layers.{i}._o.weight       -> encoder/block_{i}/o/kernel (T)
  ..._attention_layers.{i}._o.bias         -> encoder/block_{i}/o/bias
  ..._rel_attn_bias._pos_w / ._ts_w        -> encoder/block_{i}/rel_bias_pos_w / _ts_w

torch Linear stores [out, in]; flax Dense stores [in, out] — transposed on
the way through. The fork's item/year split table (embeddings.py:55-63)
maps onto the item_year embedding kind.

Usage:
  python -m mygenerativerecommenders_tpu.cli.convert_ckpt \
      <torch_ckpt.ckpt> <out_dir> [experiment=...] [overrides...]
"""

from __future__ import annotations

import sys
from typing import Any, Dict

import numpy as np


def torch_state_dict_to_params(state: Dict[str, Any], params: Dict) -> Dict:
    """Map a reference state_dict onto a params pytree of matching config.

    `params` is a freshly-initialized flax params dict (used for structure
    + shape checking); returns a new dict with mapped arrays.
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = {}

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def strip(key: str) -> str:
        for prefix in ("model.", "net."):
            if key.startswith(prefix):
                key = key[len(prefix):]
        return key

    state = {strip(k): v for k, v in state.items()}

    def find(*names):
        for name in names:
            if name in state:
                return to_np(state[name])
        return None

    for path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in path]
        joined = "/".join(keys)
        src = None
        if joined.endswith("embeddings/item_emb"):
            src = find("embeddings._item_emb.weight")
        elif joined.endswith("embeddings/year_emb"):
            src = find("embeddings._year_emb.weight")
            # both tables are indexed by YEAR VALUE, but the reference
            # sizes its table by num_items+1 (embeddings.py:60-63) while
            # ours is sized by num_years+1 — copy the overlapping rows
            # and zero-pad the rest (rows beyond either bound are never
            # indexed: year ids are bounded by the year column's values)
            if src is not None:
                rows = np.asarray(leaf).shape[0]
                if src.shape[0] > rows:
                    src = src[:rows]
                elif src.shape[0] < rows:
                    src = np.concatenate(
                        [src, np.zeros((rows - src.shape[0],) + src.shape[1:],
                                       dtype=src.dtype)]
                    )
        elif joined.endswith("preprocessor/pos_emb"):
            src = find("preprocessor._pos_emb.weight")
        elif joined.endswith("preprocessor/rating_emb"):
            src = find("preprocessor._rating_emb.weight")
        elif "encoder/block_" in joined:
            i = joined.split("block_")[1].split("/")[0]
            base = f"sequence_encoder._hstu._attention_layers.{i}"
            if joined.endswith("uvqk"):
                src = find(f"{base}._uvqk")
            elif joined.endswith("o/kernel"):
                w = find(f"{base}._o.weight")
                src = w.T if w is not None else None
            elif joined.endswith("o/bias"):
                src = find(f"{base}._o.bias")
            elif joined.endswith("rel_bias_pos_w"):
                src = find(f"{base}._rel_attn_bias._pos_w")
            elif joined.endswith("rel_bias_ts_w"):
                src = find(f"{base}._rel_attn_bias._ts_w")
        if src is None:
            out[joined] = np.asarray(leaf)
            continue
        target_shape = tuple(np.asarray(leaf).shape)
        if tuple(src.shape) != target_shape:
            raise ValueError(
                f"Shape mismatch for {joined}: ckpt {src.shape} vs model {target_shape}"
            )
        out[joined] = src.astype(np.asarray(leaf).dtype)

    leaves = [out["/".join(str(getattr(k, "key", k)) for k in p)] for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def main(argv: list[str] | None = None):
    import torch

    from mygenerativerecommenders_tpu.cli.train import parse_args
    from mygenerativerecommenders_tpu.train.driver import Trainer
    from mygenerativerecommenders_tpu.train.loggers import RankedLogger

    log = RankedLogger(__name__)
    argv = argv if argv is not None else sys.argv[1:]
    ckpt_path, out_dir, rest = argv[0], argv[1], argv[2:]
    cfg = parse_args(rest)
    trainer = Trainer(cfg)
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    params = dict(trainer.params)
    params["params"] = torch_state_dict_to_params(
        state, trainer.params["params"]
    )
    trainer.params = params
    import os

    trainer.ckpt.ckpt_dir = os.path.abspath(out_dir)
    os.makedirs(trainer.ckpt.ckpt_dir, exist_ok=True)
    trainer.ckpt.save(
        trainer.params, trainer.opt_state, step=0, epoch=0, metric_value=None
    )
    log.info(f"converted {ckpt_path} -> {out_dir}/last")


if __name__ == "__main__":
    main()
