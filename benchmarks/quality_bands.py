"""Convergence-band studies for opt-in recipe variants (real backend).

Runs a named study to convergence on synthetic data and prints the final
test metrics, extending PARITY.md's recipe-validation table:

  lazy      — embedding.lazy_update on vs off (shared-negatives loss,
              R=1024): lazy sparse-row AdamW is an algorithm change
              (no decay/momentum on untouched rows), so its metric band
              must be shown, not assumed (VERDICT round-1 item 7).
  long      — the ml-20m-hstu-long recipe (N=1024, 8 blocks) on
              ml-20m-shaped synthetic data: the long-config RECIPE (not
              just its kernels) gets a quality band (item 9).

Usage: python benchmarks/quality_bands.py lazy|long [epochs]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mygenerativerecommenders_tpu.configs import apply_overrides
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.train.driver import Trainer, enable_compilation_cache


def run(preset: str, overrides: list[str]):
    cfg = get_preset(preset)
    apply_overrides(cfg, overrides)
    trainer = Trainer(cfg)
    trainer.fit()
    results = trainer.test()
    return results


def main():
    study = sys.argv[1] if len(sys.argv) > 1 else "lazy"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    enable_compilation_cache("~/.cache/mygenerativerecommenders_tpu/xla")
    out = {}
    if study == "lazy":
        base = [
            "data.dataset_name=synthetic",
            "model.loss.shared_negatives=true",
            "model.loss.num_to_sample=1024",
            f"trainer.max_epochs={epochs}",
            "trainer.output_dir=tmp/quality_lazy",
        ]
        for mode in ("off", "on"):
            ov = base + [f"model.embedding.lazy_update={mode == 'on'}"]
            res = run("ml-1m-hstu", ov)
            out[f"lazy_{mode}"] = res
            print(f"# lazy_update={mode}: {res}", file=sys.stderr, flush=True)
    elif study == "long":
        ov = [
            "data.dataset_name=synthetic-long",
            "data.synthetic_max_seq_len=1024",
            "data.synthetic_num_users=1024",
            f"trainer.max_epochs={epochs}",
            "trainer.output_dir=tmp/quality_long",
        ]
        res = run("ml-20m-hstu-long", ov)
        out["long"] = res
        print(f"# long: {res}", file=sys.stderr, flush=True)
    else:
        raise SystemExit(f"unknown study {study}")
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
