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
  packed    — the ml-1m recipe with data.pack_sequences off vs on (same
              seed/epochs): packing changes batch COMPOSITION (segments
              share rows; per-position negative RNG stream differs), so
              its metric band must be shown before the preset enables it
              (VERDICT r2 item 3 analog for packing).
  batching_long — the ml-20m-hstu-long recipe padded vs length-bucketed
              vs packed (same seed/epochs): validates that the 4x
              bucketed and 4.7x packed throughput paths converge inside
              the padded band (VERDICT r2 item 3).

Usage: python benchmarks/quality_bands.py lazy|long|packed|batching_long [epochs]
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
    elif study == "packed":
        base = [
            "data.dataset_name=synthetic",
            f"trainer.max_epochs={epochs}",
            "trainer.output_dir=tmp/quality_packed",
        ]
        for mode in ("off", "on"):
            ov = base + [f"data.pack_sequences={mode == 'on'}"]
            res = run("ml-1m-hstu", ov)
            out[f"packed_{mode}"] = res
            print(f"# packed={mode}: {res}", file=sys.stderr, flush=True)
    elif study == "batching_long":
        base = [
            "data.dataset_name=synthetic-long",
            "data.synthetic_max_seq_len=1024",
            "data.synthetic_num_users=1024",
            f"trainer.max_epochs={epochs}",
            "trainer.output_dir=tmp/quality_batching_long",
        ]
        # the preset defaults to packing since r3 — the padded/bucketed
        # arms switch it off explicitly
        arms = {
            "padded": ["data.pack_sequences=false"],
            "bucketed": [
                "data.pack_sequences=false",
                "data.length_buckets=[128,256,512,1024]",
            ],
            "packed": [
                "data.pack_sequences=true",
                "data.pack_capacities=[256,512,1024,1152]",
            ],
        }
        for name, extra in arms.items():
            res = run("ml-20m-hstu-long", base + extra)
            out[name] = res
            print(f"# {name}: {res}", file=sys.stderr, flush=True)
    elif study == "recipes":
        # aux preprocessor / in-batch sampler / SASRec convergence bands
        # on the same ml-1m-shaped synthetic study as the AdamW baseline
        # (VERDICT r2 item 7: these were validated only as smokes)
        base = [
            "data.dataset_name=synthetic",
            f"trainer.max_epochs={epochs}",
            "trainer.output_dir=tmp/quality_recipes",
        ]
        arms = {
            # synthetic zip codes span [0, 100) (data/preprocessor.py)
            "aux": ("ml-1m-hstu-aux", [
                "model.preprocessor.categorical_dims=[2,7,21,100]",
                "model.preprocessor.categorical_embedding_dims=[0,0,0,8]",
            ]),
            "inbatch": ("ml-1m-hstu", ["model.sampler.kind=in_batch"]),
            "sasrec": ("ml-1m-sasrec", []),
        }
        for name, (preset, extra) in arms.items():
            res = run(preset, base + extra)
            out[name] = res
            print(f"# {name}: {res}", file=sys.stderr, flush=True)
    else:
        raise SystemExit(f"unknown study {study}")
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
