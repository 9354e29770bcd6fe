"""Predict entry point (reference: scripts/predict.py): writes top-k
predictions joined onto the test split CSV."""

from __future__ import annotations

import os
import sys

import pandas as pd

from mygenerativerecommenders_tpu.cli.train import maybe_init_distributed, parse_args
from mygenerativerecommenders_tpu.train.driver import Trainer
from mygenerativerecommenders_tpu.train.loggers import RankedLogger

log = RankedLogger(__name__)


def main(argv: list[str] | None = None):
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    maybe_init_distributed(cfg)
    trainer = Trainer(cfg)
    try:
        if cfg.trainer.ckpt_path:
            trainer.params = trainer.ckpt.restore(
                cfg.trainer.ckpt_path,
                {"params": trainer.params, "opt_state": trainer.opt_state},
            )["params"]
        predictions = trainer.predict()
    finally:
        trainer.close()
    # join onto the sequence frame (reco_dataset.py:454-469)
    frame = pd.read_csv(trainer.data.processor.output_format_csv())
    for key, value in predictions.items():
        frame[key] = [str(v) for v in value]
    out = os.path.join(trainer.out_dir, "predictions.csv")
    os.makedirs(trainer.out_dir, exist_ok=True)
    frame.to_csv(out, index=False)
    log.info(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
