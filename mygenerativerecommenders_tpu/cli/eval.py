"""Eval entry point (reference: scripts/eval.py): requires ckpt_path."""

from __future__ import annotations

import sys

from mygenerativerecommenders_tpu.cli.train import maybe_init_distributed, parse_args
from mygenerativerecommenders_tpu.train.driver import Trainer
from mygenerativerecommenders_tpu.train.loggers import RankedLogger

log = RankedLogger(__name__)


def main(argv: list[str] | None = None):
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    if not cfg.trainer.ckpt_path:
        raise ValueError("trainer.ckpt_path=<dir> is required for eval")
    maybe_init_distributed(cfg)
    trainer = Trainer(cfg)
    try:
        results = trainer.test(cfg.trainer.ckpt_path)
    finally:
        trainer.close()
    log.info(f"test: {results}")
    return results


if __name__ == "__main__":
    main()
