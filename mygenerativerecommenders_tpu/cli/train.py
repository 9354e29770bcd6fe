"""Train entry point (reference: scripts/train.py).

Usage:
  python -m mygenerativerecommenders_tpu.cli.train experiment=ml-1m-hstu \
      trainer.max_epochs=50 model.encoder.num_blocks=4

The first `experiment=<preset>` override picks the preset (default
ml-1m-hstu); remaining dotted overrides are applied on top — the same
ergonomics as Hydra's `experiment=` + CLI override flow, without Hydra.
"""

from __future__ import annotations

import json
import sys

from mygenerativerecommenders_tpu.configs import apply_overrides, to_dict
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.train.driver import Trainer
from mygenerativerecommenders_tpu.train.loggers import RankedLogger

log = RankedLogger(__name__)


def parse_args(argv: list[str]):
    preset = "ml-1m-hstu"
    overrides = []
    for arg in argv:
        if arg.startswith("experiment="):
            preset = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    cfg = get_preset(preset)
    apply_overrides(cfg, overrides)
    return cfg


def maybe_init_distributed(cfg) -> None:
    """Multi-host startup: one jax.distributed.initialize() per host
    BEFORE first backend use (coordinator/process env auto-discovery).
    The reference delegates this rank bootstrap to Lightning DDP
    (configs/trainer/ddp.yaml); here it is an explicit trainer flag."""
    if cfg.trainer.distributed:
        import jax

        try:
            jax.distributed.initialize()
        except RuntimeError as e:  # already initialized (repeated main())
            log.info(f"jax.distributed.initialize skipped: {e}")


def main(argv: list[str] | None = None) -> float:
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    maybe_init_distributed(cfg)
    log.info(f"config: {json.dumps(to_dict(cfg), default=str)}")
    trainer = Trainer(cfg)
    try:
        results = trainer.fit()
        test_results = trainer.test()
    finally:
        # restore global state (the ambient mesh) — in-process callers
        # like cli.sweep run many Trainers in one interpreter
        trainer.close()
    log.info(f"test: {test_results}")
    monitor_key = cfg.trainer.monitor.split("/", 1)[-1]
    return results.get(monitor_key, 0.0)


if __name__ == "__main__":
    main()
