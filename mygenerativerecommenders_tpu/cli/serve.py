"""Serving entry point: HTTP retrieval/generation service from a checkpoint.

No reference counterpart (its surface stops at offline scripts/predict.py);
this is the online half of the serving story. Usage:

  python -m mygenerativerecommenders_tpu.cli.serve experiment=<preset> \\
      trainer.ckpt_path=<ckpt dir> serve.port=8000 serve.batch_size=32

Extra dotted overrides accepted under `serve.`: host, port, batch_size.
"""

from __future__ import annotations

import sys

from mygenerativerecommenders_tpu.cli.train import parse_args
from mygenerativerecommenders_tpu.serving.service import (
    RecommenderHTTPServer,
    ServingEngine,
)
from mygenerativerecommenders_tpu.train.driver import Trainer
from mygenerativerecommenders_tpu.train.loggers import RankedLogger

log = RankedLogger(__name__)


def _pop_serve_overrides(argv: list[str]) -> tuple[list[str], dict]:
    opts = {"host": "127.0.0.1", "port": 8000, "batch_size": 32}
    rest = []
    for arg in argv:
        if arg.startswith("serve.") and "=" in arg:
            key, value = arg[len("serve."):].split("=", 1)
            if key not in opts:
                raise ValueError(
                    f"unknown serve option {key!r}; expected one of {sorted(opts)}"
                )
            opts[key] = type(opts[key])(value)
        else:
            rest.append(arg)
    return rest, opts


def build_engine(argv: list[str] | None = None):
    argv, opts = _pop_serve_overrides(
        argv if argv is not None else sys.argv[1:]
    )
    cfg = parse_args(argv)
    if not cfg.trainer.ckpt_path:
        raise ValueError("trainer.ckpt_path=<dir> is required for serving")
    trainer = Trainer(cfg)
    trainer.params = trainer.ckpt.restore(
        cfg.trainer.ckpt_path,
        {"params": trainer.params, "opt_state": trainer.opt_state},
    )["params"]
    engine = ServingEngine(
        trainer.model,
        trainer.params,
        cfg,
        trainer.all_item_ids,
        trainer.data.max_item_id,
        batch_size=opts["batch_size"],
        mesh=trainer.mesh,
    )
    return engine, opts


def main(argv: list[str] | None = None):
    engine, opts = build_engine(argv)
    server = RecommenderHTTPServer(engine, opts["host"], opts["port"])
    log.info(
        f"serving on http://{server.host}:{server.port} "
        f"(batch_size={engine.batch_size}, catalog={len(engine.all_item_ids)})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
