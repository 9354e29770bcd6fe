"""Grid hyper-parameter sweep over any dotted config keys.

The reference reserves a Hydra `hparams_search/` config group and returns
a monitored metric from train() for an optuna sweeper to consume
(scripts/train.py:87-91, utils/instantiators.py get_metric_value); the
group ships empty. This is the dependency-free equivalent: a cartesian
grid driver over the same dotted-override syntax, reusing cli.train's
metric return.

Usage:
  python -m mygenerativerecommenders_tpu.cli.sweep experiment=ml-1m-hstu \
      sweep.optimizer1.lr=1e-3,5e-4 sweep.model.encoder.num_blocks=2,4 \
      trainer.max_epochs=30

`sweep.<dotted.key>=v1,v2,...` args define the grid axes; every other
arg is passed through to each run unchanged. Each combination trains in
its own `<output_dir>/sweep_<i>` directory; results land in
`<output_dir>/sweep_results.csv` with the best row logged last (best =
per trainer.mode on trainer.monitor, as in the early-stop controller).
"""

from __future__ import annotations

import csv
import itertools
import os
import sys

from mygenerativerecommenders_tpu.cli.train import main as train_main
from mygenerativerecommenders_tpu.cli.train import parse_args
from mygenerativerecommenders_tpu.train.loggers import RankedLogger

log = RankedLogger(__name__)


def split_sweep_args(argv: list[str]):
    """(grid axes in declaration order, passthrough args)."""
    grid: dict[str, list[str]] = {}
    fixed: list[str] = []
    for arg in argv:
        if arg.startswith("sweep."):
            key, _, values = arg[len("sweep."):].partition("=")
            if not values:
                raise ValueError(f"sweep axis needs values: {arg!r}")
            grid[key] = values.split(",")
        else:
            fixed.append(arg)
    if not grid:
        raise ValueError(
            "no sweep axes given — add at least one sweep.<dotted.key>=v1,v2"
        )
    return grid, fixed


def main(argv: list[str] | None = None) -> dict:
    grid, fixed = split_sweep_args(
        list(sys.argv[1:] if argv is None else argv)
    )
    base_cfg = parse_args(list(fixed))  # validates passthrough overrides
    out_dir = base_cfg.trainer.output_dir
    mode = base_cfg.trainer.mode
    keys = list(grid)

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "sweep_results.csv")
    rows = []
    # each row is flushed as its run finishes, so a crashed/interrupted
    # combination never loses the completed runs' metrics
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["run", *keys, "metric"])
        writer.writeheader()
        for i, combo in enumerate(itertools.product(*grid.values())):
            overrides = fixed + [f"{k}={v}" for k, v in zip(keys, combo)] + [
                f"trainer.output_dir={os.path.join(out_dir, f'sweep_{i}')}"
            ]
            log.info(f"sweep run {i}: {dict(zip(keys, combo))}")
            metric = train_main(overrides)
            row = {**dict(zip(keys, combo)), "metric": metric, "run": i}
            rows.append(row)
            writer.writerow(row)
            f.flush()
            log.info(f"sweep run {i}: {base_cfg.trainer.monitor} = {metric:.6f}")

    best = (max if mode == "max" else min)(rows, key=lambda r: r["metric"])
    log.info(f"wrote {csv_path}")
    log.info(
        f"best ({base_cfg.trainer.monitor}, mode={mode}): "
        f"run {best['run']} {({k: best[k] for k in keys})} -> {best['metric']:.6f}"
    )
    return best


if __name__ == "__main__":
    main()
