"""Offline ETL entry point (reference: scripts/prepare_data.py)."""

from __future__ import annotations

import sys

from mygenerativerecommenders_tpu.cli.train import parse_args
from mygenerativerecommenders_tpu.data.dataset import RecoData
from mygenerativerecommenders_tpu.train.loggers import RankedLogger

log = RankedLogger(__name__)


def main(argv: list[str] | None = None):
    cfg = parse_args(argv if argv is not None else sys.argv[1:])
    data = RecoData(cfg.data, seed=cfg.trainer.seed)
    log.info(
        f"prepared {cfg.data.dataset_name}: "
        f"{len(data.all_item_ids)} items (max id {data.max_item_id}) -> "
        f"{data.processor.output_format_csv()}"
    )


if __name__ == "__main__":
    main()
