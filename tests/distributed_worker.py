"""Worker process for the 2-process DDP-sim integration test (the analog
of the reference's configs/trainer/ddp_sim.yaml 2-process CPU DDP).

Launched by tests/test_distributed.py as:
  python tests/distributed_worker.py <coordinator> <process_id> <num_procs> \
      <data_dir> <out_json>

Each process gets 4 virtual CPU devices (global mesh: num_procs * 4);
runs 2 epochs of synthetic-smoke training + val/test eval through the
REAL multi-process paths (make_array_from_process_local_data, padded
process_allgather, per-process loader sharding), then writes its view of
the metrics to <out_json>. The parent asserts all processes agree and
that metrics match a single-process 8-device run of the same recipe.
"""

import json
import os
import sys


def main():
    coordinator, pid, nprocs, data_dir, out_json = sys.argv[1:6]
    packed = len(sys.argv) > 6 and sys.argv[6] == "packed"
    pid, nprocs = int(pid), int(nprocs)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=nprocs,
        process_id=pid,
        local_device_ids=list(range(4)),
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.data_dir = data_dir
    # per-process batch: global 16 split across 2 processes
    cfg.data.batch_size = 16 // nprocs
    cfg.trainer.output_dir = os.path.join(data_dir, f"out_p{pid}")
    cfg.trainer.max_epochs = 2
    cfg.trainer.min_epochs = 1
    cfg.trainer.distributed = True
    cfg.data.pack_sequences = packed

    trainer = Trainer(cfg)
    try:
        final_loss = None
        train_loader = trainer._loader("train", packed=trainer._packed)
        for trainer.epoch in range(cfg.trainer.max_epochs):
            final_loss = trainer.train_epoch(train_loader)
        val = trainer.eval_epoch(trainer._loader("val"), "val")
        test = trainer.eval_epoch(trainer._loader("test"), "test")
    finally:
        trainer.close()

    with open(out_json, "w") as f:
        json.dump(
            {
                "process": pid,
                "train_loss": float(final_loss),
                "val": {k: float(v) for k, v in val.items()},
                "test": {k: float(v) for k, v in test.items()},
            },
            f,
        )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
