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

import numpy as np


def apply_mode(cfg, mode: str) -> None:
    """Configure the recipe variant under test. The sharded modes set
    mesh_data_innermost so the model/sp collective groups SPAN the two
    processes — the all-to-all / ppermute actually crosses a real process
    boundary (VERDICT r3 item 5; SURVEY §7 hard-part 6)."""
    if mode == "packed":
        cfg.data.pack_sequences = True
        cfg.data.pack_eval = "true"  # short-N smoke: force the packed eval path under test
    elif mode == "a2a_tp":
        cfg.model.embedding.kind = "sharded_a2a"
        cfg.model.embedding.num_shards = 2
        cfg.model.encoder.tp_shards = 2
        cfg.trainer.mesh_data_innermost = True
        # with the data axis innermost every process loads the identical
        # FULL global batch (Trainer._loader_sharding)
        cfg.data.batch_size = 16
    elif mode == "ring":
        cfg.model.encoder.sp_shards = 2
        cfg.model.encoder.sp_zigzag = True
        cfg.trainer.mesh_data_innermost = True
        cfg.data.batch_size = 16
    elif mode == "packed_sharded":
        # the full r5 composition: packed train AND packed eval driving
        # the row-sharded candidate index (per-shard top-k + merge) with
        # BATCHED eval dispatch (steps_per_call stacked batches/call),
        # the model axis spanning the two processes
        cfg.data.pack_sequences = True
        cfg.data.pack_eval = "true"  # short-N smoke: force the packed eval path under test
        cfg.model.embedding.kind = "sharded_a2a"
        cfg.model.embedding.num_shards = 2
        cfg.trainer.mesh_data_innermost = True
        cfg.data.batch_size = 16
        cfg.trainer.steps_per_call = 2
    elif mode != "padded":
        raise ValueError(f"unknown mode {mode}")


def main():
    coordinator, pid, nprocs, data_dir, out_json = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "padded"
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
    apply_mode(cfg, mode)

    trainer = Trainer(cfg)
    if mode in ("a2a_tp", "ring", "packed_sharded"):
        # the sharded axis must REALLY span the two processes
        axis = "sp" if mode == "ring" else "model"
        ax_idx = list(trainer.mesh.axis_names).index(axis)
        spine = np.moveaxis(trainer.mesh.devices, ax_idx, 0).reshape(
            trainer.mesh.shape[axis], -1
        )
        procs_along_axis = {d.process_index for d in spine[:, 0]}
        assert len(procs_along_axis) == nprocs, (
            f"{axis} axis does not cross processes: {procs_along_axis}"
        )
    try:
        final_loss = None
        train_loader = trainer._loader("train", packed=trainer._packed)
        for trainer.epoch in range(cfg.trainer.max_epochs):
            final_loss = trainer.train_epoch(train_loader)
        # packed mode also exercises the MULTI-HOST packed eval path
        # (per-segment fields cross make_array_from_process_local_data)
        ep = getattr(trainer, "_eval_packed", False)
        val = trainer.eval_epoch(trainer._loader("val", packed=ep), "val")
        test = trainer.eval_epoch(trainer._loader("test", packed=ep), "test")
        if ep:
            # the packed eval is EXACT vs unpacked — a tight equality
            # here catches cross-process index bugs (the per-segment
            # query gather addresses the jit-global encoded array) that
            # the loose single-vs-2-process tolerance would miss
            val_u = trainer.eval_epoch(trainer._loader("val"), "val")
            for k, v in val_u.items():
                assert abs(val[k] - v) < 1e-6, (k, val[k], v)
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
