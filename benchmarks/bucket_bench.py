"""Length-bucketed batching end-to-end step bench at ml-20m-hstu-long.

Measures a full epoch of real train steps fed by the actual BatchLoader
on a realistic ml-20m length distribution (clipped lognormal, mean ~144,
max 1024), with and without data.length_buckets — the "no padding waste"
number VERDICT asked for (skip-compute multiple, not percent).

Usage: python benchmarks/bucket_bench.py [users] [batch_size]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(users, max_len, num_items, seed=0):
    from mygenerativerecommenders_tpu.data.dataset import SequenceDataset

    rng = np.random.default_rng(seed)
    # ml-20m-like: lognormal(4.6, 0.9) clipped -> mean ~150
    lengths = np.clip(rng.lognormal(4.6, 0.9, size=users).astype(np.int32), 20, max_len)
    ids = np.zeros((users, max_len), dtype=np.int32)
    ts = np.zeros((users, max_len), dtype=np.int32)
    base = 978_000_000
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, num_items, size=n)
        ts[i, :n] = np.sort(base + rng.integers(0, 10**8, size=n))
    return SequenceDataset(
        lengths=lengths,
        ids=ids,
        ratings=rng.integers(1, 6, size=(users, max_len)).astype(np.int32),
        timestamps=ts,
        target_id=rng.integers(1, num_items, size=users).astype(np.int32),
        target_rating=rng.integers(1, 6, size=users).astype(np.int32),
        target_timestamp=(ts.max(axis=1) + 100).astype(np.int32),
        user_ids=np.arange(users),
        additional={},
    )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mygenerativerecommenders_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mygenerativerecommenders_tpu.configs import apply_overrides, resolve
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.data.dataset import BatchLoader
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
    from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    users = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = get_preset("ml-20m-hstu-long")
    if len(sys.argv) > 2:
        cfg.data.batch_size = int(sys.argv[2])
    overrides = [a for a in sys.argv[3:] if "=" in a]
    if overrides:
        apply_overrides(cfg, overrides)
    resolve(cfg, cfg.data.expected_max_item_id)
    b, l = cfg.data.batch_size, cfg.data.max_sequence_length
    ds = make_dataset(users, l, cfg.data.expected_max_item_id)
    print(f"# users={users} B={b} N={l} mean_len={ds.lengths.mean():.1f}", flush=True)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    probe = next(iter(BatchLoader(ds, batch_size=b)))
    seq, _, _ = seq_features_from_batch(probe, cfg.model.gr_output_length + 1)
    params = jax.jit(model.init)({"params": rng, "dropout": rng}, seq)
    all_item_ids = np.sort(
        np.random.default_rng(0).choice(
            np.arange(1, cfg.data.expected_max_item_id + 1),
            size=cfg.data.expected_num_unique_items,
            replace=False,
        )
    ).astype(np.int32)
    tx = build_optimizer(cfg.optimizer1, None, params, cfg.optimizer1.lr, 0.0)
    opt_state = jax.jit(tx.init)(params)
    train_step = make_train_step(model, cfg, all_item_ids)
    lr1, lr2 = cfg.optimizer1.lr, cfg.optimizer2.lr
    # the step donates params/opt_state; keep host snapshots so each
    # variant starts from fresh (undeleted) device arrays
    params_h = jax.device_get(params)
    opt_state_h = jax.device_get(opt_state)

    variants = [("padded", None), ("bucketed", [128, 256, 512, 1024])]
    pick = os.environ.get("VARIANT")
    if pick:
        variants = [v for v in variants if v[0] == pick]
    results = {}
    for name, buckets in variants:
        loader = BatchLoader(ds, batch_size=b, shuffle=True, seed=1, buckets=buckets)
        p, o = jax.device_put(params_h), jax.device_put(opt_state_h)
        # epoch 0: compile all bucket shapes
        t0 = time.perf_counter()
        seen = set()
        for i, batch in enumerate(loader):
            db = jax.device_put(batch)
            p, o, loss = train_step(p, o, db, rng, lr1, lr2)
            if i % 8 == 7:
                float(loss)
            shape = batch["ids"].shape
            if shape not in seen:
                seen.add(shape)
                float(loss)  # host pull: block_until_ready is a no-op over the axon tunnel
                print(f"#   {name} compiled {shape} at +{time.perf_counter() - t0:.0f}s", flush=True)
        float(loss)
        print(f"# {name} warm epoch done +{time.perf_counter() - t0:.0f}s", flush=True)
        # epoch 1: timed, device-feed prefetched like the driver
        batches = [jax.device_put(x) for x in loader]
        n_ex = users
        t0 = time.perf_counter()
        for i, db in enumerate(batches):
            p, o, loss = train_step(p, o, db, rng, lr1, lr2)
            if i % 8 == 7:
                float(loss)  # bound the dispatch queue (deep queues abort the tunnel)
        final = float(loss)  # host pull guarantees completion (tunnel quirk)
        dt = time.perf_counter() - t0
        results[name] = n_ex / dt
        print(
            f"{name:9s} epoch {dt * 1e3:8.1f} ms  {n_ex / dt:8.0f} ex/s/chip  "
            f"({len(batches)} steps, final loss {final:.4f})",
            flush=True,
        )
    if len(results) == 2:
        print(f"speedup: {results['bucketed'] / results['padded']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
