"""Profile the ml-20m-hstu-long padded train step and dump the FULL
per-op table (VERDICT r4 item 5: the ~24 ms broad tail was never
itemized below 'embedding grads ~2 ms, elementwise ~3 ms, rest small').

Usage: PYTHONPATH=/root/.axon_site python benchmarks/long_n_trace.py
Writes the trace under /tmp/long_n_trace and prints the top-op table via
trace_summary (sync compute ops; async DMA listed separately).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench import make_batch
from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

STEPS = 4


def main():
    cfg = get_preset("ml-20m-hstu-long")
    resolve(cfg, cfg.data.expected_max_item_id)
    b, l = cfg.data.batch_size, cfg.data.max_sequence_length
    rng_np = np.random.default_rng(0)
    batch = make_batch(b, l, cfg.data.expected_max_item_id)
    lengths = np.clip(rng_np.lognormal(4.6, 0.9, size=b).astype(np.int32), 20, l)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng_np.integers(1, cfg.data.expected_max_item_id, size=n)
        ts[i, :n] = np.sort(978_000_000 + rng_np.integers(0, 10**8, size=n))
    batch.update(lengths=lengths, ids=ids, timestamps=ts)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = jax.jit(model.init)({"params": rng, "dropout": rng}, seq)
    all_item_ids = np.sort(
        np.random.default_rng(0).choice(
            np.arange(1, cfg.data.expected_max_item_id + 1),
            size=cfg.data.expected_num_unique_items, replace=False,
        )
    ).astype(np.int32)
    tx = build_optimizer(cfg.optimizer1, None, params, cfg.optimizer1.lr, 0.0)
    opt_state = jax.jit(tx.init)(params)
    train_step = make_train_step(model, cfg, all_item_ids)
    dev = jax.device_put(batch)
    lr1, lr2 = cfg.optimizer1.lr, cfg.optimizer2.lr
    for _ in range(2):
        params, opt_state, loss = train_step(params, opt_state, dev, rng, lr1, lr2)
    print(f"warm loss {float(loss):.4f}", file=sys.stderr)

    out_dir = "/tmp/long_n_trace"
    jax.profiler.start_trace(out_dir)
    for _ in range(STEPS):
        params, opt_state, loss = train_step(params, opt_state, dev, rng, lr1, lr2)
    final = float(loss)
    jax.profiler.stop_trace()
    print(f"traced {STEPS} steps (loss {final:.4f})", file=sys.stderr)

    import glob
    import subprocess

    pbs = sorted(
        glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "trace_summary.py"),
         pbs[-1], "60"],
        check=True,
    )


if __name__ == "__main__":
    main()
