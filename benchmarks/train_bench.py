"""Train-step throughput at an arbitrary preset (real backend).

Usage: python benchmarks/train_bench.py [preset] [key=value overrides...]

Examples:
  python benchmarks/train_bench.py ml-1m-hstu
  python benchmarks/train_bench.py ml-20m-hstu model.loss.dense_catalog_negatives=true

Prints step-time and examples/s/chip. Unlike bench.py (the official
driver-run single-line bench) this is an exploration tool: any preset,
dotted overrides, optional xplane trace dump via TRACE_DIR env.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_batch  # noqa: E402


def main():
    import jax

    from mygenerativerecommenders_tpu.configs import apply_overrides, resolve
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
    from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    preset = sys.argv[1] if len(sys.argv) > 1 else "ml-1m-hstu"
    overrides = [a for a in sys.argv[2:] if "=" in a]
    cfg = get_preset(preset)
    if overrides:
        apply_overrides(cfg, overrides)
    resolve(cfg, cfg.data.expected_max_item_id)

    b = cfg.data.batch_size
    l = cfg.data.max_sequence_length
    num_items = cfg.data.expected_max_item_id
    batch = make_batch(b, l, num_items)

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = jax.jit(model.init)({"params": rng, "dropout": rng}, seq)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"# preset={preset} B={b} N={l}+{cfg.model.gr_output_length + 1} "
          f"X={cfg.data.expected_num_unique_items} blocks={cfg.model.encoder.num_blocks} "
          f"heads={cfg.model.encoder.num_heads} params={n_params/1e6:.2f}M",
          flush=True)

    all_item_ids = np.arange(1, cfg.data.expected_max_item_id + 1, dtype=np.int32)
    if cfg.data.expected_num_unique_items < cfg.data.expected_max_item_id:
        # sparse-id catalogs (ml-20m): sample the unique-item subset
        rs = np.random.default_rng(0)
        all_item_ids = np.sort(
            rs.choice(
                np.arange(1, cfg.data.expected_max_item_id + 1),
                size=cfg.data.expected_num_unique_items,
                replace=False,
            )
        ).astype(np.int32)
    if cfg.model.embedding.lazy_update:
        import functools

        from mygenerativerecommenders_tpu.train.lazy_embedding import (
            init_lazy_opt_state,
        )

        opt_state = jax.jit(functools.partial(init_lazy_opt_state, cfg))(params)
    else:
        tx = build_optimizer(cfg.optimizer1, None, params, cfg.optimizer1.lr, 0.0)
        opt_state = jax.jit(tx.init)(params)
    train_step = make_train_step(model, cfg, all_item_ids)

    dev_batch = jax.device_put(batch)
    lr1, lr2 = cfg.optimizer1.lr, cfg.optimizer2.lr
    t0 = time.perf_counter()
    for _ in range(3):
        params, opt_state, loss = train_step(params, opt_state, dev_batch, rng, lr1, lr2)
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s loss={float(loss):.4f}",
          flush=True)

    trace_dir = os.environ.get("TRACE_DIR")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    steps = int(os.environ.get("STEPS", "20"))
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = train_step(params, opt_state, dev_batch, rng, lr1, lr2)
    final = float(loss)  # host pull guarantees completion (tunnel quirk)
    dt = time.perf_counter() - t0
    if trace_dir:
        jax.profiler.stop_trace()
    print(
        f"step {1e3 * dt / steps:.2f} ms  {b * steps / dt:.0f} ex/s/chip  "
        f"(final loss {final:.4f})"
    )


if __name__ == "__main__":
    main()
