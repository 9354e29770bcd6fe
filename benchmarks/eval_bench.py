"""Retrieval/serving benchmarks: eval-step QPS and top-k MIPS QPS.

Usage: python benchmarks/eval_bench.py [num_items]
Prints JSON lines for: full eval step (forward + filtered top-k) and
raw MIPS top-k over the catalog. (Decode-step latency is benchmarked
by tests/test_decode.py's timing and the serving service.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mygenerativerecommenders_tpu.configs import resolve
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.ops.topk import mips_top_k
    from mygenerativerecommenders_tpu.train.task_retrieval import (
        make_candidate_fn,
        make_eval_step,
    )
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch
    from bench import make_batch

    num_items = int(sys.argv[1]) if len(sys.argv) > 1 else 3952
    b = 128
    batch = make_batch(b, 200, num_items)
    rng = jax.random.PRNGKey(0)
    cfg = get_preset("ml-1m-hstu")
    cfg.data.expected_max_item_id = num_items
    cfg.data.expected_num_unique_items = num_items
    resolve(cfg, num_items)
    model = build_model(cfg)
    seq, _, _ = seq_features_from_batch(batch, 11)
    params = jax.jit(
        lambda r, s: model.init({"params": r, "dropout": r}, s, method=model.init_all)
    )(rng, seq)
    all_ids = np.arange(1, num_items + 1, dtype=np.int32)
    eval_step = make_eval_step(model, cfg, all_ids, num_items)
    candidate_fn = make_candidate_fn(model, cfg, all_ids)
    dev = jax.device_put(batch)

    candidates = candidate_fn(params)
    ids, scores = eval_step(params, dev, candidates)
    float(scores.sum())
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        ids, scores = eval_step(params, dev, candidates)
    float(scores.sum())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "eval_step_queries_per_sec",
        "value": round(b * n / dt, 1),
        "unit": f"q/s (X={num_items}, fwd+filtered top-200)",
    }))

    # raw MIPS top-k only
    queries = jax.device_put(
        np.random.default_rng(0).normal(size=(b, 50)).astype(np.float32)
    )
    cat_ids = jnp.asarray(all_ids)
    out = mips_top_k(queries, candidates, cat_ids, k=200, max_item_id=num_items)
    float(out[1].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = mips_top_k(queries, candidates, cat_ids, k=200, max_item_id=num_items)
    float(out[1].sum())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "mips_topk_queries_per_sec",
        "value": round(b * n / dt, 1),
        "unit": f"q/s (X={num_items}, k=200)",
    }))


if __name__ == "__main__":
    main()
