"""Ring chunk kernel: fused Pallas backward vs the jnp chunk body.

Measures ONE ring step's per-device work (local queries x one visiting
K/V chunk) at ml-20m-hstu-long shapes on the real TPU chip — the
single-chip proxy for the multi-chip ring step (the ring adds only the
ppermute around this product). Arms:

  jnp    — the chunk body parallel/ring_attention.py falls back to
           (materializes [B, H, Nq, Nc] attention + Kronecker-one-hot
           bias grads: the pre-r5 custom_vjp's cost model)
  pallas — ops/pallas/hstu_chunk.py fused fwd + fused bwd (in-kernel
           dq/dk/dv + diagonal-skew d_pos_w + bucket-sweep d_ts_w)

Run: PYTHONPATH=/root/.axon_site python benchmarks/ring_chunk_bench.py
Prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ml-20m-hstu-long per-device ring-step shape: N=1024 split over sp=2
# (zigzag halves of 512 visit as 512-col chunks), B=32, H=2, D=64
B, NQ, NC, H, D, DV = 32, 512, 512, 2, 64, 64
N_GLOBAL = 1024
NUM_BUCKETS = 128
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from mygenerativerecommenders_tpu.parallel import ring_attention as ra

    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, NQ, H, D)).astype(np.float32)
    k = rng.normal(size=(B, NC, H, D)).astype(np.float32)
    v = rng.normal(size=(B, NC, H, DV)).astype(np.float32)
    base = 978_000_000
    ts = np.sort(rng.integers(0, 10**7, size=(B, N_GLOBAL)), axis=1).astype(
        np.int32
    ) + base
    tsq_next = np.concatenate(
        [ts[:, NQ + 1:], ts[:, -1:]], axis=1
    )[:, :NQ]  # queries are the BACK half rows (offsets 512..1023)
    tsk = ts[:, :NC]
    pos_w = (rng.normal(size=(2 * N_GLOBAL - 1,)) * 0.1).astype(np.float32)
    ts_w = (rng.normal(size=(NUM_BUCKETS + 1,)) * 0.1).astype(np.float32)
    row_off, col_off = NQ, 0  # back-queries x front-keys: fully live

    def loss(use_pallas, q, k, v, pos_w, ts_w):
        out = ra._chunk_contribution(
            q, k, v, jnp.asarray(tsq_next), jnp.asarray(tsk),
            jnp.asarray(row_off), jnp.asarray(col_off),
            pos_w, ts_w, N_GLOBAL, NUM_BUCKETS,
            use_pallas=use_pallas, interpret=False,
        )
        return (out * out).sum()

    results = {}
    for arm, use_pallas in (("jnp", False), ("pallas", True)):
        grad_fn = jax.grad(
            functools.partial(loss, use_pallas), argnums=(0, 1, 2, 3, 4)
        )

        # STEPS chunk-steps per dispatch inside lax.scan with a data
        # dependency (q feeds forward) — per-dispatch timing through the
        # axon tunnel is unreliable (replayed dispatches return at ~0
        # cost), and the scan harness also mimics the step's real XLA
        # fusion context (see PERFORMANCE.md measurement convention)
        @jax.jit
        def many(q, k, v, pos_w, ts_w):
            def body(qc, _):
                g = grad_fn(qc, k, v, pos_w, ts_w)
                return qc + 1e-6 * g[0], (g[3][0] + g[4][0])
            qf, outs = jax.lax.scan(body, q, None, length=STEPS)
            return qf.sum() + outs.sum()

        # measurement convention: (a) STEPS in-graph steps per dispatch,
        # (b) a DISTINCT q buffer per timed call, (c) sync by FETCHING
        # the scalar value — through the axon tunnel
        # jax.block_until_ready returns before device completion and
        # identical dispatches replay from cache, both of which read as
        # fake sub-dispatch step times
        arg_sets = [
            tuple(map(jnp.asarray, (q + 0.01 * i, k, v, pos_w, ts_w)))
            for i in range(4)
        ]
        float(many(*arg_sets[0]))  # compile + warm
        times = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            float(many(*arg_sets[i]))
            times.append((time.perf_counter() - t0) / STEPS * 1e3)
        results[arm] = min(times)
        print(f"# {arm}: {min(times):.2f} ms/chunk-step (fwd+bwd)",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "ring_chunk_fwdbwd_ms",
        "shape": f"B{B} Nq{NQ} Nc{NC} H{H} D{D}",
        "jnp_ms": results["jnp"],
        "pallas_ms": results["pallas"],
        "speedup": results["jnp"] / results["pallas"],
    }), flush=True)


if __name__ == "__main__":
    main()
