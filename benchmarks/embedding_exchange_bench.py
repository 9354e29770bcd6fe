"""psum-broadcast vs owner-routed all-to-all embedding lookup comparison.

Usage:  PYTHONPATH=. python benchmarks/embedding_exchange_bench.py [--devices 8]

Compares the two MODEL-PATH sharded-table kinds (embedding.kind=
sharded_local vs sharded_a2a, models/embeddings.py) at amzn-books-shaped
sizes (B=128, N=523 incl. output slots, D=64, vocab 2M): forward+backward
wall time on the virtual CPU mesh, plus the ANALYTIC per-device exchange
bytes — the number that matters on real ICI, where the wire is the
bottleneck (CPU-mesh wall time shares address space, so it understates
the separation). With n_l = B*N / data_shards requests per data group,
R = model shards, f = capacity_factor:

  psum  (sharded_local): ring all-reduce of the [n_l, D] f32 buffer over
        the model axis -> 2*(R-1)/R * n_l*D*4 bytes per device,
        independent of R for large R; every shard also GATHERS all n_l
        rows (R-fold redundant HBM work).
  a2a   (sharded_a2a): each shard routes its n_l/R request slice — ids
        out n_l/R*f*4, rows back n_l/R*f*D*4 — then one tiled all_gather
        (R-1)/R*n_l*D*4 reassembles. Total ≈ (1/2 + f/(2R)) of psum's
        bytes and 1/R of its gather work.

Emits one JSON line for the bench trail.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=523)  # 512 + gr_output + 1
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=2_000_000)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mygenerativerecommenders_tpu.models.embeddings import (
        ShardedA2AEmbedding,
        ShardedLocalEmbedding,
    )
    from mygenerativerecommenders_tpu.parallel.mesh import make_mesh

    data = args.devices // args.shards
    mesh = make_mesh(data=data, model=args.shards)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(1, args.vocab, size=(args.batch, args.seq)), dtype=jnp.int32
    )

    def time_module(module):
        with jax.sharding.set_mesh(mesh):
            params = module.init(jax.random.PRNGKey(0), ids[:1, :8])
            params = jax.device_put(
                params, NamedSharding(mesh, P("model", None))
            )
            ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", None)))

            g = jax.jit(
                jax.grad(lambda p, i: (module.apply(p, i) ** 2).sum())
            )
            g(params, ids_s)["params"]["item_emb"].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = g(params, ids_s)
            out["params"]["item_emb"].block_until_ready()
        return (time.perf_counter() - t0) / args.iters * 1e3

    psum_ms = time_module(
        ShardedLocalEmbedding(
            num_items=args.vocab,
            item_embedding_dim=args.dim,
            num_shards=args.shards,
        )
    )
    a2a_ms = time_module(
        ShardedA2AEmbedding(
            num_items=args.vocab,
            item_embedding_dim=args.dim,
            num_shards=args.shards,
        )
    )

    n_l = args.batch * args.seq // data  # requests per data group
    R, f = args.shards, 2.0
    psum_bytes = int(2 * (R - 1) / R * n_l * args.dim * 4)
    a2a_bytes = int(
        (R - 1) / R * (n_l / R * f) * (4 + args.dim * 4)  # ids out + rows back
        + (R - 1) / R * n_l * args.dim * 4  # model all_gather
    )
    print(
        json.dumps(
            {
                "metric": "embedding_exchange_bench",
                "shape": f"B{args.batch}xN{args.seq}xD{args.dim}, "
                f"V={args.vocab}, data={data}xmodel={R}",
                "psum_fwd_bwd_ms": round(psum_ms, 2),
                "a2a_fwd_bwd_ms": round(a2a_ms, 2),
                "psum_exchange_bytes_per_device": psum_bytes,
                "a2a_exchange_bytes_per_device": a2a_bytes,
                "bytes_ratio_psum_over_a2a": round(psum_bytes / a2a_bytes, 2),
                "gather_rows_ratio_psum_over_a2a": R,
                "unit": "ms (CPU mesh; bytes are the ICI-relevant number)",
            }
        )
    )


if __name__ == "__main__":
    main()
