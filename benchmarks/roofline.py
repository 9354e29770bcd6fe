"""Roofline / MFU accounting for the hot kernels and full train steps.

Measures wall time on the real chip and pairs every number with an
ANALYTIC count of useful FLOPs and minimal HBM bytes, so each
"near a hardware floor" claim in PERFORMANCE.md has a number vs peak
next to it (VERDICT round-1 item 3).

FLOP conventions (useful work, not padded work):
- attention fwd: 2 MXU dots per live (qi, kj) tile pair
  -> 2*BQ*BK*(Dqk + Dv) flops; live pairs counted from the per-sequence
  lengths exactly as the kernel's lax.cond skips do
  (ops/pallas/hstu_attention.py).
- attention bwd: 5 dots per live tile (qk recompute, dp, dq, dk, dv)
  -> 2*BQ*BK*(3*Dqk + 2*Dv).
- sampled-softmax lse fwd: the [BT, D] @ [D, X] logits matmul
  -> 2*BT*X*D; bwd: dq ([BT,X]@[X,D]) + dcat ([X,BT]@[BT,D]) + one
  logits recompute per bwd kernel family -> ~3x fwd per pass counted
  explicitly below.
- COUNT histogram (count_offsets_b): one-hot einsum over R samples
  -> 2*BT*R*Xpad (operands are one-hot bf16/u8 — MXU utilization is
  structurally low; that is the point of measuring it).

Peaks used (TPU v5e / "v5 lite", per chip):
  MXU bf16  197 TF/s   (f32 inputs run through the same MXU here;
                        measured in-session dense-dot ceilings are
                        ~112 TF/s f32 / ~131 TF/s bf16 at these shapes)
  HBM       819 GB/s

Usage: python benchmarks/roofline.py [--quick]
Prints a markdown table (stdout); progress notes on stderr.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_MXU = 197e12  # bf16 TPU v5e
PEAK_MXU_F32_MEASURED = 112e12  # in-session dense f32 dot ceiling
PEAK_HBM = 819e9

BQ = BK = 128


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _sync(out):
    # the axon tunnel's block_until_ready has been seen to return early
    # (see bench.py); a host pull of a concrete value guarantees the
    # device chain completed
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit_chain(step, carry, k=16, trials=3):
    """Time k chained applications of `step` inside ONE jitted call.

    One dispatch + one host pull per trial keeps the measurement robust
    to the axon tunnel's per-call latency; the carry chain (each
    iteration consumes the previous output) prevents XLA from hoisting
    loop-invariant work out of the scan. Returns min-over-trials seconds
    per application.
    """

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None, length=k)[0]

    out = run(carry)
    _sync(out)  # compile + warmup
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = run(carry)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def live_tile_pairs(lengths, n, include_dead_q=False):
    """Sum over sequences of live causal (qi, kj) tile pairs, matching the
    kernel's skip condition: kj <= qi, kj*BK < len, qi*BQ < len."""
    total = 0
    for ln in np.asarray(lengths):
        t = int(np.ceil(min(int(ln), n) / BK))
        total += t * (t + 1) // 2
    return total


def attn_flops(lengths, n, h, dqk, dv, bwd=False):
    pairs = live_tile_pairs(lengths, n)
    per_tile = 2 * BQ * BK * ((3 * dqk + 2 * dv) if bwd else (dqk + dv))
    return pairs * h * per_tile


def rand_attn_inputs(b, n, h, dqk, dv, lengths, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, n, h, dqk)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, dqk)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, dv)), jnp.float32)
    mask = (np.arange(n)[None, :] < np.asarray(lengths)[:, None]).astype(
        np.float32
    )
    q = q * mask[:, :, None, None]
    k = k * mask[:, :, None, None]
    v = v * mask[:, :, None, None]
    ts = np.sort(
        978_000_000 + rng.integers(0, 10**8, size=(b, n)), axis=1
    ).astype(np.int32)
    pos_w = jnp.asarray(rng.standard_normal(2 * n - 1) * 0.02, jnp.float32)
    ts_w = jnp.asarray(rng.standard_normal(129) * 0.02, jnp.float32)
    return q, k, v, jnp.asarray(ts), pos_w, ts_w


def bench_attention(rows, iters):
    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    cases = [
        # name, b, n, h, dqk, dv, length mode
        ("attn ml-1m (B=128,N=211,H=1,D=50)", 128, 211, 1, 50, 50, "uniform"),
        ("attn ml-20m-long full (B=32,N=1035,H=2,D=32)", 32, 1035, 2, 32, 32, "full"),
        ("attn ml-20m-long realistic (mean~157)", 32, 1035, 2, 32, 32, "lognormal"),
    ]
    rng = np.random.default_rng(0)
    for name, b, n, h, dqk, dv, mode in cases:
        if mode == "full":
            lengths = np.full(b, n, np.int32)
        elif mode == "uniform":
            lengths = rng.integers(20, n - 11, size=b).astype(np.int32)
        else:
            lengths = np.clip(
                rng.lognormal(4.6, 0.9, size=b).astype(np.int32), 20, n
            )
        q, k, v, ts, pw, tw = rand_attn_inputs(b, n, h, dqk, dv, lengths)
        ln = jnp.asarray(lengths)

        def fwd_step(qc):
            out = hstu_attention_fused(qc, k, v, ts, pw, tw, n, 128, lengths=ln)
            return qc + 1e-30 * out[..., :dqk]

        t_fwd = timeit_chain(fwd_step, q, k=iters)
        f_fwd = attn_flops(lengths, n, h, dqk, dv)
        # minimal HBM: q,k,v read once per (b,h); out written once
        bytes_fwd = 4 * b * n * h * (3 * dqk + dv) + 4 * b * n  # + ts
        rows.append((name + " fwd", t_fwd, f_fwd, bytes_fwd, "MXU/VPU"))

        def loss(qc, pwc, twc):
            return hstu_attention_fused(
                qc, k, v, ts, pwc, twc, n, 128, lengths=ln
            ).sum()

        def grad_step(carry):
            # bias-table grads included (accumulated fully in-kernel
            # since r5 — no dz buffer exists anywhere)
            qc, pwc, twc = carry
            dq, dpw, dtw = jax.grad(loss, argnums=(0, 1, 2))(qc, pwc, twc)
            return (qc + 1e-30 * dq, pwc + 1e-30 * dpw, twc + 1e-30 * dtw)

        t_full = timeit_chain(grad_step, (q, pw, tw), k=iters)
        npad = int(np.ceil(n / 128) * 128)
        f_bwd = attn_flops(lengths, n, h, dqk, dv, bwd=True)
        # bwd HBM floor: inputs re-read + dq/dk/dv written. The r4 dz
        # stripe term (2 * 4 * b * npad * npad — written by the kernel,
        # re-read by XLA bias-grad fusions) is GONE at npad >= 512
        # (in-kernel bias grads); short sequences still emit the
        # head-summed dz for the XLA d_ts_w einsum.
        bytes_bwd = 3 * 4 * b * n * h * (dqk + dv)
        if npad < 512:
            bytes_bwd += 2 * 4 * b * npad * npad
        rows.append(
            (
                name + " fwd+bwd",
                t_full,
                f_fwd + f_bwd,
                bytes_fwd + bytes_bwd,
                "MXU + dz HBM" if npad < 512 else "MXU/VPU tiles",
            )
        )
        _log(f"{name}: fwd {t_fwd*1e3:.2f} ms, fwd+bwd {t_full*1e3:.2f} ms")


def bench_lse(rows, iters):
    """Fused sampled-softmax lse at ml-1m and ml-20m shapes."""
    from mygenerativerecommenders_tpu.ops.dense_negatives import (
        sampled_softmax_dense_neg_lse,
    )

    for name, bt, d, x, r in [
        ("lse ml-1m (BT=26880,X=3952,D=50)", 128 * 210, 50, 3952, 128),
        ("lse ml-20m (BT=26880,X=26744,D=50)", 128 * 210, 50, 26744, 128),
    ]:
        rng = np.random.default_rng(0)
        q2 = jnp.asarray(rng.standard_normal((bt, d)), jnp.float32)
        q2 = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
        cat = jnp.asarray(rng.standard_normal((x, d)), jnp.float32)
        cat = cat / jnp.linalg.norm(cat, axis=-1, keepdims=True)
        offs = jnp.asarray(rng.integers(0, x, size=(bt, r)), jnp.int32)
        pos = jnp.asarray(rng.integers(0, x, size=(bt,)), jnp.int32)

        def fwd_step(q2c):
            lse = sampled_softmax_dense_neg_lse(
                q2c, cat, offs, pos, 0.05, use_pallas=True
            )
            return q2c + 1e-30 * lse[:, None]

        t_fwd = timeit_chain(fwd_step, q2, k=iters)
        xpad = int(np.ceil(x / 128) * 128)
        f_logits = 2 * bt * x * d
        f_count = 2 * bt * r * xpad  # one-hot histogram einsum
        n_bt_tiles = int(np.ceil(bt / 256))  # bt_tile(x) >= 256
        bytes_fwd = (
            bt * xpad  # u8 count3 read
            + 4 * bt * d  # q2
            + 4 * x * d  # catalog (VMEM-resident per x-block)
        )
        rows.append(
            (name + " fwd (logits+count)", t_fwd, f_logits + f_count,
             bytes_fwd, "count-read HBM + MXU")
        )

        def lloss(q2c, catc):
            return sampled_softmax_dense_neg_lse(
                q2c, catc, offs, pos, 0.05, use_pallas=True
            ).sum()

        def grad_step(carry):
            q2c, catc = carry
            dq, dcat = jax.grad(lloss, argnums=(0, 1))(q2c, catc)
            return (q2c + 1e-30 * dq, catc + 1e-30 * dcat)

        t_full = timeit_chain(grad_step, (q2, cat), k=iters)
        # bwd: dq kernel (recompute logits + dq dot) + dcat kernel
        # (recompute + dcat dot) => 4 extra logits-sized dots + count
        # re-read per kernel family
        f_bwd = 4 * f_logits + f_count
        bytes_bwd = 3 * bt * xpad + 2 * (4 * bt * d + 4 * x * d)
        rows.append(
            (name + " fwd+bwd", t_full, f_logits + f_count + f_bwd,
             bytes_fwd + bytes_bwd, "count-read HBM + MXU")
        )
        _log(f"{name}: fwd {t_fwd*1e3:.2f} ms, fwd+bwd {t_full*1e3:.2f} ms")


def bench_adamw_table(rows, iters):
    """The embedding-table AdamW update at ml-20m scale (X=131262, D=50):
    pure HBM-bound elementwise — the lazy_update target."""
    import optax

    x, d = 131262, 50
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.standard_normal((x, d)) * 0.02, jnp.float32)}
    g = {"w": jnp.asarray(rng.standard_normal((x, d)) * 1e-3, jnp.float32)}
    tx = optax.adamw(1e-3, b1=0.9, b2=0.98, weight_decay=1e-3)
    state = tx.init(p)

    def step(carry):
        p, state = carry
        u, state = tx.update(g, state, p)
        return optax.apply_updates(p, u), state

    t = timeit_chain(step, (p, state), k=iters)
    nb = x * d * 4
    # read p, m, v, g; write p, m, v
    rows.append(("AdamW table update (X=131262, D=50)", t, 10 * x * d,
                 7 * nb, "HBM"))
    _log(f"adamw table: {t*1e3:.3f} ms")


def encoder_matmul_flops(b, n, dmodel, dqk, dv, h, blocks):
    """uvqk + o projections, fwd; bwd = 2x (dgrad + wgrad)."""
    per_block = 2 * b * n * dmodel * (2 * h * dqk + 2 * h * dv) + 2 * b * n * (
        h * dv
    ) * dmodel
    return blocks * per_block


def bench_steps(rows, iters):
    """Full train-step MFU for the three presets."""
    from mygenerativerecommenders_tpu.configs import resolve
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
    from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    from bench import make_batch

    cases = [
        ("ml-1m-hstu", "uniform"),
        ("ml-20m-hstu", "uniform"),
        ("ml-20m-hstu-long", "full"),
        ("ml-20m-hstu-long", "lognormal"),
    ]
    for preset, mode in cases:
        try:
            _bench_one_step(rows, preset, mode)
        except Exception as e:
            import traceback

            _log(f"step {preset}/{mode} FAILED: {e}")
            traceback.print_exc(file=sys.stderr)


def _bench_one_step(rows, preset, mode):
    import jax

    from mygenerativerecommenders_tpu.configs import resolve
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
    from mygenerativerecommenders_tpu.train.task_retrieval import make_train_step
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    from bench import make_batch

    if True:
        cfg = get_preset(preset)
        resolve(cfg, cfg.data.expected_max_item_id)
        b, l = cfg.data.batch_size, cfg.data.max_sequence_length
        x_id = cfg.data.expected_max_item_id
        batch = make_batch(b, l, x_id)
        rng_np = np.random.default_rng(0)
        if mode == "lognormal":
            lengths = np.clip(
                rng_np.lognormal(4.6, 0.9, size=b).astype(np.int32), 20, l
            )
        elif mode == "full":
            lengths = np.full(b, l, np.int32)
        else:
            lengths = batch["lengths"]
        ids = np.zeros((b, l), np.int32)
        ts = np.zeros((b, l), np.int32)
        for i, nl in enumerate(lengths):
            ids[i, :nl] = rng_np.integers(1, x_id, size=nl)
            ts[i, :nl] = np.sort(
                978_000_000 + rng_np.integers(0, 10**8, size=nl)
            )
        batch.update(lengths=lengths, ids=ids, timestamps=ts)

        model = build_model(cfg)
        key = jax.random.PRNGKey(0)
        seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
        params = jax.jit(model.init)({"params": key, "dropout": key}, seq)
        uniq = cfg.data.expected_num_unique_items
        all_item_ids = np.sort(
            np.random.default_rng(0).choice(
                np.arange(1, x_id + 1), size=uniq, replace=False
            )
        ).astype(np.int32)
        tx = build_optimizer(cfg.optimizer1, None, params, cfg.optimizer1.lr, 0.0)
        opt_state = jax.jit(tx.init)(params)
        k = 8
        train_step = make_train_step(model, cfg, all_item_ids, steps=k)
        stacked = {key2: np.stack([v] * k) for key2, v in batch.items()}
        dev_batch = jax.device_put(stacked)
        lr1, lr2 = cfg.optimizer1.lr, cfg.optimizer2.lr

        # k optimizer steps per dispatch already (steps_per_call); time
        # whole calls, min over trials, sync via the loss scalar.
        # params/opt_state are DONATED by the step — must rebind each call
        params, opt_state, loss = train_step(
            params, opt_state, dev_batch, key, lr1, lr2
        )
        _sync(loss)  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = train_step(
                params, opt_state, dev_batch, key, lr1, lr2
            )
            _sync(loss)
            best = min(best, time.perf_counter() - t0)
        t_step = best / k

        e = cfg.model.encoder
        n = l + cfg.model.gr_output_length + 1
        dmodel = cfg.model.item_embedding_dim
        h = e.num_heads
        dqk_h, dv_h = e.attention_dim // h, e.linear_dim // h
        seq_lens = np.minimum(lengths + cfg.model.gr_output_length + 1, n)
        f_attn = attn_flops(seq_lens, n, h, dqk_h, dv_h) + attn_flops(
            seq_lens, n, h, dqk_h, dv_h, bwd=True
        )
        f_attn *= e.num_blocks
        f_mm = 3 * encoder_matmul_flops(b, n, dmodel, dqk_h, dv_h, h, e.num_blocks)
        bt = b * (n - 1)
        xpad = int(np.ceil(uniq / 128) * 128)
        # 5 logits-sized dots (fwd + dq recompute+dot + dcat recompute+dot)
        # + ONE count-build histogram einsum (stop_gradient, fwd only)
        f_loss = 5 * 2 * bt * uniq * dmodel + 2 * bt * 128 * xpad
        f_total = f_attn + f_mm + f_loss
        mfu = f_total / t_step / PEAK_MXU
        mfu_f32 = f_total / t_step / PEAK_MXU_F32_MEASURED
        rows.append(
            (
                f"STEP {preset} ({mode}) [B={b}]",
                t_step,
                f_total,
                None,
                f"MFU {100*mfu:.1f}% bf16-peak / {100*mfu_f32:.1f}% f32-ceiling",
            )
        )
        _log(
            f"step {preset}/{mode}: {t_step*1e3:.2f} ms, "
            f"{f_total/1e9:.1f} GFLOP, MFU {100*mfu:.1f}%"
        )


def main():
    quick = "--quick" in sys.argv
    iters = 8 if quick else 24
    from mygenerativerecommenders_tpu.train.driver import enable_compilation_cache

    enable_compilation_cache("~/.cache/mygenerativerecommenders_tpu/xla")
    _log(f"devices: {jax.devices()}")
    rows = []
    only = next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")), "")
    sections = {
        "attn": bench_attention,
        "lse": bench_lse,
        "adamw": bench_adamw_table,
        "steps": bench_steps,
    }
    for name, fn in sections.items():
        if not only or name in only.split(","):
            fn(rows, iters)

    print("\n| op | time | useful FLOPs | TF/s | % bf16 peak | min HBM | GB/s | % HBM peak | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, t, flops, nbytes, bound in rows:
        tf = flops / t / 1e12
        pct = 100 * flops / t / PEAK_MXU
        if nbytes is not None:
            gbs = nbytes / t / 1e9
            hbm_pct = 100 * nbytes / t / PEAK_HBM
            bcol = f"{nbytes/1e6:.1f} MB | {gbs:.0f} | {hbm_pct:.0f}%"
        else:
            bcol = "— | — | —"
        print(
            f"| {name} | {t*1e3:.2f} ms | {flops/1e9:.1f} G | {tf:.1f} | "
            f"{pct:.1f}% | {bcol} | {bound} |"
        )


if __name__ == "__main__":
    main()
