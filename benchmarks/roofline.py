"""Roofline / MFU accounting for the hot kernels and whole train steps.

For each measured region this prints: analytic FLOPs, HBM bytes, achieved
TFLOP/s and GB/s, percent of the chip's peaks, and which roof binds
(MXU / HBM / neither => overhead- or VPU-bound). Peaks are for the chip
family reported by jax.devices() (v5e/"TPU v5 lite" by default; override
with PEAK_TFLOPS / PEAK_GBS env vars).

Usage: python benchmarks/roofline.py [b] [n]   (defaults 128 1035)
Writes a markdown table to stdout — pasted into PERFORMANCE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (one chip): 197 TFLOP/s bf16; f32 matmul runs as multi-pass
# bf16 (~112 TF/s measured on this chip, PERFORMANCE.md); HBM 819 GB/s.
PEAK_TFLOPS_BF16 = float(os.environ.get("PEAK_TFLOPS", "197"))
PEAK_TFLOPS_F32 = float(os.environ.get("PEAK_TFLOPS_F32", "112"))
PEAK_GBS = float(os.environ.get("PEAK_GBS", "819"))


def timeit(f, *args, n=20):
    out = f(*args)
    _ = float(np.asarray(jax_leaf(out)).reshape(-1)[0])  # host pull (tunnel quirk)
    t0 = time.perf_counter()
    for _i in range(n):
        out = f(*args)
    _ = float(np.asarray(jax_leaf(out)).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def jax_leaf(tree):
    import jax

    return jax.tree.leaves(tree)[0]


def report(name, seconds, flops, bytes_, dtype="f32", note=""):
    tf = flops / seconds / 1e12
    gbs = bytes_ / seconds / 1e9
    peak_tf = PEAK_TFLOPS_F32 if dtype == "f32" else PEAK_TFLOPS_BF16
    pct_mxu = 100 * tf / peak_tf
    pct_hbm = 100 * gbs / PEAK_GBS
    bound = "MXU" if pct_mxu > pct_hbm else "HBM"
    if max(pct_mxu, pct_hbm) < 25:
        bound = "VPU/overhead"
    print(
        f"| {name} | {seconds * 1e3:8.2f} | {flops / 1e9:9.1f} | {bytes_ / 1e6:8.0f} "
        f"| {tf:6.1f} | {pct_mxu:5.1f}% | {gbs:6.0f} | {pct_hbm:5.1f}% | {bound} | {note} |",
        flush=True,
    )


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/mygenerativerecommenders_tpu/xla"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import (
        hstu_attention_fused,
    )

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1035
    h, d = 2, 25
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    ts = jnp.asarray(
        np.sort(rng.integers(1000, 10**6, size=(b, n)), axis=1).astype(np.int32)
    )
    pos_w = jnp.asarray(rng.normal(size=(2 * n - 1,)).astype(np.float32) * 0.02)
    ts_w = jnp.asarray(rng.normal(size=(129,)).astype(np.float32) * 0.02)
    lens_real = np.clip(rng.lognormal(4.6, 0.9, size=b).astype(np.int32), 20, n)
    full = jnp.full((b,), n, dtype=jnp.int32)
    short = jnp.asarray(lens_real)

    print(f"# B={b} N={n} H={h} D={d} mean_len={lens_real.mean():.0f}")
    print(
        "| region | ms | GFLOP | MB | TF/s | %MXU | GB/s | %HBM | bound | note |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")

    np_pad = ((n + 127) // 128) * 128
    d_pad = 128

    def attn_stats(lengths):
        # causal live tiles per sequence: l(l+1)/2 of 128x128 tiles
        lq = np.ceil(np.minimum(np.asarray(lengths), n) / 128).astype(np.int64)
        tiles = (lq * (lq + 1) // 2).sum() * h
        flops = 2 * tiles * 128 * 128 * d_pad * 2  # qk + av dots, padded D
        # bytes: q/k/v/out per bh + live z-equivalents are VMEM-resident;
        # HBM traffic ~ q + k + v + out arrays once each (padded layout)
        bytes_ = 4 * (4 * b * h * np_pad * d_pad)
        return flops, bytes_

    fwd = jax.jit(
        lambda lens: hstu_attention_fused(
            q, k, v, ts, pos_w, ts_w, n, 128, lengths=lens
        )
    )
    fl, by = attn_stats(full)
    report("attn fwd (full-length)", timeit(fwd, full), fl, by, note="padded D=128")
    fl, by = attn_stats(short)
    report("attn fwd (real lengths)", timeit(fwd, short), fl, by, note="jagged skip")

    def loss(q_, lens):
        return (
            hstu_attention_fused(q_, k, v, ts, pos_w, ts_w, n, 128, lengths=lens) ** 2
        ).sum()

    gr = jax.jit(jax.grad(loss))

    def grad_stats(lengths):
        f_fwd, _ = attn_stats(lengths)
        lq = np.ceil(np.minimum(np.asarray(lengths), n) / 128).astype(np.int64)
        live = (lq * (lq + 1) // 2).sum() * h
        # bwd: 4 dots per live tile (dp, dq, dk, dv) at padded D
        f_bwd = 2 * live * 128 * 128 * d_pad * 4
        # z: live tiles written by fwd, full stripes re-read by bwd
        z_write = 4 * live * 128 * 128
        z_read = 4 * b * h * np_pad * np_pad  # dead-stripe reads included
        dzh = 2 * 4 * b * np_pad * np_pad  # head-summed dz write+read
        io = 4 * (8 * b * h * np_pad * d_pad)
        return f_fwd + f_bwd, z_write + z_read + dzh + io

    fl, by = grad_stats(full)
    report("attn fwd+bwd (full)", timeit(gr, q, full), fl, by, note="z stripes in HBM")
    fl, by = grad_stats(short)
    report("attn fwd+bwd (real)", timeit(gr, q, short), fl, by, note="")

    # pure MXU roof check: big f32 and bf16 matmuls
    m = 4096
    a32 = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    mm32 = jax.jit(lambda x: x @ x)
    report(
        "4096^3 matmul f32",
        timeit(mm32, a32),
        2 * m**3,
        4 * 3 * m * m,
        dtype="f32",
        note="MXU roof probe",
    )
    a16 = a32.astype(jnp.bfloat16)
    mm16 = jax.jit(lambda x: (x @ x))
    report(
        "4096^3 matmul bf16",
        timeit(mm16, a16),
        2 * m**3,
        2 * 3 * m * m,
        dtype="bf16",
        note="",
    )

    # HBM roof probe: big copy
    big = jnp.asarray(rng.normal(size=(64, 1024, 1024)).astype(np.float32))
    cp = jax.jit(lambda x: x * 1.000001)
    report(
        "elementwise copy 256MB",
        timeit(cp, big),
        big.size,
        2 * 4 * big.size,
        note="HBM roof probe",
    )


if __name__ == "__main__":
    main()
