import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import hstu_attention_fused

B, N, H, D = 128, 1035, 2, 25
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
ts = jnp.asarray(np.sort(rng.integers(1000, 10**6, size=(B, N)), axis=1).astype(np.int32))
pos_w = jnp.asarray(rng.normal(size=(2 * N - 1,)).astype(np.float32) * 0.02)
ts_w = jnp.asarray(rng.normal(size=(129,)).astype(np.float32) * 0.02)
# ml-20m-like length distribution: clipped lognormal, mean ~144
lens_real = np.clip(rng.lognormal(4.6, 0.9, size=B).astype(np.int32), 20, N)
print("mean len", lens_real.mean())
full = jnp.full((B,), N, dtype=jnp.int32)
short = jnp.asarray(lens_real)

def loss(q_, lens):
    return (hstu_attention_fused(q_, k, v, ts, pos_w, ts_w, N, 128, lengths=lens) ** 2).sum()

fwd = jax.jit(lambda lens: hstu_attention_fused(q, k, v, ts, pos_w, ts_w, N, 128, lengths=lens))
gr = jax.jit(jax.grad(loss))

def timeit(f, *a, n=20):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000

print("fwd full  %.2f ms" % timeit(fwd, full))
print("fwd short %.2f ms" % timeit(fwd, short))
print("grad full  %.2f ms" % timeit(gr, q, full))
print("grad short %.2f ms" % timeit(gr, q, short))
# correctness spot check on TPU (vs masked jnp reference)
import sys; sys.path.insert(0, "/root/repo/tests"); from test_pallas_hstu import _expected_jagged
exp = np.asarray(_expected_jagged(q[:4], k[:4], v[:4], ts[:4], pos_w, ts_w, N, short[:4]))
got = np.asarray(hstu_attention_fused(q[:4], k[:4], v[:4], ts[:4], pos_w, ts_w, N, 128, lengths=short[:4]))
err = np.abs(got - exp).max()
print("max err vs masked ref:", err)
