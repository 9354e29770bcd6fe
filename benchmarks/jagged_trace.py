import os, sys
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
lens_real = np.clip(rng.lognormal(4.6, 0.9, size=B).astype(np.int32), 20, N)
short = jnp.asarray(lens_real)

def loss(q_, lens):
    return (hstu_attention_fused(q_, k, v, ts, pos_w, ts_w, N, 128, lengths=lens) ** 2).sum()

gr = jax.jit(jax.grad(loss))
r = gr(q, short); jax.block_until_ready(r)
jax.profiler.start_trace("/tmp/jagged_trace")
for _ in range(5):
    r = gr(q, short)
jax.block_until_ready(r)
jax.profiler.stop_trace()
print("done")
