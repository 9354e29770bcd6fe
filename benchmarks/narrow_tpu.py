import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from mygenerativerecommenders_tpu.ops.pallas.hstu_attention import hstu_attention_fused

rng = np.random.default_rng(0)
b, n, h, d, max_len = 32, 139, 2, 25, 1035
q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
ts = jnp.asarray(np.sort(rng.integers(1000, 10**6, size=(b, n)), axis=1).astype(np.int32))
pos_w = jnp.asarray(rng.normal(size=(2 * max_len - 1,)).astype(np.float32) * 0.02)
ts_w = jnp.asarray(rng.normal(size=(129,)).astype(np.float32) * 0.02)
lens = jnp.asarray(np.clip(rng.integers(5, n + 1, size=b), 1, n).astype(np.int32))

def loss(q_):
    return (hstu_attention_fused(q_, k, v, ts, pos_w, ts_w, max_len, 128, lengths=lens) ** 2).sum()

out = hstu_attention_fused(q, k, v, ts, pos_w, ts_w, max_len, 128, lengths=lens)
print("fwd ok", float(out.sum()))
g = jax.jit(jax.grad(loss))(q)
print("grad ok", float(g.sum()))
