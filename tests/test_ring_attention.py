"""Ring (sequence-parallel) HSTU attention vs the single-device reference.

The TPU analog of distributed-correctness testing: an 8-virtual-device
CPU mesh (tests/conftest.py) with the sequence axis sharded 4-way and
batch 2-way. HSTU attention is a plain sum over keys, so the ring result
must match the dense reference to float tolerance, gradients included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mygenerativerecommenders_tpu.ops.hstu_attention import (
    hstu_attention_reference,
    relative_position_bias,
    relative_time_bias,
)
from mygenerativerecommenders_tpu.parallel.ring_attention import (
    make_ring_hstu_attention,
)

B, N, H, D, DV = 4, 32, 2, 8, 8
NUM_BUCKETS = 128


def _inputs(rng):
    q = rng.normal(size=(B, N, H, D)).astype(np.float32)
    k = rng.normal(size=(B, N, H, D)).astype(np.float32)
    v = rng.normal(size=(B, N, H, DV)).astype(np.float32)
    base = 978_000_000
    ts = np.sort(rng.integers(0, 10**7, size=(B, N)), axis=1).astype(np.int32) + base
    pos_w = rng.normal(size=(2 * N - 1,)).astype(np.float32) * 0.1
    ts_w = rng.normal(size=(NUM_BUCKETS + 1,)).astype(np.float32) * 0.1
    return q, k, v, ts, pos_w, ts_w


def _reference(q, k, v, ts, pos_w, ts_w):
    bias = relative_position_bias(pos_w, N)[None] + relative_time_bias(
        ts_w, ts, NUM_BUCKETS
    )
    return hstu_attention_reference(q, k, v, bias, max_len=N, causal=True)


@pytest.fixture
def mesh():
    return Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))


def test_ring_matches_reference(rng, mesh):
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = make_ring_hstu_attention(mesh, max_len=N, num_buckets=NUM_BUCKETS)
    got = np.asarray(ring(q, k, v, ts, pos_w, ts_w))
    want = np.asarray(_reference(q, k, v, ts, pos_w, ts_w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ring_gradients_match(rng, mesh):
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = make_ring_hstu_attention(mesh, max_len=N, num_buckets=NUM_BUCKETS)

    def loss_ring(q, k, v, pos_w, ts_w):
        return (ring(q, k, v, ts, pos_w, ts_w) ** 2).sum()

    def loss_ref(q, k, v, pos_w, ts_w):
        return (_reference(q, k, v, ts, pos_w, ts_w) ** 2).sum()

    got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pos_w, ts_w
    )
    want = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pos_w, ts_w
    )
    for g, w, name in zip(got, want, ["dq", "dk", "dv", "dpos_w", "dts_w"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_zigzag_ring_matches_reference(rng, mesh):
    """The load-balanced zigzag body is exact: value + every gradient
    match the dense reference (and therefore the contiguous ring)."""
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    ring = make_ring_hstu_attention(
        mesh, max_len=N, num_buckets=NUM_BUCKETS, zigzag=True
    )
    got = np.asarray(ring(q, k, v, ts, pos_w, ts_w))
    want = np.asarray(_reference(q, k, v, ts, pos_w, ts_w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss_ring(q, k, v, pos_w, ts_w):
        return (ring(q, k, v, ts, pos_w, ts_w) ** 2).sum()

    def loss_ref(q, k, v, pos_w, ts_w):
        return (_reference(q, k, v, ts, pos_w, ts_w) ** 2).sum()

    got_g = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pos_w, ts_w
    )
    want_g = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        q, k, v, pos_w, ts_w
    )
    for g, w, name in zip(got_g, want_g, ["dq", "dk", "dv", "dpos_w", "dts_w"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_zigzag_layout_roundtrip():
    from mygenerativerecommenders_tpu.parallel.ring_attention import (
        inverse_permutation,
        zigzag_order,
    )

    perm = zigzag_order(4, 32)
    # device 0's pair: chunk 0 then chunk 7
    np.testing.assert_array_equal(perm[:8], list(range(4)) + list(range(28, 32)))
    inv = inverse_permutation(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(32))


def test_ring_sp_only_mesh(rng):
    """Works on a pure-sp mesh (no data axis present)."""
    q, k, v, ts, pos_w, ts_w = _inputs(rng)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    ring = make_ring_hstu_attention(mesh, max_len=N, num_buckets=NUM_BUCKETS)
    got = np.asarray(ring(q, k, v, ts, pos_w, ts_w))
    want = np.asarray(_reference(q, k, v, ts, pos_w, ts_w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("zigzag", [False, True])
def test_full_model_sp_matches_single(rng, zigzag):
    """The flagship HSTU model with encoder.sp_shards=4 (contiguous and
    zigzag layouts) produces the same encoded outputs (and loss/grads
    path through the same ring op) as the unsharded model with identical
    params — on a (data=2, sp=4) mesh."""
    from mygenerativerecommenders_tpu.configs import Config, resolve
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

    def make(sp):
        cfg = Config()
        cfg.data.max_sequence_length = 16
        cfg.data.batch_size = 4
        cfg.model.item_embedding_dim = 16
        cfg.model.encoder.use_pallas = "false"
        cfg.model.encoder.sp_shards = sp
        cfg.model.encoder.sp_zigzag = zigzag
        resolve(cfg, 60)
        return cfg, build_model(cfg)

    b, l = 4, 16
    lengths = np.array([5, 8, 3, 12], dtype=np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, 60, size=n)
        ts[i, :n] = np.sort(rng.integers(100, 10**5, size=n))
    batch = {
        "lengths": lengths, "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32), "timestamps": ts,
        "target_id": np.ones(b, dtype=np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 10).astype(np.int32),
    }

    cfg1, model1 = make(1)
    seq, _, _ = seq_features_from_batch(batch, cfg1.model.gr_output_length + 1)
    k = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}
    params = model1.init(k, seq)
    want, want_lengths = jax.jit(
        lambda p, s: model1.apply(p, s, deterministic=True)
    )(params, seq)

    _, model_sp = make(4)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))
    ctx = jax.sharding.set_mesh(mesh)
    try:
        got, got_lengths = jax.jit(
            lambda p, s: model_sp.apply(p, s, deterministic=True)
        )(params, seq)
    finally:
        ctx.__exit__(None, None, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_array_equal(np.asarray(got_lengths), np.asarray(want_lengths))


def test_trainer_sp_e2e(tmp_path):
    """Trainer builds a (data, sp) mesh from encoder.sp_shards and trains
    one fast_dev_run epoch end-to-end with ring attention."""
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    cfg = get_preset("synthetic-smoke")
    cfg.data.batch_size = 4
    cfg.data.max_sequence_length = 16
    cfg.data.synthetic_num_users = 16
    cfg.model.encoder.sp_shards = 4
    cfg.trainer.fast_dev_run = True
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.trainer.output_dir = str(tmp_path / "out")
    trainer = Trainer(cfg)
    try:
        assert trainer.mesh.shape["sp"] == 4 and trainer.mesh.shape["data"] == 2
        results = trainer.fit()
        assert np.isfinite(results["ndcg@10"])
    finally:
        trainer.close()


def test_tp_sp_composed_encoder_matches_unsharded(rng):
    """TP x SP: heads sharded over "model" inside the ring shard_map on a
    (data=2, model=2, sp=2) mesh must match the unsharded encoder
    bit-for-tolerance, gradients included (the ROADMAP's head-sharded
    composition item)."""
    from mygenerativerecommenders_tpu.models.hstu import HSTU

    mesh3 = Mesh(
        np.array(jax.devices()[:8]).reshape(2, 2, 2), ("data", "model", "sp")
    )
    b, n, d = 4, 24, 16
    x = rng.normal(size=(b, n, d)).astype(np.float32) * 0.1
    lengths = np.array([24, 10, 17, 5], dtype=np.int32)
    mask = (np.arange(n)[None, :] < lengths[:, None]).astype(np.float32)
    x = x * mask[:, :, None]
    base = 978_000_000
    ts = (np.sort(rng.integers(0, 10**7, size=(b, n)), axis=1) + base).astype(
        np.int32
    ) * (mask > 0)

    def build(sp, tp):
        return HSTU(
            max_sequence_len=16,
            max_output_len=8,
            embedding_dim=d,
            num_blocks=2,
            num_heads=2,
            linear_dim=8,
            attention_dim=8,
            sp_shards=sp,
            tp_shards=tp,
        )

    ref_model = build(1, 1)
    params = ref_model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(lengths),
        jnp.asarray(x),
        jnp.asarray(mask[:, :, None]),
        {"timestamps": jnp.asarray(ts)},
    )

    def run(model):
        def loss(p, xx):
            out = model.apply(
                p,
                jnp.asarray(lengths),
                xx,
                jnp.asarray(mask[:, :, None]),
                {"timestamps": jnp.asarray(ts)},
                deterministic=True,
            )
            return (out ** 2).sum(), out

        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(
            params, jnp.asarray(x)
        )
        return np.asarray(out), l, grads

    want_out, want_l, want_g = run(ref_model)
    with jax.set_mesh(mesh3):
        got_out, got_l, got_g = run(build(2, 2))
    np.testing.assert_allclose(got_out, want_out, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(got_g), jax.tree.leaves(want_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-5, atol=3e-5
        )
