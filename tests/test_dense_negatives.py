"""Dense-catalog negative path vs the per-sample reference path.

ops/dense_negatives.py re-expresses the sampled-softmax negative term
through the full catalog (count-weighted lse). Same RNG stream, same math
-> loss and every gradient must agree to float tolerance.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.ops.dense_negatives import count_offsets
from mygenerativerecommenders_tpu.train.task_retrieval import make_loss_fn
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


def test_count_offsets_exact(rng):
    x = 300
    offsets = jnp.asarray(rng.integers(0, x, size=(4, 7, 64)).astype(np.int32))
    count = np.asarray(count_offsets(offsets, x), dtype=np.float64)
    expected = np.zeros((4, 7, x))
    o = np.asarray(offsets)
    for b in range(4):
        for t in range(7):
            np.add.at(expected[b, t], o[b, t], 1.0)
    np.testing.assert_array_equal(count, expected)


def _make_batch(rng, b, l, num_items):
    lengths = rng.integers(3, l, size=b).astype(np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, num_items + 1, size=n)
        ts[i, :n] = np.sort(rng.integers(100, 10**5, size=n))
    return {
        "lengths": lengths, "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32), "timestamps": ts,
        "target_id": rng.integers(1, num_items + 1, size=b).astype(np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 10).astype(np.int32),
        "sample_weight": np.ones(b, dtype=np.float32),
    }


def test_dense_negatives_matches_per_sample_path(rng):
    num_items = 260
    cfg = Config()
    cfg.data.max_sequence_length = 12
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    cfg.model.loss.num_to_sample = 32
    resolve(cfg, num_items)
    model = build_model(cfg)
    all_item_ids = np.arange(1, num_items + 1, dtype=np.int32)

    batch = _make_batch(rng, 4, 12, num_items)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq,
        method=model.init_all,
    )

    cfg_ref = copy.deepcopy(cfg)
    cfg_ref.model.loss.dense_catalog_negatives = "false"
    cfg_dense = copy.deepcopy(cfg)
    cfg_dense.model.loss.dense_catalog_negatives = "true"
    loss_ref = make_loss_fn(model, cfg_ref, all_item_ids)
    loss_dense = make_loss_fn(model, cfg_dense, all_item_ids)

    step_rng = jax.random.PRNGKey(3)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    l_ref, g_ref = jax.value_and_grad(loss_ref)(params, dev_batch, step_rng)
    l_dense, g_dense = jax.value_and_grad(loss_dense)(params, dev_batch, step_rng)

    np.testing.assert_allclose(float(l_ref), float(l_dense), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_dense = jax.tree.leaves(g_dense)
    assert len(flat_ref) == len(flat_dense)
    for (path, a), bb in zip(flat_ref, flat_dense):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_pallas_dense_neg_lse_matches_jnp(rng):
    """ops/pallas/dense_softmax.py vs the jnp dense path, value + grads."""
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.dense_negatives import (
        sampled_softmax_dense_neg_lse,
    )

    bt, d, x, r, t = 70, 12, 150, 16, 0.07
    q = jnp.asarray(rng.normal(size=(bt, d)).astype(np.float32))
    cat = jnp.asarray(rng.normal(size=(x, d)).astype(np.float32))
    cat = cat / np.linalg.norm(cat, axis=-1, keepdims=True)
    offs = jnp.asarray(rng.integers(0, x, size=(bt, r)).astype(np.int32))
    sup = jnp.asarray(
        np.where(rng.random(bt) < 0.2, -1, rng.integers(0, x, size=bt)).astype(
            np.int32
        )
    )
    # force some accidental hits so the masking path is exercised
    offs = offs.at[0, :3].set(sup[0])

    def f_ref(q, cat):
        lse = sampled_softmax_dense_neg_lse(q, cat, offs, sup, t, use_pallas=False)
        return (jnp.where(jnp.isfinite(lse), lse, 0.0) ** 2).sum(), lse

    def f_pal(q, cat):
        lse = sampled_softmax_dense_neg_lse(q, cat, offs, sup, t, use_pallas=True)
        return (jnp.where(jnp.isfinite(lse), lse, 0.0) ** 2).sum(), lse

    (l_ref, lse_ref), g_ref = jax.value_and_grad(f_ref, argnums=(0, 1), has_aux=True)(
        q, cat
    )
    with pltpu.force_tpu_interpret_mode():
        (l_pal, lse_pal), g_pal = jax.value_and_grad(
            f_pal, argnums=(0, 1), has_aux=True
        )(q, cat)

    np.testing.assert_allclose(np.asarray(lse_ref), np.asarray(lse_pal), rtol=1e-5)
    np.testing.assert_allclose(float(l_ref), float(l_pal), rtol=1e-5)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_fused_pallas_all_hit_row(rng):
    """A row whose every sample hits the positive -> -inf lse, zero grads."""
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops.dense_negatives import (
        sampled_softmax_dense_neg_lse,
    )

    bt, d, x, r = 4, 8, 40, 6
    q = jnp.asarray(rng.normal(size=(bt, d)).astype(np.float32))
    cat = jnp.asarray(rng.normal(size=(x, d)).astype(np.float32))
    sup = jnp.asarray(np.array([7, -1, 3, 5], dtype=np.int32))
    offs = jnp.asarray(rng.integers(0, x, size=(bt, r)).astype(np.int32))
    offs = offs.at[0, :].set(7)  # row 0: all samples == positive

    def f(q):
        lse = sampled_softmax_dense_neg_lse(q, cat, offs, sup, 0.05, use_pallas=True)
        pos = jnp.ones(bt)
        return (jnp.logaddexp(pos, lse) - pos).sum(), lse

    with pltpu.force_tpu_interpret_mode():
        (loss, lse), g = jax.value_and_grad(f, has_aux=True)(q)
    assert np.asarray(lse)[0] == -np.inf
    assert np.isfinite(np.asarray(lse)[1:]).all()
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()


def test_dense_auto_gate_large_catalog(rng):
    """auto mode falls back to the per-sample path when [BT, X] is huge;
    explicit true overrides the gate."""
    from mygenerativerecommenders_tpu.train import task_retrieval

    num_items = 300
    cfg = Config()
    cfg.data.max_sequence_length = 12
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, num_items)
    model = build_model(cfg)
    ids_small = np.arange(1, num_items + 1, dtype=np.int32)

    fn_auto = task_retrieval.make_loss_fn(model, cfg, ids_small)
    assert fn_auto.__name__ == "loss_fn_dense"  # small catalog: dense on

    cfg_big = copy.deepcopy(cfg)
    cfg_big.data.batch_size = 4096
    cfg_big.data.max_sequence_length = 1024
    ids_big = np.arange(1, 200_001, dtype=np.int32)
    fn_big = task_retrieval.make_loss_fn(model, cfg_big, ids_big)
    assert fn_big.__name__ == "loss_fn"  # auto gate: per-sample fallback

    cfg_force = copy.deepcopy(cfg_big)
    cfg_force.model.loss.dense_catalog_negatives = "true"
    fn_force = task_retrieval.make_loss_fn(model, cfg_force, ids_big)
    assert fn_force.__name__ == "loss_fn_dense"


def test_count_offsets_b_matches_2d(rng):
    from mygenerativerecommenders_tpu.ops.dense_negatives import count_offsets_b

    x, bt, r = 300, 9, 32
    offs = jnp.asarray(rng.integers(0, x, size=(bt, r)).astype(np.int32))
    c2 = np.asarray(count_offsets(offs, x, keep_pad=True), dtype=np.float64)
    c3 = np.asarray(count_offsets_b(offs, x), dtype=np.float64)  # [BT, HB, 128]
    np.testing.assert_array_equal(c3.reshape(bt, -1), c2)
    # widened hi one-hot: extra slices all-zero, earlier slices unchanged
    c4 = np.asarray(count_offsets_b(offs, x, 5), dtype=np.float64)
    np.testing.assert_array_equal(c4[:, :3], c3)
    assert (c4[:, 3:] == 0).all()


def test_fused_tiled_path_matches_reference(rng, monkeypatch):
    """Force a tiny x-block so the MULTI-block (online-carry) kernels run,
    and check all kernel variants against the jnp path: value + grads."""
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops import dense_negatives
    from mygenerativerecommenders_tpu.ops.pallas import dense_softmax

    bt, d, x, r, t = 52, 10, 300, 12, 0.06
    q = jnp.asarray(rng.normal(size=(bt, d)).astype(np.float32))
    cat = jnp.asarray(rng.normal(size=(x, d)).astype(np.float32))
    cat = cat / np.linalg.norm(cat, axis=-1, keepdims=True)
    offs = jnp.asarray(rng.integers(0, x, size=(bt, r)).astype(np.int32))
    sup = jnp.asarray(rng.integers(0, x, size=bt).astype(np.int32))
    offs = offs.at[1, :2].set(sup[1])  # accidental hits

    def run(use_pallas):
        def f(q, cat):
            lse = dense_negatives.sampled_softmax_dense_neg_lse(
                q, cat, offs, sup, t, use_pallas=use_pallas
            )
            return (jnp.where(jnp.isfinite(lse), lse, 0.0) ** 2).sum(), lse

        (loss, lse), grads = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True
        )(q, cat)
        return loss, lse, grads

    want_loss, want_lse, want_grads = run(False)

    with pltpu.force_tpu_interpret_mode():
        # x_pad = 384 <= default _XB -> transposed single-block kernels
        t_loss, t_lse, t_grads = run(True)
        # shrink _XB so x tiles into 3 blocks -> tiled 2-D kernels
        monkeypatch.setattr(dense_softmax, "_XB", 128)
        tiled_loss, tiled_lse, tiled_grads = run(True)

    for loss, lse, grads in [
        (t_loss, t_lse, t_grads),
        (tiled_loss, tiled_lse, tiled_grads),
    ]:
        np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse), rtol=1e-5)
        np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
        for a, b in zip(grads, want_grads):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


def test_count_offsets_packed4_matches_unpacked(rng):
    from mygenerativerecommenders_tpu.ops.dense_negatives import (
        count_offsets_b,
        count_offsets_packed4,
    )

    x, bt, r = 900, 9, 32  # 8 hi slices -> slices=8, one packed group x2
    offs = jnp.asarray(rng.integers(0, x, size=(bt, r)).astype(np.int32))
    sup = jnp.asarray(rng.integers(0, x, size=bt).astype(np.int32))
    offs = offs.at[2, :3].set(sup[2])  # accidental hits fold into weights
    slices, hb = 8, 8
    packed = np.asarray(count_offsets_packed4(offs, sup, slices, hb))
    assert packed.dtype == np.uint32 and packed.shape == (bt, 2, 128)
    # unpack digit planes: digit j of group g holds slice j*(hb//4)+g
    gb = hb // 4
    got = np.zeros((bt, slices, 128), dtype=np.int64)
    for j in range(4):
        for g in range(gb):
            got[:, j * gb + g] = (packed[:, g] >> (8 * j)) & 255
    want = np.asarray(
        count_offsets_b(offs, x, slices), dtype=np.int64
    )
    lane = np.arange(slices * 128).reshape(slices, 128)
    want = want * (lane[None] != np.asarray(sup)[:, None, None])
    np.testing.assert_array_equal(got, want)
    # sentinel offsets count nothing
    offs_s = offs.at[0, :].set(slices * 128)
    packed_s = np.asarray(count_offsets_packed4(offs_s, sup, slices, hb))
    assert (packed_s[0] == 0).all()


def test_fused_packed_multiblock_matches_reference(rng):
    """Catalog > one x-block with R <= 255: the u32 radix-256 packed count
    path (hb=32 tiled blocks) must match the jnp reference in value and
    grads."""
    from jax.experimental.pallas import tpu as pltpu

    from mygenerativerecommenders_tpu.ops import dense_negatives
    from mygenerativerecommenders_tpu.ops.pallas import dense_softmax

    bt, d, x, r, t = 12, 10, 4500, 9, 0.06  # 36 lanes -> hb=32, n_j=2
    assert dense_softmax.hi_blocks(x, packed=True) == (32, 2)
    q = jnp.asarray(rng.normal(size=(bt, d)).astype(np.float32))
    cat = jnp.asarray(rng.normal(size=(x, d)).astype(np.float32))
    cat = cat / np.linalg.norm(cat, axis=-1, keepdims=True)
    offs = jnp.asarray(rng.integers(0, x, size=(bt, r)).astype(np.int32))
    sup = jnp.asarray(rng.integers(0, x, size=bt).astype(np.int32))
    offs = offs.at[1, :2].set(sup[1])  # accidental hits

    def run(use_pallas):
        def f(q, cat):
            lse = dense_negatives.sampled_softmax_dense_neg_lse(
                q, cat, offs, sup, t, use_pallas=use_pallas
            )
            return (jnp.where(jnp.isfinite(lse), lse, 0.0) ** 2).sum(), lse

        (loss, lse), grads = jax.value_and_grad(
            f, argnums=(0, 1), has_aux=True
        )(q, cat)
        return loss, lse, grads

    want_loss, want_lse, want_grads = run(False)
    with pltpu.force_tpu_interpret_mode():
        got_loss, got_lse, got_grads = run(True)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse), rtol=1e-5)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    for a, b in zip(got_grads, want_grads):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
