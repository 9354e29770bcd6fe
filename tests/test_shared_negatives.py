"""Shared-negatives sampled softmax (loss.shared_negatives).

Opt-in algorithm change: one negative set per step shared by all
supervision positions (vs the reference's per-position draw,
autoregressive_losses.py:272-279). The test hand-rolls the expected
loss from the model's own forward + the documented RNG stream and
checks the wired loss_fn against it, gradients included.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.ops.sequence import scatter_at_lengths
from mygenerativerecommenders_tpu.train import task_retrieval
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

from tests.test_dense_negatives import _make_batch


def _setup(rng, num_items=120, r=16):
    cfg = Config()
    cfg.data.max_sequence_length = 10
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    cfg.model.loss.num_to_sample = r
    cfg.model.loss.shared_negatives = True
    resolve(cfg, num_items)
    model = build_model(cfg)
    all_item_ids = np.arange(1, num_items + 1, dtype=np.int32)
    batch = _make_batch(rng, 4, 10, num_items)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq,
        method=model.init_all,
    )
    return cfg, model, all_item_ids, batch, params


def test_selected_when_flag_set(rng):
    cfg, model, ids, _, _ = _setup(rng)
    fn = task_retrieval.make_loss_fn(model, cfg, ids)
    assert fn.__name__ == "loss_fn_shared"
    cfg_off = copy.deepcopy(cfg)
    cfg_off.model.loss.shared_negatives = False
    assert task_retrieval.make_loss_fn(model, cfg_off, ids).__name__ != (
        "loss_fn_shared"
    )


def test_matches_hand_rolled_reference(rng):
    cfg, model, all_item_ids, batch, params = _setup(rng)
    loss_fn = task_retrieval.make_loss_fn(model, cfg, all_item_ids)
    step_rng = jax.random.PRNGKey(7)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    got, grads = jax.value_and_grad(loss_fn)(params, dev_batch, step_rng)

    # hand reference: same forward, shared negatives drawn explicitly
    drop_rng, neg_rng = jax.random.split(step_rng)
    max_out = cfg.model.gr_output_length + 1
    seq, target_ids, _ = seq_features_from_batch(dev_batch, max_out)
    past_ids = scatter_at_lengths(seq.past_ids, seq.past_lengths, target_ids)
    seq = seq._replace(past_ids=past_ids)
    emb = model.apply(params, past_ids, method=model.item_embeddings)
    seq = seq._replace(past_embeddings=emb)
    encoded, _ = model.apply(
        params, seq, deterministic=False, rngs={"dropout": drop_rng}
    )
    outputs = np.asarray(encoded[:, :-1, :], dtype=np.float64)
    sup_ids = np.asarray(past_ids[:, 1:])
    weights = (sup_ids != 0).astype(np.float64)
    weights *= np.asarray(batch["sample_weight"])[:, None]

    r = cfg.model.loss.num_to_sample
    offsets = np.asarray(
        jax.random.randint(neg_rng, (r,), 0, len(all_item_ids))
    )
    neg_ids = all_item_ids[offsets]
    neg_e = np.asarray(
        model.apply(params, jnp.asarray(neg_ids), method=model.item_embeddings)
    ).astype(np.float64)
    neg_e /= np.maximum(np.linalg.norm(neg_e, axis=-1, keepdims=True), 1e-6)
    pos_e = np.asarray(emb[:, 1:, :], dtype=np.float64)
    pos_e /= np.maximum(np.linalg.norm(pos_e, axis=-1, keepdims=True), 1e-6)

    t = cfg.model.loss.temperature
    pos_logits = (outputs * pos_e).sum(-1) / t
    neg_logits = outputs @ neg_e.T / t
    hits = sup_ids[..., None] == neg_ids[None, None, :]
    neg_logits = np.where(hits, -5e4, neg_logits)
    m = np.maximum(pos_logits, neg_logits.max(-1))
    lse = m + np.log(
        np.exp(pos_logits - m) + np.exp(neg_logits - m[..., None]).sum(-1)
    )
    per_pos = lse - pos_logits
    want = (per_pos * weights).sum() / weights.sum()

    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_requires_applicable_config(rng):
    cfg, model, ids, _, _ = _setup(rng)
    cfg.model.sampler.kind = "in_batch"
    try:
        task_retrieval.make_loss_fn(model, cfg, ids)
    except ValueError as e:
        assert "shared_negatives" in str(e)
    else:
        raise AssertionError("expected ValueError for in_batch sampler")


def test_train_step_runs_and_loss_drops(rng):
    cfg, model, ids, batch, params = _setup(rng)
    loss_fn = task_retrieval.make_loss_fn(model, cfg, ids)
    step = jax.jit(
        task_retrieval.train_step_from_loss(loss_fn, cfg),
        donate_argnums=(0, 1),
    )
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer

    opt2 = cfg.optimizer2 if cfg.optimizer2.enabled else None
    tx = build_optimizer(
        cfg.optimizer1, opt2, params, cfg.optimizer1.lr, cfg.optimizer2.lr
    )
    opt_state = tx.init(params)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, dev_batch, jax.random.PRNGKey(i),
            jnp.float32(1e-3), jnp.float32(1e-3),
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
