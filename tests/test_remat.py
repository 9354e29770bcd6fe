"""encoder.remat: per-block rematerialization (jax.checkpoint).

Must be a pure memory/compute tradeoff — identical forward and gradients
to the non-remat model (the recomputed forward is the same program), and
the full train step must run under it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import resolve
from mygenerativerecommenders_tpu.configs.presets import get_preset
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

from tests.test_sharded_model import make_batch


def _setup(rng, remat):
    cfg = get_preset("synthetic-smoke")
    cfg.model.encoder.use_pallas = "false"
    cfg.model.encoder.remat = remat
    resolve(cfg, 220)
    model = build_model(cfg)
    batch = make_batch(rng, 4, cfg.data.max_sequence_length, 220)
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq,
        method=model.init_all,
    )
    return cfg, model, seq, params, batch


def test_remat_matches_no_remat(rng):
    _, m0, seq, params, _ = _setup(rng, remat=False)
    _, m1, _, _, _ = _setup(np.random.default_rng(0), remat=True)

    def loss(model, p):
        out, _ = model.apply(p, seq, deterministic=True)
        return (out**2).sum()

    want = jax.jit(lambda p: loss(m0, p))(params)
    got = jax.jit(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    gw = jax.jit(jax.grad(lambda p: loss(m0, p)))(params)
    gg = jax.jit(jax.grad(lambda p: loss(m1, p)))(params)
    for (pa, wl), gl in zip(
        jax.tree_util.tree_leaves_with_path(gw), jax.tree_util.tree_leaves(gg)
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in pa)
        np.testing.assert_allclose(
            np.asarray(gl), np.asarray(wl), rtol=1e-5, atol=1e-6, err_msg=name
        )


def test_remat_train_step_runs(rng):
    from mygenerativerecommenders_tpu.train import task_retrieval
    from mygenerativerecommenders_tpu.train.optimizers import build_optimizer

    cfg, model, _, params, batch = _setup(rng, remat=True)
    ids = np.arange(1, 221, dtype=np.int32)
    loss_fn = task_retrieval.make_loss_fn(model, cfg, ids)
    step = jax.jit(
        task_retrieval.train_step_from_loss(loss_fn, cfg), donate_argnums=(0, 1)
    )
    opt2 = cfg.optimizer2 if cfg.optimizer2.enabled else None
    tx = build_optimizer(cfg.optimizer1, opt2, params, cfg.optimizer1.lr, cfg.optimizer2.lr)
    opt_state = tx.init(params)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for i in range(4):
        params, opt_state, loss = step(
            params, opt_state, dev, jax.random.PRNGKey(i),
            jnp.float32(1e-3), jnp.float32(1e-3),
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
