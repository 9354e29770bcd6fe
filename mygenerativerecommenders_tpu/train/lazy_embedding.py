"""Opt-in lazy (sparse-row) embedding-table optimizer.

At production vocabulary scales the dense AdamW update of the item table
dominates the step: every step reads and writes p/m/v over all [V, D]
rows (7 full passes — ~22 GB of HBM traffic per step at V=16M, D=50,
i.e. ~28 ms on a v5e chip) even though a batch only *touches*
B*T positives + R shared negatives (~27K rows at the ml-1m recipe). The
reference has no answer to this — its `LocalEmbeddingModule` is a plain
replicated `nn.Embedding` updated densely (embeddings.py:40-101).

This module is the TPU-native answer, an ALGORITHM CHANGE equivalent to
`torch.optim.SparseAdam` (and standard practice in production
recommender systems), therefore opt-in via
`model.embedding.lazy_update=true` and OFF the reference-parity path:

- the loss is evaluated against the GATHERED rows of the table (one
  [K, D] gather, K = B*T + R), so autodiff produces a FACTORED gradient
  (ids, row-grads) and the dense [V, D] cotangent never materializes;
- the update dedups ids with a static-shape sort + segment-sum (grads of
  duplicate rows sum, exactly like the dense scatter-add would),
  applies AdamW math to the K touched rows only (global-step bias
  correction, like torch SparseAdam), and scatters p/m/v rows back;
- rows NOT touched this step receive no momentum motion and no weight
  decay — that is the semantic difference vs dense AdamW, and the reason
  this is opt-in.

Requires the sparse-touch configuration: `loss.shared_negatives` (the
dense-catalog and per-position paths give every catalog row a gradient),
`sampler.kind=local`, `similarity.kind=dot_product`,
`embedding.kind=local`, `optimizer1.kind=adamw`. The RNG stream, loss
value and factored gradients match the shared-negatives loss bit-for-bit
(tests/test_lazy_embedding.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config
from mygenerativerecommenders_tpu.models.losses import sampled_softmax_loss
from mygenerativerecommenders_tpu.models.model import GenerativeRecommender
from mygenerativerecommenders_tpu.ops.sequence import scatter_at_lengths
from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


class LazyTableState(NamedTuple):
    # first+second moments PACKED as one [V, 2D] array: the per-step row
    # gather/scatter cost on TPU is dominated by per-row issue overhead
    # (~135 ns/row gather, ~160 ns/row scatter measured on v5e), so one
    # double-width pass beats two single-width passes
    mv: jax.Array  # [V, 2D] — [:, :D] = m, [:, D:] = v
    count: jax.Array  # scalar int32 — global step (bias correction)

    @property
    def m(self) -> jax.Array:
        d = self.mv.shape[-1] // 2
        return self.mv[:, :d]

    @property
    def v(self) -> jax.Array:
        d = self.mv.shape[-1] // 2
        return self.mv[:, d:]


class LazyOptState(NamedTuple):
    rest: Any  # optax state over the non-table params
    table: LazyTableState


def lazy_applicable(cfg: Config, raise_on_error: bool = True) -> bool:
    """The configurations under which the touched-row set is the sparse
    (past_ids, shared negatives) pair the lazy update relies on."""
    m = cfg.model
    problems = []
    if not m.loss.shared_negatives or m.loss.kind != "sampled_softmax":
        problems.append("loss.shared_negatives with kind=sampled_softmax")
    if m.sampler.kind != "local":
        problems.append("sampler.kind=local")
    if m.similarity.kind != "dot_product":
        problems.append("similarity.kind=dot_product")
    if m.embedding.kind != "local":
        problems.append("embedding.kind=local")
    if cfg.optimizer1.kind != "adamw":
        problems.append("optimizer1.kind=adamw")
    if problems and raise_on_error:
        raise ValueError(
            "embedding.lazy_update requires: " + ", ".join(problems)
        )
    return not problems


def split_table(params: Any) -> Tuple[jax.Array, Any]:
    """(table, rest): pop the item table out of the param tree so autodiff
    over `rest` never builds a dense [V, D] cotangent."""
    p = dict(params["params"])
    emb = dict(p.pop("embeddings"))
    table = emb.pop("item_emb")
    if emb:
        raise ValueError(
            f"lazy_update expects a plain local table; extra embedding "
            f"params {list(emb)} (use embedding.kind=local)"
        )
    return table, {**params, "params": p}


def merge_table(rest: Any, table: jax.Array) -> Any:
    p = dict(rest["params"])
    p["embeddings"] = {"item_emb": table}
    return {**rest, "params": p}


def lazy_adamw_update(
    table: jax.Array,
    state: LazyTableState,
    ids: jax.Array,  # [K] touched row ids (duplicates allowed)
    row_grads: jax.Array,  # [K, D] per-slot gradients
    lr,
    betas: Tuple[float, float],
    eps: float,
    weight_decay: float,
) -> Tuple[jax.Array, LazyTableState]:
    """AdamW on the touched rows only (torch SparseAdam semantics + the
    decoupled decay applied to touched rows).

    Dedup is a static-shape sort + segment-sum: duplicate rows' gradients
    sum exactly as the dense scatter-add transpose of the gather would.
    Unused slots get the out-of-bounds sentinel V and are dropped by the
    scatters / zero-filled by the gathers.
    """
    b1, b2 = betas
    v_rows = table.shape[0]
    # sort ids with a positions payload (one fused sort, vs argsort+takes)
    sid, order = jax.lax.sort(
        (ids, jnp.arange(ids.shape[0], dtype=jnp.int32)), num_keys=1
    )
    srows = jnp.take(row_grads, order, axis=0)
    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sid[1:] != sid[:-1]]
    )
    seg = (jnp.cumsum(first) - 1).astype(jnp.int32)  # [K] segment per slot
    gsum = jax.ops.segment_sum(
        srows, seg, num_segments=ids.shape[0], indices_are_sorted=True
    )  # [K, D]; tail zeros
    uids = (
        jnp.full(ids.shape, v_rows, dtype=sid.dtype)
        .at[seg]
        .set(sid, indices_are_sorted=True)
    )  # [K]; slot j < n_unique holds the segment's id, tail = sentinel

    take = functools.partial(jnp.take, axis=0, mode="fill", fill_value=0.0)
    mv_rows = take(state.mv, uids)  # [K, 2D] — one double-width gather
    p_rows = take(table, uids)
    d = table.shape[-1]
    count = state.count + 1
    mv_new = (
        jnp.concatenate([jnp.full((d,), b1), jnp.full((d,), b2)]) * mv_rows
        + jnp.concatenate(
            [(1.0 - b1) * gsum, (1.0 - b2) * gsum * gsum], axis=-1
        )
    )
    c = count.astype(jnp.float32)
    m_hat = mv_new[:, :d] / (1.0 - b1**c)
    v_hat = mv_new[:, d:] / (1.0 - b2**c)
    upd = -lr * (m_hat / (jnp.sqrt(v_hat) + eps) + weight_decay * p_rows)
    new_table = table.at[uids].add(upd, mode="drop")
    return new_table, LazyTableState(
        mv=state.mv.at[uids].set(mv_new, mode="drop"),
        count=count,
    )


def init_lazy_opt_state(cfg: Config, params: Any) -> LazyOptState:
    """LazyOptState: optax state over the non-table params + zeroed
    moments for the table (the driver's tx.init analog)."""
    lazy_applicable(cfg)
    table, rest = split_table(params)
    opt2 = cfg.optimizer2 if cfg.optimizer2.enabled else None
    tx = build_optimizer(
        cfg.optimizer1, opt2, rest, cfg.optimizer1.lr, cfg.optimizer2.lr
    )
    return LazyOptState(
        rest=tx.init(rest),
        table=LazyTableState(
            mv=jnp.zeros(
                (table.shape[0], 2 * table.shape[1]), dtype=table.dtype
            ),
            count=jnp.zeros((), dtype=jnp.int32),
        ),
    )


def make_lazy_parts(
    model: GenerativeRecommender, cfg: Config, all_item_ids: np.ndarray,
    packed: bool = False,
) -> Tuple[Callable, Callable]:
    """(ids_fn, loss_rows_fn) for the lazy step.

    ids_fn(batch, rng) -> [K] the exact ids the shared-negatives loss
    looks up this step, in lookup order: the post-target-scatter past_ids
    (B*N slots) then the R shared negatives. Uses the same RNG splits as
    task_retrieval's loss_fn_shared, so the negative draw is identical.

    loss_rows_fn(rest_params, rows, batch, rng) -> scalar loss equal to
    loss_fn_shared(params, batch, rng), with every table lookup replaced
    by a slice of `rows` (rows = table[ids_fn(batch, rng)]).

    packed=True consumes PackedBatchLoader batches (data/packing.py):
    targets are already inline and supervision masks segment boundaries,
    exactly as task_retrieval's packed path.
    """
    from mygenerativerecommenders_tpu.train.task_retrieval import make_sampler
    from mygenerativerecommenders_tpu.utils.features import packed_seq_features

    lazy_applicable(cfg)
    sampler = make_sampler(cfg)
    loss_cfg = cfg.model.loss
    # numpy closures on purpose: device-array constants are fetched D2H
    # during MLIR lowering (~80s/array over the axon tunnel; PARITY.md)
    catalog = np.asarray(all_item_ids, dtype=np.int32)
    max_out = cfg.model.gr_output_length + 1
    num_neg = loss_cfg.num_to_sample

    def _ids_and_ctx(batch, rng):
        drop_rng, neg_rng = jax.random.split(rng)
        if packed:
            seq = packed_seq_features(batch)
            past_ids = seq.past_ids
        else:
            seq, target_ids, _ = seq_features_from_batch(batch, max_out)
            past_ids = scatter_at_lengths(
                seq.past_ids, seq.past_lengths, target_ids
            )
        offsets = jax.random.randint(neg_rng, (num_neg,), 0, catalog.shape[0])
        neg_ids = jnp.take(jnp.asarray(catalog), offsets, axis=0)  # [R]
        ids_all = jnp.concatenate([past_ids.reshape(-1), neg_ids])
        return ids_all, (seq, past_ids, neg_ids, drop_rng)

    def ids_fn(batch, rng):
        return _ids_and_ctx(batch, rng)[0]

    def loss_rows_fn(rest_params, rows, batch, rng):
        _, (seq, past_ids, neg_ids, drop_rng) = _ids_and_ctx(batch, rng)
        b, n = past_ids.shape
        input_embeddings = rows[: b * n].reshape(b, n, -1)
        seq = seq._replace(past_ids=past_ids, past_embeddings=input_embeddings)
        encoded, _ = model.apply(
            rest_params, seq, deterministic=False, rngs={"dropout": drop_rng}
        )
        outputs = encoded[:, :-1, :]
        sup_ids = past_ids[:, 1:]
        sup_emb = input_embeddings[:, 1:, :]
        weights = (sup_ids != 0).astype(jnp.float32)
        if packed:
            seg = batch["seg_ids"]
            same_seg = jnp.logical_and(
                seg[:, 1:] == seg[:, :-1], seg[:, :-1] >= 0
            )
            weights = weights * same_seg.astype(jnp.float32)
        elif "sample_weight" in batch:
            weights = weights * batch["sample_weight"][:, None]

        neg_emb = sampler.normalize_embeddings(rows[b * n :])  # [R, D]
        hits = sup_ids[..., None] == neg_ids[None, None, :]
        pos_emb = sampler.normalize_embeddings(sup_emb)
        t = loss_cfg.temperature
        pos_logits = (outputs * pos_emb).sum(-1) / t
        neg_logits = (
            jnp.einsum(
                "btd,rd->btr", outputs, neg_emb,
                preferred_element_type=jnp.float32,
            )
            / t
        )
        return sampled_softmax_loss(pos_logits, neg_logits, hits, weights)

    return ids_fn, loss_rows_fn


class LazyTrainStepOutput(NamedTuple):
    params: Any
    opt_state: LazyOptState
    loss: jax.Array


def make_lazy_train_step(
    model: GenerativeRecommender,
    cfg: Config,
    all_item_ids: np.ndarray,
    steps: int = 1,
    packed: bool = False,
) -> Callable:
    """train_step(params, opt_state, batch, rng, lr1, lr2) with the item
    table updated lazily. Same signature/behavior as
    task_retrieval.make_train_step (steps>1 = lax.scan fused calls)."""
    ids_fn, loss_rows_fn = make_lazy_parts(model, cfg, all_item_ids, packed=packed)
    opt1 = cfg.optimizer1
    opt2 = cfg.optimizer2 if cfg.optimizer2.enabled else None

    def one_step(params, opt_state, batch, step_rng, lr1, lr2):
        table, rest = split_table(params)
        ids_all = ids_fn(batch, step_rng)
        rows = jnp.take(table, ids_all, axis=0)

        def wrapped(rest_and_rows):
            r, rw = rest_and_rows
            return loss_rows_fn(r, rw, batch, step_rng)

        loss, (g_rest, g_rows) = jax.value_and_grad(wrapped)((rest, rows))
        tx = build_optimizer(opt1, opt2, rest, lr1, lr2)
        updates, new_rest_state = tx.update(g_rest, opt_state.rest, rest)
        new_rest = jax.tree.map(lambda p, u: p + u, rest, updates)
        new_table, new_tstate = lazy_adamw_update(
            table, opt_state.table, ids_all, g_rows,
            lr1, opt1.betas, opt1.eps, opt1.weight_decay,
        )
        return (
            merge_table(new_rest, new_table),
            LazyOptState(new_rest_state, new_tstate),
            loss,
        )

    if steps <= 1:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng, lr1, lr2, step0=0):
            step_rng = jax.random.fold_in(rng, step0)
            return LazyTrainStepOutput(
                *one_step(params, opt_state, batch, step_rng, lr1, lr2)
            )

        return train_step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(params, opt_state, batches, rng, lr1, lr2, step0=0):
        # per-step keys are a pure function of (base key, global step) so
        # the stream is identical at every steps_per_call (see
        # task_retrieval.train_step_from_loss)
        idxs = step0 + jnp.arange(steps)

        def body(carry, xs):
            batch, idx = xs
            step_rng = jax.random.fold_in(rng, idx)
            p, o, loss = one_step(carry[0], carry[1], batch, step_rng, lr1, lr2)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, idxs)
        )
        return LazyTrainStepOutput(params, opt_state, losses)

    return train_steps
