"""Retrieval task: jit-compiled train / eval steps.

Replaces the reference's `Retrieval` Lightning head (models/retrieval.py):

- `make_train_step` reproduces training_step (retrieval.py:50-160):
  scatter target into past_ids -> embed -> forward -> negative sampling ->
  shift-by-one supervision (outputs[:, :-1] vs ids[:, 1:]) ->
  sampled-softmax loss -> optimizer update. The manual 2-optimizer
  zero_grad/backward/step dance collapses into one value_and_grad + optax
  multi-transform update.
- `make_eval_step` reproduces retrieve() + validation_step
  (retrieval.py:20-48, 171-198): forward -> last-position embedding ->
  filtered brute-force MIPS top-k against the refreshed candidate matrix.

All steps are donate-argnum jitted and mesh-shardable: the batch is
sharded over the "data" axis, params replicated (or table-sharded via
parallel/embedding_sharding.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mygenerativerecommenders_tpu.configs import Config
from mygenerativerecommenders_tpu.models.losses import (
    bce_loss,
    sampled_softmax_loss,
)
from mygenerativerecommenders_tpu.models.model import GenerativeRecommender
from mygenerativerecommenders_tpu.models.negatives import (
    InBatchNegativesSampler,
    LocalNegativesSampler,
)
from mygenerativerecommenders_tpu.ops.sequence import (
    get_current_embeddings,
    scatter_at_lengths,
)
from mygenerativerecommenders_tpu.ops.topk import mips_top_k
from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch


class TrainStepOutput(NamedTuple):
    params: Any
    opt_state: Any
    loss: jax.Array


def make_sampler(cfg: Config):
    s = cfg.model.sampler
    if s.kind == "local":
        return LocalNegativesSampler(l2_norm=s.l2_norm, l2_norm_eps=s.l2_norm_eps)
    if s.kind == "in_batch":
        return InBatchNegativesSampler(
            l2_norm=s.l2_norm,
            l2_norm_eps=s.l2_norm_eps,
            dedup_embeddings=s.dedup_embeddings,
        )
    raise ValueError(f"Unknown sampler kind {s.kind}")


def make_loss_fn(
    model: GenerativeRecommender,
    cfg: Config,
    all_item_ids: np.ndarray,
    packed: bool = False,
) -> Callable:
    """Builds loss_fn(params, batch, rng) -> scalar loss.

    packed=True consumes PackedBatchLoader batches (data/packing.py):
    several segments per row, targets inline as each segment's last
    token, supervision masked at segment boundaries. The set of
    supervised (position, target) terms matches the unpacked layout for
    the same examples exactly."""
    if packed:
        p = cfg.model
        problems = []
        if p.task != "retrieval":
            problems.append("model.task=retrieval")
        if p.preprocessor.kind != "learnable_positional":
            problems.append("preprocessor.kind=learnable_positional")
        if p.encoder.kind != "hstu" or p.encoder.normalization not in (
            "rel_bias", "hstu_rel_bias"
        ):
            problems.append("encoder.kind=hstu with rel_bias normalization")
        if p.encoder.sp_shards > 1:
            problems.append("encoder.sp_shards=1 (packing replaces the ring)")
        if problems:
            raise ValueError(
                "data.pack_sequences requires: " + ", ".join(problems)
            )
    sampler = make_sampler(cfg)
    loss_cfg = cfg.model.loss
    # NOTE: keep closure constants as NUMPY arrays — device-array
    # constants are fetched D2H during MLIR lowering, which costs
    # ~80s/array over the axon TPU tunnel (measured; see PARITY.md).
    catalog = np.asarray(all_item_ids, dtype=np.int32)
    max_out = cfg.model.gr_output_length + 1
    # dense-catalog negatives: valid exactly when the negative logits are
    # plain dot products against normalized catalog rows
    dense_neg = str(loss_cfg.dense_catalog_negatives).lower()
    applicable = (
        loss_cfg.kind == "sampled_softmax"
        and cfg.model.sampler.kind == "local"
        and cfg.model.similarity.kind == "dot_product"
    )
    # auto additionally gates on the [B*T, X] count footprint: the dense
    # path trades the per-sample gather/scatter for whole-catalog matmuls.
    # With the fused Pallas kernels (u8 count, VMEM-resident logits) dense
    # wins well past ml-20m scale — measured on v5e: X=26744 55 vs 73 ms,
    # X=100k 96 vs 103 ms — so the gate is the ~2.7 GB u8 count buffer
    # (~3e9 elements), past which HBM pressure (plus the shrinking margin)
    # favors per-sample. The jnp fallback path materializes f32 count +
    # [BT, X] logits, so it keeps the tighter 4e8 (~1.6 GB) gate.
    # Explicit true overrides the gate.
    from mygenerativerecommenders_tpu.models.model import _resolve_use_pallas

    bt_rows = cfg.data.batch_size * (
        cfg.data.max_sequence_length + cfg.model.gr_output_length + 1
    )
    x_pad = ((len(all_item_ids) + 127) // 128) * 128
    pallas = _resolve_use_pallas(cfg.model.encoder.use_pallas)
    fits = bt_rows * x_pad <= (3e9 if pallas else 4e8)
    use_dense_neg = applicable and (
        dense_neg in ("true", "1", "yes")
        or (dense_neg == "auto" and fits)
    )
    if dense_neg in ("true", "1", "yes") and not applicable:
        raise ValueError(
            "loss.dense_catalog_negatives=true requires sampled_softmax + "
            "local sampler + dot_product similarity"
        )
    # id -> catalog offset (-1 for ids outside the catalog, e.g. padding);
    # lets the accidental-hit mask compare offsets instead of gathering
    # [B, T, R] ids (negatives.py sample_offsets docstring)
    id_to_offset_np = np.full(int(np.max(all_item_ids)) + 1, -1, dtype=np.int32)
    id_to_offset_np[np.asarray(all_item_ids)] = np.arange(
        len(all_item_ids), dtype=np.int32
    )
    id_to_offset = id_to_offset_np  # numpy on purpose (see catalog note)
    # contiguous catalogs (ml-1m: ids 1..X) map with arithmetic instead
    # of a [B*T]-gather (XLA gathers cost ~0.1 ms/step at ml-1m shapes)
    _ids_np = np.asarray(all_item_ids)
    _contig_start = (
        int(_ids_np[0])
        if len(_ids_np) > 0
        and int(_ids_np[-1]) - int(_ids_np[0]) + 1 == len(_ids_np)
        and bool(np.all(np.diff(_ids_np) == 1))
        else None
    )
    num_catalog = len(_ids_np)

    def ids_to_offsets(sup_ids: jax.Array) -> jax.Array:
        if _contig_start is not None:
            off = sup_ids.astype(jnp.int32) - _contig_start
            return jnp.where((off >= 0) & (off < num_catalog), off, -1)
        return jnp.take(id_to_offset, jnp.clip(sup_ids, 0, None), axis=0)

    def encode_for_loss(params: Any, batch: Dict[str, jax.Array], rng: jax.Array):
        """Shared preamble of every retrieval loss variant: target scatter
        (retrieval.py:86-90), embed, forward, shift-by-one supervision
        layout (outputs[:, :-1] vs ids[:, 1:]) and presence weights.

        Packed layout: targets are already inline (each segment's last
        token) and the shift-by-one additionally masks segment
        boundaries, so position p supervises ids[p+1] only when p+1 is
        in the SAME segment."""
        drop_rng, neg_rng = jax.random.split(rng)
        if packed:
            from mygenerativerecommenders_tpu.utils.features import (
                packed_seq_features,
            )

            seq = packed_seq_features(batch)
            past_ids = seq.past_ids
        else:
            seq, target_ids, _ = seq_features_from_batch(batch, max_out)
            # target goes at position `length` (retrieval.py:86-90)
            past_ids = scatter_at_lengths(seq.past_ids, seq.past_lengths, target_ids)
            seq = seq._replace(past_ids=past_ids)

        def lookup(ids):
            return model.apply(params, ids, method=model.item_embeddings)

        input_embeddings = lookup(past_ids)
        seq = seq._replace(past_embeddings=input_embeddings)
        encoded, _ = model.apply(
            params, seq, deterministic=False, rngs={"dropout": drop_rng}
        )  # [B, N, D]

        outputs = encoded[:, :-1, :]  # [B, N-1, D]
        sup_ids = past_ids[:, 1:]  # [B, N-1]
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
        return lookup, past_ids, outputs, sup_ids, sup_emb, weights, neg_rng

    def loss_fn(params: Any, batch: Dict[str, jax.Array], rng: jax.Array) -> jax.Array:
        lookup, past_ids, outputs, sup_ids, sup_emb, weights, neg_rng = (
            encode_for_loss(params, batch, rng)
        )

        num_neg = loss_cfg.num_to_sample if loss_cfg.kind == "sampled_softmax" else 1
        if isinstance(sampler, InBatchNegativesSampler):
            presences = past_ids != 0
            if "sample_weight" in batch:
                presences = jnp.logical_and(
                    presences, batch["sample_weight"][:, None] > 0
                )
            pool, count = sampler.process_batch(past_ids, presences)
            neg_ids, neg_emb = sampler(
                neg_rng, sup_ids, num_neg, pool, count, lookup
            )
            hits = sup_ids[..., None] == neg_ids
        else:
            norm_catalog = sampler.normalize_embeddings(lookup(catalog))
            neg_offsets, neg_emb = sampler.sample_offsets(
                neg_rng, sup_ids, num_neg, norm_catalog
            )
            sup_offsets = ids_to_offsets(sup_ids)
            hits = sup_offsets[..., None] == neg_offsets
            neg_ids = None  # ids never materialized on the hot path

        pos_emb = sampler.normalize_embeddings(sup_emb)

        def score(q, items, ids=None):
            return model.apply(params, q, items, ids, method=model.score)

        t = loss_cfg.temperature
        if loss_cfg.kind == "sampled_softmax":
            pos_logits = score(outputs, pos_emb[..., None, :])[..., 0] / t
            neg_logits = score(outputs, neg_emb, neg_ids) / t
            return sampled_softmax_loss(pos_logits, neg_logits, hits, weights)
        if loss_cfg.kind == "bce":
            pos_logits = score(outputs, pos_emb[..., None, :])[..., 0] / t
            neg_logits = score(outputs, neg_emb)[..., 0] / t
            return bce_loss(pos_logits, neg_logits, hits[..., 0], weights)
        raise ValueError(f"Unknown retrieval loss {loss_cfg.kind}")

    def loss_fn_dense(
        params: Any, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> jax.Array:
        """Same sampled-softmax loss via the dense-catalog negative path
        (ops/dense_negatives.py): no per-sample gather/scatter — the step's
        dominant cost on TPU. RNG stream and loss value match loss_fn."""
        from mygenerativerecommenders_tpu.ops.dense_negatives import (
            sampled_softmax_dense_neg_lse,
        )

        lookup, _, outputs, sup_ids, sup_emb, weights, neg_rng = (
            encode_for_loss(params, batch, rng)
        )
        norm_catalog = sampler.normalize_embeddings(lookup(catalog))
        neg_offsets = sampler.offsets_only(
            neg_rng, sup_ids, loss_cfg.num_to_sample, norm_catalog.shape[0]
        )
        sup_offsets = ids_to_offsets(sup_ids)

        t = loss_cfg.temperature
        pos_emb = sampler.normalize_embeddings(sup_emb)
        pos_logits = (outputs * pos_emb).sum(-1) / t
        from mygenerativerecommenders_tpu.models.model import _resolve_use_pallas

        neg_lse = sampled_softmax_dense_neg_lse(
            outputs, norm_catalog, neg_offsets, sup_offsets, t,
            use_pallas=_resolve_use_pallas(cfg.model.encoder.use_pallas),
        )
        per_pos = jnp.logaddexp(pos_logits, neg_lse) - pos_logits
        w = weights.astype(per_pos.dtype)
        return (per_pos * w).sum() / jnp.maximum(w.sum(), 1e-12)

    def loss_fn_shared(
        params: Any, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> jax.Array:
        """Sampled softmax with ONE negative set per step shared by all
        supervision positions (loss.shared_negatives — an opt-in
        algorithm change, see LossConfig). Negative scoring is a single
        [B, T, D] x [R, D] einsum; accidental hits are masked per
        position exactly as in the per-position loss."""
        lookup, _, outputs, sup_ids, sup_emb, weights, neg_rng = (
            encode_for_loss(params, batch, rng)
        )
        offsets = jax.random.randint(
            neg_rng, (loss_cfg.num_to_sample,), 0, catalog.shape[0]
        )
        neg_ids = jnp.take(jnp.asarray(catalog), offsets, axis=0)  # [R]
        neg_emb = sampler.normalize_embeddings(lookup(neg_ids))  # [R, D]
        hits = sup_ids[..., None] == neg_ids[None, None, :]  # [B, T, R]

        t = loss_cfg.temperature
        pos_emb = sampler.normalize_embeddings(sup_emb)
        pos_logits = (outputs * pos_emb).sum(-1) / t
        neg_logits = (
            jnp.einsum(
                "btd,rd->btr", outputs, neg_emb,
                preferred_element_type=jnp.float32,
            )
            / t
        )
        return sampled_softmax_loss(pos_logits, neg_logits, hits, weights)

    if loss_cfg.shared_negatives:
        if not applicable:
            raise ValueError(
                "loss.shared_negatives requires sampled_softmax + local "
                "sampler + dot_product similarity"
            )
        return loss_fn_shared
    if use_dense_neg:
        return loss_fn_dense
    return loss_fn


def train_step_from_loss(loss_fn: Callable, cfg: Config, steps: int = 1) -> Callable:
    """Wrap loss_fn(params, batch, rng) into a donate-jitted optimizer step.

    steps=1: train_step(params, opt_state, batch, rng, lr1, lr2[, step0])
    with a scalar loss. steps>1: the batch argument carries a leading
    [steps] axis and the optimizer steps run inside one lax.scan — a
    single device dispatch per `steps` optimizer updates, which amortizes
    the per-call host/runtime overhead (the reference has no analog; its
    per-step Python loop is hidden behind CUDA's ~µs launch latency,
    while a remote TPU runtime pays ~ms per call); loss comes back as a
    [steps] array.

    The per-step rng is fold_in(rng, step0 + i) with `step0` the GLOBAL
    step index of the call's first step — so the training RNG stream is
    a pure function of (base key, global step) and identical for every
    trainer.steps_per_call value (r2 VERDICT item 8; previously keys
    were split per call, making the stream depend on k).
    """
    opt2 = cfg.optimizer2 if cfg.optimizer2.enabled else None

    def one_step(params, opt_state, batch, step_rng, lr1, lr2):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_rng)
        tx = build_optimizer(cfg.optimizer1, opt2, params, lr1, lr2)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        return new_params, new_opt_state, loss

    if steps <= 1:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng, lr1, lr2, step0=0):
            step_rng = jax.random.fold_in(rng, step0)
            return TrainStepOutput(
                *one_step(params, opt_state, batch, step_rng, lr1, lr2)
            )

        return train_step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(params, opt_state, batches, rng, lr1, lr2, step0=0):
        idxs = step0 + jnp.arange(steps)

        def body(carry, xs):
            batch, idx = xs
            step_rng = jax.random.fold_in(rng, idx)
            p, o, loss = one_step(carry[0], carry[1], batch, step_rng, lr1, lr2)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, idxs)
        )
        return TrainStepOutput(params, opt_state, losses)

    return train_steps


def make_train_step(
    model: GenerativeRecommender,
    cfg: Config,
    all_item_ids: np.ndarray,
    steps: int = 1,
    packed: bool = False,
) -> Callable:
    """train_step(params, opt_state, batch, rng, lr1, lr2) -> TrainStepOutput."""
    if cfg.model.embedding.lazy_update:
        from mygenerativerecommenders_tpu.train.lazy_embedding import (
            make_lazy_train_step,
        )

        return make_lazy_train_step(model, cfg, all_item_ids, steps, packed=packed)
    loss_fn = make_loss_fn(model, cfg, all_item_ids, packed=packed)
    return train_step_from_loss(loss_fn, cfg, steps)


def index_sharded_on(cfg: Config) -> bool:
    """Resolve index.sharded: sharded-candidate eval engages for sharded
    embedding kinds with exact (non-int8) scoring."""
    s = str(cfg.model.index.sharded).lower()
    if s in ("false", "0", "no", "off"):
        return False
    applicable = (
        cfg.model.embedding.kind
        in ("sharded_local", "sharded_a2a", "sharded_column", "sharded_2d")
        and cfg.model.embedding.num_shards > 1
    )
    if s == "auto":
        return applicable
    if s in ("true", "1", "yes", "on"):
        if not applicable:
            raise ValueError(
                "index.sharded=true requires a sharded embedding kind with "
                "num_shards > 1"
            )
        return True
    raise ValueError(f"Unknown index.sharded {cfg.model.index.sharded!r}")


def make_candidate_fn(
    model: GenerativeRecommender, cfg: Config, all_item_ids: np.ndarray,
    mesh=None,
) -> Callable:
    """Refresh the candidate matrix: normalized catalog embeddings
    (retrieval.py:165-169). With index.sharded resolved on (and the
    trainer's mesh passed), the matrix stays ROW-SHARDED over "model" —
    no device holds the full [X, D]."""
    sampler = make_sampler(cfg)
    # NOTE: keep closure constants as NUMPY arrays — device-array
    # constants are fetched D2H during MLIR lowering, which costs
    # ~80s/array over the axon TPU tunnel (measured; see PARITY.md).
    catalog = np.asarray(all_item_ids, dtype=np.int32)

    quantize = cfg.model.index.quantize

    if mesh is not None and index_sharded_on(cfg):
        from jax.sharding import NamedSharding, PartitionSpec as P

        shards = mesh.shape["model"]
        x_pad = ((len(catalog) + shards - 1) // shards) * shards
        catalog_padded = np.zeros(x_pad, dtype=np.int32)
        catalog_padded[: len(catalog)] = catalog  # pad rows carry id 0
        spec = NamedSharding(mesh, P("model", None))

        @jax.jit
        def candidates_sharded(params):
            emb = model.apply(
                params, catalog_padded, method=model.item_embeddings
            )
            emb = sampler.normalize_embeddings(emb)
            emb = jnp.where(catalog_padded[:, None] > 0, emb, 0.0)
            return jax.lax.with_sharding_constraint(emb, spec)

        if quantize == "int8":
            from jax.sharding import NamedSharding as _NS

            from mygenerativerecommenders_tpu.ops.quantized_topk import (
                QuantizedCatalog,
                quantize_rows,
            )

            scale_spec = _NS(mesh, P("model"))

            @jax.jit
            def candidates_sharded_q(params):
                exact = candidates_sharded(params)
                q, scales = quantize_rows(exact)
                return QuantizedCatalog(
                    q=jax.lax.with_sharding_constraint(q, spec),
                    scales=jax.lax.with_sharding_constraint(
                        scales, scale_spec
                    ),
                    exact=exact,
                )

            return candidates_sharded_q
        if quantize not in ("", "none"):
            raise ValueError(f"Unknown index.quantize {quantize!r}")
        return candidates_sharded

    @jax.jit
    def candidates(params) -> jax.Array:
        emb = model.apply(params, catalog, method=model.item_embeddings)
        return sampler.normalize_embeddings(emb)  # [X, D]

    if quantize == "int8":
        from mygenerativerecommenders_tpu.ops.quantized_topk import (
            quantize_catalog,
        )

        @jax.jit
        def candidates_q(params):
            return quantize_catalog(candidates(params), keep_exact=True)

        return candidates_q
    if quantize not in ("", "none"):
        raise ValueError(f"Unknown index.quantize {quantize!r}")
    return candidates


def make_eval_step(
    model: GenerativeRecommender,
    cfg: Config,
    all_item_ids: np.ndarray,
    max_item_id: int,
    mesh=None,
    steps: int = 1,
) -> Callable:
    """eval_step(params, batch, candidates) -> (top_k_ids, top_k_scores).

    steps > 1: `batch` carries a leading [steps] axis (stacked eval
    batches) and ONE device call scans over them, returning stacked
    results — amortizes per-dispatch host latency exactly like the train
    path's trainer.steps_per_call (the axon tunnel costs ~1.6 ms per
    dispatch; the eval step's device time is ~1.1 ms at ml-1m shapes)."""
    # NOTE: keep closure constants as NUMPY arrays — device-array
    # constants are fetched D2H during MLIR lowering, which costs
    # ~80s/array over the axon TPU tunnel (measured; see PARITY.md).
    catalog = np.asarray(all_item_ids, dtype=np.int32)
    k = cfg.model.index.k
    filter_past = cfg.model.index.filter_past_ids
    quantize = cfg.model.index.quantize
    over_fetch = cfg.model.index.rescore_over_fetch
    max_out = cfg.model.gr_output_length + 1

    if mesh is not None and index_sharded_on(cfg):
        from mygenerativerecommenders_tpu.parallel.topk_sharded import (
            sharded_mips_top_k,
            sharded_mips_top_k_int8,
        )

        shards = mesh.shape["model"]
        x_pad = ((len(catalog) + shards - 1) // shards) * shards
        catalog_padded = np.zeros(x_pad, dtype=np.int32)
        catalog_padded[: len(catalog)] = catalog
        k_eff = min(k, len(all_item_ids))

        def eval_step_sharded(params, batch, candidates):
            seq, _, _ = seq_features_from_batch(batch, max_out)
            input_embeddings = model.apply(
                params, seq.past_ids, method=model.item_embeddings
            )
            seq = seq._replace(past_embeddings=input_embeddings)
            encoded, lengths = model.apply(params, seq, deterministic=True)
            current = get_current_embeddings(lengths, encoded)  # [B, D]
            invalid = seq.past_ids if filter_past else None
            if quantize == "int8":
                # per-shard int8 pre-rank + LOCAL exact re-score (each
                # shard holds its own exact rows), merge on exact scores
                return sharded_mips_top_k_int8(
                    mesh, current, candidates.q, candidates.scales,
                    candidates.exact, jnp.asarray(catalog_padded),
                    k=k_eff, invalid_ids=invalid, over_fetch=over_fetch,
                )
            return sharded_mips_top_k(
                mesh, current, candidates, jnp.asarray(catalog_padded),
                k=k_eff, invalid_ids=invalid,
                approx_recall=float(cfg.model.index.approx_top_k_recall),
            )

        if steps > 1:
            # k stacked batches per dispatch with the per-shard top-k's
            # collectives INSIDE the scan (shard_map composes with
            # lax.map under jit) — the 100M-item sharded-index eval gets
            # the same dispatch amortization as the replicated path
            @jax.jit
            def eval_steps_sharded(params, batches, candidates):
                return jax.lax.map(
                    lambda bb: eval_step_sharded(params, bb, candidates),
                    batches,
                )

            return eval_steps_sharded

        return jax.jit(eval_step_sharded)

    def _eval_body(
        params, batch: Dict[str, jax.Array], candidates: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        seq, _, _ = seq_features_from_batch(batch, max_out)
        input_embeddings = model.apply(
            params, seq.past_ids, method=model.item_embeddings
        )
        seq = seq._replace(past_embeddings=input_embeddings)
        encoded, lengths = model.apply(params, seq, deterministic=True)
        current = get_current_embeddings(lengths, encoded)  # [B, D]
        invalid = seq.past_ids if filter_past else None
        if quantize == "int8":
            from mygenerativerecommenders_tpu.ops.quantized_topk import (
                mips_top_k_int8,
            )

            return mips_top_k_int8(
                current,
                candidates,
                jnp.asarray(catalog),
                k=min(k, len(all_item_ids)),
                invalid_ids=invalid,
                max_item_id=max_item_id,
                over_fetch=over_fetch,
            )
        return mips_top_k(
            current,
            candidates,
            catalog,
            k=min(k, len(all_item_ids)),
            invalid_ids=invalid,
            max_item_id=max_item_id,
            approx_recall=float(cfg.model.index.approx_top_k_recall),
        )

    if steps > 1:
        @jax.jit
        def eval_steps(params, batches, candidates):
            return jax.lax.map(
                lambda bb: _eval_body(params, bb, candidates), batches
            )

        return eval_steps

    return jax.jit(_eval_body)


def make_packed_eval_step(
    model: GenerativeRecommender,
    cfg: Config,
    all_item_ids: np.ndarray,
    max_item_id: int,
    mesh=None,
    steps: int = 1,
) -> Callable:
    """eval_step(params, batch, candidates) -> (ids, scores, targets,
    weights), all [S_cap, ...] — the PACKED eval path.

    Consumes PackedBatchLoader(include_target=False) batches: several
    history segments per attention row, each segment's LAST position is
    one retrieval query, and the per-query top-k filter uses ONLY that
    segment's own ids (seg_invalid_ids) — a packed row must not filter
    by its neighbors' histories. Per-row results are identical to the
    unpacked eval step for the same examples (tests/test_packing.py).

    With index.sharded resolved on (and the trainer's mesh passed), the
    per-segment queries drive the ROW-SHARDED per-shard top-k + merge
    (parallel/topk_sharded.py) — packed eval composes with the
    100M-item sharded index (the packed loader rounds S_cap to a
    multiple of the data axis, so the shard_map query spec divides).
    """
    catalog = np.asarray(all_item_ids, dtype=np.int32)
    k = cfg.model.index.k
    quantize = cfg.model.index.quantize
    over_fetch = cfg.model.index.rescore_over_fetch
    filter_past = cfg.model.index.filter_past_ids
    k_eff = min(k, len(all_item_ids))

    sharded = mesh is not None and index_sharded_on(cfg)
    if sharded:
        shards = mesh.shape["model"]
        x_pad = ((len(catalog) + shards - 1) // shards) * shards
        catalog_padded = np.zeros(x_pad, dtype=np.int32)
        catalog_padded[: len(catalog)] = catalog

    def eval_step(params, batch, candidates):
        from mygenerativerecommenders_tpu.utils.features import (
            packed_seq_features,
        )

        seq = packed_seq_features(batch)
        input_embeddings = model.apply(
            params, seq.past_ids, method=model.item_embeddings
        )
        seq = seq._replace(past_embeddings=input_embeddings)
        encoded, _ = model.apply(params, seq, deterministic=True)
        p, l, d = encoded.shape
        queries = jnp.take(
            encoded.reshape(p * l, d), batch["seg_last_flat"], axis=0
        )  # [S_cap, D]
        invalid = batch["seg_invalid_ids"] if filter_past else None
        if sharded:
            from mygenerativerecommenders_tpu.parallel.topk_sharded import (
                sharded_mips_top_k,
                sharded_mips_top_k_int8,
            )

            if quantize == "int8":
                ids, scores = sharded_mips_top_k_int8(
                    mesh, queries, candidates.q, candidates.scales,
                    candidates.exact, jnp.asarray(catalog_padded),
                    k=k_eff, invalid_ids=invalid, over_fetch=over_fetch,
                )
            else:
                ids, scores = sharded_mips_top_k(
                    mesh, queries, candidates, jnp.asarray(catalog_padded),
                    k=k_eff, invalid_ids=invalid,
                    approx_recall=float(cfg.model.index.approx_top_k_recall),
                )
        elif quantize == "int8":
            from mygenerativerecommenders_tpu.ops.quantized_topk import (
                mips_top_k_int8,
            )

            ids, scores = mips_top_k_int8(
                queries, candidates, jnp.asarray(catalog),
                k=k_eff, invalid_ids=invalid,
                max_item_id=max_item_id, over_fetch=over_fetch,
            )
        else:
            ids, scores = mips_top_k(
                queries, candidates, catalog,
                k=k_eff, invalid_ids=invalid,
                max_item_id=max_item_id,
                approx_recall=float(cfg.model.index.approx_top_k_recall),
            )
        return ids, scores, batch["seg_target"], batch["seg_weight"]

    if steps > 1:
        # k stacked batches per dispatch (same motivation as
        # make_eval_step(steps=...): per-dispatch host latency); the
        # sharded top-k's collectives ride inside the lax.map
        @jax.jit
        def eval_steps(params, batches, candidates):
            return jax.lax.map(
                lambda bb: eval_step(params, bb, candidates), batches
            )

        return eval_steps

    return jax.jit(eval_step)
