"""The training driver — jit-compiled replacement for lightning.Trainer.

Owns: mesh setup, param/optimizer init, the epoch loop over the host
loader, validation (candidate refresh -> filtered top-k -> metrics),
plateau-LR + early-stop controllers keyed on the monitored metric,
checkpointing (best + last), CSV/JSONL metric logging, and seeded
determinism (jax.random key threading replaces L.seed_everything).

Debug profiles mirror the reference's Hydra debug tree (configs/debug/):
fast_dev_run (1 batch of train/val/test), limit_*_batches, overfit_batches,
detect_anomaly (jax.debug_nans), profiler (jax.profiler traces).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mygenerativerecommenders_tpu.configs import Config, max_seq_len, resolve, to_dict
from mygenerativerecommenders_tpu.data.dataset import BatchLoader, RecoData
from mygenerativerecommenders_tpu.models.metrics import retrieval_metrics
from mygenerativerecommenders_tpu.models.model import GenerativeRecommender, build_model
from mygenerativerecommenders_tpu.parallel.tensor_parallel import place_tp_params
from mygenerativerecommenders_tpu.train.checkpoint import CheckpointManager
from mygenerativerecommenders_tpu.train.controllers import (
    EarlyStopping,
    PlateauLRController,
)
from mygenerativerecommenders_tpu.train.loggers import (
    MetricsWriter,
    ProgressLine,
    RankedLogger,
)
from mygenerativerecommenders_tpu.train.optimizers import build_optimizer
from mygenerativerecommenders_tpu.train import task_retrieval
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

log = RankedLogger(__name__)


def make_mesh(
    num_devices: int = 0,
    model_axis: int = 1,
    sp_axis: int = 1,
    col_axis: int = 1,
    data_innermost: bool = False,
) -> Mesh:
    """(data[, model][, col][, sp]) mesh: "model" shards embedding-table
    rows (and TP matrices), "col" shards embedding-table columns
    (sharded_2d), "sp" shards the sequence axis (ring attention); "data"
    gets the rest.

    `data_innermost` controls which axes ride the fast interconnect:
    False (default) lays devices out [data, model, col, sp] so model/sp
    collective groups are CONSECUTIVE devices (intra-host ICI — the
    production layout: table all-to-alls and ring ppermutes stay on ICI,
    the data-axis gradient psum crosses hosts); True makes the data axis
    the consecutive one, so model/sp groups SPAN hosts — the layout that
    stresses cross-host all-to-all/ppermute (used by the real-2-process
    sharded tests, and the right choice when a model axis must span
    slices anyway)."""
    devices = jax.devices()
    n = num_devices or len(devices)
    shape, names = [], []
    if model_axis > 1:
        shape.append(model_axis)
        names.append("model")
    if col_axis > 1:
        shape.append(col_axis)
        names.append("col")
    if sp_axis > 1:
        shape.append(sp_axis)
        names.append("sp")
    denom = int(np.prod(shape)) if shape else 1
    data = n // denom
    if data < 1:
        raise ValueError(
            f"mesh needs {denom} devices for model_axis={model_axis} x "
            f"col_axis={col_axis} x sp_axis={sp_axis}, have {n}"
        )
    if data_innermost:
        arr = np.moveaxis(
            np.array(devices[: data * denom]).reshape(shape + [data]), -1, 0
        )
    else:
        arr = np.array(devices[: data * denom]).reshape([data] + shape)
    return Mesh(arr, axis_names=tuple(["data"] + names))


def enable_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA executable cache (jax_compilation_cache_dir):
    amortizes the 20-90s first-compile of the train step across runs.

    MYGR_TPU_NO_XLA_CACHE=1 disables it — concurrent processes racing
    writes into one cache dir have been observed to corrupt an entry
    (SIGABRT on load until the entry is purged), so the test suite opts
    out (tests/conftest.py) and parallel workloads should too."""
    if not cache_dir or os.environ.get("MYGR_TPU_NO_XLA_CACHE"):
        return
    path = os.path.expanduser(cache_dir)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never fail training over a cache
        log.info(f"compilation cache disabled ({e})")


class Trainer:
    def __init__(self, cfg: Config, data: Optional[RecoData] = None):
        self.cfg = cfg
        enable_compilation_cache(cfg.trainer.jax_cache_dir)
        self.data = data or RecoData(cfg.data, seed=cfg.trainer.seed)
        resolve(cfg, self.data.max_item_id)
        self.model: GenerativeRecommender = build_model(
            cfg, year_of_item=getattr(self.data, "year_of_item", None)
        )
        emb_kind = cfg.model.embedding.kind
        # "model"-axis sharded-table kinds (rows, or columns for
        # sharded_column; sharded_2d additionally uses the "col" axis)
        emb_shards = (
            cfg.model.embedding.num_shards
            if emb_kind in ("sharded_local", "sharded_a2a", "sharded_column",
                            "sharded_2d")
            else 1
        )
        col_axis = (
            cfg.model.embedding.col_shards if emb_kind == "sharded_2d" else 1
        )
        tp_shards = (
            cfg.model.encoder.tp_shards if cfg.model.encoder.kind == "hstu" else 1
        )
        if emb_shards > 1 and tp_shards > 1 and emb_shards != tp_shards:
            raise ValueError(
                "embedding.num_shards and encoder.tp_shards both use the "
                f"'model' mesh axis and must match ({emb_shards} vs {tp_shards})"
            )
        model_axis = max(emb_shards, tp_shards)
        sp_axis = cfg.model.encoder.sp_shards if cfg.model.encoder.kind == "hstu" else 1
        # tp_shards x sp_shards compose: the ring shard_map shards heads
        # over "model" (models/hstu.py _ring_attention head_axis)
        self.mesh = make_mesh(
            cfg.trainer.num_devices, model_axis=model_axis, sp_axis=sp_axis,
            col_axis=col_axis, data_innermost=cfg.trainer.mesh_data_innermost,
        )
        self._mesh_ctx = None
        if model_axis > 1 or sp_axis > 1 or col_axis > 1:
            # row-sharded embedding / ring attention: shard_map needs the
            # ambient mesh. Global setter; close() restores (tests rely on it).
            self._mesh_ctx = jax.sharding.set_mesh(self.mesh)
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        # [steps, batch, ...] stacks for the fused multi-step train call
        self.stacked_sharding = NamedSharding(self.mesh, P(None, "data"))
        self.replicated = NamedSharding(self.mesh, P())
        # PartitionSpec of the item table for sharded kinds (None = replicated)
        self._table_spec = {
            "sharded_local": P("model", None),
            "sharded_a2a": P("model", None),
            "sharded_column": P(None, "model"),
            "sharded_2d": P("model", "col"),
        }.get(emb_kind) if emb_shards > 1 else None

        self.all_item_ids = np.asarray(self.data.all_item_ids, dtype=np.int32)
        self.rng = jax.random.PRNGKey(cfg.trainer.seed)

        # --- init params with a dummy batch
        self.rng, init_rng = jax.random.split(self.rng)
        dummy = self._dummy_batch()
        seq, _, _ = seq_features_from_batch(dummy, cfg.model.gr_output_length + 1)
        self.params = jax.jit(
            functools.partial(self.model.init, method=self.model.init_all)
        )({"params": init_rng, "dropout": init_rng}, seq)
        self.params = jax.device_put(self.params, self.replicated)
        if self._table_spec is not None:
            table_sharding = NamedSharding(self.mesh, self._table_spec)
            p = dict(self.params["params"])
            emb = dict(p["embeddings"])
            emb["item_emb"] = jax.device_put(emb["item_emb"], table_sharding)
            p["embeddings"] = emb
            self.params = {**self.params, "params": p}
        # --- optimizer
        opt2 = cfg.optimizer2 if cfg.optimizer2.enabled else None
        if opt2 is not None and opt2.kind.startswith("scion") and opt2.scion_init:
            from mygenerativerecommenders_tpu.train.optimizers import (
                param_labels,
                scion_init_params,
            )

            self.rng, init2 = jax.random.split(self.rng)
            self.params = {
                **self.params,
                "params": scion_init_params(
                    init2,
                    self.params["params"],
                    param_labels(self.params)["params"],
                    opt2,
                ),
            }
        if tp_shards > 1:
            # AFTER scion_init_params — the Scion re-init regenerates
            # exactly the 2-D encoder matrices TP shards, so placing first
            # would silently drop the shardings
            self.params = place_tp_params(self.params, self.mesh)
        if cfg.model.embedding.lazy_update:
            from mygenerativerecommenders_tpu.train.lazy_embedding import (
                init_lazy_opt_state,
            )

            self.opt_state = jax.jit(
                functools.partial(init_lazy_opt_state, cfg)
            )(self.params)
        else:
            tx = build_optimizer(cfg.optimizer1, opt2, self.params,
                                 cfg.optimizer1.lr, cfg.optimizer2.lr)
            self.opt_state = jax.jit(tx.init)(self.params)
        if model_axis == 1 and col_axis == 1:
            self.opt_state = jax.device_put(self.opt_state, self.replicated)
        # else: tx.init's jitted zeros_like inherits each param's sharding,
        # so the sharded table / TP kernels keep sharded optimizer moments
        # (force-replicating here would add per-step gather/scatter)

        # --- steps
        self._multi_step_cache: Dict[int, Any] = {}
        self.task = cfg.model.task
        self._packed = bool(cfg.data.pack_sequences)
        if self.task == "retrieval":
            self.train_step = task_retrieval.make_train_step(
                self.model, cfg, self.all_item_ids, packed=self._packed
            )
            self.eval_step = task_retrieval.make_eval_step(
                self.model, cfg, self.all_item_ids, self.data.max_item_id,
                mesh=self.mesh,
            )
            # batched eval (trainer.steps_per_call batches per dispatch):
            # per-dispatch host latency dominates the ~ms-scale eval step
            # (see benchmarks/eval_bench.py). Composes with the sharded
            # index (the per-shard top-k's collectives ride inside the
            # lax.map) and with multi-process (the stacked batch shards
            # over data like the train path; outputs come back through
            # _local_rows(axis=1)).
            k_eval = max(int(cfg.trainer.steps_per_call), 1)
            self.eval_step_many = (
                task_retrieval.make_eval_step(
                    self.model, cfg, self.all_item_ids, self.data.max_item_id,
                    mesh=self.mesh, steps=k_eval,
                )
                if k_eval > 1
                else None
            )
            self.eval_steps_per_call = k_eval if self.eval_step_many else 1
            self.candidate_fn = task_retrieval.make_candidate_fn(
                self.model, cfg, self.all_item_ids, mesh=self.mesh,
            )
            # packed EVAL: history-only segment packing with per-segment
            # top-k (exact vs unpacked, tests/test_packing.py); with a
            # sharded index the per-segment queries drive the per-shard
            # top-k + merge. Both paths are exact, so the choice is pure
            # throughput — data.pack_eval=auto picks the measured-faster
            # one per shape class (see DataConfig.pack_eval).
            pe = str(cfg.data.pack_eval).lower()
            if pe in ("true", "1", "yes", "on"):
                eval_pack_ok = True
            elif pe in ("false", "0", "no", "off"):
                eval_pack_ok = False
            elif pe == "auto":
                eval_pack_ok = cfg.data.max_sequence_length >= 512
            else:
                raise ValueError(f"Unknown data.pack_eval {cfg.data.pack_eval!r}")
            self._eval_packed = self._packed and eval_pack_ok
            self.packed_eval_step = (
                task_retrieval.make_packed_eval_step(
                    self.model, cfg, self.all_item_ids, self.data.max_item_id,
                    mesh=self.mesh,
                )
                if self._eval_packed
                else None
            )
            self.packed_eval_step_many = (
                task_retrieval.make_packed_eval_step(
                    self.model, cfg, self.all_item_ids, self.data.max_item_id,
                    mesh=self.mesh, steps=k_eval,
                )
                if self._eval_packed and k_eval > 1
                else None
            )
        elif self.task == "ranking":
            from mygenerativerecommenders_tpu.train import task_ranking

            self.train_step = task_ranking.make_train_step(
                self.model, cfg, packed=self._packed
            )
            # ranking eval stays UNPACKED (per-example last-position class
            # probabilities; packing only accelerates training)
            self.eval_step = task_ranking.make_eval_step(self.model, cfg)
            self.candidate_fn = None
        else:
            raise ValueError(f"Unknown task {self.task}")

        # --- controllers / io
        t = cfg.trainer
        self.lr1_ctrl = PlateauLRController(
            lr=cfg.optimizer1.lr,
            mode=cfg.scheduler1.mode,
            factor=cfg.scheduler1.factor,
            patience=cfg.scheduler1.patience,
            threshold=cfg.scheduler1.threshold,
            min_lr=cfg.scheduler1.min_lr,
        ) if cfg.scheduler1.kind == "plateau" else None
        self.lr2_ctrl = PlateauLRController(
            lr=cfg.optimizer2.lr,
            mode=cfg.scheduler2.mode,
            factor=cfg.scheduler2.factor,
            patience=cfg.scheduler2.patience,
            threshold=cfg.scheduler2.threshold,
            min_lr=cfg.scheduler2.min_lr,
        ) if cfg.scheduler2.kind == "plateau" and cfg.optimizer2.enabled else None
        self.early_stop = EarlyStopping(mode=t.mode, patience=t.early_stop_patience)
        self.out_dir = os.path.join(t.output_dir, cfg.experiment)
        self.writer = MetricsWriter(
            self.out_dir,
            enable_tensorboard=t.tensorboard,
            mlflow_dir=t.mlflow_dir,
            experiment=cfg.experiment,
        )
        if self.writer.mlflow is not None:
            flat = {}

            def _flatten(prefix, d):
                for k, v in d.items():
                    key = f"{prefix}.{k}" if prefix else k
                    if isinstance(v, dict):
                        _flatten(key, v)
                    else:
                        flat[key] = v

            _flatten("", to_dict(cfg))
            self.writer.mlflow.log_params(flat)
        self.ckpt = CheckpointManager(
            os.path.join(self.out_dir, "checkpoints"),
            monitor=t.monitor,
            mode=t.mode,
            async_save=t.async_checkpoint,
        )
        self.global_step = 0
        self.epoch = 0
        self.lr1 = cfg.optimizer1.lr
        self.lr2 = cfg.optimizer2.lr

        if t.detect_anomaly:
            jax.config.update("jax_debug_nans", True)

        # model summary (the RichModelSummary equivalent): params per family
        counts = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(self.params)[0]:
            keys = [str(getattr(k, "key", k)) for k in path]
            family = keys[1] if len(keys) > 1 else keys[0]
            counts[family] = counts.get(family, 0) + int(np.prod(leaf.shape))
        total = sum(counts.values())
        log.info(
            "model params: "
            + ", ".join(f"{k}={v:,}" for k, v in sorted(counts.items()))
            + f" | total={total:,}"
        )

    # ------------------------------------------------------------------
    def _dummy_batch(self) -> Dict[str, np.ndarray]:
        b = max(self.cfg.data.batch_size, 1)
        l = self.cfg.data.max_sequence_length
        batch = {
            "lengths": np.ones(b, dtype=np.int32),
            "ids": np.ones((b, l), dtype=np.int32),
            "ratings": np.ones((b, l), dtype=np.int32),
            "timestamps": np.ones((b, l), dtype=np.int32),
            "target_id": np.ones(b, dtype=np.int32),
            "target_rating": np.ones(b, dtype=np.int32),
            "target_timestamp": np.ones(b, dtype=np.int32),
            "sample_weight": np.ones(b, dtype=np.float32),
        }
        for col in self.cfg.data.additional_columns:
            batch[col] = np.zeros(b, dtype=np.int32)
        return batch

    def _put(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        if jax.process_count() > 1:
            # each process holds its own shard of the global batch; stitch
            # the process-local arrays into global arrays over the mesh
            return {
                k: jax.make_array_from_process_local_data(self.batch_sharding, v)
                for k, v in batch.items()
            }
        return jax.device_put(batch, self.batch_sharding)

    def _batches(self, loader: BatchLoader, limit: int):
        """Yield (host_batch, device_batch) with the H2D transfer of the
        next `prefetch` batches issued before the current one is consumed
        (double buffering; Lightning's DataLoader prefetch_factor analog)."""
        depth = max(int(self.cfg.trainer.prefetch), 1)
        from collections import deque

        queue = deque()
        it = iter(loader)
        for i, batch in enumerate(it):
            if i >= limit:
                break
            queue.append((batch, self._put(batch)))
            if len(queue) >= depth:
                yield queue.popleft()
        while queue:
            yield queue.popleft()

    def _put_stacked(self, stacked: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        if jax.process_count() > 1:
            return {
                k: jax.make_array_from_process_local_data(self.stacked_sharding, v)
                for k, v in stacked.items()
            }
        return jax.device_put(stacked, self.stacked_sharding)

    def _stacked_batches(self, loader: BatchLoader, limit: int, k: int):
        """Yield (host_batches, device_batch, n_steps) where n_steps == k
        means device_batch is a [k, B, ...] stack for the scanned
        multi-step call, and n_steps == 1 is a plain single batch (the
        epoch remainder). H2D transfers are double-buffered like
        _batches."""
        from collections import deque

        depth = max(int(self.cfg.trainer.prefetch), 1)
        queue = deque()
        chunk = []

        def flush_partial():
            for b in chunk:
                queue.append(([b], self._put(b), 1))
            chunk.clear()

        for i, batch in enumerate(loader):
            if i >= limit:
                break
            # length-bucketed loaders change the sequence shape at bucket
            # boundaries; a stack needs uniform shapes, so flush the open
            # chunk through the single-step path at a shape change
            if chunk and batch["ids"].shape != chunk[0]["ids"].shape:
                flush_partial()
            chunk.append(batch)
            if len(chunk) == k:
                stacked = {key: np.stack([b[key] for b in chunk]) for key in chunk[0]}
                queue.append((chunk, self._put_stacked(stacked), k))
                chunk = []
            while len(queue) >= depth:
                yield queue.popleft()
        flush_partial()
        while queue:
            yield queue.popleft()

    def _multi_train_step(self, k: int):
        """The k-step scanned train step (compiled lazily, cached per k)."""
        if k not in self._multi_step_cache:
            if self.task == "retrieval":
                fn = task_retrieval.make_train_step(
                    self.model, self.cfg, self.all_item_ids, steps=k,
                    packed=self._packed,
                )
            else:
                from mygenerativerecommenders_tpu.train import task_ranking

                fn = task_ranking.make_train_step(
                    self.model, self.cfg, steps=k, packed=self._packed
                )
            self._multi_step_cache[k] = fn
        return self._multi_step_cache[k]

    def _loader_sharding(self) -> tuple:
        """(process_index, process_count) for the loader's example-stream
        sharding. Processes own DISJOINT data-axis row slices only in the
        default mesh layout; with mesh_data_innermost every process's
        devices touch every data slice, so each process must load the
        IDENTICAL full global batch (make_array_from_process_local_data
        infers the global shape from the addressable shards — feeding
        process-local strided rows there would silently hand the model
        axis inconsistent replicas)."""
        if jax.process_count() == 1 or self.cfg.trainer.mesh_data_innermost:
            return 0, 1
        return jax.process_index(), jax.process_count()

    def _loader(self, split: str, packed: bool = False):
        """Split loader sharded by process (multi-host data parallelism).
        packed=True returns the PackedBatchLoader — train batches carry
        inline targets; eval splits pack history-only segments with
        per-segment query/target/filter fields (include_target=False)."""
        proc_idx, proc_cnt = self._loader_sharding()
        if packed:
            from mygenerativerecommenders_tpu.data.packing import (
                PackedBatchLoader,
            )

            d = self.cfg.data
            # capacity = one max segment rounded to the 128-tile: larger
            # rows amortize the endcap better but the O(row_len^2)
            # bias-table gradient terms grow faster (measured: 2x capacity
            # was a net 4x slowdown at ml-20m-long shapes)
            cap = d.pack_row_capacity or (
                (d.max_sequence_length + 1 + 127) // 128 * 128
            )
            ds = self.data.dataset(split)
            caps = list(d.pack_capacities) or None
            if caps:
                cap = max(caps)
            rows = d.pack_rows
            if not rows:
                mean_seg = float(np.mean(ds.lengths) + 1.0) if len(ds) else 1.0
                rows = max(1, int(round(d.batch_size * mean_seg / cap)))
            # rows shard over the mesh's data axis — round up to a multiple
            data_ax = dict(self.mesh.shape).get("data", 1)
            rows = ((rows + data_ax - 1) // data_ax) * data_ax
            return PackedBatchLoader(
                ds,
                rows_per_batch=rows,
                row_capacity=cap,
                shuffle=(split == "train"),
                seed=self.cfg.trainer.seed,
                process_index=proc_idx,
                process_count=proc_cnt,
                capacities=caps,
                row_multiple=data_ax,
                # every class emits ~batch_size-example batches, matching
                # the unpacked recipe's step semantics
                segments_per_batch=(0 if d.pack_rows else d.batch_size),
                include_target=(split == "train"),
            )
        return self.data.loader(
            split, process_index=proc_idx, process_count=proc_cnt,
        )

    def _local_rows(self, arr: jax.Array, axis: int = 0) -> np.ndarray:
        """This process's rows of a batch-sharded step output. Single
        process: the whole array. Multi-host: concatenated addressable
        shards along `axis` (0 for per-batch outputs, 1 for the stacked
        [k, B, ...] batched-dispatch outputs), deduplicated by shard
        offset — when a model/sp axis is replicated onto this process's
        devices, each data slice appears once."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[axis].start or 0
        )
        parts, seen = [], set()
        for s in shards:
            start = s.index[axis].start or 0
            if start in seen:
                continue
            seen.add(start)
            parts.append(np.asarray(s.data))
        return np.concatenate(parts, axis=axis)

    def _gather_rows(self, arr: np.ndarray) -> np.ndarray:
        """Concatenate per-process eval rows across hosts (the torchmetrics
        dist_reduce_fx="cat" analog, metrics/retrieval.py:33-34). Row counts
        may differ by one batch across processes, so pad to the max count
        before the fixed-shape all-gather, then drop the padding."""
        if jax.process_count() == 1:
            return arr
        if self._loader_sharding() == (0, 1):
            # every process already evaluated the FULL row set (identical
            # loaders under mesh_data_innermost) — gathering would
            # duplicate rows
            return arr
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([arr.shape[0]], dtype=np.int64)
        ).reshape(-1)
        max_count = int(counts.max())
        padded = np.zeros((max_count,) + arr.shape[1:], dtype=arr.dtype)
        padded[: arr.shape[0]] = arr
        gathered = multihost_utils.process_allgather(padded)  # [P, max, ...]
        return np.concatenate(
            [gathered[p, : int(counts[p])] for p in range(len(counts))], axis=0
        )

    # ------------------------------------------------------------------
    def train_epoch(self, loader: BatchLoader) -> float:
        t_cfg = self.cfg.trainer
        limit = len(loader)
        if t_cfg.fast_dev_run:
            limit = 1
        elif t_cfg.overfit_batches:
            limit = t_cfg.overfit_batches
        elif t_cfg.limit_train_batches < 1.0:
            limit = max(1, int(len(loader) * t_cfg.limit_train_batches))

        k = max(int(t_cfg.steps_per_call), 1)
        if t_cfg.profiler:
            k = 1  # per-step trace boundaries need one dispatch per step
        if k > 1:
            return self._train_epoch_multi(loader, limit, k)

        losses = []
        start = time.time()
        examples = 0
        progress = ProgressLine(
            limit, f"epoch {self.epoch}",
            enabled=None if t_cfg.progress_bar else False,
        )
        profile_dir = os.path.join(self.out_dir, "profile")
        for i, (batch, dev_batch) in enumerate(self._batches(loader, limit)):
            # jax.profiler trace of steps 2-4 of epoch 0 (the reference's
            # debug=profiler Lightning profile, configs/debug/profiler.yaml)
            if t_cfg.profiler and self.epoch == 0 and i == 2:
                jax.profiler.start_trace(profile_dir)
            # per-step keys derive from (base key, global step) inside the
            # step — the stream is steps_per_call-independent and resume
            # needs only global_step
            out = self.train_step(
                self.params, self.opt_state, dev_batch, self.rng,
                self.lr1, self.lr2, self.global_step,
            )
            self.params, self.opt_state = out.params, out.opt_state
            if t_cfg.profiler and self.epoch == 0 and i == 4:
                jax.block_until_ready(out.loss)
                jax.profiler.stop_trace()
                log.info(f"wrote profiler trace to {profile_dir}")
            self.global_step += 1
            examples += int(
                batch["num_segments"].sum() if "num_segments" in batch
                else batch["sample_weight"].sum()
            )
            if self.global_step % t_cfg.log_every_n_steps == 0:
                loss_val = float(out.loss)
                losses.append(loss_val)
                self.writer.log(
                    {"train/loss": loss_val, "lr1": self.lr1, "lr2": self.lr2},
                    self.global_step,
                    self.epoch,
                )
            progress.update(
                i + 1,
                loss=(losses[-1] if losses else None),
                lr=self.lr1,
                **{"ex/s": int(examples / max(time.time() - start, 1e-9))},
            )
        progress.close()
        # one final loss read per epoch for the epoch summary
        losses.append(float(out.loss))
        dt = time.time() - start
        log.info(
            f"epoch {self.epoch}: train loss {losses[-1]:.4f} "
            f"({examples / max(dt, 1e-9):.0f} ex/s)"
        )
        return losses[-1]

    def _train_epoch_multi(self, loader: BatchLoader, limit: int, k: int) -> float:
        """Epoch loop with k optimizer steps fused per device call
        (trainer.steps_per_call). The epoch remainder (limit % k batches)
        runs through the plain single-step path. Loss logging keeps the
        log_every_n_steps cadence, pulling the call's loss vector only
        when a boundary falls inside it (a D2H sync otherwise breaks the
        dispatch pipeline)."""
        t_cfg = self.cfg.trainer
        multi_step = self._multi_train_step(k)
        log_n = t_cfg.log_every_n_steps
        start = time.time()
        examples = 0
        out = None
        steps_done = 0
        last_loss = None
        progress = ProgressLine(
            limit, f"epoch {self.epoch}",
            enabled=None if t_cfg.progress_bar else False,
        )
        for host_batches, dev_batch, n_steps in self._stacked_batches(loader, limit, k):
            step_fn = multi_step if n_steps == k else self.train_step
            out = step_fn(
                self.params, self.opt_state, dev_batch, self.rng,
                self.lr1, self.lr2, self.global_step,
            )
            self.params, self.opt_state = out.params, out.opt_state
            prev = self.global_step
            self.global_step += n_steps
            examples += sum(
                int(
                    b["num_segments"].sum() if "num_segments" in b
                    else b["sample_weight"].sum()
                )
                for b in host_batches
            )
            if prev // log_n != self.global_step // log_n:
                last_loss = float(np.asarray(out.loss).reshape(-1)[-1])
                self.writer.log(
                    {"train/loss": last_loss, "lr1": self.lr1, "lr2": self.lr2},
                    self.global_step,
                    self.epoch,
                )
            steps_done += n_steps
            progress.update(
                steps_done,
                loss=last_loss,
                lr=self.lr1,
                **{"ex/s": int(examples / max(time.time() - start, 1e-9))},
            )
        progress.close()
        final = float(np.asarray(out.loss).reshape(-1)[-1])
        dt = time.time() - start
        log.info(
            f"epoch {self.epoch}: train loss {final:.4f} "
            f"({examples / max(dt, 1e-9):.0f} ex/s, {k} steps/call)"
        )
        return final

    # ------------------------------------------------------------------
    def eval_epoch(self, loader: BatchLoader, prefix: str = "val") -> Dict[str, float]:
        t_cfg = self.cfg.trainer
        limit = len(loader)
        if t_cfg.fast_dev_run:
            limit = 1
        elif prefix == "val" and t_cfg.limit_val_batches < 1.0:
            limit = max(1, int(len(loader) * t_cfg.limit_val_batches))

        if self.task == "ranking":
            from mygenerativerecommenders_tpu.models.metrics import multiclass_metrics

            all_probs, all_targets = [], []
            for batch, dev_batch in self._batches(loader, limit):
                probs = self.eval_step(self.params, dev_batch)
                valid = batch["sample_weight"] > 0
                all_probs.append(self._local_rows(probs)[valid])
                all_targets.append(batch["target_rating"][valid])
            results = multiclass_metrics(
                self._gather_rows(np.concatenate(all_probs, axis=0)),
                self._gather_rows(np.concatenate(all_targets, axis=0)),
                num_classes=self.cfg.model.preprocessor.num_ratings,
            )
        elif getattr(self, "_eval_packed", False) and getattr(
            loader, "include_target", True
        ) is False:
            # PACKED eval: one query per segment, per-segment filter
            candidates = self.candidate_fn(self.params)
            all_topk, all_targets = [], []
            if getattr(self, "packed_eval_step_many", None) is not None:
                k_eval = self.eval_steps_per_call
                for hbs, dev, n_steps in self._stacked_batches(
                    loader, limit, k_eval
                ):
                    if n_steps > 1:
                        ids_k, _, _, _ = self.packed_eval_step_many(
                            self.params, dev, candidates
                        )
                        ids_k = self._local_rows(ids_k, axis=1)
                        for i, hb in enumerate(hbs):
                            valid = hb["seg_weight"] > 0
                            all_topk.append(ids_k[i][valid])
                            all_targets.append(hb["seg_target"][valid])
                    else:
                        ids, _, _, _ = self.packed_eval_step(
                            self.params, dev, candidates
                        )
                        valid = hbs[0]["seg_weight"] > 0
                        all_topk.append(self._local_rows(ids)[valid])
                        all_targets.append(hbs[0]["seg_target"][valid])
            else:
                for batch, dev_batch in self._batches(loader, limit):
                    ids, _, _, _ = self.packed_eval_step(
                        self.params, dev_batch, candidates
                    )
                    valid = batch["seg_weight"] > 0
                    all_topk.append(self._local_rows(ids)[valid])
                    all_targets.append(batch["seg_target"][valid])
            top_k_ids = self._gather_rows(np.concatenate(all_topk, axis=0))
            target_ids = self._gather_rows(
                np.concatenate(all_targets, axis=0)
            )[:, None]
            results = retrieval_metrics(
                top_k_ids, target_ids, self.cfg.model.metrics.at_k_list
            )
        else:
            candidates = self.candidate_fn(self.params)
            all_topk, all_targets = [], []
            k_eval = getattr(self, "eval_steps_per_call", 1)
            if k_eval > 1:
                # k batches per dispatch via the train path's stacker
                # (host-side stacking, shape-boundary flush for bucketed
                # loaders, prefetch); remainders/odd shapes come through
                # with n_steps == 1
                for hbs, dev, n_steps in self._stacked_batches(
                    loader, limit, k_eval
                ):
                    if n_steps > 1:
                        ids_k, _ = self.eval_step_many(
                            self.params, dev, candidates
                        )
                        ids_k = self._local_rows(ids_k, axis=1)
                        for i, hb in enumerate(hbs):
                            valid = hb["sample_weight"] > 0
                            all_topk.append(ids_k[i][valid])
                            all_targets.append(hb["target_id"][valid])
                    else:
                        top_ids, _ = self.eval_step(
                            self.params, dev, candidates
                        )
                        valid = hbs[0]["sample_weight"] > 0
                        all_topk.append(self._local_rows(top_ids)[valid])
                        all_targets.append(hbs[0]["target_id"][valid])
            else:
                for batch, dev_batch in self._batches(loader, limit):
                    top_ids, _ = self.eval_step(
                        self.params, dev_batch, candidates
                    )
                    valid = batch["sample_weight"] > 0
                    all_topk.append(self._local_rows(top_ids)[valid])
                    all_targets.append(batch["target_id"][valid])
            top_k_ids = self._gather_rows(np.concatenate(all_topk, axis=0))
            target_ids = self._gather_rows(np.concatenate(all_targets, axis=0))[
                :, None
            ]
            results = retrieval_metrics(
                top_k_ids, target_ids, self.cfg.model.metrics.at_k_list
            )
        self.writer.log(
            {f"{prefix}/{k}": v for k, v in results.items()},
            self.global_step,
            self.epoch,
        )
        return results

    # ------------------------------------------------------------------
    def fit(self) -> Dict[str, float]:
        cfg, t = self.cfg, self.cfg.trainer
        monitor_key = t.monitor.split("/", 1)[1] if "/" in t.monitor else t.monitor
        train_loader = self._loader("train", packed=self._packed)
        val_loader = self._loader(
            "val", packed=getattr(self, "_eval_packed", False)
        )
        if t.ckpt_path:
            self.restore(t.ckpt_path)
        last_results: Dict[str, float] = {}
        max_epochs = 1 if t.fast_dev_run else t.max_epochs
        for self.epoch in range(self.epoch, max_epochs):
            self.train_epoch(train_loader)
            if (self.epoch + 1) % t.check_val_every_n_epoch != 0:
                continue
            results = self.eval_epoch(val_loader, "val")
            last_results = results
            metric = results.get(monitor_key)
            log.info(
                f"epoch {self.epoch}: "
                + " ".join(f"val/{k}={v:.4f}" for k, v in results.items())
            )
            if metric is not None:
                if self.lr1_ctrl is not None:
                    self.lr1 = self.lr1_ctrl.step(metric)
                if self.lr2_ctrl is not None:
                    self.lr2 = self.lr2_ctrl.step(metric)
                self.ckpt.save(
                    self.params,
                    self.opt_state,
                    step=self.global_step,
                    epoch=self.epoch,
                    metric_value=metric,
                    extra=self._controller_state(),
                )
                if (
                    self.epoch + 1 >= t.min_epochs
                    and self.early_stop.step(metric)
                ):
                    log.info(f"early stopping at epoch {self.epoch}")
                    break
        self.ckpt.flush()  # finish any in-flight async save
        return last_results

    def test(self, ckpt_path: Optional[str] = None) -> Dict[str, float]:
        path = ckpt_path or self.ckpt.best_path
        if path and os.path.exists(str(path)):
            self.params = self.ckpt.restore(
                str(path), {"params": self.params, "opt_state": self.opt_state}
            )["params"]
            log.info(f"loaded checkpoint {path}")
        return self.eval_epoch(
            self._loader("test", packed=getattr(self, "_eval_packed", False)),
            "test",
        )

    def predict(self) -> Dict[str, list]:
        if self.task != "retrieval":
            raise ValueError("predict() produces top-k lists; retrieval task only")
        candidates = self.candidate_fn(self.params)
        top_ids_all, top_scores_all = [], []
        if getattr(self, "_eval_packed", False):
            # packed plans group examples by capacity class / packing row:
            # collect (example, result) pairs and restore DATASET order
            # (cli/predict joins rows onto the sequence frame by position)
            loader = self._loader("test", packed=True)
            by_example = {}
            for batch, dev_batch in self._batches(loader, len(loader)):
                ids, scores, _, _ = self.packed_eval_step(
                    self.params, dev_batch, candidates
                )
                valid = batch["seg_weight"] > 0
                ids_np = self._local_rows(ids)[valid]
                scores_np = self._local_rows(scores)[valid]
                for ex, row_i, row_s in zip(
                    batch["seg_example"][valid], ids_np, scores_np
                ):
                    by_example[int(ex)] = (row_i.tolist(), row_s.tolist())
            for ex in sorted(by_example):
                top_ids_all.append(by_example[ex][0])
                top_scores_all.append(by_example[ex][1])
            return {"top_k_ids": top_ids_all, "top_k_scores": top_scores_all}
        loader = self._loader("test")
        for batch, dev_batch in self._batches(loader, len(loader)):
            ids, scores = self.eval_step(self.params, dev_batch, candidates)
            valid = batch["sample_weight"] > 0
            top_ids_all.extend(self._local_rows(ids)[valid].tolist())
            top_scores_all.extend(self._local_rows(scores)[valid].tolist())
        return {"top_k_ids": top_ids_all, "top_k_scores": top_scores_all}

    def close(self) -> None:
        """Restore global state (the ambient mesh) set by this trainer."""
        if self._mesh_ctx is not None:
            try:
                self._mesh_ctx.__exit__(None, None, None)
            except Exception:
                pass
            self._mesh_ctx = None

    # ------------------------------------------------------------------
    def _controller_state(self) -> Dict[str, Any]:
        return {
            "lr1": self.lr1_ctrl.state_dict() if self.lr1_ctrl else None,
            "lr2": self.lr2_ctrl.state_dict() if self.lr2_ctrl else None,
            "early_stop": self.early_stop.state_dict(),
            "rng": np.asarray(jax.random.key_data(self.rng)).tolist(),
        }

    def restore(self, path: str) -> None:
        state = self.ckpt.restore(
            path, {"params": self.params, "opt_state": self.opt_state}
        )
        self.params, self.opt_state = state["params"], state["opt_state"]
        meta = CheckpointManager.load_meta(path)
        self.global_step = meta["step"]
        self.epoch = meta["epoch"] + 1
        extra = meta.get("extra", {})
        if extra.get("lr1") and self.lr1_ctrl:
            self.lr1_ctrl.load_state_dict(extra["lr1"])
            self.lr1 = self.lr1_ctrl.lr
        if extra.get("lr2") and self.lr2_ctrl:
            self.lr2_ctrl.load_state_dict(extra["lr2"])
            self.lr2 = self.lr2_ctrl.lr
        if extra.get("early_stop"):
            self.early_stop.load_state_dict(extra["early_stop"])
        if extra.get("rng"):
            self.rng = jax.random.wrap_key_data(
                jnp.asarray(extra["rng"], dtype=jnp.uint32)
            )
        log.info(f"resumed from {path} at epoch {self.epoch}, step {self.global_step}")
