"""Cross-framework end-to-end convergence parity (VERDICT r3 item 1).

Trains the GENUINE reference torch modules — LocalEmbeddingModule,
LearnablePositionalEmbeddingInputFeaturesPreprocessor, HSTU,
L2NormEmbeddingPostprocessor, DotProductSimilarity,
LocalNegativesSampler, SampledSoftmaxLoss, CandidateIndex +
MIPSBruteForceTopK, RecoDataset — imported from /root/reference/src,
under a minimal no-Lightning driver that reproduces, line for line:

  * Retrieval.training_step        (models/retrieval.py:50-160)
  * GenerativeRecommenders.forward (models/generative_recommenders.py:355-393)
  * .dense_to_jagged               (generative_recommenders.py:395-425)
  * the val/test loops + index refresh (retrieval.py:162-246)
  * RetrievalMetrics' sentinel-rank computation (metrics/retrieval.py:41-67)
  * scripts/train.py's fit -> test-on-best protocol (train.py:73-84)
  * the ml-1m-hstu experiment recipe (configs/experiment/ml-1m-hstu.yaml:
    AdamW lr 1e-3 betas (0.9, 0.98) wd 1e-3 over ALL params — the
    `optimizer2: null` single-optimizer branch, generative_recommenders
    .py:280-290 — batch 128, ReduceLROnPlateau(max, 0.1, patience 10,
    threshold 1e-4) stepped on the last train batch with the previous
    val ndcg@100, early stop patience 20 on val/ndcg@100)

on the SAME synthetic sequence CSVs our trainer reads, then (arm
"ours") runs our Trainer on those identical files with the matching
model semantics (embedding.kind=item_year — the reference's
LocalEmbeddingModule IS the fork's half-item/half-year table,
embeddings.py:55-73). Lightning/Hydra are not installed; tiny module
stubs let the reference's reco_dataset.py import (only RecoDataset is
used — the Lightning DataModule class body just needs the base class
symbol to exist). The reference's module-level `item2year` dict
(embeddings.py:12-18 — a hardcoded-path CSV read that fails to {} in
this sandbox) is populated in place from the synthetic movies.csv, so
the year half of the embedding table is real on both arms.

Usage:
  python benchmarks/reference_e2e.py ref  [epochs] [users]
  python benchmarks/reference_e2e.py ours [epochs] [users]
  python benchmarks/reference_e2e.py both [epochs] [users]

Prints one JSON line per arm: {"arm": ..., "test": {...}, "best_val_ndcg100": ...}
"""

from __future__ import annotations

import copy
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REF = "/root/reference/src"
DATA_DIR = "tmp/ref_e2e"  # per-user-count subdir picked in ensure_data
SEED = 42
BATCH = 128
K = 200
AT_K = [10, 50, 100, 200]
GR_OUT = 10  # model/hstu.yaml:3
D = 50
MAX_SEQ = 200


def data_dir_for(users: int) -> str:
    return os.path.join(DATA_DIR, f"u{users}")


def ensure_data(users: int) -> str:
    """Generate (once) the synthetic dataset both arms read."""
    from mygenerativerecommenders_tpu.data.preprocessor import (
        SyntheticDataProcessor,
    )

    proc = SyntheticDataProcessor(
        prefix="synthetic", data_dir=data_dir_for(users), num_users=users
    )
    if not os.path.exists(proc.output_format_csv()):
        proc.preprocess_rating()
    return proc.processed_dir()


def _install_stubs():
    """Minimal lightning/hydra/omegaconf stand-ins so the reference's
    reco_dataset.py module body executes (RecoDataModule subclasses
    L.LightningDataModule; we only instantiate RecoDataset)."""
    if "lightning" not in sys.modules:
        L = types.ModuleType("lightning")

        class LightningDataModule:  # pragma: no cover - symbol only
            pass

        L.LightningDataModule = LightningDataModule
        sys.modules["lightning"] = L
    if "hydra" not in sys.modules:
        h = types.ModuleType("hydra")
        h.utils = types.SimpleNamespace(instantiate=None)
        sys.modules["hydra"] = h
        sys.modules["hydra.utils"] = h.utils  # type: ignore[assignment]
    if "omegaconf" not in sys.modules:
        o = types.ModuleType("omegaconf")

        class DictConfig(dict):  # pragma: no cover - symbol only
            pass

        o.DictConfig = DictConfig
        sys.modules["omegaconf"] = o


class RetrievalMetricsNumpy:
    """Reference metrics/retrieval.py:29-67 semantics, torch-free:
    rank = first position where concat([top_k_ids, target], dim=1)
    equals target (+1); sentinel column makes missing targets rank k+1."""

    def __init__(self):
        self.top_k: list[np.ndarray] = []
        self.targets: list[np.ndarray] = []

    def reset(self):
        self.top_k, self.targets = [], []

    def update(self, top_k_ids: np.ndarray, target_ids: np.ndarray):
        self.top_k.append(np.asarray(top_k_ids))
        self.targets.append(np.asarray(target_ids).reshape(-1, 1))

    def compute(self) -> dict[str, float]:
        top_k = np.concatenate(self.top_k, axis=0)
        target = np.concatenate(self.targets, axis=0)
        hit = np.concatenate([top_k, target], axis=1) == target
        ranks = hit.argmax(axis=1) + 1
        out = {}
        for at_k in AT_K:
            out[f"ndcg@{at_k}"] = float(
                np.where(ranks <= at_k, 1.0 / np.log2(ranks + 1), 0.0).mean()
            )
        for at_k in AT_K:
            out[f"hr@{at_k}"] = float((ranks <= at_k).mean())
        out["mrr"] = float((1.0 / ranks).mean())
        return out


def run_reference(
    epochs: int, users: int, save_ckpt_path: str | None = None
) -> dict:
    import torch

    _install_stubs()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    import pandas as pd

    import generative_recommenders_pl.models.embeddings.embeddings as ref_emb

    processed = ensure_data(users)
    movies = pd.read_csv(os.path.join(processed, "movies.csv"))
    # populate the fork's item->year table in place (embeddings.py:12-18;
    # reco_dataset.py:13 holds a reference to the same dict object)
    ref_emb.item2year.clear()
    ref_emb.item2year.update(
        {int(r["movie_id"]): int(r["year"]) for _, r in movies.iterrows()}
    )

    from generative_recommenders_pl.data.reco_dataset import RecoDataset, load_data
    from generative_recommenders_pl.models.embeddings.embeddings import (
        LocalEmbeddingModule,
    )
    from generative_recommenders_pl.models.indexing.candidate_index import (
        CandidateIndex,
    )
    from generative_recommenders_pl.models.indexing.top_k import MIPSBruteForceTopK
    from generative_recommenders_pl.models.losses.autoregressive_losses import (
        SampledSoftmaxLoss,
    )
    from generative_recommenders_pl.models.negatives_samples.negative_sampler import (
        LocalNegativesSampler,
    )
    from generative_recommenders_pl.models.postprocessors.postprocessors import (
        L2NormEmbeddingPostprocessor,
    )
    from generative_recommenders_pl.models.preprocessors.learnable_positional_embedding import (  # noqa: E501
        LearnablePositionalEmbeddingInputFeaturesPreprocessor,
    )
    from generative_recommenders_pl.models.sequential_encoders.hstu import HSTU
    from generative_recommenders_pl.models.utils import ops
    from generative_recommenders_pl.models.utils.features import (
        seq_features_from_row,
    )

    torch.manual_seed(SEED)  # L.seed_everything(42), train.py:37
    device = torch.device("cpu")

    # --- datamodule attrs (reco_dataset.py:346-391, ml-1m branch) ---
    all_item_ids = [int(x) for x in movies["movie_id"]]
    max_item_id = 3952

    ratings_df = load_data(
        os.path.join(processed, "sasrec_format.csv")
    )  # output_format_csv; all three reference ml-1m splits read it
    pad = MAX_SEQ + 1  # padding_length = max_sequence_length + 1
    train_ds = RecoDataset(
        ratings_file=ratings_df, padding_length=pad, ignore_last_n=1,
        chronological=True, sample_ratio=1.0,
    )
    eval_ds = RecoDataset(
        ratings_file=ratings_df, padding_length=pad, ignore_last_n=0,
        chronological=True, sample_ratio=1.0,
    )

    # --- model (configs/model/hstu.yaml, dims via generative_recommenders
    # .py:118-203: num_items=max_item_id, max_sequence_len=200+10+1) ---
    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = LocalEmbeddingModule(
                num_items=max_item_id, item_embedding_dim=D
            )
            self.preprocessor = (
                LearnablePositionalEmbeddingInputFeaturesPreprocessor(
                    max_sequence_len=MAX_SEQ + GR_OUT + 1,
                    embedding_dim=D,
                    dropout_rate=0.2,
                )
            )
            self.sequence_encoder = HSTU(
                max_sequence_len=MAX_SEQ,
                max_output_len=GR_OUT + 1,
                embedding_dim=D,
                item_embedding_dim=D,
                num_blocks=2,
                num_heads=1,
                attention_dim=D,
                linear_dim=D,
                linear_dropout_rate=0.2,
                attn_dropout_rate=0.0,
                normalization="rel_bias",
                linear_config="uvqk",
                linear_activation="silu",
                concat_ua=False,
                enable_relative_attention_bias=True,
            )
            self.postprocessor = L2NormEmbeddingPostprocessor(
                embedding_dim=D, eps=1e-6
            )

        def forward(self, seq_features):
            # generative_recommenders.py:355-393 (no aux preprocessor)
            past_lengths, user_embeddings, valid_mask, aux_mask = (
                self.preprocessor(
                    past_lengths=seq_features.past_lengths,
                    past_ids=seq_features.past_ids,
                    past_embeddings=seq_features.past_embeddings,
                    past_payloads=seq_features.past_payloads,
                )
            )
            user_embeddings, cached_states = self.sequence_encoder(
                past_lengths=past_lengths,
                user_embeddings=user_embeddings,
                valid_mask=valid_mask,
                past_payloads=seq_features.past_payloads,
            )
            assert aux_mask is None
            return self.postprocessor(user_embeddings), cached_states

    model = Model()
    similarity = __import__(
        "generative_recommenders_pl.models.similarity.dot_product",
        fromlist=["DotProductSimilarity"],
    ).DotProductSimilarity()
    negatives_sampler = LocalNegativesSampler(
        l2_norm=True, l2_norm_eps=1e-6, all_item_ids=all_item_ids
    )
    candidate_index = CandidateIndex(
        k=K,
        ids=torch.tensor(all_item_ids),
        top_k_module=MIPSBruteForceTopK(),
    )
    loss_module = SampledSoftmaxLoss(num_to_sample=128, softmax_temperature=0.05)
    metrics = RetrievalMetricsNumpy()

    # single-optimizer branch (optimizer2: null): ALL params to AdamW
    optimizer = torch.optim.AdamW(
        model.parameters(), lr=1e-3, betas=(0.9, 0.98), weight_decay=1e-3
    )
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="max", factor=0.1, patience=10, threshold=1e-4
    )

    def dense_to_jagged(lengths, **kwargs):
        # generative_recommenders.py:395-425
        jagged_id_offsets = ops.asynchronous_complete_cumsum(lengths)
        output = {}
        if "supervision_ids" in kwargs:
            output["supervision_ids"] = (
                ops.dense_to_jagged(
                    kwargs.pop("supervision_ids").unsqueeze(-1).float(),
                    jagged_id_offsets,
                )
                .squeeze(1)
                .long()
            )
        if "supervision_weights" in kwargs:
            output["supervision_weights"] = ops.dense_to_jagged(
                kwargs.pop("supervision_weights").unsqueeze(-1),
                jagged_id_offsets,
            ).squeeze(1)
        for key, value in kwargs.items():
            output[key] = ops.dense_to_jagged(value, jagged_id_offsets)
        return output

    def training_step(batch):
        # retrieval.py:50-160
        seq_features, target_ids, _ = seq_features_from_row(
            batch, device=device, max_output_length=GR_OUT + 1
        )
        seq_features.past_ids.scatter_(
            dim=1,
            index=seq_features.past_lengths.view(-1, 1),
            src=target_ids.view(-1, 1),
        )
        input_embeddings = model.embeddings.get_item_embeddings(
            seq_features.past_ids
        )
        seq_features = seq_features._replace(past_embeddings=input_embeddings)
        seq_embeddings, _ = model(seq_features)
        supervision_ids = seq_features.past_ids
        negatives_sampler._embeddings_module = model.embeddings  # :117
        jagged_features = dense_to_jagged(
            lengths=seq_features.past_lengths,
            output_embeddings=seq_embeddings[:, :-1, :],
            supervision_ids=supervision_ids[:, 1:],
            supervision_embeddings=input_embeddings[:, 1:, :],
            supervision_weights=(supervision_ids[:, 1:] != 0).float(),
        )
        loss = loss_module.jagged_forward(
            negatives_sampler=negatives_sampler,
            similarity=similarity,
            **jagged_features,
        )
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return float(loss.detach())

    @torch.no_grad()
    def eval_epoch(loader):
        # retrieval.py:162-214
        model.eval()
        metrics.reset()
        candidate_index.update_embeddings(
            negatives_sampler.normalize_embeddings(
                model.embeddings.get_item_embeddings(candidate_index.ids)
            )
        )
        for batch in loader:
            seq_features, target_ids, _ = seq_features_from_row(
                batch, device=device, max_output_length=GR_OUT + 1
            )
            input_embeddings = model.embeddings.get_item_embeddings(
                seq_features.past_ids
            )
            seq_features = seq_features._replace(
                past_embeddings=input_embeddings
            )
            # retrieve() (retrieval.py:20-48)
            seq_embeddings, _ = model(seq_features)
            current = ops.get_current_embeddings(
                seq_features.past_lengths, seq_embeddings
            )
            top_k_ids, _ = candidate_index.get_top_k_outputs(
                query_embeddings=current,
                invalid_ids=seq_features.past_ids,
            )
            metrics.update(top_k_ids.numpy(), target_ids.numpy())
        return metrics.compute()

    g = torch.Generator().manual_seed(SEED)
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=BATCH, shuffle=True, num_workers=0, generator=g
    )
    eval_loader = torch.utils.data.DataLoader(
        eval_ds, batch_size=BATCH, num_workers=0
    )

    best = {"ndcg@100": -1.0, "state": None, "epoch": -1}
    val_metric_for_scheduler = None
    since_best = 0
    t0 = time.time()
    n_train = len(train_ds)
    for epoch in range(epochs):
        model.train()
        losses = []
        for batch in train_loader:
            losses.append(training_step(batch))
        # scheduler stepped on last batch with the PREVIOUS val metric
        # (retrieval.py:148-155)
        if val_metric_for_scheduler is not None:
            scheduler.step(val_metric_for_scheduler)
        val = eval_epoch(eval_loader)
        val_metric_for_scheduler = val["ndcg@100"]
        if val["ndcg@100"] > best["ndcg@100"]:
            best = {
                "ndcg@100": val["ndcg@100"],
                "state": copy.deepcopy(model.state_dict()),
                "epoch": epoch,
            }
            since_best = 0
        else:
            since_best += 1
        print(
            f"# ref epoch {epoch}: loss {np.mean(losses):.4f} "
            f"val/ndcg@100 {val['ndcg@100']:.4f} val/ndcg@10 {val['ndcg@10']:.4f} "
            f"({n_train * (epoch + 1) / (time.time() - t0):.1f} ex/s)",
            file=sys.stderr,
            flush=True,
        )
        if since_best >= 20 and epoch + 1 >= 10:  # early stop patience 20
            break

    # test on best checkpoint (scripts/train.py:77-84)
    model.load_state_dict(best["state"])
    test = eval_epoch(eval_loader)
    if save_ckpt_path is not None:
        # Emulate a Lightning ModelCheckpoint file: the reference's
        # GenerativeRecommenders LightningModule holds embeddings/
        # preprocessor/sequence_encoder/postprocessor as direct
        # attributes (generative_recommenders.py:221-228), so its
        # checkpoint "state_dict" keys are exactly this Model's keys.
        torch.save(
            {
                "state_dict": best["state"],
                "epoch": best["epoch"],
                "global_step": 0,
            },
            save_ckpt_path,
        )
    return {
        "arm": "reference-torch",
        "epochs_run": epoch + 1,
        "best_epoch": best["epoch"],
        "best_val_ndcg100": best["ndcg@100"],
        "test": test,
        "train_examples_per_sec": n_train * (epoch + 1) / (time.time() - t0),
    }


def ours_overrides(epochs: int, users: int, out_sub: str = "ours") -> list[str]:
    return [
        "data.dataset_name=synthetic",
        f"data.data_dir={data_dir_for(users)}",
        f"data.synthetic_num_users={users}",
        # the reference's LocalEmbeddingModule is the fork's
        # half-item/half-year table (embeddings.py:55-73)
        "model.embedding.kind=item_year",
        f"trainer.max_epochs={epochs}",
        f"trainer.seed={SEED}",
        f"trainer.output_dir={os.path.join(data_dir_for(users), out_sub, f's{SEED}')}",
    ]


def run_ours(epochs: int, users: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from mygenerativerecommenders_tpu.configs import apply_overrides
    from mygenerativerecommenders_tpu.configs.presets import get_preset
    from mygenerativerecommenders_tpu.train.driver import Trainer

    ensure_data(users)
    cfg = get_preset("ml-1m-hstu")
    apply_overrides(cfg, ours_overrides(epochs, users))
    trainer = Trainer(cfg)
    t0 = time.time()
    trainer.fit()
    results = trainer.test()
    return {
        "arm": "ours-jax",
        "test": {k: float(v) for k, v in results.items()},
        "wall_s": time.time() - t0,
    }


def run_roundtrip(epochs: int, users: int) -> dict:
    """Full checkpoint round-trip (VERDICT r4 item 1): train the GENUINE
    reference torch modules, save their best state_dict as a
    Lightning-shaped .ckpt, convert it through the REAL
    cli/convert_ckpt.py entry point, restore it in OUR trainer, run OUR
    eval loop on the same split, and compare per-metric against the
    reference arm's own test metrics. Same weights + same data + same
    protocol => near-exact equality (fp-noise rank flips only).

    Reference: scripts/convert_ckpt.py:7-46 (ckpt remap), scripts/
    eval.py:21-62 (eval-on-ckpt protocol).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")

    ckpt_path = os.path.join(data_dir_for(users), f"ref_best_s{SEED}.ckpt")
    conv_dir = os.path.join(data_dir_for(users), f"converted_s{SEED}")
    os.makedirs(data_dir_for(users), exist_ok=True)
    ref = run_reference(epochs, users, save_ckpt_path=ckpt_path)

    from mygenerativerecommenders_tpu.cli import convert_ckpt
    from mygenerativerecommenders_tpu.cli.train import parse_args
    from mygenerativerecommenders_tpu.train.driver import Trainer

    overrides = ["experiment=ml-1m-hstu"] + ours_overrides(
        epochs, users, out_sub="roundtrip"
    )
    convert_ckpt.main([ckpt_path, conv_dir] + overrides)

    trainer = Trainer(parse_args(overrides))
    try:
        ours_test = trainer.test(os.path.join(conv_dir, "last"))
    finally:
        trainer.close()
    ours_test = {k: float(v) for k, v in ours_test.items()}
    deltas = {
        k: ours_test[k] - ref["test"][k]
        for k in ref["test"]
        if k in ours_test
    }
    return {
        "arm": "roundtrip",
        "ref_test": ref["test"],
        "ours_test": ours_test,
        "deltas": deltas,
        "max_abs_delta": max(abs(v) for v in deltas.values()),
        "ref_best_epoch": ref["best_epoch"],
        "epochs_run": ref["epochs_run"],
    }


def main():
    global SEED
    arm = sys.argv[1] if len(sys.argv) > 1 else "both"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    users = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    SEED = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    if arm in ("ref", "both"):
        out = run_reference(epochs, users)
        out["seed"] = SEED
        print(json.dumps(out), flush=True)
    if arm in ("ours", "both"):
        out = run_ours(epochs, users)
        out["seed"] = SEED
        print(json.dumps(out), flush=True)
    if arm == "roundtrip":
        out = run_roundtrip(epochs, users)
        out["seed"] = SEED
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
