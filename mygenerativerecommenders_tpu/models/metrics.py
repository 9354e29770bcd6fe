"""Retrieval + multiclass metrics (reference: models/metrics/).

`retrieval_metrics` reproduces RetrievalMetrics.compute
(metrics/retrieval.py:40-68): rank is found by appending the target as a
sentinel column to the top-k ids and taking the first match (so a miss
ranks k+1, contributing 0 to ndcg/hr and 1/(k+1) to mrr — bit-identical to
the reference's argmax trick).

Accumulation across batches/devices happens in the train driver (numpy
concat on host; `jax.experimental.multihost_utils` when multi-process),
replacing torchmetrics' dist-cat states.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def compute_ranks(top_k_ids: jax.Array, target_ids: jax.Array) -> jax.Array:
    """[M, K] top-k ids + [M, 1] targets -> [M] 1-based ranks (K+1 = miss)."""
    if target_ids.ndim == 1:
        target_ids = target_ids[:, None]
    hits = jnp.concatenate([top_k_ids, target_ids], axis=1) == target_ids
    return jnp.argmax(hits, axis=1) + 1


def retrieval_metrics(
    top_k_ids: np.ndarray | jax.Array,
    target_ids: np.ndarray | jax.Array,
    at_k_list: Sequence[int],
) -> Dict[str, float]:
    """NDCG@k, HR@k, MRR from accumulated top-k ids and targets."""
    ranks = np.asarray(compute_ranks(jnp.asarray(top_k_ids), jnp.asarray(target_ids)))
    ranks = ranks.astype(np.float64)
    out: Dict[str, float] = {}
    for at_k in at_k_list:
        out[f"ndcg@{at_k}"] = float(
            np.where(ranks <= at_k, 1.0 / np.log2(ranks + 1), 0.0).mean()
        )
    for at_k in at_k_list:
        out[f"hr@{at_k}"] = float((ranks <= at_k).mean())
    out["mrr"] = float((1.0 / ranks).mean())
    return out


def multiclass_metrics(
    probs: np.ndarray, targets: np.ndarray, num_classes: int
) -> Dict[str, float]:
    """Macro AUROC / AP for rating prediction (metrics/multicls.py:6-63).

    One-vs-rest per class, macro-averaged; classes absent from `targets`
    are skipped (matching torchmetrics' behavior of ignoring empty
    classes in macro averaging).
    """
    aurocs, aps = [], []
    # Precision / Recall (metrics/multicls.py:36-39,53-55): torchmetrics'
    # multiclass Precision/Recall default to average="micro", which for
    # single-label multiclass is TP/(TP+FP) = TP/(TP+FN) = top-1 accuracy.
    pred_cls = probs.argmax(axis=1)
    accuracy = float((pred_cls == targets).mean()) if len(targets) else 0.0
    for c in range(num_classes):
        y = (targets == c).astype(np.float64)
        if y.sum() == 0 or y.sum() == len(y):
            continue
        s = probs[:, c].astype(np.float64)
        order = np.argsort(-s, kind="stable")
        y_sorted = y[order]
        n_pos = y_sorted.sum()
        n_neg = len(y_sorted) - n_pos
        # AUROC via rank statistic
        ranks = np.empty(len(s))
        ranks[np.argsort(s, kind="stable")] = np.arange(1, len(s) + 1)
        # average ranks for ties
        unique_scores, inv = np.unique(s, return_inverse=True)
        sums = np.bincount(inv, weights=ranks)
        counts = np.bincount(inv)
        ranks = (sums / counts)[inv]
        auroc = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        aurocs.append(auroc)
        # Average precision
        tp = np.cumsum(y_sorted)
        precision = tp / np.arange(1, len(y_sorted) + 1)
        ap = (precision * y_sorted).sum() / n_pos
        aps.append(ap)
    return {
        "auroc": float(np.mean(aurocs)) if aurocs else 0.0,
        "ap": float(np.mean(aps)) if aps else 0.0,
        "precision": accuracy,
        "recall": accuracy,
    }
