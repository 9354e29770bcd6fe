"""Golden-value retrieval metric tests (reference: tests/test_metrics.py
style — hand-computed NDCG/HR/MRR on a tiny fixture, including the
miss-ranks-at-k+1 sentinel behavior)."""

import numpy as np

from mygenerativerecommenders_tpu.models.metrics import (
    compute_ranks,
    retrieval_metrics,
)


def test_ranks():
    top_k = np.array([[3, 1, 2], [5, 6, 7], [9, 9, 9]])
    targets = np.array([[1], [7], [4]])
    ranks = np.asarray(compute_ranks(top_k, targets))
    np.testing.assert_array_equal(ranks, [2, 3, 4])  # miss -> k+1


def test_retrieval_metrics_golden():
    top_k = np.array([[3, 1, 2], [5, 6, 7], [9, 9, 9]])
    targets = np.array([[3], [7], [4]])
    # ranks: 1, 3, 4 (miss)
    m = retrieval_metrics(top_k, targets, at_k_list=[1, 2, 3])
    np.testing.assert_allclose(m["hr@1"], 1 / 3)
    np.testing.assert_allclose(m["hr@2"], 1 / 3)
    np.testing.assert_allclose(m["hr@3"], 2 / 3)
    np.testing.assert_allclose(m["mrr"], (1 + 1 / 3 + 1 / 4) / 3)
    np.testing.assert_allclose(m["ndcg@1"], 1 / 3)
    np.testing.assert_allclose(
        m["ndcg@3"], (1.0 + 1.0 / np.log2(4)) / 3, rtol=1e-6
    )
