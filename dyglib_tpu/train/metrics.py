"""Evaluation metrics: Average Precision and ROC-AUC.

Behavioral parity target: utils/metrics.py of the reference, which uses
sklearn's ``average_precision_score`` / ``roc_auc_score``. sklearn is not a
dependency here, so both are implemented in numpy with identical semantics
(step-wise AP over distinct-score thresholds; tie-aware rank AUC).

The reference computes link-prediction metrics **per batch and then averages
across batches** (evaluate_models_utils.py:148-154) but node-classification
AUC **globally over the split** (evaluate_models_utils.py:236-240) — callers
preserve that asymmetry.
"""
from __future__ import annotations

import numpy as np


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """AP = sum_n (R_n - R_{n-1}) * P_n over descending distinct scores.

    Matches sklearn.metrics.average_precision_score for binary labels.
    """
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    assert y_true.shape == y_score.shape
    n_pos = y_true.sum()
    if n_pos == 0:
        return 0.0

    order = np.argsort(-y_score, kind="mergesort")
    y = y_true[order]
    s = y_score[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1.0 - y)
    # threshold boundaries: last index of each distinct-score run
    distinct = np.nonzero(np.diff(s))[0]
    idxs = np.concatenate([distinct, [len(y) - 1]])
    tp = tps[idxs]
    fp = fps[idxs]
    precision = tp / (tp + fp)
    recall = tp / n_pos
    return float(np.sum(np.diff(np.concatenate([[0.0], recall])) * precision))


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Tie-aware ROC-AUC via the Mann-Whitney U statistic.

    Equivalent to sklearn.metrics.roc_auc_score (trapezoidal rule with tied
    scores grouped).
    """
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_score = np.asarray(y_score, dtype=np.float64).ravel()
    assert y_true.shape == y_score.shape
    n_pos = int(y_true.sum())
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")

    order = np.argsort(y_score, kind="mergesort")
    s = y_score[order]
    # average ranks for ties (1-based)
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    base = np.arange(1, len(s) + 1, dtype=np.float64)
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        ranks[i : j + 1] = base[i : j + 1].mean()
        i = j + 1
    pos_rank_sum = ranks[y_true[order] == 1].sum()
    u = pos_rank_sum - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def link_prediction_metrics(
    predicts: np.ndarray, labels: np.ndarray
) -> dict[str, float]:
    """AP + ROC-AUC for one batch (reference utils/metrics.py:5-20)."""
    return {
        "average_precision": average_precision(labels, predicts),
        "roc_auc": roc_auc(labels, predicts),
    }


def node_classification_metrics(
    predicts: np.ndarray, labels: np.ndarray
) -> dict[str, float]:
    """ROC-AUC only (reference utils/metrics.py:23-35)."""
    return {"roc_auc": roc_auc(labels, predicts)}
