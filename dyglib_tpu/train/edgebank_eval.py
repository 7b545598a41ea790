"""EdgeBank link-prediction evaluation.

Behavioral parity target: evaluate_edge_bank_link_prediction
(evaluate_models_utils.py:245-392): per test batch, the memory is rebuilt
from train + val + the test prefix before the batch, negatives come from the
seeded test sampler (random strategy keeps neg_src = src,
evaluate_models_utils.py:322-326), loss is BCE on the hard 0/1
probabilities (torch.BCELoss clamps log terms at -100 — reproduced), and
AP/AUC are per batch then averaged.
"""
from __future__ import annotations

import numpy as np

from ..data.batching import chronological_batches
from ..data.containers import EdgeStream
from ..data.datasets import LinkPredictionData
from ..graph.neg_sampler import NegativeEdgeSampler
from ..models.edgebank import edge_bank_link_prediction
from .metrics import link_prediction_metrics


def _bce_clamped(probs: np.ndarray, labels: np.ndarray) -> float:
    """torch.nn.BCELoss semantics: log terms clamped at -100."""
    with np.errstate(divide="ignore"):
        log_p = np.maximum(np.log(np.maximum(probs, 0.0)), -100.0)
        log_1mp = np.maximum(np.log(np.maximum(1 - probs, 0.0)), -100.0)
    losses = -(labels * log_p + (1 - labels) * log_1mp)
    return float(losses.mean())


def _concat(a: EdgeStream, b_src, b_dst, b_ts, b_eid, b_label) -> EdgeStream:
    return EdgeStream(
        src=np.concatenate([a.src, b_src]),
        dst=np.concatenate([a.dst, b_dst]),
        ts=np.concatenate([a.ts, b_ts]),
        eid=np.concatenate([a.eid, b_eid]),
        label=np.concatenate([a.label, b_label]),
    )


def evaluate_edge_bank_link_prediction(
    data: LinkPredictionData,
    neg_sampler: NegativeEdgeSampler,
    batch_size: int = 200,
    edge_bank_memory_mode: str = "unlimited_memory",
    time_window_mode: str = "fixed_proportion",
    time_window_proportion: float = 0.15,
) -> tuple[list[float], list[dict]]:
    assert neg_sampler.seed is not None
    neg_sampler.reset_random_state()

    train_val = _concat(
        data.train, data.val.src, data.val.dst, data.val.ts, data.val.eid,
        data.val.label,
    )
    test = data.test
    losses, metrics = [], []
    for b in chronological_batches(test, batch_size):
        n = b.num_valid
        src, dst = b.src[:n], b.dst[:n]
        if neg_sampler.negative_sample_strategy != "random":
            neg_src, neg_dst = neg_sampler.sample(
                n, batch_src_node_ids=src, batch_dst_node_ids=dst,
                current_batch_start_time=b.batch_start_time,
                current_batch_end_time=b.batch_end_time,
            )
        else:
            _, neg_dst = neg_sampler.sample(n)
            neg_src = src

        history = _concat(
            train_val,
            test.src[: b.start], test.dst[: b.start], test.ts[: b.start],
            test.eid[: b.start], test.label[: b.start],
        )
        pos_p, neg_p = edge_bank_link_prediction(
            history, (src, dst), (neg_src, neg_dst),
            edge_bank_memory_mode=edge_bank_memory_mode,
            time_window_mode=time_window_mode,
            time_window_proportion=time_window_proportion,
        )
        predicts = np.concatenate([pos_p, neg_p])
        labels = np.concatenate([np.ones(n), np.zeros(n)])
        losses.append(_bce_clamped(predicts, labels))
        metrics.append(link_prediction_metrics(predicts, labels))
    return losses, metrics
