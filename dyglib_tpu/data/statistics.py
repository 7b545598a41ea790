"""Dataset statistics table (reference preprocess_data/data_statistics.py:1-25)."""
from __future__ import annotations

import numpy as np

from .containers import EdgeStream


def dataset_statistics(
    stream: EdgeStream,
    node_feats: np.ndarray | None = None,
    edge_feats: np.ndarray | None = None,
) -> dict:
    """num nodes/edges, time span, feature dims, density facts."""
    uniq = stream.unique_node_ids
    stats = {
        "num_nodes": int(len(uniq)),
        "num_edges": int(stream.num_interactions),
        "num_unique_edges": int(
            len(np.unique(stream.src.astype(np.int64) << 32 | stream.dst))
        ),
        "time_span": float(stream.ts.max() - stream.ts.min())
        if stream.num_interactions else 0.0,
        "mean_degree": float(2 * stream.num_interactions / max(len(uniq), 1)),
        "label_positive_rate": float(np.mean(stream.label))
        if stream.num_interactions else 0.0,
    }
    if node_feats is not None:
        stats["node_feat_dim"] = int(node_feats.shape[1])
    if edge_feats is not None:
        stats["edge_feat_dim"] = int(edge_feats.shape[1])
    return stats
