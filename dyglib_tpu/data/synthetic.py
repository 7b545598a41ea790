"""Synthetic CTDG generators for tests and benchmarks.

The reference ships no datasets in this environment (DG_data/ only contains a
README), so we generate bipartite interaction streams with Wikipedia-like
statistics (power-law user activity, bursty repeat edges, dense edge
features) and push them through the exact same preprocessing layout
(ml_*.csv / .npy) that real datasets use.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .preprocess import write_processed


def make_synthetic_bipartite(
    num_src: int = 500,
    num_dst: int = 200,
    num_edges: int = 5000,
    edge_feat_dim: int = 172,
    time_span: float = 1.0e6,
    label_rate: float = 0.02,
    repeat_bias: float = 0.8,
    node_feat_scale: float = 0.0,
    seed: int = 0,
) -> tuple[pd.DataFrame, np.ndarray, np.ndarray]:
    """Generate a processed-format bipartite edge stream.

    Returns (frame, edge_feats, node_feats) in the post-``reindex`` layout:
    node/edge ids are 1-based (0 = sentinel), dst ids offset past src ids,
    edge features carry a zero row 0. ``repeat_bias`` controls how often a
    user re-interacts with a previously visited item (temporal locality that
    makes EdgeBank/memory models meaningful).
    """
    rng = np.random.default_rng(seed)

    # power-law user activity, zipf-ish item popularity
    user_w = rng.pareto(1.5, num_src) + 1.0
    item_w = rng.pareto(1.2, num_dst) + 1.0
    u = rng.choice(num_src, size=num_edges, p=user_w / user_w.sum())
    # integer timestamps (with collisions), like every reference dataset —
    # exactly representable in float32, so device-side strict-before window
    # semantics are bit-exact vs the float64 host oracle
    ts = np.sort(rng.integers(0, int(time_span), size=num_edges)).astype(np.float64)

    i = np.empty(num_edges, dtype=np.int64)
    last_item: dict[int, int] = {}
    fresh = rng.choice(num_dst, size=num_edges, p=item_w / item_w.sum())
    repeat = rng.uniform(size=num_edges) < repeat_bias
    for k in range(num_edges):
        uk = int(u[k])
        if repeat[k] and uk in last_item:
            i[k] = last_item[uk]
        else:
            i[k] = fresh[k]
            last_item[uk] = int(i[k])

    label = (rng.uniform(size=num_edges) < label_rate).astype(np.float64)
    edge_feats = rng.normal(size=(num_edges, edge_feat_dim))

    df = pd.DataFrame(
        {
            "u": u + 1,
            "i": i + num_src + 1,
            "ts": ts,
            "label": label,
            "idx": np.arange(1, num_edges + 1),
        }
    )
    edge_feats = np.vstack([np.zeros((1, edge_feat_dim)), edge_feats])
    # real bipartite datasets ship all-zero node features (wikipedia/reddit);
    # node_feat_scale > 0 opts into informative node features for fast tests
    node_feats = node_feat_scale * rng.normal(
        size=(num_src + num_dst + 1, edge_feat_dim)
    )
    node_feats[0] = 0.0
    return df, edge_feats, node_feats


def write_synthetic_dataset(
    out_dir: str, dataset_name: str = "synthetic", **kwargs
) -> None:
    """Materialize a synthetic dataset in the standard processed layout."""
    df, edge_feats, node_feats = make_synthetic_bipartite(**kwargs)
    write_processed(out_dir, dataset_name, df, edge_feats, node_feats)
