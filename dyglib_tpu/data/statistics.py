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


def main(argv: list[str] | None = None) -> None:
    """CLI: ``python -m dyglib_tpu.data.statistics [--data_root D] [names...]``
    — the reference's data_statistics.py table over processed datasets."""
    import argparse
    import os

    parser = argparse.ArgumentParser("Dataset statistics")
    parser.add_argument("names", nargs="*", help="dataset names (default: all present)")
    parser.add_argument("--data_root", type=str, default="./processed_data")
    args = parser.parse_args(argv)

    from .datasets import _load_processed, _stream_from_frame

    names = args.names or sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d))
    )
    cols = [
        "dataset", "num_nodes", "num_edges", "num_unique_edges",
        "time_span", "mean_degree", "label_positive_rate",
        "node_feat_dim", "edge_feat_dim",
    ]
    rows = []
    for name in names:
        graph_df, edge_feats, node_feats = _load_processed(name, args.data_root)
        s = dataset_statistics(_stream_from_frame(graph_df), node_feats, edge_feats)
        rows.append(
            [name]
            + [
                round(v, 4) if isinstance(v := s.get(c, ""), float) else v
                for c in cols[1:]
            ]
        )
    widths = [
        max(len(str(x)) for x in [c] + [r[i] for r in rows])
        for i, c in enumerate(cols)
    ]
    fmt = lambda r: "  ".join(str(x).rjust(w) for x, w in zip(r, widths))
    print(fmt(cols))
    for r in rows:
        print(fmt(r))


if __name__ == "__main__":
    main()
