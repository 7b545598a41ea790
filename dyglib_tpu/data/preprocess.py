"""Raw CSV -> processed dataset files.

Behavioral parity target: preprocess_data/preprocess_data.py:9-118 of the
reference. Input format (DG_data/<name>/<name>.csv): a header line followed
by ``src,dst,ts,label,feat...`` rows with non-decreasing ``ts``. Output:

  processed/<name>/ml_<name>.csv       edge list with columns u,i,ts,label,idx
  processed/<name>/ml_<name>.npy       edge features, row 0 = zeros (sentinel)
  processed/<name>/ml_<name>_node.npy  node features, (max_id+1, node_feat_dim)

Reindexing: bipartite graphs offset dst ids past the src id range; all node
ids and edge ids are shifted +1 so id 0 is the padding sentinel
(reference reindex(), preprocess_data.py:56-81).

This implementation is vectorized numpy/pandas (the reference parses the CSV
line-by-line in Python) — identical outputs, much faster.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

BIPARTITE_DATASETS = {"wikipedia", "reddit", "mooc", "lastfm", "myket"}
DATASET_NAMES = [
    "wikipedia", "reddit", "mooc", "lastfm", "myket", "enron", "SocialEvo",
    "uci", "Flights", "CanParl", "USLegis", "UNtrade", "UNvote", "Contacts",
]


def parse_raw_csv(path: str) -> tuple[pd.DataFrame, np.ndarray]:
    """Parse a raw edge-list CSV (header skipped) into a frame + edge features.

    Mirrors reference preprocess() (preprocess_data.py:9-53): columns are
    u, i, ts, label, followed by a variable number of edge-feature columns;
    asserts timestamps are non-decreasing; edge idx = 0-based row number.
    """
    raw = pd.read_csv(path, header=None, skiprows=1)
    u = raw.iloc[:, 0].astype(np.int64).values
    i = raw.iloc[:, 1].astype(np.int64).values
    ts = raw.iloc[:, 2].astype(np.float64).values
    label = raw.iloc[:, 3].astype(np.float64).values
    feats = raw.iloc[:, 4:].astype(np.float64).values
    if feats.shape[1] == 0:
        feats = np.zeros((len(u), 1), dtype=np.float64)
    assert np.all(np.diff(ts) >= 0), "timestamps must be in ascending order"
    df = pd.DataFrame(
        {"u": u, "i": i, "ts": ts, "label": label, "idx": np.arange(len(u))}
    )
    return df, feats


def reindex(df: pd.DataFrame, bipartite: bool = True) -> pd.DataFrame:
    """Shift ids so 0 is a sentinel; separate bipartite id spaces.

    Mirrors reference reindex() (preprocess_data.py:56-81) including its
    contiguity asserts for bipartite graphs.
    """
    new_df = df.copy()
    if bipartite:
        assert df.u.max() - df.u.min() + 1 == df.u.nunique()
        assert df.i.max() - df.i.min() + 1 == df.i.nunique()
        assert df.u.min() == df.i.min() == 0
        new_df.i = df.i + df.u.max() + 1
    new_df.u += 1
    new_df.i += 1
    new_df.idx += 1
    return new_df


def preprocess_dataset(
    raw_csv_path: str,
    out_dir: str,
    dataset_name: str,
    bipartite: bool = True,
    node_feat_dim: int = 172,
) -> None:
    """Produce ml_<name>.csv / .npy / _node.npy under ``out_dir/<name>/``.

    Mirrors reference preprocess_data() (preprocess_data.py:84-117): edge
    features get a zero sentinel row 0; node features are all-zero with
    shape (max_id + 1, node_feat_dim).
    """
    df, edge_feats = parse_raw_csv(raw_csv_path)
    new_df = reindex(df, bipartite=bipartite)
    edge_feats = np.vstack([np.zeros((1, edge_feats.shape[1])), edge_feats])
    max_idx = max(new_df.u.max(), new_df.i.max())
    node_feats = np.zeros((max_idx + 1, node_feat_dim))

    dest = os.path.join(out_dir, dataset_name)
    os.makedirs(dest, exist_ok=True)
    new_df.to_csv(os.path.join(dest, f"ml_{dataset_name}.csv"))
    np.save(os.path.join(dest, f"ml_{dataset_name}.npy"), edge_feats)
    np.save(os.path.join(dest, f"ml_{dataset_name}_node.npy"), node_feats)


def write_processed(
    out_dir: str,
    dataset_name: str,
    df: pd.DataFrame,
    edge_feats: np.ndarray,
    node_feats: np.ndarray,
) -> None:
    """Write already-materialized processed arrays in the standard layout."""
    dest = os.path.join(out_dir, dataset_name)
    os.makedirs(dest, exist_ok=True)
    df.to_csv(os.path.join(dest, f"ml_{dataset_name}.csv"))
    np.save(os.path.join(dest, f"ml_{dataset_name}.npy"), edge_feats)
    np.save(os.path.join(dest, f"ml_{dataset_name}_node.npy"), node_feats)


def main(argv: list[str] | None = None) -> None:
    """CLI mirroring the reference's two preprocessing entry points:

      python -m dyglib_tpu.data.preprocess --dataset_name wikipedia
          one dataset (reference preprocess_data.py:153-177)
      python -m dyglib_tpu.data.preprocess --all
          every dataset in DATASET_NAMES (reference
          preprocess_all_data.py:1-5, which shells out per dataset; here
          one process loops — same outputs)

    Datasets missing their raw CSV are reported and skipped (--all) or
    raise (single-dataset mode).
    """
    import argparse

    parser = argparse.ArgumentParser("Preprocess raw dynamic-graph datasets")
    parser.add_argument(
        "--dataset_name", type=str, default=None, choices=DATASET_NAMES,
        help="one dataset to preprocess",
    )
    parser.add_argument(
        "--all", action="store_true",
        help="preprocess every dataset in DATASET_NAMES",
    )
    parser.add_argument("--data_root", type=str, default="./DG_data",
                        help="directory holding <name>/<name>.csv raw files")
    parser.add_argument("--out_root", type=str, default="./processed_data")
    parser.add_argument("--node_feat_dim", type=int, default=172)
    args = parser.parse_args(argv)

    if args.all == (args.dataset_name is not None):
        parser.error("exactly one of --dataset_name or --all is required")
    names = DATASET_NAMES if args.all else [args.dataset_name]
    for name in names:
        raw = os.path.join(args.data_root, name, f"{name}.csv")
        if not os.path.exists(raw):
            msg = f"{name}: raw file not found at {raw}"
            if args.all:
                print(f"skip {msg}")
                continue
            parser.error(msg)
        preprocess_dataset(
            raw, args.out_root, name,
            bipartite=name in BIPARTITE_DATASETS,
            node_feat_dim=args.node_feat_dim,
        )
        print(f"processed {name} -> {os.path.join(args.out_root, name)}")


def check_processed(reference_dir: str, out_dir: str, dataset_name: str) -> None:
    """Golden-file check mirroring reference check_data() (preprocess_data.py:120-150)."""
    from pandas.testing import assert_frame_equal

    ref = os.path.join(reference_dir, dataset_name)
    out = os.path.join(out_dir, dataset_name)
    assert_frame_equal(
        pd.read_csv(os.path.join(ref, f"ml_{dataset_name}.csv")),
        pd.read_csv(os.path.join(out, f"ml_{dataset_name}.csv")),
    )
    for suffix in ("", "_node"):
        a = np.load(os.path.join(ref, f"ml_{dataset_name}{suffix}.npy"))
        b = np.load(os.path.join(out, f"ml_{dataset_name}{suffix}.npy"))
        assert a.shape == b.shape and a.max() == b.max() and a.min() == b.min()


if __name__ == "__main__":
    main()
